package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Vector math is pure `zip_with`/`aggregate` column expressions (codegen'd
  * sequential folds — deterministic and UDF-free). Two search paths:
  *
  *  - `bruteForceTopK`: exact cosine top-k of a (small, broadcast) query
  *    set against the corpus — the correctness baseline. Cost is
  *    |queries|·|corpus| but the corpus side streams through one scan: at
  *    100 TB this is the pattern for scoring a handful of probes, not bulk
  *    knn.
  *  - `lshTopK`: random-hyperplane LSH — each vector maps to a `nBits`
  *    signature; candidates share a signature bucket (optionally within
  *    Hamming radius via multi-probe over bit flips); exact cosine reranks
  *    candidates. Corpus-side cost is one map + one bucket shuffle, query
  *    cost is bucket-local — the 100 TB path (an IVF coarse quantizer has
  *    the same shape: replace the signature with a nearest-centroid id).
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision (f32→f64 widening is exact; the fold is
    * sequential so the result is bit-deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Exact top-k by cosine: broadcast the query set, score the corpus in
    * one pass, keep k per query via window. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    // Hoist each side's norm to a per-row column: the cross join then
    // evaluates one dot-product fold per pair instead of three.
    val c = corpus.withColumn("__nc", norm2(col(vecCol)))
    val q = queries.withColumn("__nq", norm2(col(qVecCol)))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", dot(col(vecCol), col(qVecCol)) / (col("__nc") * col("__nq")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane component r_j[d] ∈ [-1, 1):
    * seeded by (bit, dim) through xxhash64 — no stored model needed. */
  private def planeComponent(bit: Int, dim: Column): Column =
    (pmod(xxhash64(concat_ws("_", lit("rh"), lit(bit), dim)), lit(1000003L))
      .cast(DoubleType) / 500001.5) - 1.0

  /** nBits-bit random-hyperplane signature of a vector. Row-expression
    * form: correct at any width, but the per-bit `aggregate(zip_with(...))`
    * folds are interpreted higher-order functions that re-run the hash
    * chain per element — use [[lshSignatures]] (same values by
    * construction, hash chain codegen'd) when signing a whole corpus. */
  def lshSignature(vec: Column, nBits: Int = 16): Column = {
    val bits = (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast(DoubleType) * planeComponent(j, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** (idCol, vecCol, sigCol, normCol) for a whole corpus — the signing
    * pass [[cosineNearDuplicates]] runs, restructured so the HOT work is
    * whole-stage-codegen'd (guide §4: no interpreted expressions in the
    * hot path).
    *
    * Spark evaluates higher-order functions (`aggregate`/`zip_with`/
    * `transform`) INTERPRETED, so the row-expression [[lshSignature]]
    * pays nBits interpreted folds per row, each re-running the
    * concat/xxhash64/pmod hyperplane chain per element — measured 126 s
    * for q104's 4,000-row corpus at sf0.1. Here the per-element products
    * x_d·r_j[d] (and x_d² for the norm) are computed in a CODEGEN'D
    * posexplode projection, then re-packed per row with one
    * `collect_list` + pos-sort; the only interpreted folds left are pure
    * additions over the precomputed doubles, added in the SAME ascending
    * dimension order as the row expression's sequential fold — so every
    * signature bit, norm, and downstream cosine is BIT-IDENTICAL to the
    * row-expression path (same doubles, same order, same ops).
    *
    * Scale shape: one corpus scan + one keyed shuffle carrying
    * dim×(nBits+2) doubles per row — same O(corpus) byte class as
    * shuffling the vectors themselves. Degenerate rows (NULL/empty
    * vector) keep the row-expression semantics via a union branch. */
  def lshSignatures(corpus: DataFrame, nBits: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    sigCol: String = "sig", normCol: String = "__n"): DataFrame = {
    val degenerate = corpus
      .filter(col(vecCol).isNull || size(col(vecCol)) <= 0)
      .select(col(idCol), col(vecCol),
        lshSignature(col(vecCol), nBits).as(sigCol),
        norm2(col(vecCol)).as(normCol))
    val x = col("x").cast(DoubleType)
    val fields = Seq(col("pos"), col("x")) ++
      (0 until nBits).map(j => (x * planeComponent(j, col("pos"))).as(s"c$j")) :+
      (x * x).as("xx")
    // widen a single-row-group corpus before the per-element plane
    // products — the signing pass is the pipeline's heaviest map stage
    // (no-op on warehouse-wide scans; see Dedup.widenIfNarrow)
    val packed = Dedup.widenIfNarrow(corpus.filter(size(col(vecCol)) > 0), idCol)
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), struct(fields: _*).as("pc"))
      .groupBy(col(idCol))
      // struct sort = by first field (pos, unique per row) — the fold
      // below then adds contributions in ascending-dimension order,
      // matching lshSignature's sequential zip_with fold exactly
      .agg(array_sort(collect_list(col("pc"))).as("ps"))
    def fold(field: String): Column =
      aggregate(col("ps"), lit(0.0), (acc, p) => acc + p.getField(field))
    val sig = (0 until nBits).map { j =>
      when(fold(s"c$j") >= 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    packed.select(col(idCol),
      transform(col("ps"), p => p.getField("x")).as(vecCol),
      sig.as(sigCol),
      sqrt(fold("xx")).as(normCol))
      .unionByName(degenerate)
  }

  /** ANN top-k: hash corpus and queries to signature buckets, join on the
    * bucket (multi-probe: also match signatures within Hamming ≤ 2 by
    * joining on masked signatures), rerank candidates with exact cosine. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nBits: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    // probe masks: exact bucket + all 1-bit flips (Hamming radius 1)
    val masks = lit(0L) +: (0 until nBits).map(j => shiftleft(lit(1L), j))
    val c = corpus.withColumn("sig", lshSignature(col(vecCol), nBits))
    val q = queries.withColumn("sig0", lshSignature(col(qVecCol), nBits))
      .withColumn("sig", explode(array(masks.map(m => col("sig0").bitwiseXOR(m)): _*)))
    val cand = c.join(broadcast(q), "sig")
    val scored = cand.withColumn("cos", cosine(col(vecCol), col(qVecCol)))
      .select(col(qIdCol), col(idCol), col("cos"))
      .groupBy(col(qIdCol), col(idCol)).agg(max(col("cos")).as("cos")) // dedup probes
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("cos"))
  }

  // ---- IVF (inverted-file) ANN: nearest-centroid coarse quantizer ------

  /** Elementwise mean vector per key: explode dims → per-(key,dim) avg →
    * regroup in dim order. The explode costs |rows|·dim but is one keyed
    * shuffle with map-side partial aggregation — the scalable shape for
    * training a coarse quantizer over a 100 TB corpus. */
  private def elementwiseMean(df: DataFrame, keyCol: String,
                              vecCol: String): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(keyCol), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col(keyCol),
        transform(col("ps"), p => p.getField("m").cast(FloatType)).as("cvec"))

  /** Assign each vector to its nearest centroid (by cosine) — cross join
    * against the broadcast centroid model, then an argmin per row via
    * map-side-combining min_by. */
  private def assign(corpus: DataFrame, centroids: DataFrame,
                     idCol: String, vecCol: String): DataFrame =
    corpus.crossJoin(broadcast(centroids))
      .withColumn("__d", -cosine(col(vecCol), col("cvec")))
      .groupBy(col(idCol))
      .agg(min_by(col("cid"), col("__d")).as("cid"),
        first(col(vecCol)).as(vecCol))

  /** Train a deterministic IVF coarse quantizer: initial centroids are the
    * elementwise means of xxhash64 buckets (no RNG, no driver-side kmeans),
    * refined by one Lloyd iteration (assign → re-average). The model is a
    * tiny (nCentroids × dim) table — broadcastable at any corpus size. */
  def ivfCentroids(corpus: DataFrame, nCentroids: Int = 16,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val init = elementwiseMean(
      corpus.withColumn("cid", pmod(xxhash64(col(idCol)), lit(nCentroids))),
      "cid", vecCol)
    elementwiseMean(
      assign(corpus, init, idCol, vecCol).select(col("cid"), col(vecCol)),
      "cid", vecCol)
  }

  /** IVF ANN top-k: bucket the corpus by nearest centroid (one scan + one
    * argmin), probe each query's `nProbe` nearest centroids, rerank the
    * probed buckets with exact cosine. Corpus-side cost is one pass +
    * one bucket-keyed join of ~nProbe/nCentroids of the data per query —
    * the IVF shape production vector stores use; `lshTopK` is the
    * hyperplane-bucket alternative with the same join skeleton. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    val centroids = ivfCentroids(corpus, nCentroids, idCol, vecCol)
    val indexed = assign(corpus, centroids, idCol, vecCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("__d").asc, col("cid").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("__d", -cosine(col(qVecCol), col("cvec")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= nProbe)
      .select(col(qIdCol), col(qVecCol), col("cid"))
    val rerank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol).asc)
    indexed.join(probes, "cid")
      .withColumn("cos", cosine(col(vecCol), col(qVecCol)))
      .withColumn("rank", row_number().over(rerank))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("cos"))
  }

  /** Build a FROZEN IVF probe scorer for standing retrieval views (the
    * score function of `Inc.topKPerGroup` / q156): the coarse quantizer
    * is trained ONCE on `train` and captured as a local model (16×dim —
    * collected at build time, the production cadence: retraining per
    * delta would move every bucket boundary), and each probe pre-ranks
    * its `nProbe` nearest centroids into a local probe-bucket table. The
    * returned function assigns its input rows to their nearest centroid
    * (one broadcast argmin) and joins them against the probe buckets —
    * so a candidate flows ONLY to probes that probe its bucket: an
    * insert into an unprobed bucket reaches nobody, and a probe re-ranks
    * only candidates from buckets it probes. With nProbe = nCentroids
    * the probed buckets cover the corpus and results equal exact
    * brute-force (the q79 axis, standing); smaller nProbe trades recall
    * for bucket-local work (gating + recall spec'd, not oracle'd). */
  def ivfProbeScorer(train: DataFrame, probes: DataFrame, nCentroids: Int,
                     nProbe: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     qIdCol: String = "q_id", qVecCol: String = "q_vec")
      : DataFrame => DataFrame = {
    val spark = train.sparkSession
    def localize(df: DataFrame): DataFrame = {
      val rows = df.collect()
      broadcast(spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), df.schema))
    }
    val cLocal = localize(ivfCentroids(train, nCentroids, idCol, vecCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("__d").asc, col("cid").asc)
    val pbLocal = localize(
      probes.withColumn("__nq", norm2(col(qVecCol)))
        .crossJoin(cLocal)
        .withColumn("__d", -cosine(col(qVecCol), col("cvec")))
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= nProbe)
        .select(col(qIdCol), col(qVecCol), col("__nq"), col("cid")))
    rows =>
      assign(rows, cLocal, idCol, vecCol)
        .withColumn("__nc", norm2(col(vecCol)))
        .join(pbLocal, "cid")
        .withColumn("cos",
          dot(col(vecCol), col(qVecCol)) / (col("__nc") * col("__nq")))
        .select(col(qIdCol), col(idCol), col("cos"))
  }

  /** REQUANTIZE a standing IVF retrieval view — the maintenance operation
    * the frozen-quantizer design (ivfProbeScorer / q156) defers: as the
    * corpus drifts, the bootstrap-time centroids stop matching the data,
    * so recall at fixed nProbe decays. This retrains the coarse quantizer
    * on the runner's CURRENT integrated corpus, rebuilds the probe scorer
    * and its top-k circuit, and bootstraps a NEW runner from that same
    * state — by construction identical to a fresh bootstrap at the
    * current state (asserted in IncrementalTopKSpec), so delta stepping
    * resumes under the new buckets with no other discontinuity: with
    * nProbe = nCentroids the standing results are invariant across the
    * requantize (exactness does not depend on the quantizer). Cost is one
    * consolidated scan of input state plus the bootstrap — the periodic
    * re-index every production vector store schedules; the old runner
    * keeps serving until the new one is live (blue/green swap). */
  def requantizeIvf(old: graft.streaming.Incremental.Runner,
                    sourceName: String, probes: DataFrame,
                    nCentroids: Int, nProbe: Int, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    qIdCol: String = "q_id", qVecCol: String = "q_vec")
      : graft.streaming.Incremental.Runner = {
    import graft.streaming.Incremental
    // persist the consolidated scan: quantizer training and the bootstrap
    // both read it — without the cache each would re-derive the old
    // runner's full input union
    val state = old.inputState(sourceName)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val score =
        ivfProbeScorer(state, probes, nCentroids, nProbe, idCol, vecCol,
          qIdCol, qVecCol)
      val circuit = Incremental.source(sourceName).topKPerGroup(score,
        Seq(idCol), Seq(qIdCol), Seq(col("cos").desc, col(idCol).asc), k)
      val fresh = new Incremental.Runner(old.spark, circuit,
        Map(sourceName -> state.limit(0)))
      fresh.bootstrap(Map(sourceName -> state))
      // the caller decides when to retire the OLD runner (blue/green:
      // it can keep serving until this one is live) — Runner.decommission
      fresh
    } finally state.unpersist(false) // bootstrap anchored its own caches
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets (the
    * embedding-space analogue of Dedup.nearDuplicates). Buckets above
    * `maxBucket` are dropped before the self-join — a degenerate corpus
    * (zero or constant vectors all hashing to one signature) otherwise
    * goes quadratic. Same cap pattern as Dedup.candidatePairs: the
    * oversized-bucket list is tiny at any corpus size, so broadcast it
    * and anti-join. */
  def cosineNearDuplicates(corpus: DataFrame, threshold: Double,
                           nBits: Int = 12,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding",
                           maxBucket: Int = 1000): DataFrame = {
    // Signatures + hoisted norms via the codegen'd signing pass
    // (bit-identical to the lshSignature row expression — see
    // lshSignatures); the per-pair cost after the bucket join is then ONE
    // dot-product fold instead of cosine's three (guide §4).
    val sig = lshSignatures(corpus, nBits, idCol, vecCol)
    // cap disabled (oracle paths) → skip the bucket-size pass entirely
    // instead of anti-joining against a provably-empty list
    val sized =
      if (maxBucket == Int.MaxValue) sig
      else {
        val bigBuckets = sig.groupBy(col("sig"))
          .agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") > maxBucket)
          .select(col("sig"))
        sig.join(broadcast(bigBuckets), Seq("sig"), "left_anti")
      }
    val a = sized.select(col("sig"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("__n").as("__na"))
    val b = sized.select(col("sig"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("__n").as("__nb"))
    a.join(b, Seq("sig")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("__na") * col("__nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos")).distinct()
  }
}
