package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators, all bucketed by construction — no stage is
  * O(n²) in corpus size, which is the difference between "works on 60k
  * docs" and "works on 100 TB":
  *
  *  - exact:   one shuffle on a 128-bit content key;
  *  - MinHash: shingle → K-permutation min-hash signature → banded LSH
  *    buckets → candidate pairs only within buckets → exact Jaccard
  *    verification on candidates;
  *  - SimHash: token-hash bit-vote signature → band buckets → Hamming
  *    verification via bit_count(xor).
  *
  * Candidate generation touches each document once (map + one shuffle per
  * stage); pair enumeration happens only inside an LSH bucket, whose size
  * is bounded by collision probability, not corpus size. Skewed buckets
  * (e.g. boilerplate shingles) are handled by AQE skew-join splitting; a
  * hard cap (`maxBucket`) drops degenerate buckets the way production
  * dedup pipelines do.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Oversized-bucket list for the capped pair self-joins. "No silent
    * caps": the cap trades recall for bounded pair-enumeration work, so
    * when it fires the dropped-bucket count is LOGGED instead of silently
    * shrinking the result. The list is needed for the broadcast anti-join
    * anyway and is tiny by construction, so persisting it and counting it
    * eagerly adds no shuffle the lazy plan wouldn't have run. Callers
    * disable the cap with `maxBucket = Int.MaxValue` (oracle-compared
    * correctness paths do — they must match an exact-enumeration oracle at
    * any scale, so a cap there would be a silent divergence). */
  private def oversizedBuckets(buckets: DataFrame, keyCols: Seq[String],
                               maxBucket: Int, what: String): DataFrame = {
    val big = buckets.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") > maxBucket)
      .select(keyCols.map(col): _*)
      .persist()
    val n = big.count()
    if (n > 0) log.warn(
      s"$what: dropping $n buckets larger than $maxBucket docs from pair " +
        "enumeration (recall reduced for those keys)")
    big
  }

  /** Anti-join `buckets` against its own oversized keys (no-op when the
    * cap is disabled). */
  private def dropOversized(buckets: DataFrame, keyCols: Seq[String],
                            maxBucket: Int, what: String): DataFrame =
    if (maxBucket == Int.MaxValue) buckets
    else buckets.join(
      broadcast(oversizedBuckets(buckets, keyCols, maxBucket, what)),
      keyCols, "left_anti")

  // ---- exact dedup -----------------------------------------------------

  /** Groups of byte-identical texts: content key → canonical (min) id +
    * duplicate count. One shuffle. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.groupBy(TextAnalysis.contentKey(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The deduplicated corpus: one representative (min id) per content key. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextAnalysis.contentKey(col(textCol)))
      .orderBy(col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ---- MinHash + banded LSH -------------------------------------------

  /** Word n-gram shingles of the normalized text (distinct per doc).
    * NOTE: when used over a DataFrame, materialize the token array behind
    * a projection boundary first (see `shingleSets`) — referencing a
    * nested array expression inside the window lambda re-evaluates it per
    * shingle in Spark's interpreted higher-order functions. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** (id, shingle-set) per document, with the token array materialized as
    * a column so shingle windows are O(tokens), not O(tokens²). */
  def shingleSets(docs0: DataFrame, idCol: String, textCol: String,
                  n: Int = 3): DataFrame = {
    val docs = widenIfNarrow(docs0, idCol)
    val toks = filter(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+"),
      t => length(t) > 0)
    docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        array_distinct(
          when(size(col("__toks")) < n, array(concat_ws(" ", col("__toks"))))
            .otherwise(transform(sequence(lit(0), size(col("__toks")) - n),
              i => concat_ws(" ", slice(col("__toks"), i + 1, lit(n))))))
          .as("sh"))
  }

  private val P = 2305843009213693951L // 2^61 - 1 (Mersenne prime)

  /** K-permutation MinHash signature: h_i(s) = (a_i·x + b_i) mod p over
    * the shingle's 64-bit hash x. Codegen'd array expression, no UDF.
    * (Single-row form; the distributed path is `minhashSignatures`.) */
  def minhashSignature(shingleArr: Column, k: Int = 64): Column = {
    val sigs = (0 until k).map { i =>
      val a = 2L * i + 1; val b = 7919L * (i + 1)
      array_min(transform(shingleArr,
        s => pmod(xxhash64(s) * a + b, lit(P))))
    }
    array(sigs: _*)
  }

  /** Same signature computed from PRE-HASHED shingles (a bound column of
    * xxhash64 values): each permutation is then a pure affine transform.
    * The split matters because higher-order functions are interpreted —
    * `minhashSignature` re-evaluates xxhash64 inside each of the k
    * permutation lambdas (k hashes per shingle), while hashing once into a
    * projected column and folding THAT costs one hash per shingle plus k
    * multiply-mods. Same values, ~k× less hashing. */
  def minhashSignatureFromHashes(hashArr: Column, k: Int = 64): Column = {
    val sigs = (0 until k).map { i =>
      val a = 2L * i + 1; val b = 7919L * (i + 1)
      array_min(transform(hashArr, h => pmod(h * a + b, lit(P))))
    }
    array(sigs: _*)
  }

  /** Distributed MinHash: explode shingle hashes, take the K permutation
    * minima as grouped aggregates. This is the shape that scales — one
    * hash per (doc, shingle), and the 64 `min`s partial-aggregate
    * map-side so the shuffle carries one 64-element row per document.
    *
    * Shingle identity is a polynomial combine of the n consecutive token
    * hashes — no shingle strings are materialized (the verify step still
    * computes exact string-shingle Jaccard; 64-bit collisions are
    * negligible for dedup). The token-hash array goes through a real
    * projection boundary before the shingle lambda touches it: Spark's
    * higher-order functions are interpreted, so a nested array expression
    * referenced inside a lambda re-evaluates per element — O(tokens²) —
    * while a column reference is an O(1) bound read. */
  /** Repartition a parallelism-STARVED source before an expensive per-row
    * derivation (guide §2.5: one unsplittable input — here a single-row-
    * group parquet file — leaves the scan, and every map-side stage fused
    * onto it, on one or two cores; measured: q77's whole token-vote
    * aggregation ran as a 2-task stage, 6.8 s of its 10 s). No-op when the
    * frame already carries >= defaultParallelism partitions — warehouse-
    * scale scans are wide, so this never fires there and adds no exchange.
    * The probe plans a throwaway wrapper under a THREAD-LOCAL conf clone
    * with AQE disabled: with AQE on, `toRdd` over a plan containing
    * exchanges materializes every query stage — silently executing the
    * upstream query once per probe (today's call sites pass scan-only
    * frames where AQE has nothing to wrap, but a future derived-frame
    * caller must not pay a hidden duplicate execution). Non-adaptive RDD
    * construction is lazy — no job. A failed probe falls back to `target`
    * (frame untouched) with the failure logged, not swallowed. */
  private[graft] def widenIfNarrow(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts = scala.util.Try(
      org.apache.spark.sql.GraftSqlBridge.withScopedConf(df.sparkSession,
        Map("spark.sql.adaptive.enabled" -> "false")) { _ =>
        df.select(col("*")).queryExecution.toRdd.getNumPartitions
      }) match {
      case scala.util.Success(p) => p
      case scala.util.Failure(e) =>
        System.err.println(s"[dedup] widenIfNarrow probe failed (${e.getMessage}); leaving frame as-is")
        target
    }
    if (parts < target) df.repartition(target, col(key)) else df
  }

  def minhashSignatures(docs0: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, k: Int = 64): DataFrame = {
    val docs = widenIfNarrow(docs0, idCol)
    val toks = filter(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+"),
      t => length(t) > 0)
    val withTh = docs.select(col(idCol), transform(toks, t => xxhash64(t)).as("__th"))
    val th = col("__th")
    val combined = transform(sequence(lit(0), size(th) - n),
      i => (0 until n).map(j => get(th, i + j) * lit(31L * (n - j)))
        .reduce(_ + _))
    val hashed = withTh.select(col(idCol),
      explode(array_distinct(
        when(size(th) < n, slice(th, 1, 1)).otherwise(combined))).as("x"))
    val mins = (0 until k).map { i =>
      val a = 2L * i + 1; val b = 7919L * (i + 1)
      min(pmod(col("x") * a + b, lit(P))).as(s"__m$i")
    }
    hashed.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** (doc_id, band_id, band_key) — LSH bucket keys: docs sharing any band
    * key are near-dup candidates. bands·rows must equal the signature
    * length. */
  def lshBands(docs: DataFrame, idCol: String, sigCol: String,
               bands: Int, rows: Int): DataFrame =
    docs.select(col(idCol), posexplode(
        array((0 until bands).map(b =>
          xxhash64(concat_ws("_", slice(col(sigCol), b * rows + 1, rows)))): _*))
      .as(Seq("band_id", "band_key")))

  /** Candidate near-duplicate pairs (id_a < id_b), deduplicated across
    * bands; buckets above maxBucket are dropped (degenerate boilerplate). */
  def candidatePairs(bandsDf: DataFrame, idCol: String,
                     maxBucket: Int = 1000): DataFrame = {
    // Bucket-size cap via aggregate + anti-join (no per-bucket sort,
    // unlike a count window). The oversized-bucket list — degenerate
    // boilerplate keys only — is tiny at any corpus size, so it
    // broadcasts; the complement (all small buckets) would not.
    val sized = dropOversized(bandsDf, Seq("band_id", "band_key"),
      maxBucket, "candidatePairs")
    val a = sized.select(col("band_id"), col("band_key"), col(idCol).as("id_a"))
    val b = sized.select(col("band_id"), col("band_key"), col(idCol).as("id_b"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard similarity for candidate pairs only (the verify step). */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
    pairs
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / greatest(col("uni"), lit(1)).cast(DoubleType))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** End-to-end MinHash-LSH near-dup detection: pairs with Jaccard ≥
    * threshold. No O(n²) stage: explode → bucket-join → verify candidates. */
  def nearDuplicates(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", n: Int = 3, k: Int = 64,
                     bands: Int = 16, threshold: Double = 0.7,
                     maxBucket: Int = 1000): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol, n, k)
    val pairs = candidatePairs(
      lshBands(sig, idCol, "sig", bands, k / bands), idCol, maxBucket)
    verifyJaccard(pairs, docs, idCol, textCol, n)
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT near-duplicate pairs — deterministic candidate generation via a
    * shared-shingle inverted index, no LSH banding. Recall is 100% for any
    * threshold > 0 (a pair with Jaccard ≥ t > 0 shares at least one
    * shingle), and Jaccard is computed exactly from index counts:
    * |A∩B| = shared distinct shingles from the index self-join,
    * |A∪B| = |A| + |B| − |A∩B| — no per-pair array intersection.
    * Zero-token docs are excluded (no shingles → no index rows), matching
    * the LSH path, which drops them at the signature explode.
    *
    * Use this where the result must match an exact all-pairs oracle
    * regardless of fixture (banding miss probability is tiny but NOT
    * zero, and downstream transitive closure amplifies one missed edge
    * into a relabeled component). Cost is one shuffle on the shingle
    * string plus pair enumeration within each shingle's posting list —
    * fine at verification scale; at corpus scale boilerplate shingles
    * make `nearDuplicates` (banded LSH, bounded buckets) the right tool. */
  def nearDuplicatesExact(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text", n: Int = 3,
                          threshold: Double = 0.7): DataFrame = {
    // Postings carry 64-bit shingle identities built ARITHMETICALLY from
    // per-token hashes in a FULLY CODEGEN'D pipeline: posexplode the
    // token hashes, then an n-token polynomial combine via lead() windows
    // — no interpreted higher-order function touches the hot path
    // (string-shingle concat_ws cost ~6 s/corpus-pass at sf0.1, and an
    // array-lambda combine re-evaluates its bound array per reference
    // under projection collapse — both measured, both avoided here).
    // Equal token windows combine equally (token → hash is a function),
    // so recall is exact; a collision conflating distinct shingles is
    // ~n²/2⁶⁵ ≈ 10⁻⁹ at millions of distinct shingles — the same
    // negligible-collision bar the MinHash path documents. Zero-token
    // docs are excluded, mirroring the oracle's len(t) > 0.
    val toks = filter(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+"),
      t => length(t) > 0)
    val wide = widenIfNarrow(docs, idCol)
    val tokRows = wide
      .select(col(idCol), posexplode(transform(toks, t => xxhash64(t)))
        .as(Seq("pos", "h0")))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
    val seq = byDoc.orderBy(col("pos"))
    val longSh = tokRows
      .withColumn("ntok", count(lit(1)).over(byDoc))
      .select(Seq(col(idCol), col("ntok"), col("pos"), col("h0")) ++
        (1 until n).map(j => lead(col("h0"), j).over(seq).as(s"h$j")): _*)
      .where(col("ntok") >= n && col("pos") <= col("ntok") - n)
      .select(col(idCol),
        (0 until n).map(j => col(s"h$j") * lit(31L * (n - j)))
          .reduce(_ + _).as("h"))
    // docs with < n tokens collapse to ONE whole-doc shingle (the string
    // path's single concat_ws shingle); the fold runs once per short doc
    val shortSh = wide
      .select(col(idCol), aggregate(transform(toks, t => xxhash64(t)),
        lit(7L), (acc, h) => acc * 1000003L + h).as("h"),
        size(toks).as("__nt"))
      .where(col("__nt") > 0 && col("__nt") < n)
      .select(col(idCol), col("h"))
    val idx = longSh.unionByName(shortSh).distinct()
      .withColumn("nsh", count(lit(1)).over(byDoc))
    val a = idx.select(col(idCol).as("id_a"), col("nsh").as("na"), col("h"))
    val b = idx.select(col(idCol).as("id_b"), col("nsh").as("nb"), col("h"))
    a.join(b, Seq("h"))
      .where(col("id_a") < col("id_b") &&
        // EXACT size prune: J = |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|),
        // so min < t·max can never reach the threshold. The 1−10⁻⁶ slack
        // absorbs double rounding (a few extra pairs survive to the
        // exact Jaccard filter below — recall is untouched). This drops
        // mismatched-size pairs BEFORE the per-pair aggregation shuffle.
        least(col("na"), col("nb")).cast(DoubleType) >=
          lit(threshold * (1.0 - 1e-6)) * greatest(col("na"), col("nb")))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (col("na") + col("nb") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---- SimHash ---------------------------------------------------------

  /** Bit masks 1<<0 .. 1<<63 as an array literal (shift amounts must be
    * literals in column expressions, so we mask instead of shifting). */
  private def pow2Arr: Column = array((0 until 64).map(b => lit(1L << b)): _*)

  /** 64-bit SimHash: per token-hash, vote +1/−1 on each bit; the sign
    * vector is the signature. Built as a single codegen'd fold. */
  def simhash(text: Column): Column = {
    val toks = filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, pow2Arr,
        (a, m) => a + when(xxhash64(t).bitwiseAND(m) =!= 0, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, pow2Arr, (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Distributed SimHash signatures: explode tokens, hash once, 64 bit-vote
    * sums as grouped aggregates (map-side partial), then pack the sign bits.
    * Same scaling rationale as `minhashSignatures`. */
  def simhashSignatures(docs0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = widenIfNarrow(docs0, idCol)
    val toks = docs.select(col(idCol),
        explode(filter(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+"),
          t => length(t) > 0)).as("t"))
      .select(col(idCol), xxhash64(col("t")).as("x"))
    val votes = (0 until 64).map { b =>
      sum(when(col("x").bitwiseAND(1L << b) =!= 0, 1L).otherwise(-1L)).as(s"__v$b")
    }
    toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 64).map(b =>
          when(col(s"__v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce((a, c) => a.bitwiseOR(c)).as("sim"))
  }

  def simhashNearDuplicates(docs: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text",
                            maxHamming: Int = 7,
                            maxBucket: Int = 10000): DataFrame =
    simhashPairsFromSignatures(
      simhashSignatures(docs, idCol, textCol), idCol, maxHamming, maxBucket)

  /** Banded pairing stage over precomputed signatures (column `sim`) —
    * split out so callers that derive signature sets (e.g. replicating a
    * corpus under shifted ids, where equal text ⇒ equal signature) don't
    * recompute the token-vote aggregation.
    *
    * Bucketing is 8×8-bit chunks: by pigeonhole, a pair within Hamming ≤ 7
    * must agree on ≥1 chunk. An 8-bit key space is only 256 buckets per
    * chunk table, so bucket population grows LINEARLY with the corpus and
    * an uncapped self-join would enumerate O(n²/2048) pairs; `maxBucket`
    * drops oversized buckets via the same broadcast anti-join as
    * `candidatePairs` (the dropped-bucket list is ≤ 8×256 entries — always
    * broadcastable). Unlike MinHash's 64-bit band keys, an oversized chunk
    * bucket here is NOT necessarily degenerate input — it is the expected
    * state once n ≳ 256·maxBucket — so capping trades recall for bounded
    * work; at corpus scale prefer [[simhashPairsHamming3]], whose 16-bit
    * keys keep buckets collision-bounded 256× longer. */
  def simhashPairsFromSignatures(sig: DataFrame, idCol: String = "doc_id",
                                 maxHamming: Int = 7,
                                 maxBucket: Int = 10000): DataFrame = {
    val chunks = sig.select(col(idCol), col("sim"), posexplode(
      array((0 until 8).map(c =>
        shiftright(col("sim"), c * 8).bitwiseAND(0xFFL)): _*))
      .as(Seq("chunk_id", "chunk_key")))
    pairsFromBuckets(chunks, "chunk_id", "chunk_key", idCol, maxBucket)
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash pairing for the tighter Hamming ≤ 3 radius, built for corpus
    * scale: 4 disjoint 16-bit fields (pigeonhole: 3 flipped bits across 4
    * fields leave ≥1 field exact), giving 65,536 buckets per field table —
    * collision-bounded until n ≈ 256M docs per partition-key domain, with
    * the same capped self-join as a backstop. The radius is the standard
    * near-dup setting for 64-bit SimHash (Manku et al., WWW'07 use k=3). */
  def simhashPairsHamming3(sig: DataFrame, idCol: String = "doc_id",
                           maxBucket: Int = 10000): DataFrame = {
    val fields = sig.select(col(idCol), col("sim"), posexplode(
      array((0 until 4).map(c =>
        shiftright(col("sim"), c * 16).bitwiseAND(0xFFFFL)): _*))
      .as(Seq("field_id", "field_key")))
    pairsFromBuckets(fields, "field_id", "field_key", idCol, maxBucket)
      .filter(col("hamming") <= 3)
  }

  /** Shared capped bucket self-join: drop buckets over `maxBucket` (tiny
    * list — broadcast anti-join), pair within survivors, verify Hamming. */
  private def pairsFromBuckets(buckets: DataFrame, bandCol: String,
                               keyCol: String, idCol: String,
                               maxBucket: Int): DataFrame = {
    val sized = dropOversized(buckets, Seq(bandCol, keyCol),
      maxBucket, "pairsFromBuckets")
    val a = sized.select(col(bandCol), col(keyCol),
      col(idCol).as("id_a"), col("sim").as("sim_a"))
    val b = sized.select(col(bandCol), col(keyCol),
      col(idCol).as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq(bandCol, keyCol))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
  }
}
