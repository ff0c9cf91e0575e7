package graft.queries

import graft.Tables
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis => TA}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-training-data pipeline operators as driver-checkable queries over
  * the documents/embeddings fixtures. Where the computation is expressible
  * in portable SQL (md5, length/replace arithmetic, sequential list folds)
  * the DuckDB oracle verifies values; the LSH-based operators
  * (engine-specific 64-bit hashes) are verified by PipelineSpec's planted
  * near-duplicate / recall tests instead and appear here as rows-only
  * entries.
  */
object Pipeline {
  type QFn = (SparkSession, String) => DataFrame
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val defs: Map[String, QFn] = Map(
    // Exact dedup: content-key groups (one shuffle on md5)
    "q70_dedup_exact_groups" -> ((s, d) =>
      Dedup.exactGroups(T(s, d, "documents"))),

    // Exact dedup: surviving representatives
    "q71_dedup_exact" -> ((s, d) =>
      Dedup.exactDedup(T(s, d, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"))),

    // Text statistics: token counts, ratios — portable arithmetic
    "q72_text_stats" -> ((s, d) =>
      T(s, d, "documents").select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars_m"),
        TA.tokenCountWs(col("text")).as("n_tokens_ws"),
        TA.countOccurrences(concat(lit(" "), lower(col("text")), lit(" ")), " the ")
          .as("n_the"),
        (length(col("text")) - length(replace(col("text"), lit(" "), lit(""))))
          .cast(LongType).as("n_spaces"))),

    // Language ID via stopword scores (portable arithmetic; ties broken by
    // language code descending through greatest-of-structs)
    "q73_langid" -> ((s, d) =>
      T(s, d, "documents").select(
        col("doc_id"), col("lang").as("lang_declared"),
        TA.languageScore(col("text"), "en").as("score_en"),
        TA.languageScore(col("text"), "de").as("score_de"))),

    // Embedding norms + dot with self (sequential fold, bit-deterministic)
    "q74_embedding_norm" -> ((s, d) =>
      T(s, d, "embeddings").select(
        col("vec_id"), col("label"),
        Similarity.dot(col("embedding"), col("embedding")).as("dot_self"),
        Similarity.norm2(col("embedding")).as("l2"))),

    // Brute-force cosine top-5: queries = first 3 vectors, corpus = all.
    // Fully expressible in DuckDB via list lambdas — values oracle-checked.
    "q75_ann_brute_topk" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopK(emb, queries, 5)
    }),

    // Multimodal decode/feature plumbing over the documents corpus
    // (rows-only: decode features aren't DuckDB-expressible; real-codec
    // values are pinned by PipelineSpec's PNG/WAV fixtures)
    "q82_multimodal_features" -> ((s, d) =>
      Multimodal.extractFeatures(
        Multimodal.syntheticMedia(T(s, d, "documents")))
        .select(col("media_id"), col("modality"), col("n_bytes"),
          col("decode_ok"))),

    // IVF ANN over the same probes as q75 (centroid model is
    // engine-specific → rows-only here; recall vs brute force is
    // value-checked in PipelineSpec)
    "q79_ann_ivf_topk" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopK(emb, queries, 5, nCentroids = 16, nProbe = 4)
    }),

    // MinHash near-dup pairs (engine-hash-specific → rows-only here;
    // value-checked by PipelineSpec's planted duplicates)
    "q76_near_dup_minhash" -> ((s, d) =>
      Dedup.nearDuplicates(T(s, d, "documents"), threshold = 0.5)),

    // SimHash near-dup pairs (rows-only, same reason)
    "q77_near_dup_simhash" -> ((s, d) =>
      Dedup.simhashNearDuplicates(T(s, d, "documents"), maxHamming = 7)),

    // Document fingerprints joined with quality scores (rows-only: xxhash64
    // + regex classes are engine-specific)
    "q78_fingerprint_quality" -> ((s, d) =>
      T(s, d, "documents").select(
        col("doc_id"),
        TA.fingerprint(col("text")).as("fp"),
        TA.qualityScore(col("text")).as("quality"),
        TA.tokenCountBpe(col("text")).as("n_tokens_bpe")))
  )

  private val dotSelf =
    """list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   (a, b) -> a + b)"""

  val oracles: Map[String, String] = Map(
    "q70_dedup_exact_groups" ->
      """SELECT md5(text) AS content_key, MIN(doc_id) AS keep_id,
                COUNT(*) AS n_copies
         FROM documents GROUP BY md5(text)""",
    "q71_dedup_exact" ->
      """SELECT doc_id, lang, n_chars FROM (
           SELECT doc_id, lang, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents) t
         WHERE rn = 1""",
    "q72_text_stats" ->
      """SELECT doc_id,
            CAST(length(text) AS BIGINT) AS n_chars_m,
            CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE length(trim(regexp_replace(trim(text), '\s+', ' ', 'g')))
                      - length(replace(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ', '')) + 1
                 END AS BIGINT) AS n_tokens_ws,
            CAST((length(' ' || lower(text) || ' ')
                  - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5
                 AS BIGINT) AS n_the,
            CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
         FROM documents""",
    "q73_langid" -> {
      def score(lang: Seq[String]) = lang.map(w =>
        s"((length(p) - length(replace(p, '$w', ''))) / ${w.length})").mkString(" + ")
      s"""SELECT doc_id, lang AS lang_declared,
            CAST(${score(Seq(" the ", " and ", " of ", " to ", " in ", " is "))} AS BIGINT) AS score_en,
            CAST(${score(Seq(" der ", " die ", " und ", " das ", " ist ", " nicht "))} AS BIGINT) AS score_de
          FROM (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents) t"""
    },
    "q74_embedding_norm" ->
      s"""SELECT vec_id, label, $dotSelf AS dot_self, SQRT($dotSelf) AS l2
          FROM embeddings""",
    "q75_ann_brute_topk" -> {
      val dotQ =
        """list_reduce(list_transform(list_zip(e.embedding, q.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)"""
      val normE = """SQRT(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))"""
      val normQ = """SQRT(list_reduce(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a+b))"""
      s"""SELECT q_id, rank, vec_id, cos FROM (
            SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
                   ($dotQ) / ($normE * $normQ) AS cos,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY ($dotQ) / ($normE * $normQ) DESC, e.vec_id ASC) AS rank
            FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 3) q) t
          WHERE rank <= 5"""
    }
  )
}
