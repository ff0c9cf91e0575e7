package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, language identification, quality scoring, document
  * fingerprinting. All pure codegen'd column expressions — no UDFs — so
  * they run at scan speed and scale linearly to any corpus size: every
  * operator is embarrassingly parallel per document (no shuffle at all
  * until a downstream groupBy).
  */
object TextAnalysis {

  /** Whitespace token count (fast path: no regex, no array allocation). */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0L)
      .otherwise(size(split(trim(text), "\\s+")).cast(LongType))

  /** BPE-ish subword token count: split on word/non-word boundaries like a
    * byte-pair tokenizer's pre-tokenizer, count non-empty pieces. */
  def tokenCountBpe(text: Column): Column =
    size(filter(split(text, "[^\\p{L}\\p{N}]+"), t => length(t) > 0))
      .cast(LongType)

  /** Rough chars-per-token estimate (≈4 for English prose) used to budget
    * context windows. */
  def charsPerToken(text: Column): Column =
    length(text).cast(DoubleType) / greatest(tokenCountWs(text), lit(1L))

  // ---- language ID: stopword-frequency heuristic -----------------------

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " in ", " is "),
    "de" -> Seq(" der ", " die ", " und ", " das ", " ist ", " nicht "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " des ", " est "),
    "es" -> Seq(" el ", " la ", " de ", " que ", " los ", " es "))

  /** Occurrences of `needle` in `hay` — expressed with length/replace so
    * the same arithmetic runs on any SQL engine (oracle-checkable, no
    * engine-specific regex). */
  def countOccurrences(hay: Column, needle: String): Column =
    ((length(hay) - length(replace(hay, lit(needle), lit("")))) /
      needle.length).cast(LongType)

  /** Per-language stopword hit count over the lowercased, space-padded
    * text. */
  def languageScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    stopwords(lang).map(countOccurrences(padded, _)).reduce(_ + _)
  }

  /** Best-scoring language, or 'und' when nothing matches (n-gram
    * heuristic in the spirit of fastText-style LID, but pure SQL). */
  def languageId(text: Column): Column = {
    val scored = stopwords.keys.toSeq.sorted.map { l =>
      struct(languageScore(text, l).as("score"), lit(l).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  // ---- quality scoring -------------------------------------------------

  /** Fraction of characters that are letters. */
  def alphaRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "\\p{L}", ""))).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  /** Mean whitespace-token length. */
  def meanTokenLen(text: Column): Column =
    (length(trim(text)).cast(DoubleType) -
      (tokenCountWs(text) - 1).cast(DoubleType)) /
      greatest(tokenCountWs(text), lit(1L)).cast(DoubleType)

  /** Composite quality score in [0,1]: length band + letter ratio +
    * English-stopword density, the classic pre-training quality gates. */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast(DoubleType)
    val lenScore = when(n < 50, n / 50.0).when(n > 20000, lit(0.25)).otherwise(1.0)
    val stopDensity = least(
      languageScore(text, "en").cast(DoubleType) /
        greatest(tokenCountWs(text), lit(1L)).cast(DoubleType) * 10.0,
      lit(1.0))
    (lenScore * 0.4 + alphaRatio(text) * 0.3 + stopDensity * 0.3)
  }

  // ---- fingerprinting --------------------------------------------------

  /** 64-bit content fingerprint of normalized text (lowercased, whitespace
    * collapsed) — xxhash64, stable across runs and partitions. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Cheap MD5 content key (hex) — cross-engine stable, used by exact
    * dedup (lib/hashing/src/lib.rs:58 uses md5 for result checks too). */
  def contentKey(text: Column): Column = md5(text.cast(StringType))
}
