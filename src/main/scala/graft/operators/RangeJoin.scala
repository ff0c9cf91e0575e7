package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — the scale path for inequality join
  * predicates.
  *
  * Spark plans a join whose ON clause has no equality conjunct as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * fits in a broadcast): O(|L|·|R|) comparisons and a single-threaded
  * driver broadcast. The reference compiles the same shape to a
  * cross-join circuit (CalciteToDBSPCompiler.java:584 routes joins with
  * an empty key set to DBSPStreamJoinOperator over the unit key), which
  * is the identical quadratic plan. Neither survives two large inputs.
  *
  * The standard fix — used by every engine with a native range join —
  * is binning: pick a bin width `w`, replicate each interval row to the
  * `⌈len/w⌉+1` bins it covers, send each point row to its single bin,
  * and equi-join on the bin id. The quadratic comparison becomes ONE
  * hash shuffle on `(keys…, bin)` with per-bucket work proportional to
  * actual match density. Replication factor is bounded by
  * `avg_interval/w + 1`, so `w` near the median interval length keeps
  * the blow-up ≤ 2×.
  *
  * Both operands stay as DataFrames end-to-end (no driver
  * materialization, no broadcast requirement); at 100 TB the shuffle is
  * keyed on (equi-keys, bin) — high cardinality when bins are sized
  * sensibly — and AQE's skew split handles hot bins (a bin holding a
  * popular calendar day, say).
  *
  * Interval–interval overlap uses the same binning on both sides plus
  * the de-duplication rule: a candidate pair is kept only in the bin
  * where the overlap STARTS (`bin == floor(max(aLo,bLo)/w)`), so no
  * distinct pass is needed — each qualifying pair is emitted exactly
  * once.
  */
object RangeJoin {

  private val Bin = "__graft_bin"

  /** Point-in-interval join: rows of `points` (with integral column
    * `pointCol`) matched to rows of `intervals` whose
    * `[loCol, hiCol]` (inclusive ends) contain the point, optionally
    * conjoined with equality on shared column names `keys`.
    *
    * `pointCol/loCol/hiCol` must be integral (epoch seconds/days, ids…)
    * — cast timestamps before calling. Inner join: points with no
    * matching interval are dropped. Column sets of the two inputs must
    * be disjoint apart from `keys`.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet) -- keys.toSet
    require(clash.isEmpty, s"column clash outside keys: ${clash.mkString(",")}")

    // Each interval row lands in every bin its span touches; each point
    // row in exactly one — so a qualifying (point, interval) pair meets
    // in exactly one bucket and no dedup is needed.
    val binned = intervals.withColumn(
      Bin, explode(sequence(floor(col(loCol) / binWidth).cast("long"),
                            floor(col(hiCol) / binWidth).cast("long"))))
    val probe = points.withColumn(Bin, floor(col(pointCol) / binWidth).cast("long"))
    probe.join(binned, keys :+ Bin)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(Bin)
  }

  /** Interval-overlap join: pairs where `[aLo,aHi]` and `[bLo,bHi]`
    * intersect (inclusive ends), optionally conjoined with equality on
    * `keys`. Each qualifying pair is emitted exactly once — the pair is
    * kept only in the bin containing the overlap's start, instead of a
    * global distinct. */
  def intervalOverlap(left: DataFrame, aLo: String, aHi: String,
                      right: DataFrame, bLo: String, bHi: String,
                      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = left.columns.toSet.intersect(right.columns.toSet) -- keys.toSet
    require(clash.isEmpty, s"column clash outside keys: ${clash.mkString(",")}")

    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn(
        Bin, explode(sequence(floor(col(lo) / binWidth).cast("long"),
                              floor(col(hi) / binWidth).cast("long"))))

    binned(left, aLo, aHi).join(binned(right, bLo, bHi), keys :+ Bin)
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col(Bin) ===
        floor(greatest(col(aLo), col(bLo)) / binWidth).cast("long"))
      .drop(Bin)
  }
}
