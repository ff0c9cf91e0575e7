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
  *
  * Input contracts, enforced LOUDLY rather than silently degrading:
  *  - intervals must be proper (`lo <= hi`) — a reversed interval
  *    raises at execution (it is ill-formed input, and silently
  *    bin-exploding a descending sequence would waste shuffle while
  *    matching nothing the caller intended);
  *  - an interval may cover at most `maxBinsPerRow` bins — a
  *    misconfigured `binWidth` (epoch-micros data with a 1-unit width,
  *    say) fails with an explicit message instead of replicating one
  *    row millions of times into the shuffle;
  *  - bin ids use EXACT integer floor division
  *    (`(c - pmod(c, w)) div w`), not `floor(c / w)`'s double division,
  *    whose rounding above 2^53 would assign a row to the wrong bin
  *    and silently drop matches. Supported value magnitude:
  *    |c| ≤ 2^63 − binWidth (the pmod subtraction must not overflow).
  */
object RangeJoin {

  private val Bin = "__graft_bin"

  /** Exact floor(c / w) over integral columns: `pmod` gives the
    * canonical non-negative remainder, so the subtraction lands exactly
    * on the floor multiple and the integral `div` (truncating) equals
    * the floor quotient — no double rounding at any magnitude.
    * (`private[graft]`: the incremental range-EXISTS circuit bins with
    * the same function so batch and circuit agree bit-for-bit.) */
  private[graft] def binColumn(c: Column, w: Long): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftSqlBridge.toExpressionTree(
          (c - pmod(c, lit(w))).cast("long")),
        org.apache.spark.sql.GraftSqlBridge.toExpressionTree(lit(w).cast("long"))))

  /** Interval-side bin ids: [binColumn(lo) .. binColumn(hi)], with the two input
    * contracts (proper interval, bounded bin count) raised per-row. The
    * guards live INSIDE the computed hi-bin column so the optimizer
    * cannot prune them away. */
  private def binSeq(lo: Column, hi: Column, w: Long,
                     maxBinsPerRow: Long): Column = {
    val bLo = binColumn(lo, w)
    val bHi0 = binColumn(hi, w)
    val bHi = when(lo > hi, raise_error(concat(
        lit("RangeJoin: reversed interval (lo > hi): lo="), lo.cast("string"),
        lit(" hi="), hi.cast("string"))))
      .when(bHi0 - bLo >= maxBinsPerRow, raise_error(concat(
        lit(s"RangeJoin: interval covers more than $maxBinsPerRow bins at "),
        lit(s"binWidth=$w (lo="), lo.cast("string"),
        lit(" hi="), hi.cast("string"),
        lit(") — raise binWidth or maxBinsPerRow"))))
      .otherwise(bHi0)
    explode(sequence(bLo, bHi))
  }

  private def checkColumns(a: DataFrame, b: DataFrame, keys: Seq[String]): Unit = {
    val clash = a.columns.toSet.intersect(b.columns.toSet) -- keys.toSet
    require(clash.isEmpty, s"column clash outside keys: ${clash.mkString(",")}")
    require(!a.columns.contains(Bin) && !b.columns.contains(Bin),
      s"inputs must not carry the internal column $Bin")
  }

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
                      binWidth: Long, keys: Seq[String] = Nil,
                      maxBinsPerRow: Long = 65536L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    checkColumns(points, intervals, keys)

    // Each interval row lands in every bin its span touches; each point
    // row in exactly one — so a qualifying (point, interval) pair meets
    // in exactly one bucket and no dedup is needed.
    val binned = intervals.withColumn(
      Bin, binSeq(col(loCol), col(hiCol), binWidth, maxBinsPerRow))
    val probe = points.withColumn(Bin, binColumn(col(pointCol), binWidth))
    probe.join(binned, keys :+ Bin)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(Bin)
  }

  /** Pick a bin width from data statistics instead of a magic constant.
    *
    * Cost model (per batch): interval rows replicate to ~`len/w + 1`
    * bins (shuffle cost `c_r·nI·len/w`), and each interval meets the
    * points of the `len + w` value-window it shares bins with (in-bin
    * candidate cost `c_p·nI·(len+w)·ρ`, where `ρ` = points per value
    * unit). Minimizing the sum gives `w* = sqrt(k·len/ρ)` with
    * `k = c_r/c_p` — the width SHRINKS as the corpus densifies, which is
    * exactly what a fixed knob gets wrong at 10–100× data: occupancy
    * per bin grows linearly while replication stays flat, so the join
    * does ever more in-bin work.
    *
    * `replicationWeight` is `k`. Same-box A/B runs of the q112 range
    * circuit (sf0.1 and a 10× replica, w ∈ {3, 41, 64}) showed the cost
    * surface is FLAT across that range at local[32] — single-JVM
    * shuffles are cheap, so the measurable local optimum is broad. The
    * default k=1024 deliberately biases toward LOW replication
    * (w ≈ 30× the equal-weight optimum): on a real cluster the
    * replicated rows cross the network and shuffle volume — not in-bin
    * CPU — is the scarce resource, and overshooting the width costs
    * bounded extra in-bin compares while undershooting multiplies
    * shuffle bytes.
    *
    * ρ is estimated LOCALLY — points per occupied probe-bin unit, not
    * points over the global min..max span — because real corpora
    * cluster in far-apart islands (time-partitioned epochs, key-offset
    * shards): the global-range estimate can be 100× too sparse there,
    * yielding a width so wide that every occupied bin is a hot bucket.
    * The denser of (global, probe-local) wins, which also keeps the
    * all-values-in-one-probe-bin corner dense rather than sparse.
    *
    * One aggregate pass per side; at 100 TB call it on a sample — the
    * estimate only needs ρ and mean length to order of magnitude, and
    * the width only changes the PLAN: results are identical at any
    * width. */
  def suggestBinWidth(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      replicationWeight: Double = 1024.0): Long = {
    require(replicationWeight > 0, "replicationWeight must be positive")
    val probeW = 1024L
    val p = points.agg(
      count(col(pointCol)).as("n"),
      min(col(pointCol)).cast("double").as("lo"),
      max(col(pointCol)).cast("double").as("hi"),
      countDistinct(binColumn(col(pointCol), probeW)).as("occ")).head()
    if (p.getLong(0) == 0) return 3600L // no data: the documented default
    val n = p.getLong(0).toDouble
    val rhoGlobal = n / math.max(1.0, p.getDouble(2) - p.getDouble(1))
    val rhoLocal = n / (math.max(1L, p.getLong(3)).toDouble * probeW)
    val rho = math.max(rhoGlobal, rhoLocal)
    val iv = intervals.agg(avg(col(hiCol).cast("double") - col(loCol).cast("double"))).head()
    val len = if (iv.isNullAt(0)) 1.0 else math.max(1.0, iv.getDouble(0))
    math.max(1L, math.round(math.sqrt(replicationWeight * len / rho)))
  }

  /** Interval-overlap join: pairs where `[aLo,aHi]` and `[bLo,bHi]`
    * intersect (inclusive ends), optionally conjoined with equality on
    * `keys`. Each qualifying pair is emitted exactly once — the pair is
    * kept only in the bin containing the overlap's start, instead of a
    * global distinct. */
  def intervalOverlap(left: DataFrame, aLo: String, aHi: String,
                      right: DataFrame, bLo: String, bHi: String,
                      binWidth: Long, keys: Seq[String] = Nil,
                      maxBinsPerRow: Long = 65536L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    checkColumns(left, right, keys)

    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn(Bin, binSeq(col(lo), col(hi), binWidth, maxBinsPerRow))

    binned(left, aLo, aHi).join(binned(right, bLo, bHi), keys :+ Bin)
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col(Bin) === binColumn(greatest(col(aLo), col(bLo)), binWidth))
      .drop(Bin)
  }
}
