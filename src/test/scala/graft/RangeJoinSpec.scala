package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.RangeJoin

/** Bucketed range join (operators/RangeJoin.scala) against the naive
  * quadratic formulation on randomized inputs, plus the physical property
  * that justifies its existence: the binned plan contains an equi-join
  * (hash/sort-merge on the bin id) and NO BroadcastNestedLoopJoin /
  * CartesianProduct — the plan Spark would otherwise pick for an ON
  * clause with no equality conjunct. */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    // AQE wraps the whole plan in AdaptiveSparkPlanExec (a leaf until
    // executed), which made the physical-plan assertion below vacuous —
    // plan.collect never reached the join nodes. Planning non-adaptively
    // makes executedPlan the real tree the assertion inspects.
    .config("spark.sql.adaptive.enabled", "false")
    .appName("range-join-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rng = new scala.util.Random(42)

  private def pointsDf = {
    import spark.implicits._
    val r = rng
    (1 to 400).map(i => (i.toLong, r.nextInt(1000).toLong, s"g${i % 3}"))
      .toDF("p_id", "p", "g")
  }

  private def intervalsDf = {
    import spark.implicits._
    val r = rng
    // spans of length 0..120 — many cross several bins at width 16
    (1 to 150).map { i =>
      val lo = r.nextInt(1000).toLong
      (i.toLong + 10000, lo, lo + r.nextInt(120).toLong, s"g${i % 3}")
    }.toDF("i_id", "lo", "hi", "g")
  }

  test("point-in-interval equals the naive quadratic join, no keys") {
    val pts = pointsDf.drop("g")
    val ivs = intervalsDf.drop("g")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", binWidth = 16L)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(want.nonEmpty && got.toSeq == want.toSeq)
  }

  test("point-in-interval with an equality conjunct on keys") {
    val got = RangeJoin.pointInInterval(pointsDf, "p", intervalsDf, "lo", "hi",
        binWidth = 16L, keys = Seq("g"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = pointsDf.join(intervalsDf.withColumnRenamed("g", "g2"),
        col("g") === col("g2") && col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(want.nonEmpty && got.toSeq == want.toSeq)
  }

  test("interval overlap emits each qualifying pair exactly once") {
    val left = intervalsDf.select(col("i_id").as("a_id"),
      col("lo").as("a_lo"), col("hi").as("a_hi"))
    val right = intervalsDf.select((col("i_id") + 1000).as("b_id"),
      col("lo").as("b_lo"), col("hi").as("b_hi"))
      .withColumn("b_lo", col("b_lo") + 7).withColumn("b_hi", col("b_hi") + 7)
    val got = RangeJoin.intervalOverlap(left, "a_lo", "a_hi",
        right, "b_lo", "b_hi", binWidth = 16L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly-once: no duplicates even though wide spans share many bins
    assert(got.length == got.distinct.length)
    val want = left.join(right,
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(want.nonEmpty && got.sorted.toSeq == want.sorted.toSeq)
  }

  test("physical plan is an equi-join on the bin — no nested-loop, no cartesian") {
    val pts = pointsDf.drop("g")
    val ivs = intervalsDf.drop("g")
    val df = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", binWidth = 16L)
    df.collect() // execute, so any adaptive wrapper is finalized too
    val plan = df.queryExecution.executedPlan
    // the suite plans non-adaptively, so this must NOT be a leaf wrapper
    assert(!plan.isInstanceOf[
      org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec])
    val bad = plan.collectWithSubqueries {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(bad.isEmpty, s"quadratic join in plan:\n$plan")
    // and the equi-join we expect is actually present
    val joins = plan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(joins.nonEmpty, s"no equi-join found in plan:\n$plan")
  }

  test("reversed interval raises loudly; oversized span raises loudly") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("p_id", "p")
    val rev = Seq((9L, 10L, 3L)).toDF("i_id", "lo", "hi")
    val exRev = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "p", rev, "lo", "hi", binWidth = 4L).collect()
    }
    assert(exRev.getMessage != null || exRev.getCause != null)
    val wide = Seq((9L, 0L, 10000000L)).toDF("i_id", "lo", "hi")
    val exWide = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "p", wide, "lo", "hi", binWidth = 1L,
        maxBinsPerRow = 1000L).collect()
    }
    assert(exWide.getMessage != null || exWide.getCause != null)
  }

  test("internal bin column clash is rejected") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("p_id", "__graft_bin")
    val ivs = Seq((9L, 1L, 8L)).toDF("i_id", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "__graft_bin", ivs, "lo", "hi", binWidth = 4L)
    }
  }

  test("bin assignment is exact for values past 2^53 (double floor would misbin)") {
    import spark.implicits._
    // 2^60 + 7 at binWidth 16: exact floor-div bin is (2^60+7-7)/16; the
    // double path rounds 2^60+7 to a neighboring representable double.
    val big = (1L << 60) + 7L
    val pts = Seq((1L, big)).toDF("p_id", "p")
    val ivs = Seq((9L, big - 2L, big + 2L)).toDF("i_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", binWidth = 16L)
    assert(got.count() == 1L)
  }

  test("suggestBinWidth shrinks as point density grows, and never changes results") {
    import spark.implicits._
    val ivs = intervalsDf.drop("g")
    def pts(n: Int) = {
      val r = new scala.util.Random(7)
      (1 to n).map(i => (i.toLong, r.nextInt(1000).toLong)).toDF("p_id", "p")
    }
    val sparse = pts(100); val dense = pts(10000)
    val wSparse = RangeJoin.suggestBinWidth(sparse, "p", ivs, "lo", "hi")
    val wDense = RangeJoin.suggestBinWidth(dense, "p", ivs, "lo", "hi")
    // ρ grows 100× over the same range → w* = sqrt(k·len/ρ) shrinks ~10×
    assert(wSparse > wDense, s"expected sparse width $wSparse > dense $wDense")
    assert(wDense >= 1L)
    // the width is a plan knob only: suggested vs arbitrary fixed width
    // produce identical matches
    def matches(w: Long) =
      RangeJoin.pointInInterval(dense, "p", ivs, "lo", "hi", binWidth = w)
        .select("p_id", "i_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(matches(wDense) == matches(64L))
    // no points: falls back to the documented default, never divides by 0
    assert(RangeJoin.suggestBinWidth(pts(0), "p", ivs, "lo", "hi") == 3600L)
    // degenerate zero-length intervals still yield a positive width
    val degen = Seq((1L, 5L, 5L)).toDF("i_id", "lo", "hi")
    assert(RangeJoin.suggestBinWidth(dense, "p", degen, "lo", "hi") >= 1L)
  }
}
