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
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", binWidth = 16L)
      .queryExecution.executedPlan
    val bad = plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(bad.isEmpty, s"quadratic join in plan:\n$plan")
  }
}
