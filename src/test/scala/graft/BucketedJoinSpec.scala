package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Co-located fact-fact joins via bucketing — the 100 TB shuffle-avoidance
  * pattern: when both sides are bucketed (and sorted) on the join key with
  * the same bucket count, a sort-merge join reads bucket i against bucket i
  * with NO Exchange on either side. At cluster scale this is the difference
  * between a full network shuffle of the larger fact table on every join
  * and none. The spec proves the physical plan property, not just the
  * result. */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = java.nio.file.Files.createTempDirectory("graft_wh_").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
    .config("spark.ui.enabled", "false")
    .appName("bucketed-join")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed+sorted tables join with zero exchanges; unbucketed join shuffles") {
    import spark.implicits._
    val facts = (0L until 10000L).map(i => (i % 997, i, s"p$i")).toDF("k", "seq", "payload")
    val dims = (0L until 997L).map(i => (i, s"d$i")).toDF("k", "name")

    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("facts_b")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("dims_b")

    val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"bucketed join must not shuffle:\n$physical")
    assert(physical.contains("SortMergeJoin"), physical)
    assert(joined.count() === 10000L)

    // control: the same join over plain parquet shuffles both sides
    facts.write.mode("overwrite").parquet(s"$warehouse/facts_p")
    val plain = spark.read.parquet(s"$warehouse/facts_p")
      .join(dims, "k")
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("bucketed groupBy on the bucket key aggregates without an exchange") {
    val agg = spark.table("facts_b").groupBy("k").agg(count(lit(1)).as("n"))
    val physical = agg.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"bucketed aggregation must not shuffle:\n$physical")
    assert(agg.count() === 997L)
  }
}
