package graft

import graft.sources.Sources
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-8 source/sink surface: the ORC round-trip preserves types and
  * values, and the Hive-partitioned parquet sink's read-back PRUNES
  * partitions at plan time — the scan must carry the partition predicate
  * as a PartitionFilter and select only the matching directories, because
  * at 100 TB partition pruning is the difference between scanning one
  * day and scanning the lake. */
class SinkSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    // plan non-adaptively so plan assertions inspect real scan nodes
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("sink-source")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()
  import spark.implicits._

  test("ORC round-trip preserves schema, values, nulls, and NTZ timestamps") {
    val df = Seq(
      (1L, Some("a"), Some(1.5), Some("2024-03-01 10:30:00.123456")),
      (2L, None, None, None),
      (3L, Some(""), Some(-0.25), Some("1999-12-31 23:59:59"))
    ).toDF("id", "s", "v", "ts_str")
      .withColumn("ts", col("ts_str").cast("timestamp_ntz")).drop("ts_str")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_spec_").toString
    Sources.writeOrc(df, dir)
    val back = Sources.readOrc(spark, dir, df.schema)
    // file scans are always nullable-relaxed; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toString).sorted ===
      df.collect().map(_.toString).sorted)
  }

  test("partitioned sink read-back prunes to only the filtered directories") {
    val df = (1 to 100).map(i => (i.toLong, s"p${i % 5}", i * 1.0))
      .toDF("id", "part", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_part_spec_").toString
    df.write.mode("overwrite").partitionBy("part").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("part").isin("p1", "p3"))
      .groupBy(col("part")).agg(count(lit(1)).as("n"))
    val scans = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "partition predicate must be a PartitionFilter, not a data Filter")
    assert(scan.selectedPartitions.partitionCount === 2,
      s"must read exactly the 2 matching directories of 5, " +
        s"got ${scan.selectedPartitions.partitionCount}")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toMap ===
      Map("p1" -> 20L, "p3" -> 20L))
  }
}
