package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All operators take the scale-factor directory as a parameter so the same
  * plan runs unchanged at sf0.001 (smoke), sf0.01 (correctness), sf0.1
  * (bench) — and, by extension, on a real cluster at any scale: nothing here
  * assumes data fits on one node. Reads are plain parquet scans, so Catalyst
  * pushes filters/projections down to the scan (verify with
  * `.explain("formatted")` → `PushedFilters`, `ReadSchema`).
  *
  * Timestamps are normalized to TIMESTAMP_NTZ: the reference's TIMESTAMP has
  * no time zone (lib/sqllib/src/timestamp.rs:85-93, millis since epoch), and
  * NTZ also round-trips through parquet as isAdjustedToUTC=false, which the
  * DuckDB oracle reads back as plain TIMESTAMP (a TZ-adjusted write would
  * come back as TIMESTAMPTZ and fail the hash compare).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which vanilla Spark rejects
    // ([PARQUET_TYPE_ILLEGAL]); read nanos as raw longs and convert below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampType =>
          d.withColumn(f.name, col(f.name).cast(TimestampNTZType))
        case LongType if name == "events" && f.name == "ts" =>
          // nanos → micros (truncating, same as DuckDB's read of NANOS),
          // then to wall-clock NTZ. `div` floors for the positive epoch.
          d.withColumn(f.name,
            timestamp_micros(expr(s"${f.name} div 1000")).cast(TimestampNTZType))
        case _ => d
      }
    }
  }

  /** Register every table as a temp view named after its file (lazily:
    * DataFrames are lazy, so registering all views costs only footer reads).
    * A table whose file is absent is skipped rather than failing the whole
    * registration — only queries that touch it should fail. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      try load(spark, sfDir, n).createOrReplaceTempView(n)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
}
