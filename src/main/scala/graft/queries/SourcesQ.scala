package graft.queries

import graft.Tables
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink coverage: CSV ingestion (lib/readers/src/lib.rs:51) proven
  * by round-tripping real table data through the CSV path and aggregating
  * it — the oracle runs the same aggregate on the original parquet, so a
  * hash match certifies the CSV reader end-to-end (types, nulls,
  * timestamps). */
object SourcesQ {
  type QFn = (SparkSession, String) => DataFrame

  val defs: Map[String, QFn] = Map(
    "q80_csv_source" -> ((s, d) => {
      val supplier = Tables.load(s, d, "supplier")
      val path = s"/root/repo/target/tmp/csv_supplier_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
      Sources.writeCsv(supplier, path)
      Sources.readCsv(s, path, supplier.schema)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("s_suppkey")).as("sum_key"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q80_csv_source" ->
      """SELECT s_nationkey, COUNT(*) AS n, SUM(s_suppkey) AS sum_key
         FROM supplier GROUP BY s_nationkey"""
  )
}
