package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingestion surface beyond parquet, mirroring the reference's runtime
  * readers (lib/readers/src/lib.rs): CSV `read_csv<T,Weight>(path)` at :51
  * and the sqlx-backed DB reader `read_db(conn, table, mapper)` at :75.
  *
  * Both hand back lazy DataFrames: CSV scans parallelize per file split,
  * JDBC parallelizes via partitionColumn ranges — the knobs a 100 TB
  * ingest needs are exposed rather than wrapped away.
  */
object Sources {

  /** Typed CSV read — schema is explicit (the reference deserializes into
    * a declared tuple type, never infers). Header off by default to match
    * read_csv's positional mapping. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = false, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      // reference CSV reader semantics: empty field of nullable col = NULL
      .option("nullValue", "")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(path)

  /** NDJSON (JSON-lines) read with explicit schema — like the CSV path,
    * the type contract is declared, never inferred (inference would scan
    * twice and guess NULL-only columns wrong). Each file splits per line,
    * so a directory of .jsonl shards parallelizes like any text source. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
      .json(path)

  /** Write a DataFrame as an NDJSON fixture (round-trip tests / ingest). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
      .json(path)

  /** ORC read with explicit schema — the third columnar format a lake
    * ingest meets in practice (Spark's reader is vectorized and pushes
    * filters/column pruning down exactly like parquet's, so ORC inputs
    * keep the same 100 TB scan properties). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Write an ORC fixture (round-trip tests / ingest). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JDBC table read (read_db analogue). `partitionOn` splits the scan
    * into `numPartitions` range slices so executors read in parallel —
    * without it a JDBC scan is a single-task bottleneck at any scale. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionOn: Option[(String, Long, Long)] = None,
               numPartitions: Int = 8,
               props: java.util.Properties = new java.util.Properties()): DataFrame =
    partitionOn match {
      case Some((column, lo, hi)) =>
        spark.read.jdbc(url, table, column, lo, hi, numPartitions, props)
      case None =>
        spark.read.jdbc(url, table, props)
    }

  /** Write a DataFrame as a CSV fixture (used by tests and the CSV query
    * entry to round-trip real data through the CSV path). */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ","): Unit =
    df.write.mode("overwrite")
      .option("sep", delimiter)
      .option("nullValue", "")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(path)
}
