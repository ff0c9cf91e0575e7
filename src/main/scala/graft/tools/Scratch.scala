package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway probe driver for in-flight work (not part of any gate).
  * Run: tools/run_main.sh graft.tools.Scratch */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exprs = Seq(
      // int narrowing overflow
      "CAST(CAST(300 AS TINYINT) AS BIGINT)",
      "CAST(CAST(-129 AS TINYINT) AS BIGINT)",
      "CAST(CAST(40000 AS SMALLINT) AS BIGINT)",
      "CAST(CAST(3000000000 AS INT) AS BIGINT)",
      "CAST(CAST(9223372036854775807 AS TINYINT) AS BIGINT)",
      "CAST(CAST(-9223372036854775808 AS SMALLINT) AS BIGINT)",
      // double -> ints: trunc & overflow behavior
      "CAST(CAST(1.9 AS INT) AS BIGINT)",
      "CAST(CAST(-1.9 AS INT) AS BIGINT)",
      "CAST(CAST(2.5 AS INT) AS BIGINT)",
      "CAST(CAST(1e10 AS INT) AS BIGINT)",
      "CAST(CAST(-1e10 AS INT) AS BIGINT)",
      "CAST(CAST(300.7 AS TINYINT) AS BIGINT)",
      "CAST(CAST(1e10 AS TINYINT) AS BIGINT)",
      "CAST(CAST(1e25 AS BIGINT) AS BIGINT)",
      "CAST(CAST(CAST('nan' AS DOUBLE) AS INT) AS BIGINT)",
      // string -> int
      "CAST(CAST(' 42 ' AS INT) AS BIGINT)",
      "CAST(CAST('12.5' AS INT) AS BIGINT)",
      "CAST(CAST('abc' AS INT) AS BIGINT)",
      "CAST(CAST('' AS INT) AS BIGINT)",
      "CAST(CAST('1e3' AS INT) AS BIGINT)",
      "CAST(CAST('+7' AS INT) AS BIGINT)",
      "CAST(CAST('007' AS INT) AS BIGINT)",
      "CAST(CAST('2147483648' AS INT) AS BIGINT)",
      // string -> double
      "CAST(' 1.5 ' AS DOUBLE)",
      "CAST('1e3' AS DOUBLE)",
      "CAST('abc' AS DOUBLE)",
      "CAST('.5' AS DOUBLE)",
      "CAST('5.' AS DOUBLE)",
      // string -> bool (via int image)
      "CAST(CAST('true' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('FALSE' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('t' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('f' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('y' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('n' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('yes' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('no' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('1' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('0' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST(' true ' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('2' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('on' AS BOOLEAN) AS BIGINT)",
      "CAST(CAST('abc' AS BOOLEAN) AS BIGINT)",
      // numeric -> bool
      "CAST(CAST(2 AS BOOLEAN) AS BIGINT)",
      "CAST(CAST(0 AS BOOLEAN) AS BIGINT)",
      "CAST(CAST(-1 AS BOOLEAN) AS BIGINT)",
      "CAST(CAST(0.5 AS BOOLEAN) AS BIGINT)",
      "CAST(CAST(0.0 AS BOOLEAN) AS BIGINT)",
      // decimal casts, as string images
      "CAST(CAST(1.2345 AS DECIMAL(9,3)) AS STRING)",
      "CAST(CAST(1.2355 AS DECIMAL(9,3)) AS STRING)",
      "CAST(CAST(2.5 AS DECIMAL(5,0)) AS STRING)",
      "CAST(CAST(3.5 AS DECIMAL(5,0)) AS STRING)",
      "CAST(CAST(-2.5 AS DECIMAL(5,0)) AS STRING)",
      "CAST(CAST(1.5 AS DECIMAL(5,1)) AS STRING)",
      "CAST(CAST(123456.789 AS DECIMAL(5,1)) AS STRING)",
      "CAST(CAST(-0.0005 AS DECIMAL(9,3)) AS STRING)",
      "CAST(CAST(7 AS DECIMAL(9,3)) AS STRING)",
      "CAST(CAST('1.25' AS DECIMAL(9,3)) AS STRING)",
      "CAST(CAST('junk' AS DECIMAL(9,3)) AS STRING)",
      // double -> string
      "CAST(1.5 AS STRING)",
      "CAST(CAST(1.5 AS DOUBLE) AS STRING)",
      "CAST(CAST(0.25 AS DOUBLE) AS STRING)",
      "CAST(CAST(100.0 AS DOUBLE) AS STRING)",
      "CAST(CAST(1e7 AS DOUBLE) AS STRING)",
      "CAST(CAST(1234567.0 AS DOUBLE) AS STRING)",
      "CAST(CAST(0.001 AS DOUBLE) AS STRING)",
      "CAST(CAST(0.0001 AS DOUBLE) AS STRING)",
      "CAST(CAST(-42.0 AS DOUBLE) AS STRING)",
      // bool -> string / int
      "CAST(true AS STRING)",
      "CAST(false AS STRING)",
      "CAST(CAST(true AS INT) AS BIGINT)",
      // string -> date/timestamp
      "CAST(CAST('2023-01-15' AS DATE) AS STRING)",
      "CAST(CAST('2023-1-5' AS DATE) AS STRING)",
      "CAST(CAST('2023-01' AS DATE) AS STRING)",
      "CAST(CAST('2023-02-30' AS DATE) AS STRING)",
      "CAST(CAST('junk' AS DATE) AS STRING)",
      "CAST(CAST(' 2023-01-15 ' AS DATE) AS STRING)",
      "CAST(CAST('2023-01-15 10:30:00' AS TIMESTAMP) AS STRING)",
      "CAST(CAST('2023-01-15T10:30:00' AS TIMESTAMP) AS STRING)",
      "CAST(CAST('2023-01-15' AS TIMESTAMP) AS STRING)",
      "CAST(CAST('2023-01-15 10:30:00.123' AS TIMESTAMP) AS STRING)",
      // date <-> timestamp
      "CAST(CAST(CAST('2023-01-15 18:45:00' AS TIMESTAMP) AS DATE) AS STRING)",
      "CAST(CAST(CAST('2023-01-15' AS DATE) AS TIMESTAMP) AS STRING)",
      // timestamp/date -> bigint? (seconds) — probe
      "CAST(CAST(CAST('2023-01-15 00:00:00' AS TIMESTAMP) AS BIGINT) AS BIGINT)"
    )
    exprs.foreach { e =>
      val r = try String.valueOf(spark.sql(s"SELECT $e").collect()(0).get(0))
              catch { case ex: Exception => s"ERROR: ${ex.getMessage.linesIterator.next().take(80)}" }
      println(s"PROBE\t$e\t$r")
    }
    spark.stop()
  }
}
