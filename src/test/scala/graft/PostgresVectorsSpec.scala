package graft

import graft.engine.Engine
import graft.functions.SqlFunctions._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Postgres-derived regression vectors, ported from the reference's
  * compiler/postgres suites (PostgresDateTests.java — literal vectors
  * adapted from postgres src/test/regress/expected/date.out). These pin
  * our SqlFunctions EXTRACT implementations to Postgres ground truth at
  * the boundary cases (century/millennium/decade edges, ISO week years,
  * epoch) and exercise the DATE_TBL fixture arithmetic. */
class PostgresVectorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("pgvectors")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def evalLong(c: Column): Long =
    spark.range(1).select(c.cast("long").as("v")).collect()(0).getLong(0)

  private def d(s: String): Column = to_date(lit(s))

  // PostgresDateTests extract-constant vectors (testQueryTwice block)
  test("EXTRACT(EPOCH FROM DATE '1970-01-01') = 0") {
    assert(evalLong(epochSecond(d("1970-01-01").cast("timestamp_ntz"))) === 0L)
  }
  test("CENTURY edges") {
    assert(evalLong(century(d("0001-01-01"))) === 1L)
    assert(evalLong(century(d("1900-12-31"))) === 19L)
    assert(evalLong(century(d("1901-01-01"))) === 20L)
    assert(evalLong(century(d("2000-12-31"))) === 20L)
    assert(evalLong(century(d("2001-01-01"))) === 21L)
    assert(evalLong(century(d("2020-08-11"))) === 21L)
  }
  test("MILLENNIUM edges") {
    assert(evalLong(millennium(d("0001-01-01"))) === 1L)
    assert(evalLong(millennium(d("1000-12-31"))) === 1L)
    assert(evalLong(millennium(d("2000-12-31"))) === 2L)
    assert(evalLong(millennium(d("2001-01-01"))) === 3L)
    assert(evalLong(millennium(d("2020-08-11"))) === 3L)
  }
  test("DECADE edges") {
    assert(evalLong(decade(d("1994-12-25"))) === 199L)
    assert(evalLong(decade(d("0010-01-01"))) === 1L)
    assert(evalLong(decade(d("0009-12-31"))) === 0L)
    assert(evalLong(decade(d("2020-08-11"))) === 202L)
  }
  test("sub-day units of a DATE are zero") {
    val ts = d("2020-08-11").cast("timestamp_ntz")
    assert(evalLong(microsecondOfMinute(ts)) === 0L)
    assert(evalLong(millisecondOfMinute(ts)) === 0L)
    assert(evalLong(second(ts).cast("long")) === 0L)
    assert(evalLong(minute(ts).cast("long")) === 0L)
    assert(evalLong(hour(ts).cast("long")) === 0L)
  }
  test("calendar units of 2020-08-11") {
    val x = d("2020-08-11")
    assert(evalLong(dayofmonth(x).cast("long")) === 11L)
    assert(evalLong(month(x).cast("long")) === 8L)
    assert(evalLong(year(x).cast("long")) === 2020L)
    assert(evalLong(isoyear(x)) === 2020L)
    assert(evalLong(quarter(x).cast("long")) === 3L)
    assert(evalLong(weekofyear(x).cast("long")) === 33L)
    assert(evalLong(dayofyear(x).cast("long")) === 224L)
  }
  test("DOW/ISODOW (Tuesday=2; Sunday dow=0 isodow=7)") {
    assert(evalLong(dow(d("2020-08-11"))) === 2L)
    assert(evalLong(dow(d("2020-08-16"))) === 0L)
    assert(evalLong(isodow(d("2020-08-16"))) === 7L)
    assert(evalLong(isodow(d("2020-08-11"))) === 2L)
  }
  test("ISOYEAR at year boundaries (2005-01-01 belongs to ISO 2004)") {
    assert(evalLong(isoyear(d("2005-01-01"))) === 2004L)
    assert(evalLong(isoyear(d("2006-01-01"))) === 2005L)
    assert(evalLong(isoyear(d("2004-12-31"))) === 2004L)
  }

  // DATE_TBL fixture (PostgresDateTests.java:80-106) through the Engine
  private lazy val dateTbl: Engine = {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE DATE_TBL (f1 DATE NOT NULL);
        |INSERT INTO DATE_TBL VALUES ('1957-04-09'), ('1957-06-13'),
        | ('1996-02-28'), ('1996-02-29'), ('1996-03-01'), ('1996-03-02'),
        | ('1997-02-28'), ('1997-03-01'), ('1997-03-02'),
        | ('2000-04-01'), ('2000-04-02'), ('2000-04-03'),
        | ('2038-04-08'), ('2039-04-09'), ('2040-04-10')""".stripMargin)
    e
  }

  test("DATE_TBL: filter before 2000 (PostgresDateTests :188)") {
    val got = dateTbl.spark
      .sql("SELECT f1 FROM DATE_TBL WHERE f1 < '2000-01-01'")
      .collect().map(_.getDate(0).toString).sorted
    assert(got === Array("1957-04-09", "1957-06-13", "1996-02-28", "1996-02-29",
      "1996-03-01", "1996-03-02", "1997-02-28", "1997-03-01", "1997-03-02"))
  }

  test("DATE_TBL: between filter (:209)") {
    val got = dateTbl.spark.sql(
      "SELECT f1 FROM DATE_TBL WHERE f1 BETWEEN '2000-01-01' AND '2001-01-01'")
      .count()
    assert(got === 3)
  }

  test("DATE_TBL: days from 2000-01-01 (:1016 'Days From 2K')") {
    val got = dateTbl.spark.sql(
      "SELECT datediff(f1, DATE '2000-01-01') AS days FROM DATE_TBL WHERE f1 >= '2000-01-01' ORDER BY f1")
      .collect().map(_.getInt(0))
    assert(got === Array(91, 92, 93, 13977, 14343, 14710))
  }

  // Timestamp vectors (PostgresTimestampTests shape): precision + ordering
  test("timestamp literal extracts at full precision") {
    val ts = lit("1997-02-10 17:32:01.4").cast("timestamp_ntz")
    assert(evalLong(year(ts).cast("long")) === 1997L)
    assert(evalLong(hour(ts).cast("long")) === 17L)
    assert(evalLong(second(ts).cast("long")) === 1L)
    assert(evalLong(millisecondOfMinute(ts)) === 1400L)
    assert(evalLong(microsecondOfMinute(ts)) === 1400000L)
  }

  // Numeric vectors (PostgresNumericTests shape): decimal arithmetic
  test("decimal arithmetic at scale 10 (DBSPTypeDecimal limits)") {
    val r = spark.sql(
      """SELECT CAST(4.31 AS DECIMAL(20,10)) + CAST(-7215.24 AS DECIMAL(20,10)) AS s,
                CAST(4.31 AS DECIMAL(20,10)) * CAST(-2.0 AS DECIMAL(8,2)) AS p,
                CAST(1 AS DECIMAL(38,10)) / CAST(3 AS DECIMAL(38,10)) AS q""")
      .collect()(0)
    assert(r.getDecimal(0).toPlainString === "-7210.9300000000")
    assert(r.getDecimal(1).doubleValue() === -8.62)
    assert(math.abs(r.getDecimal(2).doubleValue() - 1.0 / 3) < 1e-6)
  }
}
