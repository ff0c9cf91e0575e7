package graft

import graft.engine.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Ports of the reference's domain suites: ArrayTests.java (arrays +
  * UNNEST variants), TimeTests.java (timestamp ops over a 100ms-epoch
  * fixture), CastTests.java (implicit casts in arithmetic). */
class DomainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("domain")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  // ---- ArrayTests.java -------------------------------------------------

  private lazy val arrEngine: Engine = {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE ARR_TABLE (ID INTEGER NULL, VALS INTEGER ARRAY NULL, VALVALS VARCHAR ARRAY NULL);
        |INSERT INTO ARR_TABLE VALUES (1, array(10, 20, 30), array('a', 'b'))""".stripMargin)
    e
  }

  test("testArray (:53): CARDINALITY, ARRAY ctor, ITEM over a table") {
    val got = arrEngine.spark.sql(
      "SELECT ID, size(VALS) AS card, ARRAY(ID, 5) AS a2, element_at(VALS, 1) AS first FROM ARR_TABLE")
    assert(canon(got) === Seq("1|3|ArraySeq(1, 5)|10"))
  }

  test("testUnnest (:64): UNNEST(ARRAY[1..5])") {
    val got = spark.sql("SELECT explode(ARRAY(1, 2, 3, 4, 5)) AS col")
    assert(canon(got) === Seq("1", "2", "3", "4", "5"))
  }

  test("unnest duplicates preserved (:86) — multiset semantics") {
    val got = spark.sql("SELECT explode(ARRAY(1, 1, 1)) AS col")
    assert(canon(got) === Seq("1", "1", "1"))
  }

  test("unnest with NULL element (:108)") {
    val got = spark.sql("SELECT explode(ARRAY(1, 2, 3, 4, NULL)) AS col")
    assert(canon(got) === Seq("1", "2", "3", "4", "null"))
  }

  test("UNNEST WITH ORDINALITY (:131/:155): 1-based, NULL element keeps its position") {
    val got = spark.sql(
      "SELECT col, pos + 1 AS ord FROM (SELECT posexplode(ARRAY(1, 2, 3, 4, 5, NULL)))")
    assert(canon(got) ===
      Seq("1|1", "2|2", "3|3", "4|4", "5|5", "null|6"))
  }

  test("testUnnest1 (:212): lateral UNNEST of a table's array column") {
    import spark.implicits._
    val t = Seq((Seq(1, 2, 3), 6), (Seq(1, 2, 3), 7)).toDF("VALS", "ID")
    val got = t.select(explode(col("VALS")).as("VAL"), col("ID"))
    assert(canon(got) ===
      Seq("1|6", "1|7", "2|6", "2|7", "3|6", "3|7"))
  }

  test("testDoubleUnnest1 (:251): two lateral UNNESTs compose (cartesian per row)") {
    import spark.implicits._
    val t = Seq((Seq(1, 2), Seq(10, 20), 6)).toDF("VALS0", "VALS1", "ID")
    val got = t.select(explode(col("VALS0")).as("VAL0"), col("VALS1"), col("ID"))
      .select(col("VAL0"), explode(col("VALS1")).as("VAL1"), col("ID"))
    assert(canon(got) ===
      Seq("1|10|6", "1|20|6", "2|10|6", "2|20|6"))
  }

  // ---- TimeTests.java (fixture: one row, TIMESTAMP = 100 ms epoch) -----

  private lazy val timeT: DataFrame =
    spark.sql("SELECT CAST('1970-01-01 00:00:00.1' AS TIMESTAMP_NTZ) AS COL1")

  test("timestampTableTest / extract parts of 100ms-epoch timestamp") {
    val r = timeT.select(
      second(col("COL1")).as("s"), minute(col("COL1")).as("m"),
      hour(col("COL1")).as("h"), dayofmonth(col("COL1")).as("d"),
      dayofweek(col("COL1")).as("dw"), month(col("COL1")).as("mo"),
      year(col("COL1")).as("y"),
      graft.functions.SqlFunctions.isodow(col("COL1")).as("iso")).collect()(0)
    // 1970-01-01 was a Thursday: DAYOFWEEK (1=Sun) = 5, ISODOW = 4
    assert(r.toSeq === Seq(0, 0, 0, 1, 5, 1, 1970, 4L))
  }

  test("castTimestampToString keeps sub-second precision (documented deviation)") {
    // The reference's ms-resolution timestamp prints without the fraction
    // ("1970-01-01 00:00:00", TimeTests.java:70-76) and so loses the 100ms
    // on a string round-trip; Spark preserves ".1" and round-trips exactly.
    val s = timeT.select(col("COL1").cast("string")).collect()(0).getString(0)
    assert(s === "1970-01-01 00:00:00.1")
    val rt = timeT.select(col("COL1").cast("string").cast("timestamp_ntz").as("t"))
      .select((col("t") === col("t")).as("self"), col("t").cast("string"))
      .collect()(0)
    assert(rt.getBoolean(0) && rt.getString(1) === "1970-01-01 00:00:00.1")
  }

  test("timestamp literal with fraction (:146)") {
    val s = spark.sql("SELECT CAST(TIMESTAMP '2020-04-30 12:25:13.45' AS STRING)")
      .collect()(0).getString(0)
    assert(s === "2020-04-30 12:25:13.45")
  }

  // ---- CastTests.java --------------------------------------------------

  test("string literal in arithmetic coerces to number (:78)") {
    // Calcite yields INT 3; Spark's implicit string coercion goes through
    // DOUBLE — same value, wider type (documented deviation).
    val v = spark.sql("SELECT '1' + 2").collect()(0)
    assert(v.getDouble(0) === 3.0)
  }

  test("numeric widening ladder in mixed arithmetic (reduceType, ExpressionCompiler.java:165-204)") {
    val r = spark.sql(
      """SELECT CAST(1 AS TINYINT) + CAST(2 AS SMALLINT) AS a,
                CAST(1 AS INT) + CAST(2.5 AS DOUBLE) AS b,
                CAST(1 AS BIGINT) + CAST(2.5 AS DECIMAL(4,2)) AS c""").collect()(0)
    assert(r.getShort(0) === 3)
    assert(r.getDouble(1) === 3.5)
    assert(r.getDecimal(2).doubleValue() === 3.5)
  }
}
