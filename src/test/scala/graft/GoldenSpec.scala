package graft

import graft.engine.Engine
import graft.functions.SqlFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Port of the reference's golden end-to-end corpus: the 2-row table T of
  * BaseSQLTests.java:210-266 queried by the EndToEndTests.java goldens
  * (65 @Tests at :44-640), evaluated through our DDL Engine and compared as
  * multisets. ORDER BY goldens compare as sequences (the reference returns
  * a sorted Vec, CalciteToDBSPCompiler.visitSort:980-1048).
  *
  * Queries are the reference's SQL, transposed to Spark dialect where they
  * differ (1-based ITEM → element_at; ELEMENT/ST_* → graft.functions).
  */
class GoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("golden")
    .getOrCreate()

  private lazy val engine: Engine = {
    val e = new Engine(spark)
    // BaseSQLTests.java:210-218 DDL + :223-238 rows e0/e1
    e.executeScript(
      """CREATE TABLE T (
        |  COL1 INT NOT NULL, COL2 DOUBLE NOT NULL, COL3 BOOLEAN NOT NULL,
        |  COL4 VARCHAR NOT NULL, COL5 INT, COL6 DOUBLE
        |);
        |INSERT INTO T VALUES (10, 12.0, true, 'Hi', NULL, NULL);
        |INSERT INTO T VALUES (10, 1.0, false, 'Hi', 1, 0.0)""".stripMargin)
    e
  }

  override def afterAll(): Unit = spark.stop()

  /** Goldens evaluate over the engine's registered tables. (Direct sql()
    * rather than CREATE VIEW: Spark temp views reject duplicate output
    * column names, which several goldens produce, e.g. T1.COL3, T2.COL3.) */
  private def runSql(q: String): DataFrame = { engine; spark.sql(q) }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case d: java.lang.Double => d.toString
      case f: java.lang.Float  => f.toString
      case x                   => String.valueOf(x)
    }.mkString("|")).toSeq

  /** Multiset compare (order-insensitive). */
  private def check(q: String, expected: Seq[Seq[Any]]): Unit =
    assert(canon(runSql(q)).sorted ===
      expected.map(_.map(String.valueOf).mkString("|")).sorted)

  /** Sequence compare (ORDER BY goldens). */
  private def checkOrdered(q: String, expected: Seq[Seq[Any]]): Unit =
    assert(canon(runSql(q)) ===
      expected.map(_.map(String.valueOf).mkString("|")))

  private val e0 = Seq(10, 12.0, true, "Hi", null, null)
  private val e1 = Seq(10, 1.0, false, "Hi", 1, 0.0)

  // EndToEndTests.java:63 — nullable 3-valued AND
  test("testNullableBoolean") {
    check("SELECT T.COL5 > 10 AND T.COL3 FROM T", Seq(Seq(null), Seq(false)))
  }
  // :72/:79 — aggregate-over with RANGE UNBOUNDED PRECEDING
  test("overTest") {
    check("SELECT T.COL1, COUNT(*) OVER (ORDER BY T.COL1 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM T",
      Seq(Seq(10, 2), Seq(10, 2)))
  }
  test("overSumTest") {
    check("SELECT T.COL1, SUM(T.COL2) OVER (ORDER BY T.COL1 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM T",
      Seq(Seq[Any](10, 13.0), Seq[Any](10, 13.0)))
  }
  // :85 — string concat
  test("testConcat") {
    check("SELECT T.COL4 || ' ' || T.COL4 FROM T", Seq(Seq("Hi Hi"), Seq("Hi Hi")))
  }
  // :124 — concat NULL propagates
  test("testConcatNull") {
    check("SELECT T.COL4 || NULL FROM T", Seq(Seq(null), Seq(null)))
  }
  // :92/:99/:106 — ELEMENT, 1-based ITEM, OOB → NULL
  test("testArray (ELEMENT)") {
    val df = spark.range(1).select(SqlFunctions.element(array(lit(2))).as("e"))
    assert(canon(df) === Seq("2"))
  }
  // Reference SQL spellings resolve as SQL text (SqlRegistry)
  test("testArray (ELEMENT via SQL)") {
    check("SELECT ELEMENT(ARRAY(2))", Seq(Seq(2)))
  }
  test("geo via SQL spellings") {
    check("SELECT ST_DISTANCE(ST_POINT(0, 0), ST_POINT(0, 1))", Seq(Seq(1.0)))
  }
  test("extract-unit functions via SQL spellings") {
    check("SELECT DECADE(DATE '1994-12-25'), CENTURY(DATE '2001-01-01'), " +
      "ISOYEAR(DATE '2005-01-01'), FDIV(0.0, 0.0)",
      Seq(Seq[Any](199, 21, 2004, Double.NaN)))
  }
  test("testArrayIndex") {
    check("SELECT element_at(ARRAY(2), 1)", Seq(Seq(2)))
  }
  test("testArrayIndexOutOfBounds") {
    check("SELECT element_at(ARRAY(2), 3)", Seq(Seq(null)))
  }
  // :116 — ELEMENT of >1-element array errors
  test("testArrayElement errors on >1") {
    val df = spark.range(1).select(SqlFunctions.element(array(lit(2), lit(3))).as("e"))
    intercept[Exception] { df.collect() }
  }
  // :131-:161 — multiple windows over one relation
  test("overTwiceTest") {
    check("""SELECT T.COL1,
             SUM(T.COL2) OVER (ORDER BY T.COL1 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             COUNT(*) OVER (ORDER BY T.COL1 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM T""",
      Seq(Seq[Any](10, 13.0, 2), Seq[Any](10, 13.0, 2)))
  }
  // Reference expects COUNT = 2 here (EndToEndTests.java:146), i.e. the
  // frame [v-2, v-1] somehow containing the two peer rows at v=10. That
  // contradicts standard RANGE semantics — Spark, DuckDB, and Postgres all
  // return 0 for an [8,9] frame with no rows in it. We pin the
  // standard-correct value and record the reference deviation.
  test("overConstantWindowTest (standard semantics: empty frame counts 0)") {
    check("""SELECT T.COL1,
             COUNT(*) OVER (ORDER BY T.COL1 RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING) FROM T""",
      Seq(Seq(10, 0), Seq(10, 0)))
  }
  test("overTwiceDifferentTest (standard semantics)") {
    check("""SELECT T.COL1,
             SUM(T.COL2) OVER (ORDER BY T.COL1 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             COUNT(*) OVER (ORDER BY T.COL1 RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING) FROM T""",
      Seq(Seq[Any](10, 13.0, 0), Seq[Any](10, 13.0, 0)))
  }
  // :169 — correlated nested aggregates (RPAI paper query): decorrelation
  test("correlatedAggregate") {
    check("""SELECT Sum(r.COL1 * r.COL5) FROM T r
             WHERE 0.5 * (SELECT Sum(r1.COL5) FROM T r1) =
                   (SELECT Sum(r2.COL5) FROM T r2 WHERE r2.COL1 = r.COL1)""",
      Seq(Seq(null)))
  }

  // :186/:219/:230 — projections
  test("projectTest") { check("SELECT T.COL3 FROM T", Seq(Seq(true), Seq(false))) }
  test("projectNullableTest") { check("SELECT T.COL5 FROM T", Seq(Seq(null), Seq(1))) }
  test("selectStarTest") { check("SELECT * FROM T", Seq(e0, e1)) }
  // :195 — INTERSECT (set semantics)
  test("intersectTest") {
    check("SELECT * FROM T INTERSECT (SELECT * FROM T)", Seq(e0, e1))
  }
  // :201/:210 — arithmetic with NULL propagation
  test("plusNullTest") { check("SELECT T.COL1 + T.COL5 FROM T", Seq(Seq(null), Seq(11))) }
  test("negateNullTest") { check("SELECT -T.COL5 FROM T", Seq(Seq(null), Seq(-1))) }
  // :236/:242 — UNION / UNION ALL
  test("unionTest") {
    check("(SELECT * FROM T) UNION (SELECT * FROM T)", Seq(e0, e1))
  }
  test("unionAllTest") {
    check("(SELECT * FROM T) UNION ALL (SELECT * FROM T)", Seq(e0, e1, e0, e1))
  }
  // :250/:260/:289/:298/:307 — join flavors on T
  test("joinTest") {
    check("SELECT T1.COL3, T2.COL3 FROM T AS T1 JOIN T AS T2 ON T1.COL1 = T2.COL1",
      Seq(Seq(true, true), Seq(true, false), Seq(false, true), Seq(false, false)))
  }
  test("joinNullableKeyTest") {
    // COL1=10 never equals COL5∈{NULL,1}: empty
    check("SELECT T1.COL3, T2.COL3 FROM T AS T1 JOIN T AS T2 ON T1.COL1 = T2.COL5", Seq())
  }
  test("leftOuterJoinTest") {
    check("SELECT T1.COL3, T2.COL3 FROM T AS T1 LEFT JOIN T AS T2 ON T1.COL1 = T2.COL5",
      Seq(Seq(true, null), Seq(false, null)))
  }
  test("rightOuterJoinTest") {
    check("SELECT T1.COL3, T2.COL3 FROM T AS T1 RIGHT JOIN T AS T2 ON T1.COL1 = T2.COL5",
      Seq(Seq(null, true), Seq(null, false)))
  }
  test("fullOuterJoinTest") {
    check("SELECT T1.COL3, T2.COL3 FROM T AS T1 FULL OUTER JOIN T AS T2 ON T1.COL1 = T2.COL5",
      Seq(Seq(true, null), Seq(false, null), Seq(null, true), Seq(null, false)))
  }
  // :266/:372 — constants
  test("zero") { check("SELECT 0", Seq(Seq(0))) }
  test("constantFold") { check("SELECT 1 + 2", Seq(Seq(3))) }
  // :273/:282 — geo
  test("geoPointTest") {
    val df = spark.range(1).select(SqlFunctions.stPoint(lit(0), lit(0)).as("p"))
    assert(df.collect()(0).getStruct(0).toSeq === Seq(0.0, 0.0))
  }
  test("geoDistanceTest") {
    val df = spark.range(1).select(SqlFunctions.stDistance(
      SqlFunctions.stPoint(lit(0), lit(0)), SqlFunctions.stPoint(lit(0), lit(1))).as("d"))
    assert(canon(df) === Seq("1.0"))
  }
  // :318-:366 — filters
  test("whereFalse") { check("SELECT * FROM T WHERE FALSE", Seq()) }
  test("whereBoolColumn") { check("SELECT * FROM T WHERE COL3", Seq(e0)) }
  test("whereCompare") { check("SELECT * FROM T WHERE COL2 < COL1", Seq(e1)) }
  test("whereCastDouble") { check("SELECT * FROM T WHERE COL2 < CAST(COL1 AS DOUBLE)", Seq(e1)) }
  test("whereCastNullable") { check("SELECT * FROM T WHERE COL2 < CAST(COL5 AS DOUBLE)", Seq()) }
  test("whereCastFloat") { check("SELECT * FROM T WHERE COL2 < CAST(COL1 AS FLOAT)", Seq(e1)) }
  test("whereNegative") { check("SELECT * FROM T WHERE COL2 < 0", Seq()) }
  // :366 — EXCEPT
  test("exceptTest") {
    check("SELECT * FROM T EXCEPT (SELECT * FROM T WHERE COL3)", Seq(e1))
  }
  // :378-:392 — GROUP BY
  test("groupByTest") { check("SELECT COL1 FROM T GROUP BY COL1", Seq(Seq(10))) }
  test("groupByCountTest") {
    check("SELECT COL1, COUNT(col2) FROM T GROUP BY COL1, COL3",
      Seq(Seq(10, 1), Seq(10, 1)))
  }
  test("groupBySumTest") {
    check("SELECT COL1, SUM(col2) FROM T GROUP BY COL1, COL3",
      Seq(Seq[Any](10, 12.0), Seq[Any](10, 1.0)))
  }
  // :400-:443 — division incl. div-by-zero → NULL (ints) / IEEE (doubles).
  // Calcite's `/` on INTs is integer division; Spark's is always double —
  // the Spark-dialect transposition is DIV, which matches the reference's
  // I32 results exactly.
  test("divTest") { check("SELECT T.COL1 DIV T.COL5 FROM T", Seq(Seq(null), Seq(10))) }
  test("divIntTest") { check("SELECT T.COL5 DIV T.COL5 FROM T", Seq(Seq(null), Seq(1))) }
  test("divZeroTest") { check("SELECT 1 DIV 0", Seq(Seq(null))) }
  test("nestedDivTest") { check("SELECT 2 DIV (1 DIV 0)", Seq(Seq(null))) }
  test("floatDivTest (IEEE NaN)") {
    val df = engine.table("T").select(
      SqlFunctions.fdiv(col("COL6"), col("COL6")).as("d"))
    assert(canon(df).sorted === Seq("NaN", "null"))
  }
  // :452-:539 — aggregates
  test("aggregateDistinctTest") {
    check("SELECT SUM(DISTINCT T.COL1), SUM(T.COL2) FROM T", Seq(Seq[Any](10, 13.0)))
  }
  test("aggregateTest") { check("SELECT SUM(T.COL1) FROM T", Seq(Seq(20))) }
  test("maxTest") { check("SELECT MAX(T.COL1) FROM T", Seq(Seq(10))) }
  test("maxConst") { check("SELECT MAX(6) FROM T", Seq(Seq(6))) }
  test("constAggregateExpression") {
    check("SELECT 34 DIV SUM (1) FROM T GROUP BY COL1", Seq(Seq(17)))
  }
  test("inTest") {
    // Reference (:492): 3 IN {NULL, 1} is UNKNOWN → NULL under 3VL.
    // Spark's IN-subquery *as a projection* collapses UNKNOWN to false, so
    // the transposition spells out the 3-valued semantics explicitly.
    check("""SELECT CASE WHEN EXISTS(SELECT 1 FROM T WHERE COL5 = 3) THEN TRUE
                         WHEN EXISTS(SELECT 1 FROM T WHERE COL5 IS NULL) THEN NULL
                         ELSE FALSE END""", Seq(Seq(null)))
  }
  test("constAggregateExpression2") {
    check("SELECT 34 / AVG (1) FROM T GROUP BY COL1", Seq(Seq(34.0)))
  }
  test("constAggregateDoubleExpression") {
    check("SELECT 34 DIV SUM (1), 20 DIV SUM(2) FROM T GROUP BY COL1",
      Seq(Seq(17, 5)))
  }
  test("aggregateFloatTest") { check("SELECT SUM(T.COL2) FROM T", Seq(Seq(13.0))) }
  test("aggregateNullableTest") { check("SELECT SUM(T.COL5) FROM T", Seq(Seq(1))) }
  test("aggregateFalseTest (SUM over empty → NULL)") {
    check("SELECT SUM(T.COL1) FROM T WHERE FALSE", Seq(Seq(null)))
  }
  test("averageTest") { check("SELECT AVG(T.COL1) FROM T", Seq(Seq(10.0))) }
  // :547 — self cross join
  test("cartesianTest") {
    check("SELECT * FROM T, T AS X", Seq(e0 ++ e0, e0 ++ e1, e1 ++ e0, e1 ++ e1))
  }
  // :558 — NULLIF folding
  test("foldTest") { check("SELECT + 91 + NULLIF ( + 93, + 38 )", Seq(Seq(184))) }
  // :566-:582 — ORDER BY (sequence compare)
  test("orderbyTest") {
    checkOrdered("SELECT * FROM T ORDER BY T.COL2", Seq(e1, e0))
  }
  test("orderbyDescendingTest") {
    checkOrdered("SELECT * FROM T ORDER BY T.COL2 DESC", Seq(e0, e1))
  }
  test("orderby2Test") {
    checkOrdered("SELECT * FROM T ORDER BY T.COL2, T.COL1", Seq(e1, e0))
  }
}
