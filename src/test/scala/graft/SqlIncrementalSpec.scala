package graft

import graft.engine.{Engine, SqlIncremental}
import graft.streaming.Incremental.Runner
import graft.zset.ZSet
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end: CREATE VIEW text → incremental circuit → step deltas →
  * output equals the view's batch SQL over the integrated inputs. This is
  * the reference's whole program shape (DDL in, incrementally-maintained
  * views out) on Spark. */
class SqlIncrementalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("sql-inc")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()
  import scala.jdk.CollectionConverters._

  private lazy val engine: Engine = {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE SALES (region VARCHAR NOT NULL, item VARCHAR NOT NULL, amount BIGINT NOT NULL);
        |CREATE TABLE REGIONS (region VARCHAR NOT NULL, country VARCHAR NOT NULL);
        |CREATE VIEW BIG_SALES AS SELECT region, item, amount * 2 AS doubled FROM SALES WHERE amount > 10;
        |CREATE VIEW SALES_BY_REGION AS
        |  SELECT region, COUNT(*) AS n, SUM(amount) AS total, MAX(amount) AS biggest, AVG(amount) AS mean
        |  FROM SALES GROUP BY region;
        |CREATE VIEW JOINED AS
        |  SELECT country, item, amount FROM SALES JOIN REGIONS ON SALES.region = REGIONS.region;
        |CREATE VIEW ITEMS AS SELECT DISTINCT item FROM SALES;
        |CREATE VIEW COMBINED AS
        |  SELECT item FROM SALES WHERE amount > 50
        |  UNION ALL SELECT item FROM SALES WHERE region = 'west'""".stripMargin)
    e
  }

  private val salesSchema = StructType(Seq(
    StructField("region", StringType), StructField("item", StringType),
    StructField("amount", LongType)))
  private val regionsSchema = StructType(Seq(
    StructField("region", StringType), StructField("country", StringType)))

  private def z(schema: StructType, rows: Seq[Any]*): DataFrame =
    spark.createDataFrame(
      rows.map(r => Row(r: _*)).asJava,
      StructType(schema.fields :+ StructField(ZSet.W, LongType)))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  /** Run steps; assert integral of output deltas == full recompute AND ==
    * the batch SQL over the expanded integrated inputs. */
  private def checkView(view: String, steps: Seq[Map[String, DataFrame]]): Unit = {
    val r = engine.incrementalRunner(view)
    steps.foreach(r.step)
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute), s"$view: inc != recompute")
  }

  private val step1 = Map(
    "SALES" -> z(salesSchema,
      Seq("west", "widget", 100L, 1L), Seq("west", "gadget", 5L, 1L),
      Seq("east", "widget", 30L, 1L), Seq("east", "doohickey", 70L, 2L)),
    "REGIONS" -> z(regionsSchema,
      Seq("west", "US", 1L), Seq("east", "US", 1L)))
  private val step2 = Map( // retract one doohickey, add a south sale
    "SALES" -> z(salesSchema,
      Seq("east", "doohickey", 70L, -1L), Seq("south", "widget", 60L, 1L)),
    "REGIONS" -> z(regionsSchema, Seq("south", "MX", 1L)))
  private val step3 = Map( // retract the whole east region's widget
    "SALES" -> z(salesSchema, Seq("east", "widget", 30L, -1L)))

  test("project+filter view compiles and maintains incrementally") {
    checkView("BIG_SALES", Seq(step1, step2, step3))
  }

  test("grouped aggregate view with COUNT/SUM/MAX/AVG under retractions") {
    checkView("SALES_BY_REGION", Seq(step1, step2, step3))
  }

  test("join view (same-named equi key) under retractions on both sides") {
    checkView("JOINED", Seq(step1, step2, step3))
  }

  test("distinct view") {
    checkView("ITEMS", Seq(step1, step2, step3))
  }

  test("union-all view") {
    checkView("COMBINED", Seq(step1, step2, step3))
  }

  test("incremental output matches batch SQL over final table contents") {
    // independent check against spark.sql over materialized positive rows
    val r = engine.incrementalRunner("SALES_BY_REGION")
    Seq(step1, step2, step3).foreach(r.step)
    val sales = Seq(
      ("west", "widget", 100L), ("west", "gadget", 5L),
      ("east", "doohickey", 70L), ("south", "widget", 60L))
    import spark.implicits._
    sales.toDF("region", "item", "amount").createOrReplaceTempView("SALES_FINAL")
    val want = spark.sql(
      """SELECT region, COUNT(*) AS n, SUM(amount) AS total, MAX(amount) AS biggest, AVG(amount) AS mean
        |FROM SALES_FINAL GROUP BY region""".stripMargin)
    val got = ZSet.toRows(ZSet.consolidate(r.output))
    assert(canon(got) === canon(want))
  }

  test("left outer join view: unmatched rows pad with NULLs, flip on retraction") {
    val e2 = new Engine(spark)
    e2.executeScript(
      """CREATE TABLE S2 (region VARCHAR NOT NULL, amount BIGINT NOT NULL);
        |CREATE TABLE R2 (region VARCHAR NOT NULL, country VARCHAR NOT NULL);
        |CREATE VIEW LJ AS
        |  SELECT amount, country FROM S2 LEFT JOIN R2 ON S2.region = R2.region""".stripMargin)
    val s2 = StructType(Seq(StructField("region", StringType), StructField("amount", LongType)))
    val r2 = StructType(Seq(StructField("region", StringType), StructField("country", StringType)))
    val r = e2.incrementalRunner("LJ")
    r.step(Map(
      "S2" -> z(s2, Seq("west", 10L, 1L), Seq("north", 99L, 1L)),
      "R2" -> z(r2, Seq("west", "US", 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    // retract the only match for west → west row must flip to padded NULL
    r.step(Map("R2" -> z(r2, Seq("west", "US", -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val rows = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => (x.getLong(0), Option(x.getString(1)))).toSet
    assert(rows === Set((10L, None), (99L, None)))
  }

  test("full outer join view under deltas on both sides") {
    val e3 = new Engine(spark)
    e3.executeScript(
      """CREATE TABLE S3 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE TABLE R3 (k VARCHAR NOT NULL, w BIGINT NOT NULL);
        |CREATE VIEW FJ AS SELECT v, w FROM S3 FULL JOIN R3 ON S3.k = R3.k""".stripMargin)
    val s3 = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val r3 = StructType(Seq(StructField("k", StringType), StructField("w", LongType)))
    val r = e3.incrementalRunner("FJ")
    r.step(Map(
      "S3" -> z(s3, Seq("a", 1L, 1L), Seq("b", 2L, 1L)),
      "R3" -> z(r3, Seq("a", 10L, 1L), Seq("c", 30L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    r.step(Map("S3" -> z(s3, Seq("c", 3L, 1L)), "R3" -> z(r3, Seq("a", 10L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
  }

  test("HAVING (filter over aggregate) and view-over-view compile incrementally") {
    val e4 = new Engine(spark)
    e4.executeScript(
      """CREATE TABLE S4 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW AGG4 AS SELECT k, SUM(v) AS total FROM S4 GROUP BY k HAVING SUM(v) > 10;
        |CREATE VIEW OVER4 AS SELECT k FROM AGG4 WHERE total < 100""".stripMargin)
    val s4 = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val r = e4.incrementalRunner("OVER4")
    r.step(Map("S4" -> z(s4, Seq("a", 6L, 1L), Seq("a", 7L, 1L), Seq("b", 5L, 1L),
      Seq("c", 200L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val got1 = ZSet.toRows(ZSet.consolidate(r.output)).collect().map(_.getString(0)).toSet
    assert(got1 === Set("a")) // a: 13 ∈ (10,100); b: 5 fails HAVING; c: 200 fails WHERE
    // retraction drops a below the HAVING threshold
    r.step(Map("S4" -> z(s4, Seq("a", 7L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(ZSet.toRows(ZSet.consolidate(r.output)).count() === 0)
  }

  test("window-aggregate view (taxi/fraud shape) maintains incrementally") {
    val e5 = new Engine(spark)
    e5.executeScript(
      """CREATE TABLE TX (card VARCHAR NOT NULL, t BIGINT NOT NULL, amt BIGINT NOT NULL);
        |CREATE VIEW FEAT AS
        |  SELECT card, t, amt,
        |         COUNT(*) OVER (PARTITION BY card ORDER BY t RANGE BETWEEN 100 PRECEDING AND 1 PRECEDING) AS n_prev,
        |         SUM(amt) OVER (PARTITION BY card ORDER BY t RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS spend
        |  FROM TX""".stripMargin)
    val tx = StructType(Seq(StructField("card", StringType),
      StructField("t", LongType), StructField("amt", LongType)))
    val r = e5.incrementalRunner("FEAT")
    r.step(Map("TX" -> z(tx,
      Seq("a", 10L, 5L, 1L), Seq("a", 50L, 7L, 1L), Seq("a", 200L, 1L, 1L),
      Seq("b", 10L, 9L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    // a new txn inside a's window reshapes frames; b untouched → no delta
    val d2 = r.step(Map("TX" -> z(tx, Seq("a", 60L, 3L, 1L))))
    val touched = ZSet.consolidate(d2).select("card").distinct()
      .collect().map(_.getString(0)).toSet
    assert(touched === Set("a"))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    // retraction removes a frame member
    r.step(Map("TX" -> z(tx, Seq("a", 50L, 7L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
  }

  test("unsupported shapes fail loudly with the node name") {
    engine // ensure tables exist
    val e1 = intercept[SqlIncremental.UnsupportedPlanException] {
      SqlIncremental.compile(spark,
        "SELECT region, (SELECT item FROM SALES ORDER BY item LIMIT 1) AS top FROM SALES",
        Set("SALES"))
    }
    assert(e1.getMessage.contains("scalar subqueries must be global aggregates"))
    val e2 = intercept[SqlIncremental.UnsupportedPlanException] {
      SqlIncremental.compile(spark,
        "SELECT region FROM SALES LIMIT 5", Set("SALES"))
    }
    assert(e2.getMessage.contains("LIMIT without ORDER BY"))
  }

  test("ordered-LIMIT lateral whose primary sort key is projected away: " +
    "reject or exact — never a partial-order ranking") {
    // The pulled-sort recovery rebuilds a decorrelated lateral's window
    // order from the Sort BELOW the window. If the inner SELECT projects
    // the primary sort key away (here `c`), a partial pull would keep
    // only the tie-breaker `b` and silently rank by the WRONG order
    // (picking b=10 instead of the c-DESC winner b=20). The pull is
    // all-or-nothing: either every sort key resolves in the window
    // child's output and the circuit's answer is exact, or the compile
    // rejects to the spark.sql fallback. Data is chosen so the partial
    // order and the true order disagree on every group.
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE PLO (k BIGINT NOT NULL);
        |CREATE TABLE PLI (k BIGINT NOT NULL, b BIGINT NOT NULL, c BIGINT NOT NULL);
        |CREATE VIEW PLV AS SELECT o.k, y.b FROM PLO o, LATERAL
        |  (SELECT b FROM PLI WHERE PLI.k = o.k ORDER BY c DESC, b LIMIT 1) y""".stripMargin)
    import spark.implicits._
    Seq(1L, 2L).toDF("k").createOrReplaceTempView("PLO")
    Seq((1L, 10L, 1L), (1L, 20L, 9L), (2L, 5L, 2L), (2L, 7L, 8L))
      .toDF("k", "b", "c").createOrReplaceTempView("PLI")
    val want = canon(spark.sql(
      "SELECT o.k, y.b FROM PLO o, LATERAL (SELECT b FROM PLI " +
        "WHERE PLI.k = o.k ORDER BY c DESC, b LIMIT 1) y"))
    try {
      val inc = SqlIncremental.compile(spark,
        "SELECT o.k, y.b FROM PLO o, LATERAL (SELECT b FROM PLI " +
          "WHERE PLI.k = o.k ORDER BY c DESC, b LIMIT 1) y",
        Set("PLO", "PLI"))
      val in = Map("PLO" -> ZSet.fromRows(spark.table("PLO")),
        "PLI" -> ZSet.fromRows(spark.table("PLI")))
      val got = canon(ZSet.toRows(ZSet.consolidate(inc.batch(in))))
      assert(got === want,
        "lossy pulled sort produced a partial-order ranking")
      info("lateral with projected-away sort key: lowered, exact")
    } catch {
      case ex: SqlIncremental.UnsupportedPlanException =>
        info(s"lateral with projected-away sort key: rejected (${ex.getMessage})")
    }
  }

  test("global aggregate view: zero row on empty state, maintained through retraction to empty") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S6 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW TOTALS AS SELECT COUNT(*) AS n, SUM(v) AS total, MAX(v) AS mx FROM S6""".stripMargin)
    val s6 = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val r = e.incrementalRunner("TOTALS")
    // before any step the view already holds the SQL zero row
    val seed = ZSet.toRows(ZSet.consolidate(r.output)).collect()
    assert(seed.length === 1 && seed(0).getLong(0) === 0L && seed(0).isNullAt(1))
    r.step(Map("S6" -> z(s6, Seq("a", 5L, 1L), Seq("b", 7L, 2L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val after1 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
    assert(after1.length === 1 && after1(0).getLong(0) === 3L &&
      after1(0).getLong(1) === 19L && after1(0).getLong(2) === 7L)
    // retract everything: the view must flip back to the zero row
    r.step(Map("S6" -> z(s6, Seq("a", 5L, -1L), Seq("b", 7L, -2L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val empty = ZSet.toRows(ZSet.consolidate(r.output)).collect()
    assert(empty.length === 1 && empty(0).getLong(0) === 0L &&
      empty(0).isNullAt(1) && empty(0).isNullAt(2))
  }

  test("join view with differently-named equi keys (ON a.x = b.y) keeps both columns") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE A7 (x VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE TABLE B7 (y VARCHAR NOT NULL, w BIGINT NOT NULL);
        |CREATE VIEW J7 AS SELECT x, y, v, w FROM A7 JOIN B7 ON A7.x = B7.y""".stripMargin)
    val a7 = StructType(Seq(StructField("x", StringType), StructField("v", LongType)))
    val b7 = StructType(Seq(StructField("y", StringType), StructField("w", LongType)))
    val r = e.incrementalRunner("J7")
    r.step(Map(
      "A7" -> z(a7, Seq("p", 1L, 1L), Seq("q", 2L, 1L)),
      "B7" -> z(b7, Seq("p", 10L, 1L), Seq("r", 30L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val rows = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3))).toSet
    assert(rows === Set(("p", "p", 1L, 10L)))
    r.step(Map("B7" -> z(b7, Seq("p", 10L, -1L), Seq("q", 20L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val rows2 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3))).toSet
    assert(rows2 === Set(("q", "q", 2L, 20L)))
  }

  test("join view with residual predicate (ON a.x = b.y AND a.v > b.w)") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE A8 (x VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE TABLE B8 (y VARCHAR NOT NULL, w BIGINT NOT NULL);
        |CREATE VIEW J8 AS SELECT v, w FROM A8 JOIN B8 ON A8.x = B8.y AND A8.v > B8.w""".stripMargin)
    val a8 = StructType(Seq(StructField("x", StringType), StructField("v", LongType)))
    val b8 = StructType(Seq(StructField("y", StringType), StructField("w", LongType)))
    val r = e.incrementalRunner("J8")
    r.step(Map(
      "A8" -> z(a8, Seq("p", 5L, 1L), Seq("p", 1L, 1L), Seq("q", 9L, 1L)),
      "B8" -> z(b8, Seq("p", 3L, 1L), Seq("q", 20L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val rows = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(rows === Set((5L, 3L))) // p/1 fails v>w, q/9 fails 9>20
    // a retraction of the matching right row kills the surviving pair
    r.step(Map("B8" -> z(b8, Seq("p", 3L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(ZSet.toRows(ZSet.consolidate(r.output)).count() === 0L)
  }

  test("uncorrelated scalar subqueries join in as single-row circuits") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S19 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE TABLE U19 (w BIGINT NOT NULL);
        |CREATE VIEW SCAL AS
        |  SELECT k, v, (SELECT MAX(w) FROM U19) AS mx, v - (SELECT MIN(w) FROM U19) AS off
        |  FROM S19""".stripMargin)
    val s = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val u = StructType(Seq(StructField("w", LongType)))
    val r = e.incrementalRunner("SCAL")
    r.step(Map(
      "S19" -> z(s, Seq("a", 10L, 1L), Seq("b", 20L, 1L)),
      "U19" -> z(u, Seq(3L, 1L), Seq(7L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val m1 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => x.getString(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(m1 === Map("a" -> (7L, 7L), "b" -> (7L, 17L)))
    // retracting the max changes EVERY output row
    r.step(Map("U19" -> z(u, Seq(7L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val m2 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => x.getString(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(m2 === Map("a" -> (3L, 7L), "b" -> (3L, 17L)))
  }

  test("multi-column (a,b) IN subqueries lower to multi-key semi/anti joins") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S21 (k VARCHAR NOT NULL, g BIGINT NOT NULL, v BIGINT NOT NULL);
        |CREATE TABLE U21 (k2 VARCHAR NOT NULL, g2 BIGINT NOT NULL);
        |CREATE VIEW MIN21 AS SELECT k, g, v FROM S21 WHERE (k, g) IN (SELECT k2, g2 FROM U21);
        |CREATE VIEW MNIN21 AS SELECT k, g, v FROM S21 WHERE (k, g) NOT IN (SELECT k2, g2 FROM U21)""".stripMargin)
    val s = StructType(Seq(StructField("k", StringType),
      StructField("g", LongType), StructField("v", LongType)))
    val u = StructType(Seq(StructField("k2", StringType), StructField("g2", LongType)))
    val step1 = Map(
      "S21" -> z(s, Seq("a", 1L, 10L, 1L), Seq("a", 2L, 20L, 1L), Seq("b", 1L, 30L, 1L)),
      "U21" -> z(u, Seq("a", 1L, 1L), Seq("b", 2L, 1L)))
    val step2 = Map("U21" -> z(u, Seq("a", 1L, -1L), Seq("b", 1L, 1L)))
    val rIn = e.incrementalRunner("MIN21")
    rIn.step(step1); rIn.step(step2)
    assert(canon(ZSet.consolidate(rIn.output)) === canon(rIn.recompute))
    assert(ZSet.toRows(ZSet.consolidate(rIn.output)).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet === Set(("b", 1L)))
    val rNin = e.incrementalRunner("MNIN21")
    rNin.step(step1); rNin.step(step2)
    assert(canon(ZSet.consolidate(rNin.output)) === canon(rNin.recompute))
    assert(ZSet.toRows(ZSet.consolidate(rNin.output)).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet === Set(("a", 1L), ("a", 2L)))
  }

  test("correlated scalar subqueries decorrelate to grouped joins with empty defaults") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S20 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE TABLE U20 (k VARCHAR NOT NULL, w BIGINT NOT NULL);
        |CREATE VIEW CORR AS
        |  SELECT k, v, (SELECT COUNT(*) FROM U20 u WHERE u.k = s.k) AS n_match
        |  FROM S20 s""".stripMargin)
    val s = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val u = StructType(Seq(StructField("k", StringType), StructField("w", LongType)))
    val r = e.incrementalRunner("CORR")
    r.step(Map(
      "S20" -> z(s, Seq("a", 1L, 1L), Seq("b", 2L, 1L), Seq("c", 3L, 1L)),
      "U20" -> z(u, Seq("a", 10L, 2L), Seq("b", 20L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val m1 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    // c has NO matching group: COUNT over empty = 0, not a dropped row
    assert(m1 === Map("a" -> 2L, "b" -> 1L, "c" -> 0L))
    // retract b's only match: its count flips to the empty default
    r.step(Map("U20" -> z(u, Seq("b", 20L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val m2 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(m2 === Map("a" -> 2L, "b" -> 0L, "c" -> 0L))
  }

  test("WITH ... CTE views inline and maintain incrementally") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S18 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW CTEV AS
        |  WITH big AS (SELECT k, v FROM S18 WHERE v > 10),
        |       agg AS (SELECT k, COUNT(*) AS n FROM big GROUP BY k)
        |  SELECT k, n FROM agg WHERE n >= 2""".stripMargin)
    val s = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val r = e.incrementalRunner("CTEV")
    r.step(Map("S18" -> z(s,
      Seq("a", 20L, 1L), Seq("a", 30L, 1L), Seq("b", 40L, 1L), Seq("a", 5L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet === Set(("a", 2L)))
    // retraction drops a below the HAVING-like threshold
    r.step(Map("S18" -> z(s, Seq("a", 30L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(ZSet.toRows(ZSet.consolidate(r.output)).count() === 0L)
  }

  test("GROUPING() marker functions flow through incremental ROLLUP") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S17 (r VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW RG AS
        |  SELECT r, GROUPING(r) AS is_total, COUNT(*) AS n
        |  FROM S17 GROUP BY ROLLUP(r)""".stripMargin)
    val s = StructType(Seq(StructField("r", StringType), StructField("v", LongType)))
    val run = e.incrementalRunner("RG")
    run.step(Map("S17" -> z(s, Seq("w", 1L, 1L), Seq("e", 2L, 2L))))
    assert(canon(ZSet.consolidate(run.output)) === canon(run.recompute))
    val rows = ZSet.toRows(ZSet.consolidate(run.output)).collect()
      .map(x => (Option(x.getString(0)), x.getByte(1), x.getLong(2))).toSet
    assert(rows === Set(
      (Some("w"), 0.toByte, 1L), (Some("e"), 0.toByte, 2L), (None, 1.toByte, 3L)))
  }

  test("window with computed PARTITION BY expression maintains incrementally") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S16 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW WEXPR AS
        |  SELECT k, v, SUM(v) OVER (PARTITION BY v % 2 ORDER BY v, k) AS run
        |  FROM S16""".stripMargin)
    val s = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val r = e.incrementalRunner("WEXPR")
    r.step(Map("S16" -> z(s,
      Seq("a", 1L, 1L), Seq("b", 2L, 1L), Seq("c", 3L, 1L), Seq("d", 4L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val m1 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(m1 === Map("a" -> 1L, "c" -> 4L, "b" -> 2L, "d" -> 6L)) // odd/even partitions
    // retract 1: odd partition reshapes; even untouched
    val d2 = r.step(Map("S16" -> z(s, Seq("a", 1L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val touchedParity = ZSet.consolidate(d2).select(org.apache.spark.sql.functions.col("v") % 2).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(touchedParity === Set(1L))
  }

  test("UNNEST view (Generate is linear) maintains incrementally") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S15 (k VARCHAR NOT NULL, xs BIGINT ARRAY NOT NULL);
        |CREATE VIEW UN AS SELECT k, x FROM S15 LATERAL VIEW explode(xs) t AS x;
        |CREATE VIEW UNAGG AS SELECT k, SUM(x) AS total
        |  FROM S15 LATERAL VIEW explode(xs) t AS x GROUP BY k""".stripMargin)
    val s = StructType(Seq(StructField("k", StringType),
      StructField("xs", ArrayType(LongType))))
    val r = e.incrementalRunner("UN")
    r.step(Map("S15" -> z(s, Seq("a", Seq(1L, 2L), 1L), Seq("b", Seq(7L), 2L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val rows = ZSet.consolidate(r.output).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(rows === Set(("a", 1L, 1L), ("a", 2L, 1L), ("b", 7L, 2L)))
    // retraction of a source row retracts every generated row
    r.step(Map("S15" -> z(s, Seq("a", Seq(1L, 2L), -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(ZSet.consolidate(r.output).collect()
      .map(x => x.getString(0)).toSet === Set("b"))

    val ra = e.incrementalRunner("UNAGG")
    ra.step(Map("S15" -> z(s, Seq("a", Seq(1L, 2L), 1L), Seq("b", Seq(7L), 2L))))
    ra.step(Map("S15" -> z(s, Seq("b", Seq(7L), -1L), Seq("a", Seq(10L), 1L))))
    assert(canon(ZSet.consolidate(ra.output)) === canon(ra.recompute))
    val totals = ZSet.toRows(ZSet.consolidate(ra.output)).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(totals === Map("a" -> 13L, "b" -> 7L))
  }

  test("ROLLUP view (Expand is linear) maintains incrementally") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S14 (r VARCHAR NOT NULL, i VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW RU AS
        |  SELECT r, i, COUNT(*) AS n, SUM(v) AS total
        |  FROM S14 GROUP BY ROLLUP(r, i)""".stripMargin)
    val s = StructType(Seq(StructField("r", StringType),
      StructField("i", StringType), StructField("v", LongType)))
    val runner = e.incrementalRunner("RU")
    runner.step(Map("S14" -> z(s,
      Seq("west", "a", 10L, 1L), Seq("west", "b", 20L, 1L), Seq("east", "a", 5L, 1L))))
    assert(canon(ZSet.consolidate(runner.output)) === canon(runner.recompute))
    val m1 = ZSet.toRows(ZSet.consolidate(runner.output)).collect()
      .map(x => (Option(x.getString(0)), Option(x.getString(1))) ->
        (x.getLong(2), x.getLong(3))).toMap
    assert(m1(Some("west") -> None) === (2L, 30L))       // west subtotal
    assert(m1(None -> None) === (3L, 35L))               // grand total
    // retraction must ripple through every rollup level
    runner.step(Map("S14" -> z(s, Seq("west", "b", 20L, -1L))))
    assert(canon(ZSet.consolidate(runner.output)) === canon(runner.recompute))
    val m2 = ZSet.toRows(ZSet.consolidate(runner.output)).collect()
      .map(x => (Option(x.getString(0)), Option(x.getString(1))) ->
        (x.getLong(2), x.getLong(3))).toMap
    assert(m2(Some("west") -> None) === (1L, 10L))
    assert(m2(None -> None) === (2L, 15L))
    assert(!m2.contains(Some("west") -> Some("b")))      // emptied group gone
  }

  test("EXISTS / IN / NOT IN view predicates lower to semi/anti circuits") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE T13 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE TABLE U13 (k VARCHAR NOT NULL, w BIGINT NOT NULL);
        |CREATE VIEW EX13 AS SELECT k, v FROM T13 t
        |  WHERE EXISTS (SELECT 1 FROM U13 u WHERE u.k = t.k AND u.w > 5);
        |CREATE VIEW IN13 AS SELECT k, v FROM T13 WHERE k IN (SELECT k FROM U13);
        |CREATE VIEW NIN13 AS SELECT k, v FROM T13 WHERE k NOT IN (SELECT k FROM U13)""".stripMargin)
    val t = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val u = StructType(Seq(StructField("k", StringType), StructField("w", LongType)))
    val step1 = Map(
      "T13" -> z(t, Seq("a", 1L, 1L), Seq("b", 2L, 1L), Seq("c", 3L, 1L)),
      "U13" -> z(u, Seq("a", 10L, 1L), Seq("b", 2L, 1L)))
    val step2 = Map( // retract a's qualifying row; add one for c
      "U13" -> z(u, Seq("a", 10L, -1L), Seq("c", 9L, 1L)))

    val rEx = e.incrementalRunner("EX13")
    rEx.step(step1)
    assert(canon(ZSet.consolidate(rEx.output)) === canon(rEx.recompute))
    assert(ZSet.toRows(ZSet.consolidate(rEx.output)).collect()
      .map(_.getString(0)).toSet === Set("a")) // b's match fails w > 5
    rEx.step(step2)
    assert(canon(ZSet.consolidate(rEx.output)) === canon(rEx.recompute))
    assert(ZSet.toRows(ZSet.consolidate(rEx.output)).collect()
      .map(_.getString(0)).toSet === Set("c"))

    val rIn = e.incrementalRunner("IN13")
    rIn.step(step1); rIn.step(step2)
    assert(canon(ZSet.consolidate(rIn.output)) === canon(rIn.recompute))
    assert(ZSet.toRows(ZSet.consolidate(rIn.output)).collect()
      .map(_.getString(0)).toSet === Set("b", "c"))

    val rNin = e.incrementalRunner("NIN13")
    rNin.step(step1); rNin.step(step2)
    assert(canon(ZSet.consolidate(rNin.output)) === canon(rNin.recompute))
    assert(ZSet.toRows(ZSet.consolidate(rNin.output)).collect()
      .map(_.getString(0)).toSet === Set("a"))
  }

  test("computed grouping keys (GROUP BY expr) maintain incrementally") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S12 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW BYMOD AS
        |  SELECT v % 3 AS grp, COUNT(*) AS n, SUM(v) AS total
        |  FROM S12 GROUP BY v % 3""".stripMargin)
    val s = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val r = e.incrementalRunner("BYMOD")
    r.step(Map("S12" -> z(s,
      Seq("a", 3L, 1L), Seq("b", 4L, 1L), Seq("c", 6L, 1L), Seq("d", 7L, 2L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val m1 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(m1 === Map(0L -> (2L, 9L), 1L -> (3L, 18L)))
    // retraction moves group 1's totals; group 0 untouched
    r.step(Map("S12" -> z(s, Seq("d", 7L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val m2 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(m2 === Map(0L -> (2L, 9L), 1L -> (2L, 11L)))
  }

  test("global window (no PARTITION BY) and INTERSECT ALL views maintain") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S10 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE TABLE S11 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW GW AS SELECT k, v, SUM(v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM S10;
        |CREATE VIEW IA AS SELECT k, v FROM S10 INTERSECT ALL SELECT k, v FROM S11""".stripMargin)
    val s = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val rw = e.incrementalRunner("GW")
    rw.step(Map("S10" -> z(s, Seq("a", 1L, 1L), Seq("b", 2L, 1L), Seq("c", 5L, 1L))))
    assert(canon(ZSet.consolidate(rw.output)) === canon(rw.recompute))
    rw.step(Map("S10" -> z(s, Seq("b", 2L, -1L), Seq("d", 3L, 1L))))
    assert(canon(ZSet.consolidate(rw.output)) === canon(rw.recompute))
    val runs = ZSet.toRows(ZSet.consolidate(rw.output)).collect()
      .map(x => (x.getString(0), x.getLong(2))).toMap
    assert(runs === Map("a" -> 1L, "d" -> 4L, "c" -> 9L))

    val ri = e.incrementalRunner("IA")
    ri.step(Map(
      "S10" -> z(s, Seq("x", 1L, 2L), Seq("y", 2L, 1L)),
      "S11" -> z(s, Seq("x", 1L, 1L), Seq("z", 3L, 1L))))
    assert(canon(ZSet.consolidate(ri.output)) === canon(ri.recompute))
    // min(2,1)=1 copy of x survives; y/z don't intersect
    val rows = ZSet.consolidate(ri.output).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(rows === Set(("x", 1L, 1L)))
    // raising S11's x multiplicity to 3 lifts the intersection to min(2,3)=2
    ri.step(Map("S11" -> z(s, Seq("x", 1L, 2L))))
    assert(canon(ZSet.consolidate(ri.output)) === canon(ri.recompute))
    val rows2 = ZSet.consolidate(ri.output).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(rows2 === Set(("x", 1L, 2L)))
  }

  test("ORDER BY ... LIMIT view maintains the top-k under retractions") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE S9 (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW TOP2 AS SELECT k, v FROM S9 ORDER BY v DESC, k LIMIT 2""".stripMargin)
    val s9 = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val r = e.incrementalRunner("TOP2")
    r.step(Map("S9" -> z(s9,
      Seq("a", 10L, 1L), Seq("b", 20L, 1L), Seq("c", 30L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val top1 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    assert(top1 === Set(("c", 30L), ("b", 20L)))
    // retracting the current max must promote a back into the top-2
    r.step(Map("S9" -> z(s9, Seq("c", 30L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    val top2 = ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    assert(top2 === Set(("b", 20L), ("a", 10L)))
  }

  test("outer joins with residual ON predicates pad 'unmatched after residual'") {
    // the reference composes join+filter graphs for outer joins with
    // non-equi ON conjuncts (CalciteToDBSPCompiler.java:665-747); the pad
    // must cover rows whose key matches but whose residual fails — and a
    // NULL-valued row must not be double-padded (null-safe value matching)
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE LO (k VARCHAR NOT NULL, v BIGINT NULL);
        |CREATE TABLE RO (k VARCHAR NOT NULL, w BIGINT NOT NULL);
        |CREATE VIEW LJR AS
        |  SELECT LO.k AS k, v, w FROM LO LEFT JOIN RO ON LO.k = RO.k AND LO.v > RO.w;
        |CREATE VIEW FJR AS
        |  SELECT v, w FROM LO FULL JOIN RO ON LO.k = RO.k AND LO.v > RO.w""".stripMargin)
    val lo = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val ro = StructType(Seq(StructField("k", StringType), StructField("w", LongType)))
    val steps = Seq(
      Map( // a: 10 > 5 matches; b: 1 > 5 fails residual → padded;
           // NULL v row: residual UNKNOWN → padded; c: no key match
        "LO" -> z(lo, Seq("a", 10L, 1L), Seq("b", 1L, 1L), Seq("b", null, 1L),
          Seq("c", 7L, 1L)),
        "RO" -> z(ro, Seq("a", 5L, 1L), Seq("b", 5L, 1L), Seq("d", 9L, 1L))),
      Map( // retract a's partner → a flips matched → padded
        "RO" -> z(ro, Seq("a", 5L, -1L), Seq("b", 0L, 1L))),
      Map( // retract b's failing row; duplicate the NULL row (weight 2)
        "LO" -> z(lo, Seq("b", 1L, -1L), Seq("b", null, 1L))))
    for (view <- Seq("LJR", "FJR")) {
      val r = e.incrementalRunner(view)
      steps.foreach(r.step)
      assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute),
        s"$view: inc != recompute")
    }
    // independent check against Spark SQL over the net final contents
    import spark.implicits._
    Seq(("a", Option(10L)), ("c", Some(7L)), ("b", None), ("b", None))
      .toDF("k", "v").createOrReplaceTempView("LO_F")
    Seq(("b", 5L), ("d", 9L), ("b", 0L)).toDF("k", "w")
      .createOrReplaceTempView("RO_F")
    val r2 = e.incrementalRunner("LJR")
    steps.foreach(r2.step)
    val want = spark.sql(
      "SELECT LO_F.k, v, w FROM LO_F LEFT JOIN RO_F ON LO_F.k = RO_F.k AND v > w")
    assert(canon(ZSet.toRows(ZSet.consolidate(r2.output))) === canon(want))
  }

  test("NOT IN over nullable columns takes the null-aware 3VL circuit") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE OT (x BIGINT NULL, tag VARCHAR NOT NULL);
        |CREATE TABLE IT (y BIGINT NULL);
        |CREATE VIEW NNI AS SELECT tag FROM OT WHERE x NOT IN (SELECT y FROM IT)""".stripMargin)
    val ot = StructType(Seq(StructField("x", LongType), StructField("tag", StringType)))
    val it = StructType(Seq(StructField("y", LongType)))
    val r = e.incrementalRunner("NNI")
    def passed: Set[String] = ZSet.toRows(ZSet.consolidate(r.output))
      .collect().map(_.getString(0)).toSet
    // empty subquery: every row passes, NULL probe included
    r.step(Map("OT" -> z(ot, Seq(1L, "a", 1L), Seq(null, "b", 1L), Seq(3L, "c", 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("a", "b", "c"))
    // 1 ∈ subquery: a matches → false; b NULL probe → UNKNOWN; c passes
    r.step(Map("IT" -> z(it, Seq(1L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("c"))
    // a NULL enters the subquery: nothing passes (miss → UNKNOWN)
    r.step(Map("IT" -> z(it, Seq(null, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set.empty[String])
    // retract the NULL: back to c only — and Spark SQL agrees
    r.step(Map("IT" -> z(it, Seq(null, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    import spark.implicits._
    Seq((Option(1L), "a"), (None, "b"), (Some(3L), "c")).toDF("x", "tag")
      .createOrReplaceTempView("OT_F")
    Seq(Option(1L)).toDF("y").createOrReplaceTempView("IT_F")
    val want = spark.sql("SELECT tag FROM OT_F WHERE x NOT IN (SELECT y FROM IT_F)")
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want))
  }

  test("multi-column NOT IN over nullable columns takes the 3VL pattern circuit") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE MOT (p BIGINT NULL, q BIGINT NULL, tag VARCHAR NOT NULL);
        |CREATE TABLE MIT (x BIGINT NULL, y BIGINT NULL);
        |CREATE VIEW MNN AS SELECT tag FROM MOT
        |  WHERE (p, q) NOT IN (SELECT x, y FROM MIT)""".stripMargin)
    val ot = StructType(Seq(StructField("p", LongType),
      StructField("q", LongType), StructField("tag", StringType)))
    val it = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    val r = e.incrementalRunner("MNN")
    assert(graft.engine.SqlIncremental.lastNotInStrategy
      .contains("static-mask"))
    def passed: Set[String] = ZSet.toRows(ZSet.consolidate(r.output))
      .collect().map(_.getString(0)).toSet
    // empty subquery: everything passes, NULL probes included
    r.step(Map("MOT" -> z(ot,
      Seq(1L, 1L, "a", 1L),    // exact match later
      Seq(1L, 2L, "b", 1L),    // differs on q from (1,1); vs (2,NULL) differs on p
      Seq(null, 2L, "c", 1L),  // NULL p
      Seq(3L, null, "d", 1L),  // NULL q
      Seq(null, null, "e", 1L) // both NULL
    )))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("a", "b", "c", "d", "e"))
    // (1,1): kills a (exact); e (all-UNKNOWN); others differ definitely
    r.step(Map("MIT" -> z(it, Seq(1L, 1L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("b", "c", "d"))
    // (2,NULL): kills c (p UNKNOWN, q=2 vs NULL UNKNOWN)? c is (NULL,2):
    // p: NULL vs 2 → UNKNOWN, q: 2 vs NULL → UNKNOWN → blocked. b=(1,2):
    // p 1≠2 definite → survives. d=(3,NULL): p 3≠2 definite → survives.
    r.step(Map("MIT" -> z(it, Seq(2L, null, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("b", "d"))
    // (NULL,9): q 2≠9 and NULL≠9... d=(3,NULL): p UNKNOWN, q UNKNOWN →
    // blocked; b=(1,2): q 2≠9 definite → survives
    r.step(Map("MIT" -> z(it, Seq(null, 9L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("b"))
    // retract (2,NULL) and (NULL,9): back to b, c, d
    r.step(Map("MIT" -> z(it, Seq(2L, null, -1L), Seq(null, 9L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("b", "c", "d"))
    // Spark SQL (itself null-aware for NOT IN) agrees on the net state
    import spark.implicits._
    Seq((Option(1L), Option(1L), "a"), (Some(1L), Some(2L), "b"),
      (Option.empty[Long], Some(2L), "c"), (Some(3L), Option.empty[Long], "d"),
      (Option.empty[Long], Option.empty[Long], "e"))
      .toDF("p", "q", "tag").createOrReplaceTempView("MOT_F")
    Seq((Option(1L), Option(1L))).toDF("x", "y").createOrReplaceTempView("MIT_F")
    val want = spark.sql(
      "SELECT tag FROM MOT_F WHERE (p, q) NOT IN (SELECT x, y FROM MIT_F)")
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want))
  }

  test("COMPUTED probes in [NOT] IN lower via helper projections and step correctly") {
    // the probe side is (p+1, q%4) — expressions, not columns — so the
    // lowering projects __inp helpers and routes through the same
    // null-aware mask circuit; waves must track Spark's own NOT IN
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE CP (p BIGINT NULL, q BIGINT NULL, tag VARCHAR NOT NULL);
        |CREATE TABLE CI (x BIGINT NULL, y BIGINT NULL);
        |CREATE VIEW CPN AS SELECT tag FROM CP
        |  WHERE (p + 1, q % 4) NOT IN (SELECT x, y FROM CI);
        |CREATE VIEW CPS AS SELECT tag FROM CP
        |  WHERE p + 1 IN (SELECT x FROM CI)""".stripMargin)
    val pt = StructType(Seq(StructField("p", LongType),
      StructField("q", LongType), StructField("tag", StringType)))
    val it = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    val r = e.incrementalRunner(Seq("CPN", "CPS"))
    def outOf(v: String): Set[String] = ZSet.toRows(ZSet.consolidate(r.output(v)))
      .collect().map(_.getString(0)).toSet
    r.stepAll(Map("CP" -> z(pt,
      Seq(1L, 2L, "a", 1L),    // probe (2, 2)
      Seq(2L, 6L, "b", 1L),    // probe (3, 2)
      Seq(null, 2L, "c", 1L),  // probe (NULL, 2)
      Seq(3L, null, "d", 1L)   // probe (4, NULL)
    )))
    assert(outOf("CPN") === Set("a", "b", "c", "d")) // empty subquery
    assert(outOf("CPS") === Set.empty)
    r.stepAll(Map("CI" -> z(it, Seq(2L, 2L, 1L))))  // kills a; c UNKNOWN
    assert(outOf("CPN") === Set("b", "d"))
    assert(outOf("CPS") === Set("a"))
    r.stepAll(Map("CI" -> z(it, Seq(2L, 2L, -1L), Seq(3L, null, 1L))))
    // (3,NULL): b=(3,2) p-part exact, q-part UNKNOWN → blocked;
    // c=(NULL,2) UNKNOWN on both parts → blocked; a and d differ
    // definitely on the p part → survive
    assert(outOf("CPN") === Set("a", "d"))
    assert(outOf("CPS") === Set("b"))
    // Spark SQL agreement on the net state, both views
    import spark.implicits._
    Seq((Option(1L), Option(2L), "a"), (Some(2L), Some(6L), "b"),
      (Option.empty[Long], Some(2L), "c"), (Some(3L), Option.empty[Long], "d"))
      .toDF("p", "q", "tag").createOrReplaceTempView("CP_F")
    Seq((Option(3L), Option.empty[Long])).toDF("x", "y")
      .createOrReplaceTempView("CI_F")
    val wantN = spark.sql("SELECT tag FROM CP_F " +
      "WHERE (p + 1, q % 4) NOT IN (SELECT x, y FROM CI_F)")
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output("CPN")))) === canon(wantN))
    val wantS = spark.sql(
      "SELECT tag FROM CP_F WHERE p + 1 IN (SELECT x FROM CI_F)")
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output("CPS")))) === canon(wantS))
  }

  test("NOT IN over 5 nullable columns takes the pattern-grouped mask circuit") {
    // beyond the ≤3-per-side static 2^k enumeration: masks come from the
    // OTHER side's distinct present NULL patterns (a unit-key bilinear
    // join), so 5 nullable columns cost #patterns-in-data fan-out, not 32
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE P5 (a BIGINT NULL, b BIGINT NULL, c BIGINT NULL, d BIGINT NULL, f BIGINT NULL, tag VARCHAR NOT NULL);
        |CREATE TABLE S5 (v BIGINT NULL, w BIGINT NULL, x BIGINT NULL, y BIGINT NULL, z BIGINT NULL);
        |CREATE VIEW N5 AS SELECT tag FROM P5
        |  WHERE (a, b, c, d, f) NOT IN (SELECT v, w, x, y, z FROM S5)""".stripMargin)
    val pt = StructType(Seq(StructField("a", LongType), StructField("b", LongType),
      StructField("c", LongType), StructField("d", LongType),
      StructField("f", LongType), StructField("tag", StringType)))
    val st = StructType(Seq(StructField("v", LongType), StructField("w", LongType),
      StructField("x", LongType), StructField("y", LongType),
      StructField("z", LongType)))
    val r = e.incrementalRunner("N5")
    assert(graft.engine.SqlIncremental.lastNotInStrategy
      .contains("pattern-grouped"))
    def passed: Set[String] = ZSet.toRows(ZSet.consolidate(r.output))
      .collect().map(_.getString(0)).toSet
    // empty subquery: everything passes, NULL probes included
    r.step(Map("P5" -> z(pt,
      Seq(1L, 2L, 3L, 4L, 5L, "t1", 1L),
      Seq(1L, 2L, 3L, 4L, 6L, "t2", 1L),
      Seq(null, 2L, 3L, 4L, 5L, "t3", 1L),
      Seq(1L, null, null, 4L, 5L, "t4", 1L),
      Seq(null, null, null, null, null, "t5", 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("t1", "t2", "t3", "t4", "t5"))
    // (1,2,3,4,5): exact-kills t1; t3/t4/t5 have no definite difference
    // (their non-NULL columns all agree) → blocked; t2 differs on f
    r.step(Map("S5" -> z(st, Seq(1L, 2L, 3L, 4L, 5L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("t2"))
    // a NEW subquery NULL pattern arrives: (NULL,NULL,NULL,NULL,6) agrees
    // with t2 on the only mutually non-NULL column (f=6) → t2 blocked;
    // the pattern-grouped probe expansion must re-derive against the new
    // pattern delta
    r.step(Map("S5" -> z(st, Seq(null, null, null, null, 6L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set.empty[String])
    // retract the all-but-z-NULL row: its pattern leaves with it, t2 back
    r.step(Map("S5" -> z(st, Seq(null, null, null, null, 6L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("t2"))
    // Spark SQL (itself null-aware for NOT IN) agrees on the net state
    import spark.implicits._
    Seq((Some(1L), Some(2L), Some(3L), Some(4L), Some(5L), "t1"),
      (Some(1L), Some(2L), Some(3L), Some(4L), Some(6L), "t2"),
      (Option.empty[Long], Some(2L), Some(3L), Some(4L), Some(5L), "t3"),
      (Some(1L), Option.empty[Long], Option.empty[Long], Some(4L), Some(5L), "t4"),
      (Option.empty[Long], Option.empty[Long], Option.empty[Long],
        Option.empty[Long], Option.empty[Long], "t5"))
      .toDF("a", "b", "c", "d", "f", "tag").createOrReplaceTempView("P5_F")
    Seq((Some(1L), Some(2L), Some(3L), Some(4L), Some(5L)))
      .toDF("v", "w", "x", "y", "z").createOrReplaceTempView("S5_F")
    val want = spark.sql(
      """SELECT tag FROM P5_F
        |WHERE (a, b, c, d, f) NOT IN (SELECT v, w, x, y, z FROM S5_F)""".stripMargin)
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want))
  }

  test("uncorrelated EXISTS gates on a maintained global count (empty→nonempty→empty)") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE XT (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE TABLE WT (w BIGINT NOT NULL);
        |CREATE VIEW XV AS SELECT k, v FROM XT
        |  WHERE EXISTS (SELECT 1 FROM WT WHERE w > 5);
        |CREATE VIEW NXV AS SELECT k, v FROM XT
        |  WHERE NOT EXISTS (SELECT 1 FROM WT WHERE w > 5)""".stripMargin)
    val xt = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val wt = StructType(Seq(StructField("w", LongType)))
    val r = e.incrementalRunner("XV")
    val rn = e.incrementalRunner("NXV")
    def out(rr: Runner): Set[String] = ZSet.toRows(ZSet.consolidate(rr.output))
      .collect().map(_.getString(0)).toSet
    val s1 = Map("XT" -> z(xt, Seq("a", 1L, 1L), Seq("b", 2L, 1L)),
      "WT" -> z(wt, Seq(3L, 1L))) // witness below threshold: still empty
    val s2 = Map("WT" -> z(wt, Seq(7L, 1L)))  // gate opens
    val s3 = Map("WT" -> z(wt, Seq(7L, -1L))) // gate closes again
    Seq(s1, s2, s3).foreach { st => r.step(st); rn.step(st) }
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(canon(ZSet.consolidate(rn.output)) === canon(rn.recompute))
    assert(out(r) === Set.empty[String])
    assert(out(rn) === Set("a", "b"))
    // reopen: both flip
    r.step(Map("WT" -> z(wt, Seq(9L, 1L))))
    rn.step(Map("WT" -> z(wt, Seq(9L, 1L))))
    assert(out(r) === Set("a", "b"))
    assert(out(rn) === Set.empty[String])
  }

  test("unit-key cross join and pure-theta join maintain through retractions") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE CFACT (fk VARCHAR NOT NULL, fv BIGINT NOT NULL);
        |CREATE TABLE CDIM (dk VARCHAR NOT NULL, lim BIGINT NOT NULL);
        |CREATE VIEW CPROD AS SELECT fk, fv, dk, lim FROM CFACT CROSS JOIN CDIM;
        |CREATE VIEW CTHETA AS
        |  SELECT fk, fv, dk FROM CFACT JOIN CDIM ON fv > lim""".stripMargin)
    val fact = StructType(Seq(StructField("fk", StringType), StructField("fv", LongType)))
    val dim = StructType(Seq(StructField("dk", StringType), StructField("lim", LongType)))
    val steps = Seq(
      Map("CFACT" -> z(fact, Seq("a", 5L, 1L), Seq("b", 20L, 2L)),
        "CDIM" -> z(dim, Seq("x", 10L, 1L))),
      Map("CDIM" -> z(dim, Seq("y", 3L, 1L))),   // new dim row: joins all facts
      Map("CFACT" -> z(fact, Seq("b", 20L, -1L)), // drop one copy of b
        "CDIM" -> z(dim, Seq("x", 10L, -1L))))   // dim retraction drops a slice
    for (view <- Seq("CPROD", "CTHETA")) {
      val r = e.incrementalRunner(view)
      steps.foreach(r.step)
      assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute),
        s"$view: inc != recompute")
    }
    // final CTHETA state against plain SQL on the net rows
    import spark.implicits._
    Seq(("a", 5L), ("b", 20L)).toDF("fk", "fv").createOrReplaceTempView("CFACT_F")
    Seq(("y", 3L)).toDF("dk", "lim").createOrReplaceTempView("CDIM_F")
    val r2 = e.incrementalRunner("CTHETA")
    steps.foreach(r2.step)
    val want = spark.sql(
      "SELECT fk, fv, dk FROM CFACT_F JOIN CDIM_F ON fv > lim")
    assert(canon(ZSet.toRows(ZSet.consolidate(r2.output))) === canon(want))
  }

  test("pure-inequality EXISTS (BETWEEN shape) lowers to the binned range circuit") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE RIV (iv BIGINT NOT NULL);
        |CREATE TABLE ROT (ok VARCHAR NOT NULL, lo BIGINT NOT NULL, hi BIGINT NOT NULL);
        |CREATE VIEW RHIT AS SELECT ok, lo, hi FROM ROT
        |  WHERE EXISTS (SELECT 1 FROM RIV WHERE iv >= lo AND iv <= hi);
        |CREATE VIEW RMISS AS SELECT ok, lo, hi FROM ROT
        |  WHERE NOT EXISTS (SELECT 1 FROM RIV WHERE iv >= lo AND iv <= hi)""".stripMargin)
    val iv = StructType(Seq(StructField("iv", LongType)))
    val ot = StructType(Seq(StructField("ok", StringType),
      StructField("lo", LongType), StructField("hi", LongType)))
    val steps = Seq(
      Map( // b's interval reversed (matches nothing), c's far away
        "ROT" -> z(ot, Seq("a", 10L, 20L, 1L), Seq("b", 30L, 25L, 1L),
          Seq("c", 1000L, 1010L, 1L)),
        "RIV" -> z(iv, Seq(15L, 1L), Seq(500L, 2L))),
      Map("RIV" -> z(iv, Seq(1005L, 1L))),   // c starts matching
      Map("RIV" -> z(iv, Seq(15L, -1L)),     // a stops matching...
        "ROT" -> z(ot, Seq("d", 490L, 510L, 1L)))) // new outer row matches 500
    for (view <- Seq("RHIT", "RMISS")) {
      val r = e.incrementalRunner(view)
      steps.foreach(r.step)
      assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute),
        s"$view: inc != recompute")
    }
    val r2 = e.incrementalRunner("RHIT")
    steps.foreach(r2.step)
    assert(ZSet.toRows(ZSet.consolidate(r2.output))
      .collect().map(_.getString(0)).sorted.toSeq === Seq("c", "d"))
    // inner churn on values no interval covers: physically empty delta
    // (the distinct value set gains a value binned away from every match,
    // and the replicated outer rows only join their own bins)
    val quiet = r2.step(Map("RIV" -> z(iv, Seq(5000L, 1L))))
    assert(quiet.count() === 0L)
    // single-bound correlation still throws the explanatory error
    val err = intercept[SqlIncremental.UnsupportedPlanException] {
      e.executeScript(
        """CREATE VIEW RBAD AS SELECT ok FROM ROT
          |  WHERE EXISTS (SELECT 1 FROM RIV WHERE iv >= lo)""".stripMargin)
      e.incrementalRunner("RBAD")
    }
    assert(err.getMessage.contains("BETWEEN shape"))
  }

  test("non-flip subquery churn emits a PHYSICALLY empty delta (regime-bit gate)") {
    // The r6 defect: a witness-count change that does NOT flip the verdict
    // used to retract/re-insert the counts row and re-emit O(outer) rows
    // through the constant-key join. The regime-bit gate + consolidated
    // Refold delta must make such steps emit ZERO physical rows.
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE GXT (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE TABLE GWT (w BIGINT NOT NULL);
        |CREATE VIEW GXV AS SELECT k, v FROM GXT
        |  WHERE EXISTS (SELECT 1 FROM GWT WHERE w > 5);
        |CREATE VIEW GNI AS SELECT k, v FROM GXT
        |  WHERE v NOT IN (SELECT w FROM GWT)""".stripMargin)
    val xt = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val wt = StructType(Seq(StructField("w", LongType)))

    // EXISTS: open the gate with two witnesses, then retract one — the
    // verdict (exists) is unchanged, so the output delta must be empty.
    val r = e.incrementalRunner("GXV")
    r.step(Map(
      "GXT" -> z(xt, Seq("a", 1L, 1L), Seq("b", 2L, 1L)),
      "GWT" -> z(wt, Seq(7L, 1L), Seq(9L, 1L))))
    val shrink = r.step(Map("GWT" -> z(wt, Seq(9L, -1L))))
    assert(shrink.count() === 0L,
      "witness-shrink step must emit a physically empty delta")
    // and adding a third witness is equally silent
    assert(r.step(Map("GWT" -> z(wt, Seq(11L, 1L)))).count() === 0L)
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))

    // NULL-aware NOT IN (single-column): adding a second copy of an
    // existing non-NULL witness changes counts but neither regime nor the
    // per-value verdicts — only the value-keyed anti join sees the delta
    // (restricted to the touched value, which no probe matches here).
    val rn = e.incrementalRunner("GNI")
    rn.step(Map(
      "GXT" -> z(xt, Seq("a", 1L, 1L), Seq("b", 2L, 1L)),
      "GWT" -> z(wt, Seq(50L, 1L))))
    val churn = rn.step(Map("GWT" -> z(wt, Seq(50L, 1L))))
    assert(churn.count() === 0L,
      "count-only NOT IN churn must emit a physically empty delta")
    assert(canon(ZSet.consolidate(rn.output)) === canon(rn.recompute))
  }

  test("correlated EXISTS with an inequality residual (reference correlatedAggregate shape)") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE ORD (cust VARCHAR NOT NULL, total BIGINT NOT NULL);
        |CREATE TABLE LIM (cust VARCHAR NOT NULL, cap BIGINT NOT NULL);
        |CREATE VIEW OVERCAP AS
        |  SELECT cust, total FROM ORD o
        |  WHERE EXISTS (SELECT 1 FROM LIM l WHERE l.cust = o.cust AND l.cap < o.total);
        |CREATE VIEW UNDERCAP AS
        |  SELECT cust, total FROM ORD o
        |  WHERE NOT EXISTS (SELECT 1 FROM LIM l WHERE l.cust = o.cust AND l.cap < o.total)""".stripMargin)
    val ord = StructType(Seq(StructField("cust", StringType), StructField("total", LongType)))
    val lim = StructType(Seq(StructField("cust", StringType), StructField("cap", LongType)))
    val steps = Seq(
      Map( // a's 100 (×2 — multiplicity must survive the semi join) beats
           // cap 50; a's 30 doesn't; b has no cap row → NOT EXISTS keeps it
        "ORD" -> z(ord, Seq("a", 100L, 2L), Seq("a", 30L, 1L), Seq("b", 70L, 1L)),
        "LIM" -> z(lim, Seq("a", 50L, 1L))),
      Map( // b gets a cap under its total → flips views
        "LIM" -> z(lim, Seq("b", 60L, 1L))),
      Map( // retract a's cap → a's rows flip back; retract one 100-copy
        "ORD" -> z(ord, Seq("a", 100L, -1L)),
        "LIM" -> z(lim, Seq("a", 50L, -1L))))
    for (view <- Seq("OVERCAP", "UNDERCAP")) {
      val r = e.incrementalRunner(view)
      steps.foreach(r.step)
      assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute),
        s"$view: inc != recompute")
    }
    import spark.implicits._
    Seq(("a", 100L), ("a", 30L), ("b", 70L)).toDF("cust", "total")
      .createOrReplaceTempView("ORD_F")
    Seq(("b", 60L)).toDF("cust", "cap").createOrReplaceTempView("LIM_F")
    val r2 = e.incrementalRunner("OVERCAP")
    steps.foreach(r2.step)
    val want = spark.sql(
      """SELECT cust, total FROM ORD_F o
        |WHERE EXISTS (SELECT 1 FROM LIM_F l WHERE l.cust = o.cust AND l.cap < o.total)""".stripMargin)
    assert(canon(ZSet.toRows(ZSet.consolidate(r2.output))) === canon(want))
  }

  test("multi-sink runner: N views maintained over ONE set of input integrals") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE MS (k VARCHAR NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW MS_TOTALS AS SELECT k, SUM(v) AS total, COUNT(*) AS n FROM MS GROUP BY k;
        |CREATE VIEW MS_KEYS AS SELECT DISTINCT k FROM MS;
        |CREATE VIEW MS_BIG AS SELECT k, v FROM MS WHERE v > 10""".stripMargin)
    val ms = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val r = e.incrementalRunner(Seq("MS_TOTALS", "MS_KEYS", "MS_BIG"))
    val d1 = r.stepAll(Map("MS" -> z(ms,
      Seq("a", 5L, 1L), Seq("a", 20L, 1L), Seq("b", 7L, 1L))))
    assert(d1.keySet === Set("MS_TOTALS", "MS_KEYS", "MS_BIG"))
    val d2 = r.stepAll(Map("MS" -> z(ms, Seq("a", 20L, -1L), Seq("c", 30L, 1L))))
    // every sink maintained through the same steps, off shared integrals
    for (v <- Seq("MS_TOTALS", "MS_KEYS", "MS_BIG"))
      assert(canon(ZSet.consolidate(r.output(v))) === canon(r.recompute(v)),
        s"$v: inc != recompute")
    // a retracted to only v=5 → leaves MS_BIG; c entered
    val big = ZSet.toRows(ZSet.consolidate(r.output("MS_BIG"))).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    assert(big === Set(("c", 30L)))
    val keys = ZSet.toRows(ZSet.consolidate(r.output("MS_KEYS"))).collect()
      .map(_.getString(0)).toSet
    assert(keys === Set("a", "b", "c"))
    // quiet sink sees an empty delta, not a recomputation
    assert(ZSet.consolidate(d2("MS_KEYS"))
      .filter(org.apache.spark.sql.functions.col("k") === "b").count() === 0)
  }

  test("full snapshot through the delta path: TPC-H Q3 on a capped fixture") {
    // q128's bench entry bootstraps its snapshot (batch-priced, like
    // q130); the full-load-THROUGH-the-delta-path coverage it used to
    // carry lives here instead, on the sf0.001 fixture, so the compiled
    // circuit's cold-start correctness stays proven without a 30 s bulk
    // load in the bench.
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val c = graft.Tables.load(spark, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = graft.Tables.load(spark, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"), col("o_orderstatus"))
    val li = graft.Tables.load(spark, d, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        col("l_shipdate"), col("l_quantity"))
    assert(li.count() <= 50000L, "capped fixture: full-load coverage must stay cheap")
    c.limit(0).createOrReplaceTempView("CF3")
    o.limit(0).createOrReplaceTempView("OF3")
    li.limit(0).createOrReplaceTempView("LF3")
    def q3(ct: String, ot: String, lt: String) =
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
                 CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                   * 10000.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
                   AS revenue
          FROM $ct
          JOIN $ot ON c_custkey = o_custkey
          JOIN $lt ON o_orderkey = l_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1997-06-17'
            AND l_shipdate > TIMESTAMP '1997-06-17'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue DESC, l_orderkey LIMIT 10"""
    val circuit = SqlIncremental.compile(spark, q3("CF3", "OF3", "LF3"),
      Set("CF3", "OF3", "LF3"))
    val r = new Runner(spark, circuit,
      Map("CF3" -> c.limit(0), "OF3" -> o.limit(0), "LF3" -> li.limit(0)))
    // the ENTIRE snapshot as one wave of deltas — no bootstrap
    r.step(Map("CF3" -> ZSet.fromRows(c), "OF3" -> ZSet.fromRows(o),
      "LF3" -> ZSet.fromRows(li)))
    c.createOrReplaceTempView("CB3")
    o.createOrReplaceTempView("OB3")
    li.createOrReplaceTempView("LB3")
    val want = spark.sql(q3("CB3", "OB3", "LB3"))
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want))
    // and a follow-up retraction over the delta-loaded state still tracks
    r.step(Map("OF3" -> ZSet.negate(ZSet.fromRows(
      o.filter(col("o_orderstatus") === "F")))))
    o.filter(col("o_orderstatus") =!= "F").createOrReplaceTempView("OB3")
    val want2 = spark.sql(q3("CB3", "OB3", "LB3"))
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want2))
  }

  test("LATERAL joins decorrelate to maintained circuits (incl. aggregates)") {
    // Spark's PullupCorrelatedPredicates + RewriteLateralSubquery run on
    // the LateralJoin subtree; the result is plain Join/Aggregate nodes,
    // so incrementality is inherited. Two shapes: a correlated-filter
    // lateral (inequality correlation) and a LEFT JOIN LATERAL aggregate
    // (count over the per-row group, empty group → padded NULL).
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE LO (a BIGINT NOT NULL, t VARCHAR NOT NULL);
        |CREATE TABLE LI (a BIGINT NOT NULL, b BIGINT NOT NULL);
        |CREATE VIEW LTV AS SELECT o.a, o.t, y.yb
        |  FROM LO o, LATERAL (SELECT LI.b AS yb FROM LI WHERE LI.a < o.a) y;
        |CREATE VIEW LAV AS SELECT o.a, o.t, y.s
        |  FROM LO o LEFT JOIN LATERAL
        |    (SELECT count(*) AS s FROM LI WHERE LI.a = o.a) y ON true""".stripMargin)
    val lo = StructType(Seq(StructField("a", LongType), StructField("t", StringType)))
    val li = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
    val r = e.incrementalRunner(Seq("LTV", "LAV"))
    def check(): Unit = for (vn <- Seq("LTV", "LAV"))
      assert(canon(ZSet.consolidate(r.output(vn))) === canon(r.recompute(vn)), vn)
    r.stepAll(Map(
      "LO" -> z(lo, Seq(1L, "p", 1L), Seq(3L, "q", 1L)),
      "LI" -> z(li, Seq(1L, 10L, 1L), Seq(2L, 20L, 1L), Seq(3L, 30L, 1L))))
    check()
    // inner rows arriving/retracting must ripple through the domain join
    r.stepAll(Map("LI" -> z(li, Seq(2L, 21L, 1L), Seq(1L, 10L, -1L))))
    check()
    // an outer row retraction removes its lateral group entirely
    r.stepAll(Map("LO" -> z(lo, Seq(3L, "q", -1L), Seq(5L, "r", 1L))))
    check()
    // Spark SQL agreement on the net state, both views
    import spark.implicits._
    Seq((1L, "p"), (5L, "r")).toDF("a", "t").createOrReplaceTempView("LO_F")
    Seq((2L, 20L), (3L, 30L), (2L, 21L)).toDF("a", "b")
      .createOrReplaceTempView("LI_F")
    val wantT = spark.sql("SELECT o.a, o.t, y.yb FROM LO_F o, " +
      "LATERAL (SELECT LI_F.b AS yb FROM LI_F WHERE LI_F.a < o.a) y")
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output("LTV")))) === canon(wantT))
    val wantA = spark.sql("SELECT o.a, o.t, y.s FROM LO_F o LEFT JOIN LATERAL " +
      "(SELECT count(*) AS s FROM LI_F WHERE LI_F.a = o.a) y ON true")
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output("LAV")))) === canon(wantA))
  }

  test("INTERSECT treats NULL rows as equal (min-circuit, not equi join)") {
    // SQL set semantics compare NULL = NULL inside INTERSECT/EXCEPT; the
    // lowering must not route rows through a NULL-dropping equi join
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE IA (k BIGINT NULL, v BIGINT NULL);
        |CREATE TABLE IB (k BIGINT NULL, v BIGINT NULL);
        |CREATE VIEW IXV AS SELECT k, v FROM IA INTERSECT SELECT k, v FROM IB""".stripMargin)
    val t = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    val r = e.incrementalRunner("IXV")
    def rows: Set[String] = ZSet.toRows(ZSet.consolidate(r.output))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    r.stepAll(Map(
      "IA" -> z(t, Seq(1L, 10L, 1L), Seq(null, 10L, 2L), Seq(null, null, 1L)),
      "IB" -> z(t, Seq(1L, 10L, 1L), Seq(null, 10L, 1L), Seq(2L, null, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(rows === Set("1|10", "null|10"))
    // (NULL,NULL) arriving on IB joins the intersection; retracting IA's
    // last (NULL,10) removes that row despite the remaining IB copy
    r.stepAll(Map(
      "IA" -> z(t, Seq(null, 10L, -2L)),
      "IB" -> z(t, Seq(null, null, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(rows === Set("1|10", "null|null"))
    // Spark SQL agreement on the net state
    import spark.implicits._
    Seq((Some(1L), Some(10L)), (Option.empty[Long], Option.empty[Long]))
      .toDF("k", "v").createOrReplaceTempView("IA_F")
    Seq((Some(1L), Some(10L)), (Option.empty[Long], Some(10L)),
      (Some(2L), Option.empty[Long]), (Option.empty[Long], Option.empty[Long]))
      .toDF("k", "v").createOrReplaceTempView("IB_F")
    val want = spark.sql("SELECT k, v FROM IA_F INTERSECT SELECT k, v FROM IB_F")
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want))
  }

  test("pure-theta OUTER joins pad through the unit-key circuit") {
    // no equi pair → unit-key bilinear join; LEFT/RIGHT/FULL pads must
    // union with the inner branch AFTER the internal __xk tag is
    // projected away (regression: the tagged inner and untagged pad
    // branches failed to line up)
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE TL (a BIGINT NOT NULL, t VARCHAR NOT NULL);
        |CREATE TABLE TR (k BIGINT NOT NULL, v VARCHAR NOT NULL);
        |CREATE VIEW TLJ AS SELECT a, t, k, v FROM TL LEFT JOIN TR ON k < a - 10;
        |CREATE VIEW TRJ AS SELECT a, t, k, v FROM TL RIGHT JOIN TR ON k < a - 10;
        |CREATE VIEW TFJ AS SELECT a, t, k, v FROM TL FULL JOIN TR ON k < a - 10""".stripMargin)
    val tl = StructType(Seq(StructField("a", LongType), StructField("t", StringType)))
    val tr = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val r = e.incrementalRunner(Seq("TLJ", "TRJ", "TFJ"))
    def check(): Unit = for (vn <- Seq("TLJ", "TRJ", "TFJ"))
      assert(canon(ZSet.consolidate(r.output(vn))) === canon(r.recompute(vn)), vn)
    r.stepAll(Map(
      "TL" -> z(tl, Seq(5L, "lo", 1L), Seq(20L, "hi", 1L)),
      "TR" -> z(tr, Seq(1L, "x", 1L), Seq(15L, "y", 1L))))
    check()
    // lo matches nothing (k < -5 empty) → padded in LEFT/FULL; y (k=15)
    // matches nothing (needs a > 25) → padded in RIGHT/FULL
    import spark.implicits._
    Seq((5L, "lo"), (20L, "hi")).toDF("a", "t").createOrReplaceTempView("TL_F")
    Seq((1L, "x"), (15L, "y")).toDF("k", "v").createOrReplaceTempView("TR_F")
    for ((vn, jt) <- Seq("TLJ" -> "LEFT", "TRJ" -> "RIGHT", "TFJ" -> "FULL")) {
      val want = spark.sql(
        s"SELECT a, t, k, v FROM TL_F $jt JOIN TR_F ON k < a - 10")
      assert(canon(ZSet.toRows(ZSet.consolidate(r.output(vn)))) === canon(want), vn)
    }
    // a retraction that removes hi's only match flips it to the padded row
    r.stepAll(Map("TR" -> z(tr, Seq(1L, "x", -1L))))
    check()
  }

  test("self-joins with clashing column names lower via the dedup pre-pass") {
    // `u JOIN w ON u.a = w.b` over the SAME table: every column name
    // exists on both sides. The pre-pass renames the right side's
    // colliding columns behind a projection and re-anchors the SELECT
    // list, so the name-addressed circuit stays unambiguous (previously
    // an UnsupportedPlanException asking the user to alias).
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE SJ (a BIGINT NOT NULL, b BIGINT NOT NULL, v VARCHAR NOT NULL);
        |CREATE VIEW SJV AS SELECT u.a AS ua, u.v AS uv, w.a AS wa, w.v AS wv
        |  FROM SJ u JOIN SJ w ON u.a = w.b""".stripMargin)
    val sj = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType), StructField("v", StringType)))
    val r = e.incrementalRunner("SJV")
    def rows: Set[String] = ZSet.toRows(ZSet.consolidate(r.output))
      .collect().map(_.toSeq.mkString("|")).toSet
    r.step(Map("SJ" -> z(sj,
      Seq(1L, 2L, "x", 1L),   // matches rows whose b = 1
      Seq(2L, 1L, "y", 1L),   // matches rows whose b = 2
      Seq(3L, 3L, "z", 1L)))) // self-match
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(rows === Set("1|x|2|y", "2|y|1|x", "3|z|3|z"))
    // retraction of one row removes both pairs it participates in
    r.step(Map("SJ" -> z(sj, Seq(2L, 1L, "y", -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(rows === Set("3|z|3|z"))
    // Spark SQL agreement on the net state
    import spark.implicits._
    Seq((1L, 2L, "x"), (3L, 3L, "z")).toDF("a", "b", "v")
      .createOrReplaceTempView("SJ_F")
    val want = spark.sql("SELECT u.a AS ua, u.v AS uv, w.a AS wa, w.v AS wv " +
      "FROM SJ_F u JOIN SJ_F w ON u.a = w.b")
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want))
  }

  test("outer join reading the inner side's same-named key NULL-pads correctly") {
    // With a merged USING-style key, `SELECT w.k` from a LEFT JOIN would
    // read the preserved side's value on unmatched rows; the pre-pass
    // renames same-named keys for OUTER joins so the inner side's key is
    // its own column and pads NULL (Postgres/DuckDB ON-join semantics).
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE LK (k BIGINT NOT NULL, lv VARCHAR NOT NULL);
        |CREATE TABLE RK (k BIGINT NOT NULL, rv VARCHAR NOT NULL);
        |CREATE VIEW OKV AS SELECT l.k AS lk, r.k AS rk, lv, rv
        |  FROM LK l LEFT JOIN RK r ON l.k = r.k""".stripMargin)
    val lk = StructType(Seq(StructField("k", LongType), StructField("lv", StringType)))
    val rk = StructType(Seq(StructField("k", LongType), StructField("rv", StringType)))
    val r = e.incrementalRunner("OKV")
    def rows: Set[String] = ZSet.toRows(ZSet.consolidate(r.output))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    r.step(Map("LK" -> z(lk, Seq(1L, "a", 1L), Seq(2L, "b", 1L)),
               "RK" -> z(rk, Seq(1L, "p", 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(rows === Set("1|1|a|p", "2|null|b|null")) // rk is NULL, not 2
    // the match arriving flips the padded row to a real pair
    r.step(Map("RK" -> z(rk, Seq(2L, "q", 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(rows === Set("1|1|a|p", "2|2|b|q"))
    // and retracting the last match pads again
    r.step(Map("RK" -> z(rk, Seq(1L, "p", -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(rows === Set("1|null|a|null", "2|2|b|q"))
    // Spark SQL agreement on the net state
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "lv").createOrReplaceTempView("LK_F")
    Seq((2L, "q")).toDF("k", "rv").createOrReplaceTempView("RK_F")
    val want = spark.sql("SELECT l.k AS lk, r.k AS rk, lv, rv " +
      "FROM LK_F l LEFT JOIN RK_F r ON l.k = r.k")
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want))
  }

  test("OR-disjunctions over subquery predicates lower via iterative complement") {
    // `a IN (...) OR (b NOT IN (...) AND a > 0) OR a = 99` — a disjunction
    // mixing an IN leaf, a conjunction containing a null-aware NOT IN, and
    // a plain predicate. WHERE keeps TRUE rows only: a row where every
    // disjunct is FALSE or UNKNOWN is blocked. The lowering peels each
    // disjunct's passers off the not-yet-passing remainder (see
    // SqlIncremental.passing), so multiplicities never go negative.
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE DT (a BIGINT NULL, b BIGINT NULL, tag VARCHAR NOT NULL);
        |CREATE TABLE D1 (x BIGINT NOT NULL);
        |CREATE TABLE D2 (y BIGINT NULL);
        |CREATE VIEW DV AS SELECT tag FROM DT
        |  WHERE a IN (SELECT x FROM D1)
        |     OR (b NOT IN (SELECT y FROM D2) AND a > 0)
        |     OR a = 99""".stripMargin)
    val dt = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType), StructField("tag", StringType)))
    val d1 = StructType(Seq(StructField("x", LongType)))
    val d2 = StructType(Seq(StructField("y", LongType)))
    val r = e.incrementalRunner("DV")
    def passed: Set[String] = ZSet.toRows(ZSet.consolidate(r.output))
      .collect().map(_.getString(0)).toSet
    // both subqueries empty: NOT IN (empty) = TRUE, so disjunct 2 passes
    // every a > 0 row; NULL `a` is UNKNOWN everywhere → blocked
    r.step(Map("DT" -> z(dt,
      Seq(1L, 10L, "a", 1L),
      Seq(2L, 20L, "b", 1L),
      Seq(null, 10L, "c", 1L),
      Seq(-1L, null, "d", 1L),
      Seq(99L, 30L, "e", 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("a", "b", "e"))
    // D1 gains {2, -1}: "d" (a = -1) now passes via the IN disjunct
    r.step(Map("D1" -> z(d1, Seq(2L, 1L), Seq(-1L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("a", "b", "d", "e"))
    // D2 gains {10}: "a" loses disjunct 2 (10 NOT IN {10} = FALSE) and has
    // no other disjunct → blocked; "b"/"e" keep it (20, 30 differ)
    r.step(Map("D2" -> z(d2, Seq(10L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("b", "d", "e"))
    // retract 2 from D1: "b" survives on disjunct 2 alone
    r.step(Map("D1" -> z(d1, Seq(2L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("b", "d", "e"))
    // NULL arrives in D2: every NOT IN goes UNKNOWN-at-best → "b" blocked
    // ("e" keeps a = 99, "d" keeps the IN)
    r.step(Map("D2" -> z(d2, Seq(null, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("d", "e"))
    // retract the NULL: "b" returns
    r.step(Map("D2" -> z(d2, Seq(null, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(passed === Set("b", "d", "e"))
    // Spark SQL agreement on the net state (Spark lowers disjunctive
    // subqueries natively in 4.x)
    import spark.implicits._
    Seq((Some(1L), Some(10L), "a"), (Some(2L), Some(20L), "b"),
      (Option.empty[Long], Some(10L), "c"), (Some(-1L), Option.empty[Long], "d"),
      (Some(99L), Some(30L), "e"))
      .toDF("a", "b", "tag").createOrReplaceTempView("DT_F")
    Seq(-1L).toDF("x").createOrReplaceTempView("D1_F")
    Seq(Some(10L)).toDF("y").createOrReplaceTempView("D2_F")
    val want = spark.sql(
      """SELECT tag FROM DT_F
        |WHERE a IN (SELECT x FROM D1_F)
        |   OR (b NOT IN (SELECT y FROM D2_F) AND a > 0)
        |   OR a = 99""".stripMargin)
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want))
  }

  test("computed grouping key whose auto-alias collides with a child column") {
    // Spark names `CAST(i AS BOOLEAN)` just `i` — the same name as the
    // child's own column. Projecting the computed key under that alias
    // next to child.output made the circuit's groupBy("i") ambiguous at
    // EVAL time (compile succeeded), the one eval-failure the castmatrix
    // cross-check caught at r13 HEAD. The key now projects under a
    // synthetic name and the restated-key re-alias restores the
    // user-visible name.
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE GK (i BIGINT NULL);
        |CREATE VIEW GV AS SELECT CAST(i AS BOOLEAN), COUNT(*) FROM GK GROUP BY 1""".stripMargin)
    val gk = StructType(Seq(StructField("i", LongType)))
    val r = e.incrementalRunner("GV")
    r.step(Map("GK" -> z(gk,
      Seq(0L, 1L), Seq(1L, 1L), Seq(7L, 1L), Seq(null, 1L), Seq(0L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    import spark.implicits._
    Seq(Some(0L), Some(1L), Some(7L), Option.empty[Long], Some(0L))
      .toDF("i").createOrReplaceTempView("GK_F")
    val want = spark.sql(
      "SELECT CAST(i AS BOOLEAN), COUNT(*) FROM GK_F GROUP BY 1")
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want))
    // a delta that flips a group's count and adds a new group
    r.step(Map("GK" -> z(gk, Seq(0L, -1L), Seq(1L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
  }

  test("3-way chain of merged same-named keys projects every side " +
    "(the r13 join.test alias-apart bucket)") {
    // u JOIN w ON u.a = w.a JOIN x ON x.a = u.a, projecting a from ALL
    // THREE sides plus the non-key collisions: each inner merge leaves two
    // plan attributes carrying one name, so the upper join's checks and
    // projections must read the CIRCUIT schema (circuitCols), not plan
    // attrs. Previously rejected ("join sides share non-key column name").
    // compiled directly (not through Engine: Spark temp-view registration
    // rejects the duplicate OUTPUT names this shape legitimately produces)
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L)).toDF("a", "b").createOrReplaceTempView("MK1")
    Seq((1L, 100L), (3L, 300L)).toDF("k", "v").createOrReplaceTempView("MK2")
    Seq((1L, 1000L), (2L, 2000L)).toDF("k", "g").createOrReplaceTempView("MK3")
    val sql =
      """SELECT u.a, w.a, x.a, u.b, w.b, x.b FROM MK1 u
        |JOIN (SELECT k AS a, v AS b FROM MK2) w ON u.a = w.a
        |JOIN (SELECT k AS a, g AS b FROM MK3) x ON x.a = u.a""".stripMargin
    val circuit = SqlIncremental.compile(spark, sql, Set("MK1", "MK2", "MK3"))
    val m1 = spark.table("MK1").limit(0)
    val m2 = spark.table("MK2").limit(0)
    val m3 = spark.table("MK3").limit(0)
    val r = new Runner(spark, circuit, Map("MK1" -> m1, "MK2" -> m2, "MK3" -> m3))
    r.step(Map(
      "MK1" -> ZSet.fromRows(spark.table("MK1")),
      "MK2" -> ZSet.fromRows(spark.table("MK2")),
      "MK3" -> ZSet.fromRows(spark.table("MK3"))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(spark.sql(sql)))
    // retraction through the merged chain
    r.step(Map("MK2" -> ZSet.negate(ZSet.fromRows(
      Seq((1L, 100L)).toDF("k", "v")))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
  }

  test("correlated EXISTS keyed on a RENAMED join column re-anchors the " +
    "OuterReference name (rjoin.test bug)") {
    // The right side's `id` is renamed id__rN apart from the left's; the
    // EXISTS correlation references it through an OuterReference — a LEAF
    // expression the rename pass could not reach, so the semi join
    // silently keyed on the LEFT side's still-`id`-named column (wrong
    // rows, no error). 68 rjoin.test records caught it.
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE RX1 (id BIGINT NOT NULL, q BIGINT NOT NULL);
        |CREATE TABLE RX2 (id BIGINT NOT NULL, p BIGINT NOT NULL, v BIGINT NOT NULL);
        |CREATE VIEW RXV AS
        |  SELECT a.q, b.id FROM RX1 a RIGHT JOIN RX2 b ON a.q = b.v
        |  WHERE EXISTS (SELECT 1 FROM RX2 i WHERE i.p = b.id)""".stripMargin)
    val s1 = StructType(Seq(StructField("id", LongType), StructField("q", LongType)))
    val s2 = StructType(Seq(StructField("id", LongType), StructField("p", LongType),
      StructField("v", LongType)))
    val r = e.incrementalRunner("RXV")
    // RX1.id values deliberately COLLIDE with RX2.p so the old wrong key
    // (left id ∈ p) differs from the right answer (b.id ∈ p)
    r.step(Map(
      "RX1" -> z(s1, Seq(7L, 50L, 1L), Seq(8L, 60L, 1L)),
      "RX2" -> z(s2, Seq(1L, 7L, 50L, 1L), Seq(2L, 9L, 99L, 1L), Seq(7L, 2L, 60L, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    import spark.implicits._
    Seq((7L, 50L), (8L, 60L)).toDF("id", "q").createOrReplaceTempView("RX1_F")
    Seq((1L, 7L, 50L), (2L, 9L, 99L), (7L, 2L, 60L))
      .toDF("id", "p", "v").createOrReplaceTempView("RX2_F")
    val want = spark.sql(
      """SELECT a.q, b.id FROM RX1_F a RIGHT JOIN RX2_F b ON a.q = b.v
        |WHERE EXISTS (SELECT 1 FROM RX2_F i WHERE i.p = b.id)""".stripMargin)
    assert(canon(ZSet.toRows(ZSet.consolidate(r.output))) === canon(want))
    // retract the witness row: ids keyed through it must drop
    r.step(Map("RX2" -> z(s2, Seq(1L, 7L, 50L, -1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
  }
}
