package graft

import graft.engine.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Engine/Catalog protocol tests: the reference's public API
  * (DBSPCompiler.java:40-57 — statements fed one by one; README's minimal
  * example; multi-view programs sharing inputs, MultiViewTests.java). */
class EngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("engine")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("README minimal example: table + view end-to-end") {
    // README.md "CREATE TABLE T(COL0 INTEGER, COL1 INTEGER);" example
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE T0(COL0 INTEGER NOT NULL, COL1 INTEGER NOT NULL);
        |CREATE VIEW V AS SELECT T0.COL1 FROM T0;
        |INSERT INTO T0 VALUES (1, 10), (2, 20)""".stripMargin)
    assert(e.view("V").collect().map(_.getInt(0)).sorted === Array(10, 20))
    assert(e.views === Seq("V"))
  }

  test("typed DDL: nullability and the TypeCompiler type map") {
    val e = new Engine(spark)
    e.executeStatement(
      """CREATE TABLE TY (
        |  b BOOLEAN, t TINYINT, s SMALLINT, i INTEGER, l BIGINT,
        |  d DECIMAL(10,2), f REAL, dd DOUBLE NOT NULL,
        |  v VARCHAR NULL, c CHAR(3), ts TIMESTAMP, dt DATE,
        |  arr INT ARRAY
        |)""".stripMargin)
    val sch = e.schemaOf("TY")
    assert(sch("b").dataType === BooleanType)
    assert(sch("t").dataType === ByteType)
    assert(sch("s").dataType === ShortType)
    assert(sch("i").dataType === IntegerType)
    assert(sch("l").dataType === LongType)
    assert(sch("d").dataType === DecimalType(10, 2))
    assert(sch("f").dataType === FloatType)
    assert(sch("dd").dataType === DoubleType)
    assert(sch("v").dataType === StringType)
    assert(sch("ts").dataType === TimestampNTZType) // reference TS has no TZ
    assert(sch("dt").dataType === DateType)
    assert(sch("arr").dataType === ArrayType(IntegerType))
    // non-nullable by default (doc/sql/types.rst:37-41), NULL opts in
    assert(!sch("dd").nullable && sch("v").nullable && !sch("i").nullable)
  }

  test("INSERTs accumulate and views see them (TableContents.java:112)") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE A(x INT NOT NULL);
        |CREATE VIEW VA AS SELECT SUM(x) AS s FROM A""".stripMargin)
    e.executeStatement("INSERT INTO A VALUES (1), (2)")
    assert(e.view("VA").collect()(0).getLong(0) === 3L)
    e.executeStatement("INSERT INTO A VALUES (10)")
    assert(e.view("VA").collect()(0).getLong(0) === 13L)
  }

  test("multi-view program shares one input (MultiViewTests shape)") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE M(k VARCHAR NOT NULL, v INT NOT NULL);
        |CREATE VIEW BIG AS SELECT k FROM M WHERE v > 10;
        |CREATE VIEW SMALL AS SELECT k FROM M WHERE v <= 10;
        |CREATE VIEW COUNTS AS SELECT COUNT(*) AS n FROM M;
        |INSERT INTO M VALUES ('a', 5), ('b', 50), ('c', 7)""".stripMargin)
    assert(e.views === Seq("BIG", "SMALL", "COUNTS"))
    assert(e.view("BIG").collect().map(_.getString(0)).toSet === Set("b"))
    assert(e.view("SMALL").collect().map(_.getString(0)).toSet === Set("a", "c"))
    assert(e.view("COUNTS").collect()(0).getLong(0) === 3L)
  }

  test("structural CSE: two views over the same aggregate share ONE trace") {
    import org.apache.spark.sql.functions.col
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE CS(k VARCHAR NOT NULL, v INT NOT NULL);
        |CREATE VIEW TOTALS AS SELECT k, SUM(v) AS s FROM CS GROUP BY k;
        |CREATE VIEW BIGTOTALS AS SELECT k, s FROM
        |  (SELECT k, SUM(v) AS s FROM CS GROUP BY k) t WHERE s > 10""".stripMargin)
    // Separately compiled, the two views each carry their own copy of the
    // grouped-SUM operator; compiled together (compileAll), the canonical
    // Catalyst plans of the two aggregate subtrees are equal, so the
    // Runner must hold exactly ONE stateful node — one trace, advanced
    // once per step — and node identity (not just structure) proves it.
    val r = e.incrementalRunner(Seq("TOTALS", "BIGTOTALS"))
    assert(r.statefulNodeCount === 1)
    import graft.zset.ZSet
    import spark.implicits._
    r.stepAll(Map("CS" -> ZSet.fromRows(
      Seq(("a", 5), ("a", 7), ("b", 3)).toDF("k", "v"))))
    r.stepAll(Map("CS" -> ZSet.fromRows(Seq(("b", 20)).toDF("k", "v"))))
    val totals = ZSet.toRows(ZSet.consolidate(r.output("TOTALS")))
      .select(col("k"), col("s")).as[(String, Long)].collect().toSet
    val big = ZSet.toRows(ZSet.consolidate(r.output("BIGTOTALS")))
      .select(col("k"), col("s")).as[(String, Long)].collect().toSet
    assert(totals === Set(("a", 12L), ("b", 23L)))
    assert(big === Set(("a", 12L), ("b", 23L)))
  }

  test("structural CSE: three views sharing one JOIN keep one join trace " +
    "(the q174 program shape)") {
    import org.apache.spark.sql.functions.col
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE JO (ok BIGINT NOT NULL, ck BIGINT NOT NULL, p BIGINT NOT NULL);
        |CREATE TABLE JC (ck BIGINT NOT NULL, seg VARCHAR NOT NULL);
        |CREATE VIEW JV1 AS SELECT seg, ok, p FROM JO JOIN JC ON JO.ck = JC.ck;
        |CREATE VIEW JV2 AS SELECT seg, COUNT(*) AS n, SUM(p) AS t
        |  FROM JO JOIN JC ON JO.ck = JC.ck GROUP BY seg;
        |CREATE VIEW JV3 AS SELECT seg, ok FROM JO JOIN JC ON JO.ck = JC.ck
        |  WHERE p > 100""".stripMargin)
    // Compiled together the three views must share the join subtree's
    // circuit node(s): the combined runner holds strictly fewer distinct
    // nodes than the sum of the three views compiled alone.
    val alone = Seq("JV1", "JV2", "JV3")
      .map(v => e.incrementalRunner(Seq(v)).nodeCount).sum
    val r = e.incrementalRunner(Seq("JV1", "JV2", "JV3"))
    assert(r.nodeCount < alone,
      s"combined=${r.nodeCount} vs alone-sum=$alone — join not shared")
    // and the shared program still maintains correctly through a
    // retraction wave on each input
    import graft.zset.ZSet
    import spark.implicits._
    r.stepAll(Map(
      "JO" -> ZSet.fromRows(Seq((1L, 10L, 50L), (2L, 10L, 200L),
        (3L, 20L, 150L)).toDF("ok", "ck", "p")),
      "JC" -> ZSet.fromRows(Seq((10L, "A"), (20L, "B")).toDF("ck", "seg"))))
    r.stepAll(Map("JO" -> ZSet.negate(ZSet.fromRows(
      Seq((2L, 10L, 200L)).toDF("ok", "ck", "p")))))
    r.stepAll(Map("JC" -> ZSet.negate(ZSet.fromRows(
      Seq((20L, "B")).toDF("ck", "seg")))))
    val v1 = ZSet.toRows(ZSet.consolidate(r.output("JV1")))
      .select(col("seg"), col("ok"), col("p"))
      .as[(String, Long, Long)].collect().toSet
    val v2 = ZSet.toRows(ZSet.consolidate(r.output("JV2")))
      .select(col("seg"), col("n"), col("t"))
      .as[(String, Long, Long)].collect().toSet
    val v3 = ZSet.toRows(ZSet.consolidate(r.output("JV3")))
      .select(col("seg"), col("ok")).as[(String, Long)].collect().toSet
    assert(v1 === Set(("A", 1L, 50L)))
    assert(v2 === Set(("A", 1L, 50L)))
    assert(v3 === Set.empty[(String, Long)])
  }

  test("multi-view runner with shared traces bootstraps from a snapshot") {
    import org.apache.spark.sql.functions.col
    // Snapshot bootstrap must seed the SHARED trace exactly once (the
    // traced-node set is id-deduplicated) and leave both views consistent
    // with an insert-wave start — including through a follow-up step with
    // a retraction over the bootstrapped state.
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE CB(k VARCHAR NOT NULL, v INT NOT NULL);
        |CREATE VIEW BT1 AS SELECT k, SUM(v) AS s FROM CB GROUP BY k;
        |CREATE VIEW BT2 AS SELECT k, s FROM
        |  (SELECT k, SUM(v) AS s FROM CB GROUP BY k) t WHERE s > 10""".stripMargin)
    val r = e.incrementalRunner(Seq("BT1", "BT2"))
    assert(r.statefulNodeCount === 1)
    import graft.zset.ZSet
    import spark.implicits._
    r.bootstrap(Map("CB" ->
      Seq(("a", 5), ("a", 7), ("b", 3)).toDF("k", "v")))
    r.stepAll(Map("CB" -> ZSet.plus(
      ZSet.fromRows(Seq(("b", 20)).toDF("k", "v")),
      ZSet.negate(ZSet.fromRows(Seq(("a", 7)).toDF("k", "v"))))))
    val totals = ZSet.toRows(ZSet.consolidate(r.output("BT1")))
      .select(col("k"), col("s")).as[(String, Long)].collect().toSet
    val big = ZSet.toRows(ZSet.consolidate(r.output("BT2")))
      .select(col("k"), col("s")).as[(String, Long)].collect().toSet
    assert(totals === Set(("a", 5L), ("b", 23L)))
    assert(big === Set(("b", 23L)))
  }

  test("structural CSE shares alias-differing plans through a rename projection") {
    import org.apache.spark.sql.functions.col
    // Catalyst canonicalization erases alias names, so `SUM(v) AS s1` and
    // `SUM(v) AS s2` canonicalize equal. A name-blind memo would hand the
    // second view the first view's circuit verbatim (wrong column names
    // downstream); instead the memo shares the NODE — one trace — behind
    // a linear rename projection carrying each view's own aliases.
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE CA(k VARCHAR NOT NULL, v INT NOT NULL);
        |CREATE VIEW AL1 AS SELECT k, SUM(v) AS s1 FROM CA GROUP BY k;
        |CREATE VIEW AL2 AS SELECT k, s2 + 1 AS t FROM
        |  (SELECT k, SUM(v) AS s2 FROM CA GROUP BY k) i""".stripMargin)
    val r = e.incrementalRunner(Seq("AL1", "AL2"))
    assert(r.statefulNodeCount === 1) // ONE aggregate trace despite aliases
    import graft.zset.ZSet
    import spark.implicits._
    r.stepAll(Map("CA" -> ZSet.fromRows(
      Seq(("a", 5), ("a", 7), ("b", 3)).toDF("k", "v"))))
    val a1 = ZSet.toRows(ZSet.consolidate(r.output("AL1")))
    val a2 = ZSet.toRows(ZSet.consolidate(r.output("AL2")))
    assert(a1.columns.toSeq === Seq("k", "s1"))
    assert(a2.columns.toSeq === Seq("k", "t"))
    assert(a1.select(col("k"), col("s1")).as[(String, Long)].collect().toSet
      === Set(("a", 12L), ("b", 3L)))
    assert(a2.select(col("k"), col("t")).as[(String, Long)].collect().toSet
      === Set(("a", 13L), ("b", 4L)))
  }

  test("structural CSE shares subtrees whose output names REPEAT (positional rename)") {
    // `SELECT k, k, SUM(v)` makes the memoized aggregate's output names
    // repeat — a name-keyed rename (`col("k").as(...)`) would be ambiguous,
    // so the r6 memo skipped sharing and compiled a duplicate stateful
    // node. The positional rename (toDF) shares it: ONE trace.
    // The view outputs themselves must be duplicate-free (Spark temp-view
    // registration rejects duplicates), so the repeated-name node is the
    // INNER derived table; the outer select references only `s`.
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE CDUP(k VARCHAR NOT NULL, v INT NOT NULL);
        |CREATE VIEW DUP1 AS SELECT s AS s1 FROM
        |  (SELECT k, k, SUM(v) AS s FROM CDUP GROUP BY k) i;
        |CREATE VIEW DUP2 AS SELECT s2 + 1 AS t FROM
        |  (SELECT k, k, SUM(v) AS s2 FROM CDUP GROUP BY k) i""".stripMargin)
    val r = e.incrementalRunner(Seq("DUP1", "DUP2"))
    assert(r.statefulNodeCount === 1) // shared despite repeated stored names
    import graft.zset.ZSet
    import spark.implicits._
    r.stepAll(Map("CDUP" -> ZSet.fromRows(
      Seq(("a", 5), ("a", 7), ("b", 3)).toDF("k", "v"))))
    r.stepAll(Map("CDUP" -> ZSet.fromRows(Seq(("b", 20)).toDF("k", "v"))))
    def rows(view: String) =
      ZSet.toRows(ZSet.consolidate(r.output(view)))
        .as[Long].collect().toSet
    assert(rows("DUP1") === Set(12L, 23L))
    assert(rows("DUP2") === Set(13L, 24L))
  }

  test("views over views") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE N(x INT NOT NULL);
        |CREATE VIEW V1 AS SELECT x * 2 AS y FROM N;
        |CREATE VIEW V2 AS SELECT SUM(y) AS s FROM V1;
        |INSERT INTO N VALUES (1), (2), (3)""".stripMargin)
    assert(e.view("V2").collect()(0).getLong(0) === 12L)
  }

  test("registerSource: external DataFrame as a table (the scale path)") {
    val e = new Engine(spark)
    import spark.implicits._
    e.registerSource("S", Seq((1, "a"), (2, "b")).toDF("id", "name"))
    e.executeStatement("CREATE VIEW VS AS SELECT name FROM S WHERE id = 2")
    assert(e.view("VS").collect().map(_.getString(0)).toSeq === Seq("b"))
  }

  test("materialize writes a view to parquet (sink operator)") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE MT(x INT NOT NULL);
        |CREATE VIEW MV AS SELECT x * 3 AS y FROM MT;
        |INSERT INTO MT VALUES (1), (2)""".stripMargin)
    val path = "/root/repo/target/tmp/mv_sink"
    e.materialize("MV", path)
    val back = spark.read.parquet(path)
    assert(back.collect().map(_.getInt(0)).sorted === Array(3, 6))
  }

  test("unknown statement and undeclared INSERT are rejected") {
    val e = new Engine(spark)
    intercept[IllegalArgumentException] { e.executeStatement("DROP TABLE X") }
    intercept[IllegalArgumentException] { e.executeStatement("INSERT INTO NOPE VALUES (1)") }
  }

  test("statement splitting respects string literals") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE SQ(s VARCHAR NOT NULL);
        |INSERT INTO SQ VALUES ('a;b'), ('c')""".stripMargin)
    assert(e.table("SQ").collect().map(_.getString(0)).toSet === Set("a;b", "c"))
  }

  test("CHAINED views: W defined FROM V reuses V's circuit node and trace") {
    // `CREATE VIEW W AS SELECT … FROM V` — the downstream view's analyzed
    // plan inlines V's definition, so compiled TOGETHER the memo must hand
    // W the SAME aggregate node V's sink uses (one trace, advanced once
    // per step): V's deltas feed W's circuit without re-deriving from
    // sources (the reference's multi-view catalog composes this way —
    // MultiViewTests).
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE CH(k VARCHAR NOT NULL, v INT NOT NULL);
        |CREATE VIEW CHV AS SELECT k, SUM(v) AS s FROM CH GROUP BY k;
        |CREATE VIEW CHW AS SELECT k, s + 1 AS s1 FROM CHV WHERE s > 10""".stripMargin)
    val r = e.incrementalRunner(Seq("CHV", "CHW"))
    assert(r.statefulNodeCount === 1,
      "the chained view must reuse the upstream view's aggregate trace")
    import graft.zset.ZSet
    import spark.implicits._
    r.stepAll(Map("CH" -> ZSet.fromRows(
      Seq(("a", 5), ("a", 7), ("b", 3)).toDF("k", "v"))))
    r.stepAll(Map("CH" -> ZSet.fromRows(Seq(("b", 20)).toDF("k", "v"))))
    val v = ZSet.toRows(ZSet.consolidate(r.output("CHV")))
      .as[(String, Long)].collect().toSet
    val w = ZSet.toRows(ZSet.consolidate(r.output("CHW")))
      .as[(String, Long)].collect().toSet
    assert(v === Set(("a", 12L), ("b", 23L)))
    assert(w === Set(("a", 13L), ("b", 24L)))
    // retraction flows THROUGH the chain: drop b's big row below the gate
    r.stepAll(Map("CH" -> ZSet.negate(ZSet.fromRows(
      Seq(("b", 20)).toDF("k", "v")))))
    val w2 = ZSet.toRows(ZSet.consolidate(r.output("CHW")))
      .as[(String, Long)].collect().toSet
    assert(w2 === Set(("a", 13L)))
  }

  test("unterminated block comment fails loudly, terminated ones are fine") {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE BC(x INT NOT NULL); /* mid-script
        |comment; with a semicolon */ INSERT INTO BC VALUES (7)""".stripMargin)
    assert(e.table("BC").collect().map(_.getInt(0)).toSeq === Seq(7))
    val ex = intercept[IllegalArgumentException] {
      e.executeScript("CREATE TABLE BC2(x INT NOT NULL); /* oops")
    }
    assert(ex.getMessage.contains("unterminated"))
  }
}
