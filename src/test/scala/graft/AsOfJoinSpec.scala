package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.AsOfJoin

/** AS-OF join + sessionization semantics (operators/AsOfJoin.scala) against
  * hand-computed answers, plus the physical property that makes the
  * formulation scale-safe: ONE exchange on the key columns, no range-join
  * row explosion. DuckDB's ASOF JOIN provides the large-input oracle via
  * q107 in the gate; this spec pins the edge cases a bulk compare can miss
  * (equal timestamps, no prior build row, NULL payload carry-past,
  * session tie-breaking). */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("asof-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def probes = {
    import spark.implicits._
    Seq( // (key, ts, probe payload)
      ("u1", 10L, "c1"), ("u1", 20L, "c2"), ("u1", 5L, "c0"),
      ("u2", 100L, "c3"),
      ("u3", 7L, "c4")
    ).toDF("k", "ts", "click")
  }

  private def builds = {
    import spark.implicits._
    Seq( // (key, ts, build payload)
      ("u1", 10L, java.lang.Double.valueOf(1.5)),  // ties with probe at ts=10 → inclusive
      ("u1", 15L, java.lang.Double.valueOf(2.5)),
      ("u2", 101L, java.lang.Double.valueOf(9.0)), // strictly after → never matched
      ("u3", 1L, null.asInstanceOf[java.lang.Double]), // NULL payload: carried past
      ("u3", 3L, java.lang.Double.valueOf(4.0))
    ).toDF("k", "ts", "v")
  }

  test("as-of left: latest at-or-before match, inclusive ties, NULL left rows") {
    val out = AsOfJoin.asOfLeft(probes, builds, Seq("k"), "ts")
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("u1", 5L, "c0", null),   // before every build row
      ("u1", 10L, "c1", 1.5),   // equal ts matches (inclusive <=)
      ("u1", 20L, "c2", 2.5),   // latest prior, not first
      ("u2", 100L, "c3", null), // build row is strictly later
      ("u3", 7L, "c4", 4.0)))   // NULL payload at ts=1 looked past
  }

  test("as-of keeps probe multiplicity and schema") {
    val doubled = probes.union(probes)
    val out = AsOfJoin.asOfLeft(doubled, builds, Seq("k"), "ts")
    assert(out.count() == 10)
    assert(out.columns.toSeq == Seq("k", "ts", "click", "v"))
  }

  test("as-of plan: single exchange on the key, no join node") {
    val out = AsOfJoin.asOfLeft(probes, builds, Seq("k"), "ts")
    val physical = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(exchanges == 1, s"want 1 key exchange, plan:\n$physical")
    assert(!physical.contains("Join"), s"no join node expected:\n$physical")
  }

  test("payload name clash is rejected") {
    val bad = builds.withColumnRenamed("v", "click")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfLeft(probes, bad, Seq("k"), "ts")
    }
    assert(e.getMessage.contains("click"))
  }

  test("incremental as-of: maintained through build retraction equals batch") {
    import graft.streaming.Incremental
    import graft.zset.ZSet
    val probeInc = Incremental.source("PR")
    val buildInc = Incremental.source("BU")
    val circuit = AsOfJoin.asOfLeftInc(probeInc, probes.schema,
      buildInc, builds.schema, Seq("k"), "ts")
    val r = new Incremental.Runner(spark, circuit,
      Map("PR" -> probes.limit(0), "BU" -> builds.limit(0)))
    // wave 1: some probes before any build rows → NULL payloads
    r.step(Map("PR" -> ZSet.fromRows(probes.filter(col("ts") < 50))))
    // wave 2: builds arrive → carried payloads rewrite the touched keys
    r.step(Map("BU" -> ZSet.fromRows(builds)))
    // wave 3: late probe + RETRACT u1's ts=15 build row → u1@20 falls back
    // to the ts=10 payload
    r.step(Map(
      "PR" -> ZSet.fromRows(probes.filter(col("ts") >= 50)),
      "BU" -> ZSet.negate(ZSet.fromRows(
        builds.filter(col("k") === "u1" && col("ts") === 15L)))))
    val got = ZSet.toRows(ZSet.consolidate(r.output))
      .orderBy("k", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    val want = AsOfJoin.asOfLeft(probes,
        builds.filter(!(col("k") === "u1" && col("ts") === 15L)),
        Seq("k"), "ts")
      .orderBy("k", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
    assert(got.exists { case (k, ts, _, v) => k == "u1" && ts == 20L && v == 1.5 })
    // untouched-key churn: a build insert for u9 (no probes) re-folds only
    // that key — and the output delta for existing keys is empty
    import spark.implicits._
    val quiet = r.step(Map("BU" -> ZSet.fromRows(
      Seq(("u9", 1L, java.lang.Double.valueOf(3.0))).toDF("k", "ts", "v"))))
    assert(quiet.count() === 0L)
  }

  test("sessionize: gap splits, ties stay in one session, ids are 1-based per key") {
    import spark.implicits._
    val ev = Seq(
      ("u1", 0L, "a"), ("u1", 100L, "b"), ("u1", 100L, "c"), // tie at 100
      ("u1", 2000L, "d"),                                    // gap > 1800 → new session
      ("u1", 3000L, "e"),                                    // gap 1000 → same
      ("u2", 50L, "f")
    ).toDF("k", "ts", "id")
    val out = AsOfJoin.sessionize(ev, Seq("k"), "ts", "id", 1800L)
      .orderBy("k", "ts", "id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("u1", 0L, "a", 1L), ("u1", 100L, "b", 1L), ("u1", 100L, "c", 1L),
      ("u1", 2000L, "d", 2L), ("u1", 3000L, "e", 2L),
      ("u2", 50L, "f", 1L)))
  }

  test("sessionize: boundary gap exactly gapSec stays in session") {
    import spark.implicits._
    val ev = Seq(("u", 0L, "a"), ("u", 1800L, "b"), ("u", 3601L, "c"))
      .toDF("k", "ts", "id")
    val ids = AsOfJoin.sessionize(ev, Seq("k"), "ts", "id", 1800L)
      .orderBy("ts").collect().map(_.getLong(3))
    assert(ids.toSeq == Seq(1L, 1L, 2L)) // 1800 == gap stays; 1801 splits
  }
}
