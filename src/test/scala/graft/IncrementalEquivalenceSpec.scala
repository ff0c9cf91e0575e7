package graft

import graft.streaming.Incremental
import graft.streaming.Incremental._
import graft.zset.ZSet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Batch ≡ incremental equivalence — the reference's NaiveIncrementalTests
  * axis (NaiveIncrementalTests.java:35 re-runs every EndToEndTests golden
  * with incremental=true and asserts identical outputs). Here: feed deltas
  * step by step (including retractions = negative weights), then assert the
  * integrated incremental output equals a full recompute over the
  * integrated inputs.
  */
class IncrementalEquivalenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("inc-equiv")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val tSchema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))
  private val uSchema = StructType(Seq(
    StructField("k", StringType), StructField("w2", LongType)))

  private def zset(schema: StructType, rows: (Any, Any, Long)*): DataFrame = {
    val rdd = rows.map { case (a, b, w) => Row(a, b, w) }
    spark.createDataFrame(rdd.asJava,
      schema.add(StructField(ZSet.W, LongType)))
  }

  private def empty(schema: StructType): DataFrame =
    spark.createDataFrame(List.empty[Row].asJava, schema)

  /** Sorted canonical dump of a consolidated Z-set. */
  private def canon(z: DataFrame): Seq[String] =
    ZSet.consolidate(z).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def assertEquiv(query: Inc, steps: Seq[Map[String, DataFrame]],
                          schemas: Map[String, DataFrame]): Unit = {
    val r = new Runner(spark, query, schemas)
    steps.foreach(r.step)
    assert(canon(r.output) === canon(r.recompute))
  }

  private def stepsT(ss: Seq[(Any, Any, Long)]*): Seq[Map[String, DataFrame]] =
    ss.map(s => Map("T" -> zset(tSchema, s: _*)))

  private val schemasT = Map("T" -> empty(tSchema))
  private val schemasTU = Map("T" -> empty(tSchema), "U" -> empty(uSchema))

  test("linear map+filter: insert then retract") {
    val q = source("T").where(col("v") > 1)
      .select(col("k"), (col("v") * 2).as("v2"))
    assertEquiv(q, stepsT(
      Seq(("a", 1L, 1L), ("b", 2L, 1L), ("c", 3L, 2L)),
      Seq(("b", 2L, -1L), ("d", 5L, 1L))), schemasT)
  }

  test("union / minus with negative weights") {
    val a = source("T").where(col("v") > 1)
    val b = source("T").where(col("v") > 2)
    val q = a.minus(b) // rows with 1 < v <= 2
    assertEquiv(q, stepsT(
      Seq(("a", 2L, 1L), ("b", 3L, 1L)),
      Seq(("a", 2L, -1L), ("c", 2L, 3L))), schemasT)
  }

  test("bilinear join: delta on both sides, then retraction") {
    val q = source("T").join(source("U"), Seq("k"))
    val steps = Seq(
      Map("T" -> zset(tSchema, ("a", 1L, 1L), ("b", 2L, 1L)),
          "U" -> zset(uSchema, ("a", 10L, 1L))),
      Map("U" -> zset(uSchema, ("b", 20L, 1L), ("a", 30L, 2L))),
      Map("T" -> zset(tSchema, ("a", 1L, -1L))))
    assertEquiv(q, steps, schemasTU)
  }

  test("incremental aggregate: count+sum per key with retraction") {
    val q = source("T").aggregate(Seq("k"),
      "cnt" -> ZSet.wcount, "sum_v" -> ZSet.wsum(col("v")))
    assertEquiv(q, stepsT(
      Seq(("a", 1L, 1L), ("a", 2L, 1L), ("b", 5L, 1L)),
      Seq(("a", 1L, -1L), ("b", 7L, 2L)),
      Seq(("b", 5L, -1L), ("b", 7L, -2L))), schemasT) // group b vanishes
  }

  test("global aggregate (single group) stays correct on retraction") {
    val q = source("T").select(lit(0).as("g"), col("v"))
      .aggregate(Seq("g"), "cnt" -> ZSet.wcount, "sum_v" -> ZSet.wsum(col("v")))
    assertEquiv(q, stepsT(
      Seq(("a", 4L, 1L), ("b", 6L, 1L)),
      Seq(("a", 4L, -1L))), schemasT)
  }

  test("incremental distinct: duplicate weights collapse; retraction below zero removes") {
    val q = source("T").distinct
    assertEquiv(q, stepsT(
      Seq(("a", 1L, 3L), ("b", 2L, 1L)),
      Seq(("a", 1L, -2L)),      // still present (weight 1)
      Seq(("a", 1L, -1L))),     // now gone
      schemasT)
  }

  test("join after aggregate (non-linear composed with bilinear)") {
    val agg = source("T").aggregate(Seq("k"), "cnt" -> ZSet.wcount)
    val q = agg.join(source("U"), Seq("k"))
    val steps = Seq(
      Map("T" -> zset(tSchema, ("a", 1L, 1L), ("a", 2L, 1L)),
          "U" -> zset(uSchema, ("a", 10L, 1L))),
      Map("T" -> zset(tSchema, ("a", 3L, 1L))),   // cnt 2→3: retract+insert flows through join
      Map("U" -> zset(uSchema, ("a", 10L, -1L)))) // join partner retracted
    assertEquiv(q, steps, schemasTU)
  }

  test("distinct after union (set union semantics)") {
    val q = source("T").select(col("k"))
      .union(source("U").select(col("k"))).distinct
    val steps = Seq(
      Map("T" -> zset(tSchema, ("a", 1L, 1L)),
          "U" -> zset(uSchema, ("a", 9L, 1L), ("b", 9L, 1L))),
      Map("T" -> zset(tSchema, ("a", 1L, -1L)))) // 'a' still in U
    assertEquiv(q, steps, schemasTU)
  }

  test("empty step is a no-op") {
    val q = source("T").aggregate(Seq("k"), "cnt" -> ZSet.wcount)
    val r = new Runner(spark, q, schemasT)
    r.step(Map("T" -> zset(tSchema, ("a", 1L, 1L))))
    val before = canon(r.output)
    val d = r.step(Map.empty)
    assert(d.count() === 0)
    assert(canon(r.output) === before)
  }

  test("retraction of a never-inserted row yields negative-weight output") {
    val q = source("T").where(col("v") > 0)
    val r = new Runner(spark, q, schemasT)
    r.step(Map("T" -> zset(tSchema, ("a", 1L, -1L))))
    val out = ZSet.consolidate(r.output).collect()
    assert(out.length === 1 && out(0).getAs[Long](ZSet.W) === -1L)
    assert(canon(r.output) === canon(r.recompute))
  }

  test("incremental window aggregate: trailing range sum per key with retraction") {
    import org.apache.spark.sql.expressions.{Window => W}
    val q = source("T").windowAggregate(Seq("k")) { rows =>
      val w = W.partitionBy(col("k")).orderBy(col("v")).rangeBetween(-2, 0)
      rows.select(col("k"), col("v"),
        sum(col("v")).over(w).as("sum_2"), count(lit(1)).over(w).as("n_2"))
    }
    assertEquiv(q, stepsT(
      Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 5L, 1L), ("b", 4L, 1L)),
      Seq(("a", 3L, 1L)),          // lands inside a's existing frames
      Seq(("a", 2L, -1L))),        // retraction reshapes frames
      schemasT)
  }

  test("incremental window aggregate: quiet partitions emit no delta") {
    import org.apache.spark.sql.expressions.{Window => W}
    val q = source("T").windowAggregate(Seq("k")) { rows =>
      val w = W.partitionBy(col("k")).orderBy(col("v")).rangeBetween(-2, 0)
      rows.select(col("k"), col("v"), sum(col("v")).over(w).as("sum_2"))
    }
    val r = new Runner(spark, q, schemasT)
    r.step(Map("T" -> zset(tSchema, ("a", 1L, 1L), ("b", 4L, 1L))))
    val d2 = r.step(Map("T" -> zset(tSchema, ("a", 2L, 1L))))
    val keys = ZSet.consolidate(d2).select("k").distinct()
      .collect().map(_.getString(0)).toSet
    assert(keys === Set("a")) // partition b untouched → no delta rows
    assert(canon(r.output) === canon(r.recompute))
  }

  test("semi/anti join: presence flips when the other side's last match retracts") {
    val semi = source("T").semiJoin(source("U"), Seq("k"))
    val anti = source("T").antiJoin(source("U"), Seq("k"))
    val steps = Seq(
      Map("T" -> zset(tSchema, ("a", 1L, 1L), ("b", 2L, 2L)),
          "U" -> zset(uSchema, ("a", 9L, 1L))),
      Map("U" -> zset(uSchema, ("a", 9L, -1L), ("b", 8L, 1L)))) // a loses, b gains
    assertEquiv(semi, steps, schemasTU)
    assertEquiv(anti, steps, schemasTU)
    // value check after both steps: only b matches; a is anti (weight 2 kept)
    val r = new Runner(spark, anti, schemasTU)
    steps.foreach(r.step)
    val rows = ZSet.consolidate(r.output).collect()
      .map(x => (x.getString(0), x.getAs[Long](ZSet.W))).toSeq
    assert(rows === Seq(("a", 1L)))
  }

  test("checkpoint/restore: maintenance resumes from persisted state") {
    val q = source("T").aggregate(Seq("k"), "cnt" -> ZSet.wcount)
    val r1 = new Runner(spark, q, schemasT)
    r1.step(Map("T" -> zset(tSchema, ("a", 1L, 1L), ("b", 2L, 1L))))
    val dir = "/root/repo/target/tmp/ckpt"
    r1.checkpoint(dir)
    val r2 = new Runner(spark, q, schemasT)
    r2.restore(dir)
    assert(canon(r2.output) === canon(r1.output))
    // continue stepping on the restored runner, incl. a retraction
    r2.step(Map("T" -> zset(tSchema, ("a", 5L, 1L), ("b", 2L, -1L))))
    assert(canon(r2.output) === canon(r2.recompute))
  }

  test("multi-step convergence: output delta of quiet keys is empty") {
    val q = source("T").aggregate(Seq("k"), "sum_v" -> ZSet.wsum(col("v")))
    val r = new Runner(spark, q, schemasT)
    r.step(Map("T" -> zset(tSchema, ("a", 1L, 1L), ("b", 2L, 1L))))
    val d2 = r.step(Map("T" -> zset(tSchema, ("a", 5L, 1L))))
    // only group 'a' may appear in the second delta
    val keys = ZSet.consolidate(d2).select("k").distinct()
      .collect().map(_.getString(0)).toSet
    assert(keys === Set("a"))
    assert(canon(r.output) === canon(r.recompute))
  }

  test("snapshot bootstrap ≡ insert-wave start across operator types") {
    def plain(schema: StructType, rs: (Any, Any)*): DataFrame =
      spark.createDataFrame(rs.map { case (a, b) => Row(a, b) }.asJava, schema)
    val snapT = plain(tSchema,
      ("a", 1L), ("a", 4L), ("b", 2L), ("c", 9L), ("c", 9L))
    val snapU = plain(uSchema, ("a", 10L), ("b", 20L), ("d", 40L))
    // post-bootstrap waves: an insert AND a retraction (the circuit must
    // stay fully retraction-capable over batch-seeded state)
    val dT1 = zset(tSchema, ("b", 7L, 1L), ("e", 5L, 1L))
    val dT2 = zset(tSchema, ("a", 4L, -1L), ("c", 9L, -2L))
    val circuits: Seq[(String, Inc)] = Seq(
      "aggregate" -> source("T")
        .aggregate(Seq("k"), "cnt" -> ZSet.wcount,
          "sum_v" -> ZSet.wsum(col("v"))),
      "aggregateRows(minmax)" -> source("T")
        .aggregateRows(Seq("k"), Seq(min(col("v")).as("mn"),
          max(col("v")).as("mx")), Seq("k", "mn", "mx")),
      "aggregateLinear" -> source("T")
        .aggregateLinear(Seq("k"), Seq("s" -> ZSet.wsum(col("v"))))
        .select(col("k"), col("s")),
      "join" -> source("T").join(source("U"), Seq("k")),
      "distinct" -> source("T").distinct,
      "top-2 reevaluate" -> source("T")
        .reevaluate(_.sort(col("v").desc, col("k").asc).limit(2)),
      "global aggregate" -> source("T")
        .aggregateRowsGlobal(Seq(count(lit(1)).as("n"),
          max(col("v")).as("mx")), Seq("n", "mx")),
      "window aggregate" -> source("T").windowAggregate(Seq("k")) { df =>
        import org.apache.spark.sql.expressions.Window
        df.withColumn("rsum", sum(col("v"))
          .over(Window.partitionBy("k").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      })
    val schemas = Map("T" -> empty(tSchema), "U" -> empty(uSchema))
    for ((nm, q) <- circuits) {
      val boot = new Runner(spark, q, schemas)
      boot.bootstrap(Map("T" -> snapT, "U" -> snapU))
      boot.step(Map("T" -> dT1))
      boot.step(Map("T" -> dT2))
      val waves = new Runner(spark, q, schemas)
      waves.step(Map("T" -> ZSet.fromRows(snapT),
        "U" -> ZSet.fromRows(snapU)))
      waves.step(Map("T" -> dT1))
      waves.step(Map("T" -> dT2))
      assert(canon(boot.output) === canon(waves.output), nm)
      assert(canon(boot.output) === canon(boot.recompute), nm)
    }
  }

  test("snapshot bootstrap: transitive closure stays DRed-capable") {
    val eSchema = StructType(Seq(
      StructField("src", StringType), StructField("dst", StringType)))
    def plainE(rs: (String, String)*): DataFrame =
      spark.createDataFrame(rs.map { case (a, b) => Row(a, b) }.asJava, eSchema)
    def zsetE(rs: (String, String, Long)*): DataFrame =
      spark.createDataFrame(rs.map { case (a, b, w) => Row(a, b, w) }.asJava,
        eSchema.add(StructField(ZSet.W, LongType)))
    val q = source("E").closure("src", "dst")
    val snap = plainE(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
    val r = new Runner(spark, q, Map("E" -> empty(eSchema)))
    r.bootstrap(Map("E" -> snap))
    // extend, then sever the b->c bridge (DRed over bootstrapped state)
    r.step(Map("E" -> zsetE(("d", "e", 1L))))
    r.step(Map("E" -> zsetE(("b", "c", -1L))))
    assert(canon(r.output) === canon(r.recompute))
  }

  test("bootstrap then checkpoint/restore: maintenance resumes and retracts") {
    val q = source("T").aggregate(Seq("k"), "cnt" -> ZSet.wcount,
      "sum_v" -> ZSet.wsum(col("v")))
    val snap = spark.createDataFrame(
      Seq(Row("a", 1L), Row("a", 4L), Row("b", 2L)).asJava, tSchema)
    val r1 = new Runner(spark, q, schemasT)
    r1.bootstrap(Map("T" -> snap))
    val dir = "/root/repo/target/tmp/ckpt_boot"
    r1.checkpoint(dir)
    val r2 = new Runner(spark, q, schemasT)
    r2.restore(dir)
    assert(canon(r2.output) === canon(r1.output))
    r2.step(Map("T" -> zset(tSchema, ("a", 4L, -1L), ("c", 3L, 1L))))
    assert(canon(r2.output) === canon(r2.recompute))
  }

  test("LSH-bucket pair view: unique-content inserts emit EMPTY deltas") {
    // Miniature of the near-dup standing view's candidate stage (bucket
    // self-join + distinct): churn that collides with no existing bucket
    // must consolidate to a physically empty output delta — the circuit's
    // steady-state cost claim — while a colliding insert emits exactly its
    // new pairs and a retraction un-derives exactly the lost ones.
    val dSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def plainD(rs: (Long, String)*): DataFrame =
      spark.createDataFrame(rs.map { case (i, s) => Row(i, s) }.asJava, dSchema)
    def zsetD(rs: (Long, String, Long)*): DataFrame =
      spark.createDataFrame(rs.map { case (i, s, w) => Row(i, s, w) }.asJava,
        dSchema.add(StructField(ZSet.W, LongType)))
    val D = source("D")
    val bands = D.select(col("doc_id"), xxhash64(col("text")).as("band_key"))
    val pairs = bands.select(col("band_key"), col("doc_id").as("id_a"))
      .join(bands.select(col("band_key"), col("doc_id").as("id_b")),
        Seq("band_key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct
    val r = new Runner(spark, pairs, Map("D" -> empty(dSchema)))
    r.bootstrap(Map("D" -> plainD(1L -> "x", 2L -> "x", 3L -> "y")))
    assert(canon(r.output) === Seq("1|2|1"))
    // unique content: no bucket collision anywhere -> empty delta
    val d1 = r.step(Map("D" -> zsetD((4L, "z", 1L))))
    assert(ZSet.consolidate(d1).count() === 0L)
    // colliding content: exactly the new pair appears
    val d2 = r.step(Map("D" -> zsetD((5L, "y", 1L))))
    assert(canon(d2) === Seq("3|5|1"))
    // takedown: the severed pair un-derives, nothing else moves
    val d3 = r.step(Map("D" -> zsetD((2L, "x", -1L))))
    assert(canon(d3) === Seq("1|2|-1"))
    assert(canon(r.output) === canon(r.recompute))
  }

  test("bootstrap after a step is rejected") {
    val q = source("T").distinct
    val r = new Runner(spark, q, schemasT)
    r.step(Map("T" -> zset(tSchema, ("a", 1L, 1L))))
    intercept[IllegalArgumentException] {
      r.bootstrap(Map("T" -> plainOne))
    }
  }
  private lazy val plainOne: DataFrame =
    spark.createDataFrame(Seq(Row("z", 1L)).asJava, tSchema)
}
