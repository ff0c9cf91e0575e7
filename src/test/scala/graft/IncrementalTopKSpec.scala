package graft

import graft.streaming.Incremental
import graft.streaming.Incremental.{Runner, source}
import graft.zset.ZSet
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** TopKInc — incremental per-group exact top-k with the monotone-removal
  * shortcut (the retrieval-index-maintenance operator behind
  * q155_incremental_ann_indexed). The axis under test beyond batch ≡
  * incremental equivalence: a wave whose removals miss every current top
  * hit must NOT re-score state (Runner.lastRescanGroups == 0), and a
  * top-hit removal must re-score ONLY the hit groups. */
class IncrementalTopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("inc-topk")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  private def z(rows: Seq[Any]*): DataFrame =
    spark.createDataFrame(
      rows.map(r => Row(r: _*)).asJava,
      StructType(schema.fields :+ StructField(ZSet.W, LongType)))

  private def empty: DataFrame =
    spark.createDataFrame(Seq.empty[Row].asJava, schema)

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  /** Two score groups over one corpus: "hi" ranks by v descending, "lo"
    * by −v — so the hi top-k is the largest values, the lo top-k the
    * smallest, and one removal can hit either, both, or neither. */
  private def score(rows: DataFrame): DataFrame =
    rows.select(lit("hi").as("g"), col("id"), col("v").as("s"))
      .unionByName(
        rows.select(lit("lo").as("g"), col("id"), (-col("v")).as("s")))

  private def topMap(r: Runner): Map[(String, Long), Long] =
    ZSet.toRows(ZSet.consolidate(r.output)).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getInt(3).toLong).toMap

  private def rescans(r: Runner): Long = r.lastRescanGroups

  test("insert waves merge without scanning state; top-hit removal rescans only hit groups") {
    val circuit = source("C").topKPerGroup(score, Seq("id"), Seq("g"),
      Seq(col("s").desc, col("id").asc), k = 2)
    val r = new Runner(spark, circuit, Map("C" -> empty))
    // wave 1: pure inserts over empty state — no removal, no rescan
    r.step(Map("C" -> z((1L to 6L).map(i => Seq[Any](i, i.toDouble, 1L)): _*)))
    assert(rescans(r) === 0L)
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(topMap(r) === Map(("hi", 6L) -> 1L, ("hi", 5L) -> 2L,
      ("lo", 1L) -> 1L, ("lo", 2L) -> 2L))
    // wave 2: one insert that takes hi rank 1 — still no rescan (merge)
    r.step(Map("C" -> z(Seq[Any](7L, 7.0, 1L))))
    assert(rescans(r) === 0L)
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(topMap(r) === Map(("hi", 7L) -> 1L, ("hi", 6L) -> 2L,
      ("lo", 1L) -> 1L, ("lo", 2L) -> 2L))
    // wave 3: remove a row in NEITHER top-2 (id 4) — the no-top-hit wave:
    // zero rescans AND a physically empty emitted delta
    val d3 = r.step(Map("C" -> z(Seq[Any](4L, 4.0, -1L))))
    assert(rescans(r) === 0L)
    assert(ZSet.consolidate(d3).count() === 0L)
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    // wave 4: remove the hi top-1 (id 7) — exactly ONE group re-scored,
    // and the refill promotes id 5 back into hi
    r.step(Map("C" -> z(Seq[Any](7L, 7.0, -1L))))
    assert(rescans(r) === 1L)
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(topMap(r) === Map(("hi", 6L) -> 1L, ("hi", 5L) -> 2L,
      ("lo", 1L) -> 1L, ("lo", 2L) -> 2L))
    // wave 5: one wave hitting BOTH groups (hi's 6 and lo's 1) plus an
    // unrelated insert — both groups re-scored, result exact
    r.step(Map("C" -> z(Seq[Any](6L, 6.0, -1L), Seq[Any](1L, 1.0, -1L),
      Seq[Any](8L, 0.5, 1L))))
    assert(rescans(r) === 2L)
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(topMap(r) === Map(("hi", 5L) -> 1L, ("hi", 3L) -> 2L,
      ("lo", 8L) -> 1L, ("lo", 2L) -> 2L))
  }

  test("checkpoint/restore carries the top-k index; post-restore waves stay gated") {
    def build() = source("C").topKPerGroup(score, Seq("id"), Seq("g"),
      Seq(col("s").desc, col("id").asc), k = 2)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_topk_ckpt_").toString
    val r1 = new Runner(spark, build(), Map("C" -> empty))
    r1.step(Map("C" -> z((1L to 6L).map(i => Seq[Any](i, i.toDouble, 1L)): _*)))
    r1.checkpoint(ckpt)
    val out1 = canon(ZSet.toRows(ZSet.consolidate(r1.output)))
    // simulated restart: a NEW runner over a freshly-built circuit (new
    // node ids, same DFS shape) restores the durable traces
    val r2 = new Runner(spark, build(), Map("C" -> empty))
    r2.restore(ckpt)
    assert(canon(ZSet.toRows(ZSet.consolidate(r2.output))) === out1)
    // post-restore no-top-hit wave still takes the gated path off the
    // RESTORED output trace: zero rescans, physically empty delta
    val d = r2.step(Map("C" -> z(Seq[Any](4L, 4.0, -1L))))
    assert(rescans(r2) === 0L)
    assert(ZSet.consolidate(d).count() === 0L)
    // and a top-hit removal refills correctly from the restored child
    // integral (hi's 6 leaves; 5 promotes)
    r2.step(Map("C" -> z(Seq[Any](6L, 6.0, -1L))))
    assert(rescans(r2) === 1L)
    assert(canon(ZSet.consolidate(r2.output)) === canon(r2.recompute))
    assert(topMap(r2) === Map(("hi", 5L) -> 1L, ("hi", 3L) -> 2L,
      ("lo", 1L) -> 1L, ("lo", 2L) -> 2L))
  }

  test("bucketed score gates deltas: an insert reaches only probes of its bucket") {
    // disjoint hand-made buckets (ids 0-4 mod 10 → probe A, 5-9 → B):
    // the IVF/LSH gating shape with none of the kmeans nondeterminism —
    // proves the TopKInc × bucketed-score composition routes a delta
    // ONLY to the probes whose candidate buckets changed
    def bucketScore(rows: DataFrame): DataFrame =
      rows.filter(col("id") % 10 < 5)
        .select(lit("A").as("g"), col("id"), col("v").as("s"))
        .unionByName(rows.filter(col("id") % 10 >= 5)
          .select(lit("B").as("g"), col("id"), col("v").as("s")))
    val circuit = source("C").topKPerGroup(bucketScore, Seq("id"), Seq("g"),
      Seq(col("s").desc, col("id").asc), k = 2)
    val r = new Runner(spark, circuit, Map("C" -> empty))
    r.step(Map("C" -> z(Seq[Any](1L, 1.0, 1L), Seq[Any](2L, 2.0, 1L),
      Seq[Any](3L, 3.0, 1L), Seq[Any](4L, 4.0, 1L),
      Seq[Any](15L, 15.0, 1L), Seq[Any](16L, 16.0, 1L))))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(topMap(r) === Map(("A", 4L) -> 1L, ("A", 3L) -> 2L,
      ("B", 16L) -> 1L, ("B", 15L) -> 2L))
    // insert into B's bucket: the emitted delta carries ONLY B rows —
    // probe A's standing result is untouched, and nothing rescanned
    val d2 = r.step(Map("C" -> z(Seq[Any](25L, 25.0, 1L))))
    assert(rescans(r) === 0L)
    val d2Groups = ZSet.consolidate(d2).select(col("g")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(d2Groups === Set("B"))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(topMap(r) === Map(("A", 4L) -> 1L, ("A", 3L) -> 2L,
      ("B", 25L) -> 1L, ("B", 16L) -> 2L))
    // remove a non-top B row: no rescan, physically empty delta
    val d3 = r.step(Map("C" -> z(Seq[Any](15L, 15.0, -1L))))
    assert(rescans(r) === 0L)
    assert(ZSet.consolidate(d3).count() === 0L)
    // remove B's top-1: exactly the one hit group rescans; A untouched
    val d4 = r.step(Map("C" -> z(Seq[Any](25L, 25.0, -1L))))
    assert(rescans(r) === 1L)
    assert(ZSet.consolidate(d4).select(col("g")).distinct()
      .collect().map(_.getString(0)).toSet === Set("B"))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
  }

  test("ivfProbeScorer: full probing equals brute force; partial probing keeps recall") {
    import graft.pipeline.Similarity
    val d = "/root/testdata/sf0.001"
    val emb = graft.Tables.load(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def hits(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id"), col("vec_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = hits(Similarity.bruteForceTopK(emb, probes, 5))
    // nProbe = nCentroids: probed buckets cover the corpus → identical
    val full = Similarity.ivfProbeScorer(emb, probes, 8, nProbe = 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    def topkOf(score: DataFrame => DataFrame): DataFrame =
      score(emb).withColumn("rank",
          org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rank") <= 5)
    assert(hits(topkOf(full)) === brute)
    // nProbe = 2 of 8: bucket-local work, recall bounded below
    val part = Similarity.ivfProbeScorer(emb, probes, 8, nProbe = 2)
    val got = hits(topkOf(part))
    val recall = brute.count(got.contains).toDouble / brute.size
    assert(recall >= 0.5, s"IVF nProbe=2 recall $recall")
  }

  test("batch-priced bootstrap seeds the index; the first delta stays merge-only") {
    val circuit = source("C").topKPerGroup(score, Seq("id"), Seq("g"),
      Seq(col("s").desc, col("id").asc), k = 2)
    val r = new Runner(spark, circuit, Map("C" -> empty))
    r.bootstrap(Map("C" -> spark.createDataFrame(
      (1L to 20L).map(i => Row(i, i.toDouble)).asJava, schema)))
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(topMap(r) === Map(("hi", 20L) -> 1L, ("hi", 19L) -> 2L,
      ("lo", 1L) -> 1L, ("lo", 2L) -> 2L))
    r.step(Map("C" -> z(Seq[Any](21L, 21.0, 1L))))
    assert(rescans(r) === 0L)
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    // retract a bootstrap-era top hit: the fallback reads the
    // bootstrap-seeded trace correctly
    r.step(Map("C" -> z(Seq[Any](1L, 1.0, -1L))))
    assert(rescans(r) === 1L)
    assert(canon(ZSet.consolidate(r.output)) === canon(r.recompute))
    assert(topMap(r) === Map(("hi", 21L) -> 1L, ("hi", 20L) -> 2L,
      ("lo", 2L) -> 1L, ("lo", 3L) -> 2L))
  }

  test("requantizeIvf: retrain-and-resume equals fresh bootstrap; exact results invariant") {
    import graft.pipeline.Similarity
    val d = "/root/testdata/sf0.001"
    val emb = graft.Tables.load(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val nC = 8
    def build(train: DataFrame) = {
      val score = Similarity.ivfProbeScorer(train, probes, nC, nProbe = nC)
      source("E").topKPerGroup(score, Seq("vec_id"), Seq("q_id"),
        Seq(col("cos").desc, col("vec_id").asc), k = 3)
    }
    // q156's shape: bootstrap, then the corpus drifts through two waves
    val boot = emb.filter(col("vec_id") % 11 =!= 5)
    val r0 = new Runner(spark, build(boot), Map("E" -> emb.limit(0)))
    r0.bootstrap(Map("E" -> boot))
    r0.step(Map("E" -> ZSet.fromRows(emb.filter(col("vec_id") % 11 === 5))))
    r0.step(Map("E" -> ZSet.negate(ZSet.fromRows(
      emb.filter(col("vec_id") % 9 === 4 && col("vec_id") >= 3)))))
    val before = canon(ZSet.toRows(ZSet.consolidate(r0.output)))
    // requantize at the drifted state: retrain quantizer, re-bucket, resume
    val r1 = Similarity.requantizeIvf(r0, "E", probes, nC, nProbe = nC, k = 3)
    // (a) full probing: standing results are INVARIANT across requantize
    // (exactness does not depend on the quantizer)
    assert(canon(ZSet.toRows(ZSet.consolidate(r1.output))) === before)
    // (b) value-equal to a fresh bootstrap at the same state
    val r2 = new Runner(spark, build(r0.inputState("E")),
      Map("E" -> emb.limit(0)))
    r2.bootstrap(Map("E" -> r0.inputState("E")))
    assert(canon(ZSet.toRows(ZSet.consolidate(r1.output)))
      === canon(ZSet.toRows(ZSet.consolidate(r2.output))))
    // (c) delta stepping RESUMES under the new buckets: an insert-only
    // wave takes the merge path (no rescans) and stays exact vs recompute
    r1.step(Map("E" -> ZSet.fromRows(
      emb.filter(col("vec_id") % 9 === 4 && col("vec_id") >= 3))))
    assert(rescans(r1) === 0L)
    assert(canon(ZSet.consolidate(r1.output)) === canon(r1.recompute))
  }

  test("requantizeIvf under churn: top-hit retractions rescan correctly " +
    "across the blue/green swap") {
    import graft.pipeline.Similarity
    val d = "/root/testdata/sf0.001"
    val emb = graft.Tables.load(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val nC = 8
    val score = Similarity.ivfProbeScorer(emb, probes, nC, nProbe = nC)
    val circuit = source("E").topKPerGroup(score, Seq("vec_id"), Seq("q_id"),
      Seq(col("cos").desc, col("vec_id").asc), k = 3)
    val r0 = new Runner(spark, circuit, Map("E" -> emb.limit(0)))
    r0.bootstrap(Map("E" -> emb))
    def topHit(r: Runner): Long =
      ZSet.consolidate(r.output).filter(col("q_id") === 0L)
        .orderBy(col("cos").desc, col("vec_id").asc)
        .select(col("vec_id")).head().getLong(0)
    def retract(r: Runner, id: Long): Unit =
      r.step(Map("E" -> ZSet.negate(ZSet.fromRows(
        emb.filter(col("vec_id") === id)))))
    // churn BEFORE the swap: retract q_id 0's current best — the old
    // index must rescan the hit group(s) and stay exact
    retract(r0, topHit(r0))
    assert(rescans(r0) >= 1L)
    assert(canon(ZSet.consolidate(r0.output)) === canon(r0.recompute))
    // blue/green swap at the churned state
    val r1 = Similarity.requantizeIvf(r0, "E", probes, nC, nProbe = nC, k = 3)
    assert(canon(ZSet.consolidate(r1.output)) === canon(r1.recompute))
    // churn AFTER the swap: retract the NEW best — the rescan now runs
    // against the requantized buckets (the state the swap rebuilt), so an
    // off-by-state swap would either miss the group or refill stale rows
    retract(r1, topHit(r1))
    assert(rescans(r1) >= 1L)
    assert(canon(ZSet.consolidate(r1.output)) === canon(r1.recompute))
    // a retraction that touches NO top hit after the swap stays merge-only
    // (inputState returns plain rows — multiplicities already expanded)
    val kept = r1.inputState("E")
      .select(col("vec_id")).distinct().collect().map(_.getLong(0)).toSet
    val tops = ZSet.consolidate(r1.output)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val nonTop = (kept -- tops).head
    retract(r1, nonTop)
    assert(rescans(r1) === 0L)
    assert(canon(ZSet.consolidate(r1.output)) === canon(r1.recompute))
  }

  /** raise_error surfaces through task/job wrapping — search the whole
    * cause chain for the guard's message. */
  private def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => String.valueOf(x.getMessage)).mkString(" | ")

  test("NULL id or group key fails loudly instead of silently misrouting") {
    // NULL id in the child delta: the per-row guard raises at execution
    val circuit = source("C").topKPerGroup(score, Seq("id"), Seq("g"),
      Seq(col("s").desc, col("id").asc), k = 2)
    val r = new Runner(spark, circuit, Map("C" -> empty))
    val e1 = intercept[Exception] {
      r.step(Map("C" -> z(Seq[Any](1L, 1.0, 1L), Seq[Any](null, 2.0, 1L))))
    }
    assert(messageChain(e1).contains("NULL id key"), messageChain(e1))
    // NULL group key PRODUCED BY the score function: guarded on the score
    // output, same loud failure
    def nullGroupScore(rows: DataFrame): DataFrame =
      rows.select(when(col("id") % 2 === 0, lit(null).cast("string"))
        .otherwise(lit("g1")).as("g"), col("id"), col("v").as("s"))
    val c2 = source("C").topKPerGroup(nullGroupScore, Seq("id"), Seq("g"),
      Seq(col("s").desc, col("id").asc), k = 2)
    val r2 = new Runner(spark, c2, Map("C" -> empty))
    val e2 = intercept[Exception] {
      r2.step(Map("C" -> z(Seq[Any](1L, 1.0, 1L), Seq[Any](2L, 2.0, 1L))))
    }
    assert(messageChain(e2).contains("NULL group key"), messageChain(e2))
  }
}
