package graft

import graft.operators.Fixpoint
import graft.streaming.Incremental._
import graft.zset.ZSet
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Recursive queries: semi-naive fixpoints (operators/Fixpoint.scala) and
  * the incremental standing-closure view (Incremental.ClosureInc) — both
  * beyond-reference surface (the reference's Calcite pipeline rejects
  * recursion). Goldens are hand-computed; the SQL path cross-checks
  * against Spark's native WITH RECURSIVE (UnionLoop). */
class FixpointSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("fixpoint")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }
  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.select(col("src"), col("dst")).as[(Long, Long)].collect().toSet
  }
  /** Pin the DISTRIBUTED regime (local small-regime kernel off) — for
    * tests that assert the distributed DRed machinery itself. */
  private def forceDistributed[A](f: => A): A = {
    spark.conf.set("graft.closure.localMaxBytes", "0")
    try f finally spark.conf.unset("graft.closure.localMaxBytes")
  }

  test("transitive closure of a chain") {
    val got = pairsOf(Fixpoint.transitiveClosure(edges(1L -> 2L, 2L -> 3L, 3L -> 4L)))
    assert(got === Set(1L -> 2L, 2L -> 3L, 3L -> 4L,
      1L -> 3L, 2L -> 4L, 1L -> 4L))
  }

  test("transitive closure of a cycle terminates (set semantics)") {
    val got = pairsOf(Fixpoint.transitiveClosure(edges(1L -> 2L, 2L -> 3L, 3L -> 1L)))
    val all = for (a <- 1L to 3L; b <- 1L to 3L) yield (a, b)
    assert(got === all.toSet)
  }

  test("closure matches Spark's native WITH RECURSIVE on an acyclic graph") {
    import spark.implicits._
    val e = edges(1L -> 2L, 2L -> 3L, 2L -> 4L, 4L -> 5L, 7L -> 8L)
    e.createOrReplaceTempView("fx_e")
    val sql = spark.sql(
      """WITH RECURSIVE reach (src, dst) AS (
           SELECT src, dst FROM fx_e
           UNION ALL
           SELECT r.src, e.dst FROM reach r JOIN fx_e e ON r.dst = e.src
         ) SELECT DISTINCT src, dst FROM reach""")
    assert(pairsOf(Fixpoint.transitiveClosure(e)) === pairsOf(sql))
  }

  test("setMinus is NULL-safe (NULL-bearing facts terminate the loop)") {
    import spark.implicits._
    val a = Seq((Some(1L), "x"), (None: Option[Long], "y")).toDF("k", "v")
    val b = Seq((None: Option[Long], "y")).toDF("k", "v")
    val got = Fixpoint.setMinus(a, b).as[(Option[Long], String)].collect().toSet
    assert(got === Set((Some(1L), "x")))
  }

  test("semiNaive rejects divergence via maxIters") {
    import spark.implicits._
    val base = Seq(0L).toDF("n")
    intercept[IllegalStateException] {
      Fixpoint.semiNaive(base, (f, _) => f.select((col("n") + 1).as("n")),
        maxIters = 5)
    }
  }

  test("incremental closure: insert-only steps are exact (bridge joins two old components)") {
    val chainA = edges(1L -> 2L, 2L -> 3L) // component A
    val chainB = edges(10L -> 11L, 11L -> 12L) // component B
    val bridge = edges(3L -> 10L) // new edge joins them
    val circuit = source("E").closure("src", "dst")
    val r = new Runner(spark, circuit, Map("E" -> chainA.limit(0)))
    r.step(Map("E" -> ZSet.fromRows(chainA.unionAll(chainB))))
    val d = r.step(Map("E" -> ZSet.fromRows(bridge)))
    // The step's DELTA must be exactly the cross-component pairs (+1 each):
    // every x∈{1,2,3} now reaches 10 and everything 10 reaches, via ≥1 new edge.
    val want = for (a <- Seq(1L, 2L, 3L); b <- Seq(10L, 11L, 12L)) yield (a, b)
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(d))) === want.toSet)
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      pairsOf(Fixpoint.transitiveClosure(
        chainA.unionAll(chainB).unionAll(bridge))))
  }

  test("incremental closure: chained new edges in one delta (multi-segment paths)") {
    val base = edges(1L -> 2L)
    val delta = edges(2L -> 3L, 3L -> 4L) // a path needs BOTH new edges
    val circuit = source("E").closure("src", "dst")
    val r = new Runner(spark, circuit, Map("E" -> base.limit(0)))
    r.step(Map("E" -> ZSet.fromRows(base)))
    r.step(Map("E" -> ZSet.fromRows(delta)))
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      Set(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 3L, 2L -> 4L, 1L -> 4L))
  }

  test("incremental closure: retraction severs paths (re-derivation diff)") {
    val base = edges(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val cut = edges(2L -> 3L)
    val circuit = source("E").closure("src", "dst")
    val r = new Runner(spark, circuit, Map("E" -> base.limit(0)))
    r.step(Map("E" -> ZSet.fromRows(base)))
    val d = r.step(Map("E" -> ZSet.negate(ZSet.fromRows(cut))))
    // pairs routed through 2->3 must retract with weight -1
    import spark.implicits._
    val retracted = ZSet.consolidate(d).filter(col(ZSet.W) === -1L)
      .select(col("src"), col("dst")).as[(Long, Long)].collect().toSet
    assert(retracted === Set(2L -> 3L, 1L -> 3L, 2L -> 4L, 1L -> 4L))
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      Set(1L -> 2L, 3L -> 4L))
  }

  test("incremental closure: DRed rederives over-deleted pairs via kept segments") {
    forceDistributed {
    // Diamond with a tail: 1→2→4→5 and 1→3→4. Retracting 1→2 over-deletes
    // D = {(1,2),(1,4),(1,5)}, but (1,4) and (1,5) survive via the kept
    // segments (1,3)∘(3,4)[∘(4,5)] — the K∘K-shaped rederivation that a
    // naive "alternating S paths" scheme misses (K is NOT closed under
    // composition precisely because D over-approximates).
    val base = edges(1L -> 2L, 2L -> 4L, 1L -> 3L, 3L -> 4L, 4L -> 5L)
    val circuit = source("E").closure("src", "dst")
    val r = new Runner(spark, circuit, Map("E" -> base.limit(0)))
    r.step(Map("E" -> ZSet.fromRows(base)))
    val d = r.step(Map("E" -> ZSet.negate(ZSet.fromRows(edges(1L -> 2L)))))
    import spark.implicits._
    val retracted = ZSet.consolidate(d).filter(col(ZSet.W) === -1L)
      .select(col("src"), col("dst")).as[(Long, Long)].collect().toSet
    assert(retracted === Set(1L -> 2L)) // (1,4),(1,5) must NOT retract
    assert(ClosureInc.lastOverDeleted === 3L)
    assert(ClosureInc.lastRederived === 2L)
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      pairsOf(Fixpoint.transitiveClosure(
        edges(2L -> 4L, 1L -> 3L, 3L -> 4L, 4L -> 5L))))
    }
  }

  test("incremental closure: retraction work scales with the severed neighborhood") {
    forceDistributed {
    // A large unrelated component (chain of 40 ⇒ 780 closure pairs) plus a
    // tiny 4-node chain. Retracting the tiny chain's middle edge must
    // over-delete exactly the 4 pairs routed through it — DRed never
    // touches the big component's closure (the r4 fallback re-derived all
    // 780+ pairs from scratch here).
    val big = edges((1L to 39L).map(i => i -> (i + 1)): _*)
    val small = edges(100L -> 101L, 101L -> 102L, 102L -> 103L)
    val circuit = source("E").closure("src", "dst")
    val r = new Runner(spark, circuit, Map("E" -> big.limit(0)))
    r.step(Map("E" -> ZSet.fromRows(big.unionAll(small))))
    val d = r.step(Map("E" -> ZSet.negate(ZSet.fromRows(edges(101L -> 102L)))))
    import spark.implicits._
    val retracted = ZSet.consolidate(d).filter(col(ZSet.W) === -1L)
      .select(col("src"), col("dst")).as[(Long, Long)].collect().toSet
    assert(retracted === Set(101L -> 102L, 100L -> 102L,
      101L -> 103L, 100L -> 103L))
    assert(ClosureInc.lastOverDeleted === 4L) // |{100,101}×{102,103}|, not 780
    assert(ClosureInc.lastRederived === 0L)
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      pairsOf(Fixpoint.transitiveClosure(
        big.unionAll(edges(100L -> 101L, 102L -> 103L)))))
    }
  }

  test("closure regimes agree: local kernel ≡ distributed DRed on the same steps") {
    // The same insert → mixed retract+insert step sequence through both
    // regimes (the small-regime driver kernel and the distributed DRed
    // path) must produce identical final states AND identical consolidated
    // step deltas.
    def run(): (Set[(Long, Long)], Set[(Long, Long, Long)]) = {
      val base = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 5L, 5L -> 3L)
      val circuit = source("E").closure("src", "dst")
      val r = new Runner(spark, circuit, Map("E" -> base.limit(0)))
      r.step(Map("E" -> ZSet.fromRows(base)))
      val d = r.step(Map("E" -> ZSet.plus(
        ZSet.negate(ZSet.fromRows(edges(2L -> 3L))),
        ZSet.fromRows(edges(4L -> 6L)))))
      import spark.implicits._
      val deltas = ZSet.consolidate(d)
        .select(col("src"), col("dst"), col(ZSet.W))
        .as[(Long, Long, Long)].collect().toSet
      (pairsOf(ZSet.toRows(ZSet.consolidate(r.output))), deltas)
    }
    val (stateD, deltaD) = forceDistributed(run())
    val (stateL, deltaL) = run() // default conf: small regime → kernel
    assert(stateL === stateD)
    assert(deltaL === deltaD)
  }

  test("incremental closure: mixed retract+insert in one step (DRed then extend)") {
    // Cut 2→3 and add 2→30→3 in the SAME delta: severed pairs must be
    // rescued through the new hub, so the net output delta only adds the
    // hub pairs — everything through 2..3 stays present end to end.
    val base = edges(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val circuit = source("E").closure("src", "dst")
    val r = new Runner(spark, circuit, Map("E" -> base.limit(0)))
    r.step(Map("E" -> ZSet.fromRows(base)))
    r.step(Map("E" -> ZSet.plus(
      ZSet.negate(ZSet.fromRows(edges(2L -> 3L))),
      ZSet.fromRows(edges(2L -> 30L, 30L -> 3L)))))
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      pairsOf(Fixpoint.transitiveClosure(
        edges(1L -> 2L, 2L -> 30L, 30L -> 3L, 3L -> 4L))))
  }

  test("incremental closure: re-inserted duplicate edge adds no pairs") {
    val base = edges(1L -> 2L, 2L -> 3L)
    val circuit = source("E").closure("src", "dst")
    val r = new Runner(spark, circuit, Map("E" -> base.limit(0)))
    r.step(Map("E" -> ZSet.fromRows(base)))
    val d = r.step(Map("E" -> ZSet.fromRows(edges(1L -> 2L))))
    assert(ZSet.consolidate(d).count() === 0)
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      Set(1L -> 2L, 2L -> 3L, 1L -> 3L))
  }

  test("SQL WITH RECURSIVE compiles to the incremental closure circuit") {
    val base = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L)
    base.limit(0).createOrReplaceTempView("CLE")
    val circuit = graft.engine.SqlIncremental.compile(spark,
      """WITH RECURSIVE reach (src, dst) AS (
           SELECT src, dst FROM CLE
           UNION ALL
           SELECT r.src, e.dst FROM reach r JOIN CLE e ON r.dst = e.src
         ) SELECT DISTINCT src, dst FROM reach""",
      Set("CLE"))
    val r = new Runner(spark, circuit, Map("CLE" -> base.limit(0)))
    r.step(Map("CLE" -> ZSet.fromRows(base)))
    r.step(Map("CLE" -> ZSet.fromRows(edges(4L -> 10L))))
    r.step(Map("CLE" -> ZSet.negate(ZSet.fromRows(edges(2L -> 3L)))))
    val net = edges(1L -> 2L, 3L -> 4L, 4L -> 10L, 10L -> 11L)
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      pairsOf(Fixpoint.transitiveClosure(net)))
  }

  test("SQL recursion with a seed anchor: anchor ∪ anchor∘E⁺") {
    val base = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 5L -> 6L)
    base.limit(0).createOrReplaceTempView("CLE2")
    val circuit = graft.engine.SqlIncremental.compile(spark,
      """WITH RECURSIVE reach (src, dst) AS (
           SELECT src, dst FROM CLE2 WHERE src = 1
           UNION ALL
           SELECT r.src, e.dst FROM reach r JOIN CLE2 e ON r.dst = e.src
         ) SELECT DISTINCT src, dst FROM reach""",
      Set("CLE2"))
    val r = new Runner(spark, circuit, Map("CLE2" -> base.limit(0)))
    r.step(Map("CLE2" -> ZSet.fromRows(base)))
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      Set(1L -> 2L, 1L -> 3L, 1L -> 4L))
  }

  test("UNION ALL recursion without DISTINCT is rejected with an explanation") {
    edges(1L -> 2L).limit(0).createOrReplaceTempView("CLE3")
    val e = intercept[graft.engine.SqlIncremental.UnsupportedPlanException] {
      graft.engine.SqlIncremental.compile(spark,
        """WITH RECURSIVE reach (src, dst) AS (
             SELECT src, dst FROM CLE3
             UNION ALL
             SELECT r.src, e.dst FROM reach r JOIN CLE3 e ON r.dst = e.src
           ) SELECT src, dst FROM reach""",
        Set("CLE3"))
    }
    assert(e.getMessage.contains("DISTINCT"))
  }

  test("incremental closure: presence semantics under over-retraction and re-insert") {
    // retract an edge below zero, then insert it once: net weight 0 — the
    // edge is NOT present and the insert step must not derive pairs from it
    val e12 = edges(1L -> 2L)
    val circuit = source("E").closure("src", "dst")
    val r = new Runner(spark, circuit, Map("E" -> e12.limit(0)))
    r.step(Map("E" -> ZSet.fromRows(edges(2L -> 3L))))
    r.step(Map("E" -> ZSet.negate(ZSet.fromRows(e12.unionAll(e12))))) // 1->2 at -2
    r.step(Map("E" -> ZSet.fromRows(e12))) // 1->2 back to -1: still absent
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) === Set(2L -> 3L))
    r.step(Map("E" -> ZSet.fromRows(e12.unionAll(e12)))) // net +1: present now
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      Set(1L -> 2L, 2L -> 3L, 1L -> 3L))
  }

  test("incremental closure: randomized weighted deltas ≡ batch recompute") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 3) {
      val circuit = source("E").closure("src", "dst")
      val r = new Runner(spark, circuit, Map("E" -> edges().limit(0)))
      for (_ <- 1 to 4) {
        val delta = Seq.fill(6 + rnd.nextInt(6)) {
          (rnd.nextInt(8).toLong, rnd.nextInt(8).toLong,
            (rnd.nextInt(5) - 2).toLong) // weights -2..2, cycles allowed
        }.filter(_._3 != 0L)
        r.step(Map("E" -> delta.toDF("src", "dst", ZSet.W)))
      }
      val got = pairsOf(ZSet.toRows(ZSet.consolidate(r.output)))
      val want = pairsOf(ZSet.toRows(ZSet.consolidate(r.recompute)))
      assert(got === want, s"trial $trial diverged from batch")
    }
  }

  test("recursive view through the Engine catalog (script → standing closure)") {
    val e = new graft.engine.Engine(spark)
    e.executeScript(
      """CREATE TABLE EDGES (src BIGINT NOT NULL, dst BIGINT NOT NULL);
        |CREATE VIEW REACH AS
        |  WITH RECURSIVE reach (src, dst) AS (
        |    SELECT src, dst FROM EDGES
        |    UNION ALL
        |    SELECT r.src, e.dst FROM reach r JOIN EDGES e ON r.dst = e.src
        |  ) SELECT DISTINCT src, dst FROM reach""".stripMargin)
    val r = e.incrementalRunner("REACH")
    r.step(Map("EDGES" -> ZSet.fromRows(edges(1L -> 2L, 2L -> 3L))))
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      Set(1L -> 2L, 2L -> 3L, 1L -> 3L))
    r.step(Map("EDGES" -> ZSet.negate(ZSet.fromRows(edges(1L -> 2L)))))
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      Set(2L -> 3L))
  }

  test("incremental closure: batch ≡ incremental after mixed waves") {
    val all = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L)
    val w1 = edges(1L -> 2L, 4L -> 5L)
    val w2 = edges(2L -> 3L, 3L -> 1L)
    val cut = edges(3L -> 1L)
    val circuit = source("E").closure("src", "dst")
    val r = new Runner(spark, circuit, Map("E" -> all.limit(0)))
    r.step(Map("E" -> ZSet.fromRows(w1)))
    r.step(Map("E" -> ZSet.fromRows(w2)))
    r.step(Map("E" -> ZSet.negate(ZSet.fromRows(cut))))
    val net = edges(1L -> 2L, 2L -> 3L, 4L -> 5L)
    assert(pairsOf(ZSet.toRows(ZSet.consolidate(r.output))) ===
      pairsOf(Fixpoint.transitiveClosure(net)))
  }
}
