package graft

import graft.zset.ZSet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property-based laws of the Z-set delta algebra on RANDOM inputs —
  * the algebraic contract every incremental operator leans on (SURVEY
  * §1.1: Z-sets form a commutative group under `plus`, `distinct` is the
  * set-semantics retraction boundary, bilinear join distributes over
  * deltas). The example-based suites pin concrete circuits; this one pins
  * the algebra itself across generated weight patterns, including
  * negative and cancelling weights.
  *
  * Generators are scalacheck's, driven with fixed seeds (the scalatest
  * bridge artifact is not on the offline classpath): deterministic runs,
  * 8 random multisets per law, weights in [-3, 3], a 6×4 value domain so
  * keys collide, cancel, and overlap. */
class ZSetLawsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("zset-laws")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val genZSet: Gen[List[(Int, Int, Long)]] =
    Gen.listOfN(12, for {
      k <- Gen.choose(0, 5)
      v <- Gen.choose(0, 3)
      w <- Gen.choose(-3L, 3L).suchThat(_ != 0L)
    } yield (k, v, w))

  private def cases(n: Int, seed0: Long): Seq[List[(Int, Int, Long)]] =
    (0 until n).map(i =>
      genZSet.pureApply(Gen.Parameters.default, Seed(seed0 + i)))

  private def df(rows: List[(Int, Int, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v", ZSet.W)
  }

  /** canonical map (k, v) → net weight, zero-weight rows dropped */
  private def canon(z: DataFrame): Map[(Int, Int), Long] =
    ZSet.consolidate(z).collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Int]("v")) ->
        r.getAs[Long](ZSet.W)).toMap

  private def canonJ(z: DataFrame): Map[(Int, Int, Int), Long] =
    ZSet.consolidate(z).collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Int]("v"), r.getAs[Int]("v2")) ->
        r.getAs[Long](ZSet.W)).toMap

  test("plus is commutative and associative (group law)") {
    cases(8, 100L).grouped(3).withFilter(_.size == 3).foreach {
      case Seq(a, b, c) =>
        val (da, db, dc) = (df(a), df(b), df(c))
        assert(canon(ZSet.plus(da, db)) === canon(ZSet.plus(db, da)))
        assert(canon(ZSet.plus(ZSet.plus(da, db), dc)) ===
          canon(ZSet.plus(da, ZSet.plus(db, dc))))
    }
  }

  test("negate is the group inverse: a + (-a) = 0, -(-a) = a") {
    cases(8, 200L).foreach { a =>
      val da = df(a)
      assert(canon(ZSet.plus(da, ZSet.negate(da))) === Map.empty)
      assert(canon(ZSet.negate(ZSet.negate(da))) === canon(da))
    }
  }

  test("distinct is idempotent and insensitive to positive multiplicity") {
    cases(8, 300L).foreach { a =>
      val da = df(a)
      val d1 = canon(ZSet.distinct(da))
      assert(canon(ZSet.distinct(ZSet.distinct(da))) === d1)
      // survivors are exactly the positive-net rows, at weight exactly 1
      assert(d1.values.forall(_ == 1L))
      assert(d1.keySet === canon(da).filter(_._2 > 0).keySet)
      // inflating positive multiplicities never changes the distinct image
      assert(canon(ZSet.distinct(ZSet.plus(da, ZSet.positive(da)))) === d1)
    }
  }

  test("join is bilinear: (a1+a2) ⋈ b = a1⋈b + a2⋈b (on weights)") {
    cases(9, 400L).grouped(3).foreach { case Seq(a1, a2, b) =>
      val (d1, d2) = (df(a1), df(a2))
      val db = df(b).withColumnRenamed("v", "v2")
      val lhs = canonJ(ZSet.join(ZSet.plus(d1, d2), db, Seq("k")))
      val rhs = canonJ(ZSet.plus(
        ZSet.join(d1, db, Seq("k")), ZSet.join(d2, db, Seq("k"))))
      assert(lhs === rhs)
    }
  }

  test("weight-aware aggregate ≡ brute-force weighted fold, and is " +
      "consolidation-invariant") {
    // NOTE the law that does NOT hold (probed and rejected here first):
    // post-drop outputs are not additive across deltas — a group can net
    // to zero support while carrying a nonzero weighted sum (e.g.
    // (k,v=1,w=+1)+(k,v=0,w=-1)), and the contract drops it. That is WHY
    // the incremental Runner refolds aggregates from consolidated state
    // instead of adding operator outputs.
    cases(8, 500L).foreach { a =>
      val da = df(a)
      def agg(z: DataFrame) = ZSet.aggregate(z, Seq("k"),
        "cnt" -> ZSet.wcount, "sv" -> ZSet.wsum(col("v")))
      // aggregate output carries no weight column (zero-support groups
      // are already dropped); read (k, cnt, sv) directly
      def c(z: DataFrame): Map[Int, (Long, Long)] =
        z.collect().map(r => r.getAs[Int]("k") ->
          (r.getAs[Long]("cnt"), r.getAs[Long]("sv"))).toMap
      val whole = c(agg(da))
      // first-principles fold over the canonical multiset
      val expect = canon(da).toSeq.groupBy(_._1._1).map { case (k, kvs) =>
        k -> (kvs.map(_._2).sum,
          kvs.map { case ((_, v), w) => v * w }.sum)
      }.filter { case (_, (cnt, _)) => cnt != 0L }
      assert(whole === expect)
      assert(c(agg(ZSet.consolidate(da))) === whole)
    }
  }
}
