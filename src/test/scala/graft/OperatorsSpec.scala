package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Operator-utility tests: salted skew joins must return exactly the rows
  * of the plain join, for both the random and deterministic variants. */
class OperatorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("operators")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()
  import spark.implicits._

  test("saltedJoin ≡ plain join (heavy hot key)") {
    // 10k rows on one hot key + scattered tail, joined to a small dim
    val big = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "unused"))
      .toDF("k", "name")
    val want = big.join(small, Seq("k")).collect().map(_.toString).sorted
    val gotRand = SkewJoin.saltedJoin(big, small, Seq("k"), salt = 8)
      .collect().map(_.toString).sorted
    val gotDet = SkewJoin.saltedJoinBy(big, small, Seq("k"), col("payload"), salt = 8)
      .collect().map(_.toString).sorted
    assert(gotRand === want)
    assert(gotDet === want)
    // deterministic variant is reproducible
    val again = SkewJoin.saltedJoinBy(big, small, Seq("k"), col("payload"), salt = 8)
      .collect().map(_.toString).sorted
    assert(gotDet === again)
  }

  test("ZSet.toRows expands a weight-10⁷ row chunked (bounded allocation)") {
    import graft.zset.ZSet
    // One consolidated row with weight 10,000,000: the old single
    // sequence(1, w) materialized the whole array in one task; the chunked
    // expansion caps per-task arrays at 10⁶ entries, so this completes in
    // normal executor memory and still yields exactly w rows.
    val z = Seq(("x", 10000000L)).toDF("v", ZSet.W)
    assert(ZSet.toRows(z).count() === 10000000L)
    // small weights keep exact multiset semantics (chunk math edge cases:
    // w = 1, w = chunk size, w = chunk size + 1)
    val small = Seq(("a", 1L), ("b", 3L)).toDF("v", ZSet.W)
    assert(ZSet.toRows(small).groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap === Map("a" -> 1L, "b" -> 3L))
    val edge = Seq(("c", 1000000L), ("d", 1000001L)).toDF("v", ZSet.W)
    assert(ZSet.toRows(edge).groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("c" -> 1000000L, "d" -> 1000001L))
  }
}
