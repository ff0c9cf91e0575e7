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
}
