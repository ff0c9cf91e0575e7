package graft

import graft.streaming.Incremental._
import graft.zset.ZSet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Randomized end-to-end equivalence: a SQL-compiled circuit driven by
  * RANDOM insert/retract delta sequences must integrate to exactly the
  * batch answer over the net surviving rows (the reference's
  * NaiveIncrementalTests axis, here on generated data instead of fixed
  * fixtures). Retractions are always of rows actually present (list
  * subtraction = multiset subtraction), so the net input is a valid
  * relation and the batch side is well-defined. */
class RunnerPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("runner-props")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val genRows: Gen[List[(Int, Int)]] =
    Gen.listOfN(20, for {
      k <- Gen.choose(0, 6)
      v <- Gen.choose(0, 9)
    } yield (k, v))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def df(rows: List[(Int, Int)], names: (String, String)): DataFrame = {
    import spark.implicits._
    rows.toDF(names._1, names._2)
  }

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).map { case (s, xs) => s -> xs.length }

  test("join+aggregate circuit over random insert/retract waves ≡ batch on net rows") {
    for (trial <- 0 until 4) {
      val aRows = sample(genRows, 900L + trial)
      val bRows = sample(genRows, 950L + trial)
      // retract every 3rd occurrence (a sublist ⇒ valid multiset removal),
      // then insert a fresh batch
      val aCut = aRows.zipWithIndex.collect { case (r, i) if i % 3 == 0 => r }
      val bCut = bRows.zipWithIndex.collect { case (r, i) if i % 4 == 0 => r }
      val aNew = sample(genRows, 990L + trial).take(7)
      val bNew = sample(genRows, 995L + trial).take(5)
      val netA = aRows.diff(aCut) ++ aNew
      val netB = bRows.diff(bCut) ++ bNew

      val an = ("k", "va"); val bn = ("k", "vb")
      df(aRows, an).limit(0).createOrReplaceTempView("RPA")
      df(bRows, bn).limit(0).createOrReplaceTempView("RPB")
      val sql =
        """SELECT a.k, COUNT(*) AS n, SUM(va) AS sa, SUM(vb) AS sb,
                  MAX(vb) AS mb
           FROM RPA a JOIN RPB b ON a.k = b.k
           GROUP BY a.k"""
      val circuit = graft.engine.SqlIncremental.compile(
        spark, sql, Set("RPA", "RPB"))
      val r = new Runner(spark, circuit,
        Map("RPA" -> df(Nil, an), "RPB" -> df(Nil, bn)))
      r.step(Map("RPA" -> ZSet.fromRows(df(aRows, an))))
      r.step(Map("RPB" -> ZSet.fromRows(df(bRows, bn))))
      r.step(Map(
        "RPA" -> ZSet.plus(
          ZSet.negate(ZSet.fromRows(df(aCut, an))),
          ZSet.fromRows(df(aNew, an))),
        "RPB" -> ZSet.plus(
          ZSet.negate(ZSet.fromRows(df(bCut, bn))),
          ZSet.fromRows(df(bNew, bn)))))
      val got = multiset(ZSet.toRows(ZSet.consolidate(r.output)))

      df(netA, an).createOrReplaceTempView("RPA")
      df(netB, bn).createOrReplaceTempView("RPB")
      val want = multiset(spark.sql(sql))
      assert(got === want, s"trial $trial: incremental != batch")
    }
  }
}
