package graft

import graft.zset.ZSet
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Regression: the q100 shape — CTE-projected NULLIF columns probed by a
  * multi-column NOT IN. NULLIF analyzes to a Catalyst `With`
  * (CommonExpressionDef) wrapper, which the circuit compiler must inline
  * before re-anchoring attributes (SqlIncremental.toColumn), and the
  * nullable tuple probe exercises the 3VL pattern circuit end-to-end
  * against Spark SQL's own null-aware NOT IN. */
class NotInCteSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("notin-cte").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("CTE + NULLIF multi-col NOT IN compiles and steps") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val li = Seq((1L, 1L, 5L, 7L), (2L, 1L, 18L, 3L), (3L, 2L, 7L, 29L))
      .toDF("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
    val su = Seq(5L, 18L, 14L).toDF("s_suppkey")
    li.limit(0).createOrReplaceTempView("LN2")
    su.limit(0).createOrReplaceTempView("SN2")
    val circuit = graft.engine.SqlIncremental.compile(spark,
      """WITH ot AS (SELECT l_orderkey, l_linenumber,
                            NULLIF(l_suppkey % 13, 5) AS a,
                            NULLIF(l_partkey % 11, 7) AS b
                     FROM LN2),
              it AS (SELECT NULLIF(s_suppkey % 13, 5) AS x,
                            NULLIF(s_suppkey % 11, 3) AS y
                     FROM SN2)
         SELECT l_orderkey, l_linenumber, a, b FROM ot
         WHERE (a, b) NOT IN (SELECT x, y FROM it)""",
      Set("LN2", "SN2"))
    val r = new graft.streaming.Incremental.Runner(spark, circuit,
      Map("LN2" -> li.limit(0), "SN2" -> su.limit(0)))
    r.step(Map("LN2" -> ZSet.fromRows(li), "SN2" -> ZSet.fromRows(su)))
    val got = ZSet.toRows(ZSet.consolidate(r.output))
    li.createOrReplaceTempView("LN2_F"); su.createOrReplaceTempView("SN2_F")
    val want = spark.sql(
      """WITH ot AS (SELECT l_orderkey, l_linenumber,
                            NULLIF(l_suppkey % 13, 5) AS a,
                            NULLIF(l_partkey % 11, 7) AS b FROM LN2_F),
              it AS (SELECT NULLIF(s_suppkey % 13, 5) AS x,
                            NULLIF(s_suppkey % 11, 3) AS y FROM SN2_F)
         SELECT l_orderkey, l_linenumber, a, b FROM ot
         WHERE (a, b) NOT IN (SELECT x, y FROM it)""")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    assert(canon(got) === canon(want))
  }
}
