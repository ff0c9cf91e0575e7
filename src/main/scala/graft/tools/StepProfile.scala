package graft.tools

import graft.Tables
import graft.zset.ZSet
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the incremental Runner's per-step cost. */
object StepProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("graft-step-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.ansi.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = Tables.load(s, sf, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"))
    li.limit(0).createOrReplaceTempView("LC")
    val circuit = t("compile") {
      graft.engine.SqlIncremental.compile(s,
        """WITH t AS (SELECT l_suppkey, SUM(l_quantity) AS total
                      FROM LC GROUP BY l_suppkey)
           SELECT l_suppkey, total FROM t
           WHERE total > (SELECT AVG(total) FROM t)""",
        Set("LC"))
    }
    val r = t("runner-init") {
      new graft.streaming.Incremental.Runner(s, circuit, Map("LC" -> li.limit(0)))
    }
    t("step1") { r.step(Map("LC" -> ZSet.fromRows(li.filter(col("l_quantity") < 30)))) }
    t("step2") { r.step(Map("LC" -> ZSet.fromRows(li.filter(col("l_quantity") >= 30)))) }
    t("step3") { r.step(Map("LC" -> ZSet.negate(ZSet.fromRows(li.filter(col("l_quantity") < 10))))) }
    t("output") { ZSet.toRows(ZSet.consolidate(r.output)).count() }
    s.stop()
  }
}
