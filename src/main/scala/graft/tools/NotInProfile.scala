package graft.tools

import graft.Tables
import graft.streaming.Incremental.Runner
import graft.zset.ZSet
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-wave profiler for the q100 multi-column NULL-aware NOT IN circuit
  * (the r6 verdict's 30 s / 15.6%-of-bench hotspot): replays exactly the
  * bench's waves at a chosen SF and prints one PROFILE line per phase, so
  * compile cost, per-wave step cost, and the final consolidate are
  * separately attributable. Run with
  * `sbt "runMain graft.tools.NotInProfile /root/testdata/sf0.1"`. */
object NotInProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("graft-notin-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.ansi.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val mx = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var t = 0L; mx.forEach(b => t += math.max(0L, b.getCollectionTime)); t
    }
    def t[A](label: String)(f: => A): A = {
      val g0 = gcMs; val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  gc ${gcMs - g0}%6d ms")
      r
    }

    val li = Tables.load(s, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_partkey"), col("l_quantity"))
    val su = Tables.load(s, sf, "supplier").select(col("s_suppkey"))
    li.limit(0).createOrReplaceTempView("LN")
    su.limit(0).createOrReplaceTempView("SN")
    val circuit = t("compile") {
      graft.engine.SqlIncremental.compile(s,
        """WITH ot AS (SELECT l_orderkey, l_linenumber,
                              NULLIF(l_suppkey % 13, 5) AS a,
                              NULLIF(l_partkey % 11, 7) AS b
                       FROM LN),
                it AS (SELECT NULLIF(s_suppkey % 13, 5) AS x,
                              NULLIF(s_suppkey % 11, 3) AS y
                       FROM SN)
           SELECT l_orderkey, l_linenumber, a, b FROM ot
           WHERE (a, b) NOT IN (SELECT x, y FROM it)""",
        Set("LN", "SN"))
    }
    val r = t("runner-init") {
      new Runner(s, circuit, Map("LN" -> li.limit(0), "SN" -> su.limit(0)))
    }
    t("wave1") {
      r.step(Map("LN" -> ZSet.fromRows(li.filter(col("l_quantity") < 30)),
        "SN" -> ZSet.fromRows(su)))
    }
    t("wave2") {
      r.step(Map("LN" -> ZSet.plus(
        ZSet.fromRows(
          li.filter(col("l_quantity") >= 30 && col("l_quantity") < 40)),
        ZSet.negate(ZSet.fromRows(li.filter(col("l_quantity") < 10)))),
        "SN" -> ZSet.negate(ZSet.fromRows(
          su.filter(col("s_suppkey") % 13 === 5)))))
    }
    t("consolidate") { ZSet.toRows(ZSet.consolidate(r.output)).count() }
    s.stop()
  }
}
