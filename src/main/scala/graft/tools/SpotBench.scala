package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a named subset of SparkEntry.queries against an arbitrary data
  * dir — the scaling-slope harness (e.g. driver sf0.1 vs a ScaleData
  * 10× replica). Same measurement shape as graft.Bench: noop-sink
  * materialization, cache cleared between queries.
  *
  * Usage: tools/run_main.sh graft.tools.SpotBench <sfDir> <q1,q2,...>
  */
object SpotBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).limit(1).write
        .format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // same warmup contract as graft.Bench: fixtures exist before timing —
    // but only when a requested query actually reads one (a spot run of a
    // non-source query should not pay seconds of fixture writes)
    if (names.exists(graft.queries.SourcesQ.defs.contains))
      try graft.queries.SourcesQ.warmFixtures(spark, sfDir)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[spot] fixture warmup failed: ${e.getMessage}") }
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // NonFatal only: an OOM/StackOverflow leaves the JVM corrupted —
      // timings taken after one would be fiction, so let it propagate.
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[spot] $name FAILED: ${e.getMessage}"); false }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[spot] $name%-40s ${if (ok) f"$t%8.2f" else "FAILED"}")
      (name, t, ok)
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.2f" else "-1") }.mkString("{", ",", "}")
    println(s"""{"spot":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
