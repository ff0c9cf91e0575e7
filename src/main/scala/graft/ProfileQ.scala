package graft

import org.apache.spark.sql.SparkSession

/** Single-query profiling main: runs one named SparkEntry query in the
  * exact Bench session shape (same configs, same noop-sink forcing, same
  * table warmup) so its time is comparable to a BENCH_r{N} entry. Combine
  * with GRAFT_STEP_DEBUG=1 to get per-wave phase timings from the
  * incremental Runner.
  *
  * Usage: sbt "runMain graft.ProfileQ q87_incremental_cte_scalar [reps]"
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProfileQ <query> [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GRAFT_PROFILE_CONF="k=v;k=v" applies experimental conf overrides on
    // top of the Bench shape (for isolating planner/AQE overheads).
    val overrides = sys.env.get("GRAFT_PROFILE_CONF").toSeq
      .flatMap(_.split(';')).filter(_.trim.nonEmpty).map { entry =>
        // split on the FIRST '=' only: conf values may themselves contain
        // '=' (e.g. -XX flags); a silent drop would invalidate a comparison.
        entry.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty => (k.trim, v.trim)
          case _ => sys.error(s"GRAFT_PROFILE_CONF entry does not parse as k=v: '$entry'")
        }
      }
    val spark = overrides.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).limit(1).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name rep=$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // Match Bench.timeOne: drop whatever this rep cached, or rep 2+'s
      // structurally identical plans substitute rep 1's materialized cache
      // entries and under-report the real per-query cost.
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
