package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is forced through a full materialization with the `noop` sink
  * (a `.count()` can be satisfied from parquet footer metadata after column
  * pruning and would time ~nothing). Failures are reported per-query
  * (`ok:false`, listed in `failed`) and excluded from the headline total
  * rather than silently deflating it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm up the JVM/codegen and prime parquet footer caches so the first
    // timed query doesn't absorb one-time session costs.
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).limit(1).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      val t = (System.nanoTime() - t0) / 1e9
      // Queries are independent: drop whatever state this one cached
      // (incremental Runner traces, fixpoint results) so later queries are
      // measured against a clean executor, not this query's leftovers.
      spark.catalog.clearCache()
      (name, t, ok)
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1")
    }.mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":$failed,"n_ok":${results.count(_._3)},"n":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
