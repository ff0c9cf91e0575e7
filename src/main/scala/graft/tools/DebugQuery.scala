package graft.tools

import org.apache.spark.sql.SparkSession

/** Compile-and-batch-eval one SQL record through the incremental engine,
  * with tables materialized by replaying its SLT file through the real
  * SltRunner (same dialect mapping) — the single-record microscope for
  * SltEngineAudit EVALFAIL lines: prints the full eval-time stack trace
  * instead of swallowing it into a fallback.
  *
  * Usage: tools/run_main.sh graft.tools.DebugQuery <file.test> "<sql prefix>"
  */
object DebugQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("debug-query")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val target = args(1)
    val exec: graft.testing.SltRunner.Exec = (s, q, srcs, _) => {
      if (q.linesIterator.mkString(" ").startsWith(target)) {
        println(s"== target record: $q\n== sources: $srcs")
        try {
          val inc = graft.engine.SqlIncremental.compile(s, q, srcs)
          println("== compile OK")
          val in = srcs.map(n => n -> graft.zset.ZSet.fromRows(s.table(n))).toMap
          val out = graft.zset.ZSet.toRows(graft.zset.ZSet.consolidate(inc.batch(in)))
          out.show(50, false)
        } catch {
          case e: Throwable =>
            println(s"== ENGINE FAILURE: ${e.getClass.getName}")
            e.printStackTrace(System.out)
        }
      }
      s.sql(q).collect().toSeq
    }
    val o = graft.testing.SltRunner.runFile(
      spark, java.nio.file.Paths.get(args(0)), exec)
    println(s"PASSED=${o.passed} FAILED=${o.failed.size}")
    spark.stop()
  }
}
