package graft.tools

import org.apache.spark.sql.SparkSession

/** Tally WHY queries of an SLT family do not lower to incremental
  * circuits: runs the family with an executor that attempts
  * `SqlIncremental.compile` on every query record (always answering
  * through spark.sql so the run stays green) and prints the
  * UnsupportedPlanException message histogram — the compiler's coverage
  * roadmap, measured on the grammar corpora instead of guessed.
  *
  * Usage: tools/run_main.sh graft.tools.SltCompileAudit <family.test> ...
  */
object SltCompileAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (f <- args) {
      var ok = 0
      val reasons = scala.collection.mutable.Map.empty[String, Int]
        .withDefaultValue(0)
      val exec: graft.testing.SltRunner.Exec = (s, q, srcs) => {
        try { graft.engine.SqlIncremental.compile(s, q, srcs); ok += 1 }
        catch {
          case e: graft.engine.SqlIncremental.UnsupportedPlanException =>
            // strip instance-specific tails so messages bucket
            val m = String.valueOf(e.getMessage).take(90)
            reasons(m) += 1
          case e: Exception =>
            reasons("OTHER: " + String.valueOf(e.getMessage).take(70)) += 1
        }
        s.sql(q).collect().toSeq
      }
      val p = java.nio.file.Paths.get(
        if (f.contains("/")) f else s"src/test/resources/slt/$f")
      val o = graft.testing.SltRunner.run(spark,
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8"),
        p.getFileName.toString, exec)
      println(s"== $f: $ok compile, ${reasons.values.sum} reject " +
        s"(records passed ${o.passed}, failed ${o.failed.size})")
      reasons.toSeq.sortBy(-_._2).foreach { case (m, n) =>
        println(f"  $n%5d  $m")
      }
    }
    spark.stop()
  }
}
