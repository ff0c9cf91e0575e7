package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one SqlLogicTest file through the SltRunner outside the test suite —
  * the local iteration loop for corpus authoring (a failing family prints
  * every mismatch here without waiting on sbt test).
  *
  * Usage: tools/run_main.sh graft.tools.SltFile <path/to/file.test> [maxFailuresShown]
  */
object SltFile {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val maxShown = if (args.length > 1) args(1).toInt else 20
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("slt-file")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = graft.testing.SltRunner.runFile(spark, java.nio.file.Paths.get(path))
    println(s"PASSED=${o.passed} FAILED=${o.failed.size}")
    o.failed.take(maxShown).foreach(f => println(s"  $f"))
    spark.stop()
    if (o.failed.nonEmpty) sys.exit(1)
  }
}
