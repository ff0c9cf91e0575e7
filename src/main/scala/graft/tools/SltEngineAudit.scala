package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Audit how much of an SLT grammar corpus the incremental SQL compiler
  * can lower — the corpus-authoring companion to SltRunnerSpec's engine
  * cross-check. For every query record it attempts
  * `SqlIncremental.compile` and buckets the rejects by reason, printing
  * the distinct shapes with an example query each, so compiler-coverage
  * work targets the biggest remaining families first. ORDER BY records
  * are counted separately (the circuit's Z-set output is unordered;
  * those fall back to spark.sql by design, not by gap).
  *
  * Usage: tools/run_main.sh graft.tools.SltEngineAudit <file.test>... [--examples N]
  */
object SltEngineAudit {
  def main(args: Array[String]): Unit = {
    val (flags, files) = args.partition(_.startsWith("--"))
    val examples = flags.collectFirst {
      case f if f.startsWith("--examples=") => f.stripPrefix("--examples=").toInt
    }.getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("slt-engine-audit")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (path <- files) {
      var compiled, orderBy = 0
      graft.testing.CircuitExec.resetEvalFailures()
      // reason (first line, trimmed of identifiers) → example queries
      val rejects = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
      val evalFailQs = mutable.ArrayBuffer.empty[String]
      val exec: graft.testing.SltRunner.Exec = (s, q, srcs, order) => {
        val evalBefore = graft.testing.CircuitExec.evalFailures
        graft.testing.CircuitExec.tryEngine(s, q, srcs, order) match {
          case Some(rows) => compiled += 1; rows
          case None =>
            // attribute the fallback: an eval-time analysis failure (a
            // mis-rebuilt plan — compile succeeded, batch() threw), vs a
            // shape the compiler rejects, vs a nosort ORDER BY whose
            // presentation sort the circuit output cannot reproduce
            // (sort keys outside the projection)
            if (graft.testing.CircuitExec.evalFailures > evalBefore)
              evalFailQs += q.linesIterator.mkString(" ").take(200)
            else try {
              graft.engine.SqlIncremental.compile(s, q, srcs)
              orderBy += 1
            } catch {
              case e: Exception =>
                val reason = s"${e.getClass.getSimpleName}: " +
                  e.getMessage.linesIterator.next().take(160)
                rejects.getOrElseUpdate(reason, mutable.ArrayBuffer.empty) +=
                  q.linesIterator.mkString(" ").take(200)
            }
            s.sql(q).collect().toSeq
        }
      }
      val o =
        if (path.startsWith("/slt/"))
          graft.testing.SltRunner.runResource(spark, path, exec)
        else graft.testing.SltRunner.runFile(
          spark, java.nio.file.Paths.get(path), exec)
      val rejected = rejects.valuesIterator.map(_.size).sum
      println(s"== $path: records=${o.passed + o.failed.size} " +
        s"compiled=$compiled orderByFallback=$orderBy rejected=$rejected " +
        s"evalFailures=${graft.testing.CircuitExec.evalFailures} " +
        s"sltFailed=${o.failed.size}")
      o.failed.take(20).foreach(f => println(s"  FAIL $f"))
      evalFailQs.take(20).foreach(q => println(s"  EVALFAIL $q"))
      rejects.toSeq.sortBy(-_._2.size).foreach { case (reason, qs) =>
        println(f"  ${qs.size}%5d  $reason")
        qs.take(examples).foreach(q => println(s"           e.g. $q"))
      }
    }
    spark.stop()
  }
}
