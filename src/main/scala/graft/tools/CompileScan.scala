package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Compile-ONLY sweep of an SLT file through SqlIncremental (no circuit
  * eval, no spark.sql run) — orders of magnitude faster than
  * SltEngineAudit when the question is "what REJECTS and why", which is
  * all compiler-coverage work needs. Tables are created empty from the
  * file's own CREATE TABLE statements.
  *
  * Usage: tools/run_main.sh graft.tools.CompileScan <file.test> [--examples=N]
  */
object CompileScan {
  def main(args: Array[String]): Unit = {
    val (flags, files) = args.partition(_.startsWith("--"))
    val examples = flags.collectFirst {
      case f if f.startsWith("--examples=") => f.stripPrefix("--examples=").toInt
    }.getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("compile-scan")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (path <- files) {
      val lines = scala.io.Source.fromFile(path).getLines().toVector
      val sources = mutable.Set.empty[String]
      var i = 0
      var compiled, rejected = 0
      val rejects = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
      while (i < lines.length) {
        val l = lines(i).trim
        if (l == "statement ok") {
          val sql = lines(i + 1).trim
          val m = "(?i)CREATE TABLE\\s+(\\w+)\\s*\\((.*)\\)".r
            .findFirstMatchIn(sql)
          m.foreach { mm =>
            val name = mm.group(1)
            val cols = mm.group(2).split(",").map(_.trim).map { cd =>
              val parts = cd.split("\\s+")
              val t = parts(1).toUpperCase match {
                case "INTEGER" | "INT" => "INT"
                case "BIGINT" => "BIGINT"
                case "TEXT" | "VARCHAR" => "STRING"
                case "DOUBLE" | "REAL" | "FLOAT" => "DOUBLE"
                case other => other
              }
              s"CAST(NULL AS $t) AS ${parts(0)}"
            }
            spark.sql(s"SELECT ${cols.mkString(", ")} WHERE false")
              .createOrReplaceTempView(name)
            sources += name
          }
          i += 2
        } else if (l.startsWith("query ")) {
          // SQL runs until the ---- separator or blank line
          val sqlLines = lines.drop(i + 1).takeWhile(x => x.trim != "----" && x.trim.nonEmpty)
          val sql = sqlLines.mkString(" ")
          try {
            graft.engine.SqlIncremental.compile(spark, sql, sources.toSet)
            compiled += 1
          } catch {
            case e: Exception =>
              rejected += 1
              val reason = s"${e.getClass.getSimpleName}: " +
                Option(e.getMessage).map(_.linesIterator.next().take(160)).getOrElse("")
              rejects.getOrElseUpdate(reason, mutable.ArrayBuffer.empty) += sql.take(220)
          }
          i += 1 + sqlLines.length
        } else i += 1
      }
      println(s"== $path compiled=$compiled rejected=$rejected")
      rejects.toSeq.sortBy(-_._2.size).foreach { case (r, qs) =>
        println(f"  ${qs.size}%5d  $r")
        qs.take(examples).foreach(q => println(s"           e.g. $q"))
      }
    }
    spark.stop()
  }
}
