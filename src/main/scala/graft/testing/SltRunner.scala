package graft.testing

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** SqlLogicTest `.test` file parser + executor over Spark SQL, the runner
  * shape of the reference's headline test asset (sqllogictest/Main.java:51,
  * 213-225; record grammar in SLTTestFile.java:278; run-tests.sh:7-18).
  *
  * Record grammar implemented:
  *  - `hash-threshold N` — results with more than N values compare by MD5;
  *  - `statement ok` / `statement error` + SQL until a blank line;
  *  - `query <fmt> [nosort|rowsort|valuesort] [label]` + SQL, `----`, then
  *    expected literal values (one per line) or `N values hashing to <md5>`;
  *  - `skipif <db>` / `onlyif <db>` conditions (this engine answers to
  *    "spark"); `#` comments and blank lines between records.
  *
  * Statements mutate an in-memory catalog (CREATE TABLE / INSERT INTO /
  * DROP TABLE — the full statement surface the SQLite select corpora use);
  * tables are registered as temp views and queries run through
  * `spark.sql`, so the whole Catalyst stack is under test. Verification
  * reuses SltHash — the same normalization the reference mirrors from
  * SqlLogicTest (lib/hashing/src/lib.rs:191-241). */
object SltRunner {

  final case class Outcome(passed: Int, failed: Vector[String]) {
    def ok: Boolean = failed.isEmpty
  }

  private val engineName = "spark"

  private final class Table(val schema: StructType) {
    val rows = mutable.ArrayBuffer.empty[Row]
    var dirty = true
  }

  /** Query executor: (session, sql, registered table names, the record's
    * sort mode) → result rows. The default runs plain `spark.sql`; a
    * family whose semantics need a graft lowering (e.g. DISTINCT
    * recursion over cyclic graphs, where the native UNION ALL loop would
    * not terminate) passes an executor that routes through the engine
    * instead. The sort mode lets an unordered executor (Z-set circuits)
    * decline only `nosort` records — under rowsort/valuesort the harness
    * sorts before comparing, so row order is immaterial even when the
    * query text has ORDER BY. */
  type Exec = (SparkSession, String, Set[String], SltHash.SortOrder) => Seq[Row]
  private val sparkSqlExec: Exec = (s, q, _, _) => s.sql(q).collect().toSeq

  def runFile(spark: SparkSession, path: java.nio.file.Path,
              exec: Exec = sparkSqlExec): Outcome =
    run(spark, new String(java.nio.file.Files.readAllBytes(path), "UTF-8"),
      path.getFileName.toString, exec)

  def runResource(spark: SparkSession, resource: String,
                  exec: Exec = sparkSqlExec): Outcome = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource $resource")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    run(spark, text, resource, exec)
  }

  def run(spark: SparkSession, text: String, name: String,
          exec: Exec = sparkSqlExec): Outcome = {
    val lines = text.split("\n", -1)
    val tables = mutable.Map.empty[String, Table]
    // view name → defining SELECT; re-created (in definition order) after
    // any base-table change, because a Spark temp view captures the plan
    // of the base temp view AT CREATION and would otherwise go stale.
    val views = mutable.LinkedHashMap.empty[String, String]
    var viewsStale = false
    var hashThreshold = 8
    var passed = 0
    val failed = Vector.newBuilder[String]
    var i = 0

    def isBlank(s: String) = s.trim.isEmpty

    def register(tn: String, t: Table): Unit = if (t.dirty) {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(t.rows.asJava, t.schema).createOrReplaceTempView(tn)
      t.dirty = false
      viewsStale = true
    }
    def refreshViews(): Unit = {
      if (viewsStale) views.foreach { case (vn, sel) =>
        spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $vn AS $sel")
      }
      viewsStale = false
    }

    while (i < lines.length) {
      val line = lines(i)
      val trimmed = line.trim
      if (isBlank(line) || trimmed.startsWith("#")) { i += 1 }
      else {
        // gather condition prefix lines
        var skip = false
        while (i < lines.length &&
               (lines(i).startsWith("skipif ") || lines(i).startsWith("onlyif "))) {
          val Array(cond, db) = lines(i).trim.split("\\s+", 2)
          if (cond == "skipif" && db == engineName) skip = true
          if (cond == "onlyif" && db != engineName) skip = true
          i += 1
        }
        val header = lines(i).trim
        if (header.startsWith("hash-threshold")) {
          hashThreshold = header.split("\\s+")(1).toInt
          i += 1
        } else if (header.startsWith("statement")) {
          val expectError = header == "statement error"
          i += 1
          val sql = new StringBuilder
          while (i < lines.length && !isBlank(lines(i))) {
            sql.append(lines(i)).append('\n'); i += 1
          }
          if (!skip) {
            try {
              executeStatement(spark, tables, views, sql.toString.trim,
                () => { tables.foreach { case (tn, t) => register(tn, t) }; refreshViews() },
                () => { viewsStale = true })
              if (expectError) failed += s"$name: statement expected error: $sql"
              else passed += 1
            } catch {
              case e: Exception =>
                if (expectError) passed += 1
                else failed += s"$name: statement failed: ${sql.toString.trim.take(120)} -> ${e.getMessage.take(200)}"
            }
          }
        } else if (header.startsWith("query")) {
          val parts = header.split("\\s+")
          val fmt = parts(1)
          val order = parts.lift(2) match {
            case Some("rowsort")   => SltHash.RowSort
            case Some("valuesort") => SltHash.ValueSort
            case _                 => SltHash.NoSort
          }
          i += 1
          val sql = new StringBuilder
          while (i < lines.length && lines(i).trim != "----" && !isBlank(lines(i))) {
            sql.append(lines(i)).append('\n'); i += 1
          }
          val expected = Vector.newBuilder[String]
          if (i < lines.length && lines(i).trim == "----") {
            i += 1
            while (i < lines.length && !isBlank(lines(i))) {
              expected += lines(i); i += 1
            }
          }
          if (!skip) {
            val exp = expected.result()
            try {
              tables.foreach { case (tn, t) => register(tn, t) }
              refreshViews()
              val rows = exec(spark, sql.toString, tables.keySet.toSet, order)
              val got = SltHash.toLines(rows, fmt, order)
              val hashRe = "(\\d+) values hashing to ([0-9a-f]{32})".r
              exp match {
                case Seq(hashRe(n, md5)) =>
                  val gotHash = SltHash.hash(rows, fmt, order)
                  if (got.length == n.toInt && gotHash == md5) passed += 1
                  else failed += s"$name: hash mismatch (${got.length} vs $n values) for: ${sql.toString.trim.take(160)}"
                case literal =>
                  if (got == literal) passed += 1
                  else failed += s"$name: value mismatch for: ${sql.toString.trim.take(160)} got=${got.take(6).mkString(",")} want=${literal.take(6).mkString(",")}"
              }
            } catch {
              case e: Exception =>
                failed += s"$name: query failed: ${sql.toString.trim.take(160)} -> ${String.valueOf(e.getMessage).take(200)}"
            }
          }
        } else {
          failed += s"$name: unrecognized record at line ${i + 1}: $header"
          i += 1
        }
      }
    }
    Outcome(passed, failed.result())
  }

  // ---- statement execution over the in-memory catalog -------------------

  private val createRe =
    """(?is)CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*""".r
  private val insertRe =
    """(?is)INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*VALUES\s*(.*)""".r
  private val dropRe =
    """(?is)DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r
  private val deleteRe =
    """(?is)DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*))?\s*""".r
  private val createViewRe =
    """(?is)CREATE\s+VIEW\s+(\w+)\s+AS\s+(.*)""".r
  private val dropViewRe =
    """(?is)DROP\s+VIEW\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r

  private def executeStatement(spark: SparkSession,
                               tables: mutable.Map[String, Table],
                               views: mutable.LinkedHashMap[String, String],
                               sql: String,
                               registerAll: () => Unit,
                               markViewsStale: () => Unit): Unit = sql match {
    case createRe(name, colDefs) =>
      val fields = colDefs.split(",").map(_.trim).filter(_.nonEmpty).map { cd =>
        val toks = cd.split("\\s+")
        val dt = toks(1).toUpperCase match {
          case t if t.startsWith("INT") || t.startsWith("BIGINT") => LongType
          case t if t.startsWith("REAL") || t.startsWith("FLOAT") ||
                    t.startsWith("DOUBLE") => DoubleType
          case t if t.startsWith("TEXT") || t.startsWith("VARCHAR") ||
                    t.startsWith("CHAR") || t.startsWith("STRING") => StringType
          case t if t.startsWith("TIMESTAMP") => TimestampNTZType
          case t if t.startsWith("DATE") => DateType
          case other => throw new IllegalArgumentException(s"SLT type $other")
        }
        StructField(toks(0), dt, nullable = true)
      }
      tables(name.toLowerCase) = new Table(StructType(fields.toSeq))

    case insertRe(name, colList, valuesPart) =>
      val t = tables.getOrElse(name.toLowerCase,
        throw new IllegalArgumentException(s"no such table $name"))
      val schema = t.schema
      val cols = Option(colList).filter(_ != null).map(_.split(",").map(_.trim))
        .getOrElse(schema.fieldNames)
      val colIdx = cols.map(c => schema.fieldIndex(c))
      tuples(valuesPart).foreach { tup =>
        val vals = splitValues(tup)
        require(vals.length == cols.length,
          s"INSERT arity ${vals.length} vs ${cols.length}")
        val row = new Array[Any](schema.length)
        vals.zipWithIndex.foreach { case (v, j) =>
          row(colIdx(j)) = parseLiteral(v, schema.fields(colIdx(j)).dataType)
        }
        t.rows += Row.fromSeq(row.toIndexedSeq)
      }
      t.dirty = true

    case dropRe(name) =>
      tables.remove(name.toLowerCase)
      spark.catalog.dropTempView(name)

    // DELETE evaluates its predicate through Spark SQL (3VL: only rows
    // where the predicate is TRUE are removed) and rewrites the in-memory
    // table — the statement surface the SQLite `index/delete` family uses.
    case deleteRe(name, where) =>
      val t = tables.getOrElse(name.toLowerCase,
        throw new IllegalArgumentException(s"no such table $name"))
      if (where == null) t.rows.clear()
      else {
        registerAll()
        val keep = spark.sql(
          s"SELECT * FROM ${name.toLowerCase} WHERE NOT($where) OR ($where) IS NULL")
          .collect()
        t.rows.clear()
        t.rows ++= keep
      }
      t.dirty = true

    case createViewRe(name, select) =>
      views(name.toLowerCase) = select.trim.stripSuffix(";")
      markViewsStale()

    case dropViewRe(name) =>
      views.remove(name.toLowerCase)
      spark.catalog.dropTempView(name)

    case other =>
      // anything else (CREATE [UNIQUE] INDEX, ANALYZE, REINDEX, ...)
      // affects only physical layout in the original engines — a no-op
      // for Spark temp views
      val u = other.toUpperCase
      if (!u.startsWith("CREATE INDEX") && !u.startsWith("CREATE UNIQUE INDEX") &&
          !u.startsWith("ANALYZE") && !u.startsWith("REINDEX")) {
        throw new IllegalArgumentException(s"unsupported SLT statement: $other")
      }
  }

  /** Split `(a,b),(c,d)` into tuple bodies, honoring quoted strings. */
  private def tuples(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0; var inStr = false; val cur = new StringBuilder
    s.foreach { ch =>
      if (inStr) { cur.append(ch); if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => cur.append(ch); inStr = true
        case '(' => depth += 1; if (depth > 1) cur.append(ch)
        case ')' => depth -= 1
          if (depth == 0) { out += cur.toString; cur.clear() } else cur.append(ch)
        case c => if (depth >= 1) cur.append(c)
      }
    }
    out.result()
  }

  /** Split a tuple body on commas outside quotes. */
  private def splitValues(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var inStr = false; val cur = new StringBuilder
    s.foreach { ch =>
      if (inStr) { cur.append(ch); if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => cur.append(ch); inStr = true
        case ',' => out += cur.toString.trim; cur.clear()
        case c => cur.append(c)
      }
    }
    out += cur.toString.trim
    out.result()
  }

  private def parseLiteral(v: String, dt: DataType): Any = {
    if (v.equalsIgnoreCase("NULL")) null
    else dt match {
      case LongType   => v.toLong
      case DoubleType => v.toDouble
      case StringType =>
        require(v.length >= 2 && v.head == '\'' && v.last == '\'',
          s"bad string literal $v")
        v.substring(1, v.length - 1)
      case TimestampNTZType =>
        val s = v.stripPrefix("'").stripSuffix("'")
        // invalid dates (e.g. Feb 29 of a non-leap year) load as NULL,
        // matching the reference's Calcite front-end behavior
        // (PostgresTimestampTests.java fixture comments)
        try {
          if (s.contains(" ")) {
            val Array(d, t) = s.split(" ", 2)
            java.time.LocalDateTime.of(java.time.LocalDate.parse(d),
              java.time.LocalTime.parse(t))
          } else java.time.LocalDate.parse(s).atStartOfDay()
        } catch { case _: java.time.DateTimeException => null }
      case DateType =>
        val s = v.stripPrefix("'").stripSuffix("'")
        try java.sql.Date.valueOf(java.time.LocalDate.parse(s).toString)
        catch { case _: java.time.DateTimeException => null }
      case other => throw new IllegalArgumentException(s"literal type $other")
    }
  }
}
