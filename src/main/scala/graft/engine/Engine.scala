package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** DDL-driven program driver: the reference's public API protocol
  * (compiler/backend/DBSPCompiler.java:40-57 — "compileStatement/s" called
  * repeatedly with CREATE TABLE / CREATE VIEW / INSERT, then the circuit is
  * retrieved). A program is a SQL script in which `CREATE TABLE` declares an
  * input, `CREATE VIEW` declares a standing query / output
  * (doc/sql/structure.rst:1-12), and INSERT statements are interpreted into
  * table contents at compile time, not run as operators
  * (CalciteToDBSPCompiler.java:1129-1154, frontend/TableContents.java:112).
  *
  * Spark-first realization: tables are typed in-session datasets registered
  * as temp views; views are registered as Spark temporary views, so Catalyst
  * performs the reference's whole Calcite pipeline (parse → validate →
  * decorrelate → optimize, SURVEY §3.1/§4.1) natively, lazily, at first
  * evaluation of each view. Nothing is collected to the driver: `table` and
  * `view` hand back lazy DataFrames that scale to any input size — register
  * a parquet/stream source with `registerSource` and the same script text
  * drives a 100 TB pipeline.
  */
final class Engine(val spark: SparkSession) {

  // Make the reference's SQL function spellings (ELEMENT, ST_POINT,
  // ST_DISTANCE, DECADE, …) resolvable in view text.
  graft.functions.SqlRegistry.register(spark)

  /** name → declared schema (with reference nullability: NOT NULL default). */
  private val tables = mutable.LinkedHashMap.empty[String, StructType]
  /** name → accumulated contents. */
  private val contents = mutable.HashMap.empty[String, DataFrame]
  /** view name → SQL text, in declaration order. */
  private val viewSql = mutable.LinkedHashMap.empty[String, String]

  /** Execute a whole script (statements separated by ';'; `--` line and
    * `/* */` block comments allowed anywhere outside string literals). */
  def executeScript(script: String): Unit =
    splitStatements(script).foreach(executeStatement)

  /** Execute one statement: CREATE TABLE | CREATE VIEW | INSERT INTO. */
  def executeStatement(stmt0: String): Unit = {
    val stmt = splitStatements(stmt0) match {
      case Seq() => return
      case Seq(one) => one.trim
      case more => throw new IllegalArgumentException(
        s"executeStatement got ${more.size} statements; use executeScript")
    }
    if (stmt.isEmpty) return
    val upper = stmt.toUpperCase
    if (upper.startsWith("CREATE TABLE")) createTable(stmt)
    else if (upper.startsWith("CREATE VIEW") ||
             upper.startsWith("CREATE OR REPLACE VIEW")) createView(stmt)
    else if (upper.startsWith("INSERT INTO")) insert(stmt)
    else throw new IllegalArgumentException(
      s"Engine accepts CREATE TABLE / CREATE VIEW / INSERT INTO, got: ${stmt.take(60)}")
  }

  /** Register an existing DataFrame (e.g. a parquet or stream source) as a
    * table — the scale path: contents never pass through the driver. */
  def registerSource(name: String, df: DataFrame): Unit = {
    tables(name) = df.schema
    contents(name) = df
    df.createOrReplaceTempView(name)
  }

  /** Current contents of a table. */
  def table(name: String): DataFrame =
    contents.getOrElse(name, emptyFor(name))

  /** Evaluate a view (lazy DataFrame over current table contents). */
  def view(name: String): DataFrame = {
    require(viewSql.contains(name), s"unknown view $name")
    spark.table(name)
  }

  /** Compile a declared view into an incremental circuit over this
    * engine's tables (SqlIncremental; throws UnsupportedPlanException for
    * plan shapes outside the v1 subset). Feed weighted deltas through an
    * `Incremental.Runner` built from `incrementalRunner`. */
  def incrementalCircuit(name: String): graft.streaming.Incremental.Inc = {
    require(viewSql.contains(name), s"unknown view $name")
    SqlIncremental.compile(spark, viewSql(name), tables.keys.toSet)
  }

  /** A step driver for a view's incremental circuit, with this engine's
    * declared table schemas as the input surface. */
  def incrementalRunner(name: String): graft.streaming.Incremental.Runner =
    new graft.streaming.Incremental.Runner(spark, incrementalCircuit(name),
      tables.keys.map(t => t -> emptyFor(t)).toMap)

  /** A SHARED step driver maintaining several views at once over one set
    * of input integrals — the reference's multi-view circuits (a circuit
    * catalog registers many output handles; MultiViewTests). The views are
    * compiled TOGETHER with structural CSE (SqlIncremental.compileAll):
    * sub-circuits that analyze to the same canonical Catalyst plan — a
    * shared CTE, the same aggregate, the same join subtree, even spelled
    * differently — become one `Inc` instance, so the Runner keeps ONE
    * trace per distinct computation and advances it once per step. */
  def incrementalRunner(names: Seq[String]): graft.streaming.Incremental.Runner = {
    names.foreach(n => require(viewSql.contains(n), s"unknown view $n"))
    new graft.streaming.Incremental.Runner(spark,
      SqlIncremental.compileAll(spark, names.map(n => n -> viewSql(n)),
        tables.keys.toSet),
      tables.keys.map(t => t -> emptyFor(t)).toMap)
  }

  /** Materialize a view to parquet — the sink operator
    * (DBSPSinkOperator.java:32: every CREATE VIEW is an output handle).
    * On a cluster this is the terminal exchange of the standing query. */
  def materialize(name: String, path: String): Unit =
    view(name).write.mode("overwrite").parquet(path)

  /** Declared views in declaration order (the circuit's sinks). */
  def views: Seq[String] = viewSql.keys.toSeq
  def tableNames: Seq[String] = tables.keys.toSeq
  def schemaOf(name: String): StructType = tables(name)

  // ---- CREATE TABLE ----------------------------------------------------

  private def createTable(stmt: String): Unit = {
    val m = raw"(?is)CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*".r
    stmt match {
      case m(name, colsSrc) =>
        val schema = StructType(splitTopLevel(colsSrc, ',').map(parseColumn))
        tables(name) = schema
        contents.remove(name)
        emptyFor(name).createOrReplaceTempView(name)
      case _ =>
        throw new IllegalArgumentException(s"cannot parse CREATE TABLE: ${stmt.take(80)}")
    }
  }

  /** `col TYPE [NULL | NOT NULL]` — non-nullable by default like the
    * reference (doc/sql/types.rst:37-41). */
  private def parseColumn(src: String): StructField = {
    val s = src.trim
    val m = raw"(?is)(\w+)\s+(.+?)(\s+NOT\s+NULL|\s+NULL)?\s*".r
    s match {
      case m(name, tpe, nullMod) =>
        val nullable = nullMod != null && nullMod.trim.equalsIgnoreCase("NULL")
        StructField(name, parseType(tpe.trim), nullable)
      case _ => throw new IllegalArgumentException(s"cannot parse column: $s")
    }
  }

  /** SQL type → Spark type, mirroring TypeCompiler.java:60-163. */
  private def parseType(t0: String): DataType = {
    val t = t0.trim.toUpperCase
    val dec = raw"(?:DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)".r
    val decP = raw"(?:DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*\)".r
    val vch = raw"(?:VARCHAR|CHAR)\s*(?:\(\s*\d+\s*\))?".r
    val arr = raw"(.+?)\s+ARRAY".r
    t match {
      case "BOOLEAN"                => BooleanType
      case "TINYINT"                => ByteType
      case "SMALLINT"               => ShortType
      case "INTEGER" | "INT"        => IntegerType
      case "BIGINT"                 => LongType
      case dec(p, s)                => DecimalType(p.toInt, s.toInt)
      case decP(p)                  => DecimalType(p.toInt, 0)
      case "FLOAT" | "REAL"         => FloatType
      case "DOUBLE"                 => DoubleType
      case vch()                    => StringType
      case "TIMESTAMP"              => TimestampNTZType // reference TIMESTAMP has no TZ
      case "DATE"                   => DateType
      case "INTERVAL YEAR TO MONTH" => YearMonthIntervalType()
      case "INTERVAL DAY TO SECOND" => DayTimeIntervalType()
      case "GEOMETRY"               => StructType(Seq(
        StructField("x", DoubleType), StructField("y", DoubleType)))
      case arr(inner)               => ArrayType(parseType(inner))
      case other =>
        throw new IllegalArgumentException(s"unsupported type: $other")
    }
  }

  // ---- CREATE VIEW -----------------------------------------------------

  private def createView(stmt: String): Unit = {
    val m = raw"(?is)CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.*)".r
    stmt match {
      case m(name, query) =>
        viewSql(name) = query
        spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS $query")
      case _ =>
        throw new IllegalArgumentException(s"cannot parse CREATE VIEW: ${stmt.take(80)}")
    }
  }

  // ---- INSERT (compile-time table contents, TableContents.java:112) ----

  private def insert(stmt: String): Unit = {
    val m = raw"(?is)INSERT\s+INTO\s+(\w+)\s+VALUES\s*(.*)".r
    stmt match {
      case m(name, valuesSrc) =>
        val schema = tables.getOrElse(name,
          throw new IllegalArgumentException(s"INSERT into undeclared table $name"))
        // Let Spark SQL parse the literal tuples, then cast to declared types.
        val parsed = spark.sql(s"SELECT * FROM (VALUES $valuesSrc)")
        require(parsed.schema.length == schema.length,
          s"INSERT arity ${parsed.schema.length} != table arity ${schema.length}")
        val casted = parsed.select(parsed.columns.zip(schema.fields).map {
          case (c, f) => col(c).cast(f.dataType).as(f.name)
        }.toSeq: _*)
        val next = contents.get(name) match {
          case Some(prev) => prev.unionAll(casted)
          case None       => casted
        }
        contents(name) = next
        next.createOrReplaceTempView(name)
      case _ =>
        throw new IllegalArgumentException(s"cannot parse INSERT: ${stmt.take(80)}")
    }
  }

  // ---- helpers ---------------------------------------------------------

  private def emptyFor(name: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], tables(name))

  /** Split a script on ';' outside single-quoted strings, stripping `--`
    * line comments and `/* */` block comments (also only outside strings —
    * a literal containing `--` or `;` passes through untouched; a doubled
    * `''` escape toggles out and back in, which preserves it verbatim). */
  private def splitStatements(script: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    val n = script.length
    while (i < n) {
      val c = script.charAt(i)
      if (inStr) {
        cur += c; if (c == '\'') inStr = false; i += 1
      } else if (c == '\'') {
        cur += c; inStr = true; i += 1
      } else if (c == '-' && i + 1 < n && script.charAt(i + 1) == '-') {
        while (i < n && script.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && script.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n &&
          !(script.charAt(i) == '*' && script.charAt(i + 1) == '/')) i += 1
        // Swallowing an unterminated comment would silently drop every
        // statement after the typo — fail loudly instead.
        if (i + 1 >= n) throw new IllegalArgumentException(
          "unterminated /* block comment in script")
        i += 2
        cur += ' ' // comments are separators, not glue
      } else if (c == ';') {
        out += cur.toString(); cur.clear(); i += 1
      } else { cur += c; i += 1 }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString()
    out.toSeq.filter(_.trim.nonEmpty)
  }

  /** Split `a INT, b DECIMAL(3,2)` on top-level commas only. */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case c if c == sep && depth == 0 => out += cur.toString(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}
