package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function parity layer: the reference's SQL functions that Spark
  * lacks as direct built-ins, expressed as composed Catalyst expressions
  * (never UDFs — every helper here stays inside whole-stage codegen).
  *
  * Reference implementations these mirror:
  *  - EXTRACT's 18 units: lib/sqllib/src/timestamp.rs:158-318
  *  - FLOOR/CEIL(ts TO unit): timestamp.rs:114-156
  *  - ST_POINT / ST_DISTANCE: lib/sqllib/src/geopoint.rs:26-55
  *  - ELEMENT: ExpressionCompiler.java:485-500 (1-elem array → scalar,
  *    NULL if empty, error if >1)
  *  - TIMESTAMPDIFF: Calcite rewrite exercised in ComplexQueriesTest.java:400-401
  */
object SqlFunctions {

  // ---- EXTRACT units Spark has no single built-in for (Postgres semantics,
  //      timestamp.rs:158-318). All return BIGINT to match EXTRACT's type.

  /** floor(year/10) — EXTRACT(DECADE). */
  def decade(ts: Column): Column = floor(year(ts) / 10).cast(LongType)

  /** ceil(year/100) for CE dates — EXTRACT(CENTURY). */
  def century(ts: Column): Column = ceil(year(ts) / lit(100.0)).cast(LongType)

  /** ceil(year/1000) — EXTRACT(MILLENNIUM). */
  def millennium(ts: Column): Column = ceil(year(ts) / lit(1000.0)).cast(LongType)

  /** ISO day of week, Monday=1..Sunday=7 — EXTRACT(ISODOW). */
  def isodow(ts: Column): Column = (weekday(ts) + 1).cast(LongType)

  /** Postgres day of week, Sunday=0..Saturday=6 — EXTRACT(DOW). */
  def dow(ts: Column): Column = (dayofweek(ts) - 1).cast(LongType)

  /** ISO week-numbering year: the year of this week's Thursday —
    * EXTRACT(ISOYEAR). */
  def isoyear(ts: Column): Column =
    year(date_add(to_date(ts), lit(4) - (weekday(ts) + 1))).cast(LongType)

  /** Seconds since epoch (UTC wall clock), truncated — EXTRACT(EPOCH) as
    * i64 seconds (timestamp.rs:266-272). */
  def epochSecond(ts: Column): Column =
    floor(unix_micros(ts.cast(TimestampType)) / lit(1000000L)).cast(LongType)

  /** Microseconds within the minute incl. seconds — EXTRACT(MICROSECOND). */
  def microsecondOfMinute(ts: Column): Column =
    (second(ts).cast(LongType) * 1000000L +
      pmod(unix_micros(ts.cast(TimestampType)), lit(1000000L)))

  /** Milliseconds within the minute incl. seconds — EXTRACT(MILLISECOND). */
  def millisecondOfMinute(ts: Column): Column =
    (microsecondOfMinute(ts) / 1000L).cast(LongType)

  // ---- FLOOR / CEIL (ts TO unit) — timestamp.rs:114-156

  /** FLOOR(ts TO unit); unit ∈ year|quarter|month|week|day|hour|minute|second. */
  def floorTs(ts: Column, unit: String): Column = date_trunc(unit, ts)

  /** CEIL(ts TO unit): the truncation itself when already on a boundary,
    * else the next boundary. */
  def ceilTs(ts: Column, unit: String): Column = {
    val fl = date_trunc(unit, ts)
    when(ts === fl, fl).otherwise(fl + expr(s"INTERVAL 1 $unit"))
  }

  // ---- TIMESTAMPDIFF (Calcite semantics: completed units between a and b)

  /** Completed seconds from a to b. */
  def timestampdiffSecond(a: Column, b: Column): Column =
    epochSecond(b) - epochSecond(a)

  /** Completed days from a to b (floor division of the second diff). */
  def timestampdiffDay(a: Column, b: Column): Column =
    floor(timestampdiffSecond(a, b) / lit(86400L)).cast(LongType)

  /** Completed hours from a to b. */
  def timestampdiffHour(a: Column, b: Column): Column =
    floor(timestampdiffSecond(a, b) / lit(3600L)).cast(LongType)

  /** Completed calendar months from a to b (date-resolution Calcite
    * semantics: month index difference, minus one if the day-of-month has
    * not been reached yet). */
  def timestampdiffMonth(a: Column, b: Column): Column =
    ((year(b) - year(a)) * 12 + (month(b) - month(a)) -
      when(dayofmonth(b) < dayofmonth(a), 1).otherwise(0)).cast(LongType)

  // ---- Geo (geopoint.rs:26-55): point = (x,y) struct, Euclidean distance.

  /** ST_POINT(x,y) — a {x: double, y: double} struct (no UDT needed). */
  def stPoint(x: Column, y: Column): Column =
    struct(x.cast(DoubleType).as("x"), y.cast(DoubleType).as("y"))

  /** ST_DISTANCE(p1,p2) — Euclidean; sqrt/mul/sub are correctly-rounded
    * IEEE ops, so this is bit-deterministic on any engine. */
  def stDistance(p1: Column, p2: Column): Column = {
    val dx = p1.getField("x") - p2.getField("x")
    val dy = p1.getField("y") - p2.getField("y")
    sqrt(dx * dx + dy * dy)
  }

  // ---- Arrays

  /** ELEMENT(arr): the single element of a 1-element array, NULL for empty,
    * error for >1 (ExpressionCompiler.java:485-500). */
  def element(arr: Column): Column =
    when(size(arr) === 1, element_at(arr, 1))
      .when(size(arr) === 0 || arr.isNull, lit(null))
      .otherwise(raise_error(lit("ELEMENT of array with more than 1 element")))

  // ---- Floating-point division with IEEE-754 zero-divisor semantics.
  //      Spark's non-ANSI `/` yields NULL for any zero divisor; the
  //      reference's f64 division is Rust's, i.e. IEEE (0.0/0.0 = NaN,
  //      x/0.0 = ±Inf — EndToEndTests.java floatDivTest). Signed-zero
  //      divisors are approximated as +0 (Spark's `===` equates -0.0).

  def fdiv(a: Column, b: Column): Column =
    when(b === 0.0,
      when(a.isNull, lit(null).cast(DoubleType))
        .when(a === 0.0, lit(Double.NaN))
        .when(a > 0, lit(Double.PositiveInfinity))
        .otherwise(lit(Double.NegativeInfinity)))
      .otherwise(a / b)

  // ---- Deterministic rounding for transcendental results: libm results may
  //      differ by 1 ULP across engines; fixing to 6 decimals makes the
  //      cross-engine compare stable without hiding real errors.

  def fix6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** SQL (DuckDB) spelling of fix6 for oracle queries. */
  def sqlFix6(x: String): String = s"(FLOOR(($x) * 1000000.0 + 0.5) / 1000000.0)"
}
