package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic-reduction helpers for oracle parity.
  *
  * Floating-point SUM/AVG is reduction-order dependent, and Spark's
  * partial-aggregate order differs from any other engine's, so a raw
  * `sum(double)` can never reliably hash-match an oracle. Casting each row to
  * DECIMAL first is not enough either: Spark rounds the double's shortest
  * string representation (`BigDecimal.valueOf`) while DuckDB rounds
  * `x * 10^scale` computed in double arithmetic — measured disagreement
  * ~1.3% of random doubles at scale 10, which poisons a 60k-row sum at the
  * final ULP.
  *
  * The portable fix is a reduction both engines compute bit-identically from
  * IEEE-754 semantics alone:
  *
  *   per row:  floor(x * 10000.0 + 0.5)    — two IEEE double ops + exact floor
  *   reduce :  SUM over DECIMAL(38,0)      — exact integer addition, assoc.
  *   finish :  cast to DOUBLE, / 10000.0   — deterministic rounding + division
  *
  * i.e. a fixed-point sum at 4 decimal places. Every step is identical in any
  * IEEE-conforming engine, independent of partitioning or reduction order —
  * which is exactly what a 1000-executor cluster needs for reproducible
  * results. The DECIMAL(38,0) accumulator cannot overflow at 100 TB scale
  * (sum of |x|<1e6 over 1e10 rows ≈ 1e20 « 1e38), unlike a BIGINT one.
  *
  * The reference sidesteps this by doing decimal arithmetic end-to-end with
  * MAX_PRECISION=38, MAX_SCALE=10 (ir/type/primitive/DBSPTypeDecimal.java:39-40);
  * our source columns are DOUBLE, so we pin the reduction instead.
  *
  * Per-row double arithmetic (a*b, a-b) IS deterministic (IEEE 754), so
  * expressions like `price * (1 - discount)` stay in double; only the
  * *reduction* goes through fixed point.
  */
object Exact {
  private val DecAcc = DecimalType(38, 0)
  private val Scale = 10000.0

  /** floor(x*1e4 + 0.5) as an exact decimal integer — bit-identical per row
    * in Spark and DuckDB. */
  def fix(c: Column): Column =
    floor(c * lit(Scale) + lit(0.5)).cast(DecAcc)

  /** Deterministic fixed-point(4) sum of a double column, as DOUBLE. */
  def dsum(c: Column): Column = (sum(fix(c)).cast(DoubleType) / lit(Scale))

  /** Deterministic average: fixed-point sum / non-null count. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL snippets for the DuckDB oracle side (same IEEE ops). */
  def sqlFix(x: String): String =
    s"CAST(FLOOR(($x) * 10000.0 + 0.5) AS DECIMAL(38,0))"
  def sqlDsum(x: String): String =
    s"(CAST(SUM(${sqlFix(x)}) AS DOUBLE) / 10000.0)"
  def sqlDavg(x: String): String = s"(${sqlDsum(x)} / COUNT($x))"
}
