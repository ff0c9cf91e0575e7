package graft.testing

import org.apache.spark.sql.{DataFrame, Row}

/** SqlLogicTest-style result normalization + MD5, mirroring the
  * reference's verification path (lib/hashing/src/lib.rs:191-241 "mimics
  * the md5 checksum computation from SqlLogicTest"; value formatting in
  * lib/sqlvalue/src/lib.rs:192-250; the SLT runner picks row-compare or
  * hash via this format — sqllogictest/Main.java:213-225).
  *
  * Rules implemented:
  *  - per-column format char: 'I' integer, 'R' real (printed %.3f),
  *    'T' text (empty → "(empty)", non-printable ASCII → '@');
  *  - NULL prints "NULL" for every type;
  *  - reals under 'I' truncate to int (Rust `as i32`);
  *  - rows flatten value-per-line; `Value` sort order sorts the flattened
  *    values, `Row` order sorts whole rows lexicographically;
  *  - md5 of the '\n'-joined (trailing newline) builder.
  */
object SltHash {

  sealed trait SortOrder
  case object NoSort extends SortOrder
  case object RowSort extends SortOrder
  case object ValueSort extends SortOrder

  private def translateString(s: String): String =
    if (s.isEmpty) "(empty)"
    else s.map(c => if (c < ' ' || c > '~') '@' else c)

  /** Format one value per SLT rules given its format char. */
  def formatValue(v: Any, fmt: Char): String = v match {
    case null => "NULL"
    // SLT's integer format for booleans is the SQLite convention (no bool
    // type: 1/0) — DuckDB-frozen expectations render them the same way.
    case b: Boolean if fmt == 'I' => if (b) "1" else "0"
    case b: Boolean => b.toString
    case f: Float if fmt == 'I' => f.toInt.toString
    case d: Double if fmt == 'I' => d.toInt.toString
    case f: Float => f"${f.toDouble}%.3f"
    case d: Double => f"$d%.3f"
    case s: String if fmt == 'I' =>
      scala.util.Try(s.trim.toDouble.toInt).getOrElse(0).toString
    case s: String => translateString(s)
    case bd: java.math.BigDecimal => bd.toPlainString
    // temporal values print in the ISO-with-space form the postgres-derived
    // vectors use: fractional seconds only when nonzero, micros precision
    case ts: java.time.LocalDateTime =>
      val base = f"${ts.getYear}%04d-${ts.getMonthValue}%02d-${ts.getDayOfMonth}%02d " +
        f"${ts.getHour}%02d:${ts.getMinute}%02d:${ts.getSecond}%02d"
      val micros = ts.getNano / 1000
      if (micros == 0) base else f"$base.$micros%06d"
    case ts: java.sql.Timestamp => formatValue(ts.toLocalDateTime, fmt)
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case other => other.toString
  }

  /** Rows → flattened SLT lines in the requested order. */
  def toLines(rows: Seq[Row], format: String, order: SortOrder): Seq[String] = {
    val formatted = rows.map { r =>
      require(r.length == format.length,
        s"Mismatched format ${format.length} vs len ${r.length}")
      (0 until r.length).map(i => formatValue(r.get(i), format.charAt(i)))
    }
    order match {
      case NoSort    => formatted.flatten
      case ValueSort => formatted.flatten.sorted
      case RowSort   =>
        formatted.sortWith { (a, b) =>
          a.zip(b).collectFirst { case (x, y) if x != y => x < y }.getOrElse(false)
        }.flatten
    }
  }

  /** The SLT md5: hex digest of value-per-line text (trailing newline). */
  def hash(rows: Seq[Row], format: String, order: SortOrder = RowSort): String = {
    val builder = toLines(rows, format, order).map(_ + "\n").mkString
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(builder.getBytes("UTF-8"))
    digest.map("%02x".format(_)).mkString
  }

  def hash(df: DataFrame, format: String, order: SortOrder): String =
    hash(df.collect().toSeq, format, order)
}
