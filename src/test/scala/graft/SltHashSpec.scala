package graft

import graft.testing.SltHash
import graft.testing.SltHash._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SLT normalizer to the reference's formatting rules
  * (lib/sqlvalue/src/lib.rs:192-250) and to independently-computed md5s
  * (the digest of value-per-line text, lib/hashing/src/lib.rs:193-208). */
class SltHashSpec extends AnyFunSuite {

  test("value formatting rules") {
    assert(formatValue(null, 'I') === "NULL")
    assert(formatValue(7, 'I') === "7")
    assert(formatValue(2.5, 'R') === "2.500")
    assert(formatValue(2.999f, 'I') === "2")   // Rust `as i32` truncates
    assert(formatValue(-1.5, 'I') === "-1")
    assert(formatValue("", 'T') === "(empty)")
    assert(formatValue("a\tb✓", 'T') === "a@b@") // non-printables → @
    assert(formatValue("42", 'I') === "42")
    assert(formatValue(true, 'T') === "true")
    assert(formatValue(new java.math.BigDecimal("3.1400"), 'R') === "3.1400")
  }

  test("row sort vs value sort flattening") {
    val rows = Seq(Row(2, "b"), Row(1, "a"))
    assert(toLines(rows, "IT", NoSort) === Seq("2", "b", "1", "a"))
    assert(toLines(rows, "IT", RowSort) === Seq("1", "a", "2", "b"))
    assert(toLines(rows, "IT", ValueSort) === Seq("1", "2", "a", "b"))
  }

  test("md5 matches an independently computed digest") {
    // md5 of "1\na\n2\nb\n"
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("1\na\n2\nb\n".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(SltHash.hash(Seq(Row(1, "a"), Row(2, "b")), "IT", RowSort) === expected)
  }

  test("hash is order-insensitive under RowSort, sensitive under NoSort") {
    val a = Seq(Row(1, 2.0), Row(3, 4.0))
    val b = Seq(Row(3, 4.0), Row(1, 2.0))
    assert(SltHash.hash(a, "IR", RowSort) === SltHash.hash(b, "IR", RowSort))
    assert(SltHash.hash(a, "IR", NoSort) !== SltHash.hash(b, "IR", NoSort))
  }
}
