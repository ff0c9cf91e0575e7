package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins README.md's quantitative claims to the registries they describe,
  * so the counts cannot drift as queries/corpora grow (they drifted three
  * rounds running when maintained by hand). Every number the README
  * states is re-derived here from the same source of truth the driver
  * uses: `SparkEntry.queries` for the oracle-gate count, the SLT corpus
  * files for query-record and family counts. */
class DocConsistencySpec extends AnyFunSuite {

  private lazy val readme = {
    val src = scala.io.Source.fromFile("README.md", "UTF-8")
    try src.mkString finally src.close()
  }
  private def nums(pattern: scala.util.matching.Regex): Seq[Long] =
    pattern.findAllMatchIn(readme)
      .map(_.group(1).replace(",", "").toLong).toSeq

  test("README oracle-checked query count equals SparkEntry.queries.size") {
    val claims = nums("""(\d[\d,]*) queries are\s+oracle-checked""".r)
    assert(claims.nonEmpty, "README no longer states the oracle-gate count")
    val actual = SparkEntry.queries.size.toLong
    assert(claims.forall(_ == actual),
      s"README claims $claims oracle-checked queries; registry has $actual")
    // every query must also be either oracle-checked or a documented
    // rows-only entry; a key present in oracleSql but not queries is dead
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
  }

  test("README SLT corpus query/family counts equal the frozen corpus") {
    val dir = new java.io.File("src/test/resources/slt")
    val files = dir.listFiles((_, n) => n.endsWith(".test")).toSeq
    assert(files.nonEmpty, "SLT corpus directory missing")
    val records = files.map { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().count(_.startsWith("query")) finally src.close()
    }.sum.toLong
    val qClaims = nums("""(\d[\d,]*)-query""".r)
    assert(qClaims.nonEmpty, "README no longer states the SLT corpus size")
    assert(qClaims.forall(_ == records),
      s"README claims $qClaims SLT queries; corpus has $records")
    val fClaims = nums("""(\d[\d,]*)-family""".r)
    assert(fClaims.forall(_ == files.size.toLong),
      s"README claims $fClaims SLT families; corpus has ${files.size}")
  }
}
