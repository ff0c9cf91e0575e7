package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Port of the reference's PostgresNumericTests (compiler/postgres/
  * PostgresNumericTests.java, itself adapted from postgres
  * src/test/regress/expected/numeric.out): NUMERIC(25,10) pairwise
  * add/sub/mul/div plus sqrt/ln/log10, checked against the
  * postgres-expected tables — the assertion (like the reference's) is
  * that the view of mismatching results is EMPTY. The fixture INSERTs are
  * extracted verbatim into resources/pg/numeric_fixture.sql.
  *
  * Deviations mirrored from the reference: '1/0'-style entries and 'NaN'
  * expected values load as NULL (decimal has no NaN; reference notes "In
  * postgres this is NaN"), and NULL != x is never true, so those rows
  * drop out of the mismatch view in both engines the same way. */
class PostgresNumericSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("pg-numeric")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val insertRe =
    """INSERT INTO (\w+) VALUES \(([^)]*)\);""".r

  override def beforeAll(): Unit = {
    val in = getClass.getResourceAsStream("/pg/numeric_fixture.sql")
    require(in != null, "missing numeric fixture")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    val byTable = lines.collect { case insertRe(tbl, vals) => tbl -> vals }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byTable.foreach { case (tbl, tuples) =>
      val twoKeys = tuples.head.count(_ == ',') == 2
      val cols = if (twoKeys) "c1, c2, c3" else "c1, c2"
      val schema =
        if (twoKeys)
          "CAST(c1 AS INT) AS id1, CAST(c2 AS INT) AS id2, CAST(c3 AS DECIMAL(25,10)) AS expected"
        else "CAST(c1 AS INT) AS id, CAST(c2 AS DECIMAL(25,10)) AS expected"
      val values = tuples.map(t => s"($t)").mkString(", ")
      spark.sql(s"SELECT $schema FROM (VALUES $values AS t($cols))")
        .createOrReplaceTempView(tbl)
    }
    // num_data uses (id, val) naming like the reference DDL. Arithmetic
    // inputs are DECIMAL(19,10) — every fixture value fits (max 8 integer
    // digits) and Spark's precision-loss rule then keeps >= 10 fractional
    // digits through *, /: at (25,10) inputs a product's 51-digit ideal
    // precision is capped to 38 by dropping scale to 7, which loses digits
    // postgres keeps. (The reference's Rust decimal has 28 significant
    // digits and makes the same trade at a different width.)
    spark.sql("SELECT id AS id, CAST(expected AS DECIMAL(19,10)) AS val FROM num_data")
      .createOrReplaceTempView("num_data_t")
  }

  /** Assert the reference's mismatch view is empty AND the join actually
    * covered the expected rows (guards against vacuous emptiness). */
  private def checkPairwise(resultExpr: String, expTable: String,
                            expExpr: String = "expected"): Unit = {
    val results = spark.sql(
      s"""SELECT t1.id AS id1, t2.id AS id2, CAST($resultExpr AS DECIMAL(25,10)) AS results
          FROM num_data_t t1 CROSS JOIN num_data_t t2""")
    results.createOrReplaceTempView("num_result")
    val joined = spark.sql(
      s"""SELECT t1.id1, t1.id2, t1.results, $expExpr AS expected
          FROM num_result t1 JOIN $expTable t2
          ON t1.id1 = t2.id1 AND t1.id2 = t2.id2""")
    assert(joined.count() === 100L, s"$expTable: join lost rows")
    val mismatches = joined.filter("results != expected").collect()
    assert(mismatches.isEmpty,
      s"$expTable: ${mismatches.take(5).mkString("; ")}")
  }

  private def checkUnary(resultExpr: String, expTable: String,
                         where: String = "true"): Unit = {
    val joined = spark.sql(
      s"""SELECT t1.id, CAST($resultExpr AS DECIMAL(25,10)) AS results, t2.expected
          FROM num_data_t t1 JOIN $expTable t2 ON t1.id = t2.id
          WHERE $where""")
    assert(joined.count() >= 8L, s"$expTable: join lost rows")
    val mismatches = joined.filter("results != expected").collect()
    assert(mismatches.isEmpty,
      s"$expTable: ${mismatches.take(5).mkString("; ")}")
  }

  test("pairwise addition matches postgres expected") {
    checkPairwise("t1.val + t2.val", "num_exp_add")
  }

  test("pairwise addition with ROUND(.., 10)") {
    checkPairwise("round(t1.val + t2.val, 10)", "num_exp_add", "round(expected, 10)")
  }

  test("pairwise subtraction matches postgres expected") {
    checkPairwise("t1.val - t2.val", "num_exp_sub")
  }

  test("pairwise subtraction with ROUND(.., 40)") {
    checkPairwise("round(t1.val - t2.val, 40)", "num_exp_sub", "round(expected, 40)")
  }

  test("pairwise multiplication matches postgres expected") {
    checkPairwise("t1.val * t2.val", "num_exp_mul")
  }

  test("pairwise multiplication with ROUND(.., 30)") {
    checkPairwise("round(t1.val * t2.val, 30)", "num_exp_mul", "round(expected, 30)")
  }

  test("pairwise division matches postgres expected") {
    checkPairwise("t1.val / t2.val", "num_exp_div")
  }

  test("pairwise division with ROUND(.., 10)") {
    checkPairwise("round(t1.val / t2.val, 10)", "num_exp_div", "round(expected, 10)")
  }

  test("SQRT(ABS(val)) matches postgres expected") {
    checkUnary("SQRT(ABS(t1.val))", "num_exp_sqrt")
  }

  test("LN(ABS(val)) matches postgres expected for nonzero values") {
    checkUnary("LN(ABS(t1.val))", "num_exp_ln", "t1.val != 0")
  }

  test("LOG10(ABS(val)) matches postgres expected for nonzero values") {
    checkUnary("LOG10(ABS(t1.val))", "num_exp_log10", "t1.val != 0")
  }

  test("double special values follow IEEE (postgres testSpecialValues)") {
    // key cells of the reference's 7x7 special-value matrix
    val r = spark.sql(
      """SELECT CAST('Infinity' AS DOUBLE) + CAST('-Infinity' AS DOUBLE) AS s,
                CAST('Infinity' AS DOUBLE) - CAST('Infinity' AS DOUBLE) AS d,
                0E0 * CAST('Infinity' AS DOUBLE) AS p,
                CAST('nan' AS DOUBLE) + 1E0 AS n,
                CAST('-Infinity' AS DOUBLE) * CAST('-Infinity' AS DOUBLE) AS pp""").collect()(0)
    assert(r.getDouble(0).isNaN && r.getDouble(1).isNaN && r.getDouble(2).isNaN && r.getDouble(3).isNaN)
    assert(r.getDouble(4).isPosInfinity)
  }
}
