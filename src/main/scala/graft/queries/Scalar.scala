package graft.queries

import graft.Tables
import graft.functions.SqlFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-expression surface: arithmetic with NULL-on-div-zero, comparisons
  * incl. IS [NOT] DISTINCT FROM, 3-valued boolean logic, bitwise & shifts,
  * CASE (both forms), string concat `||`, math functions, geo, and the cast
  * matrix.
  *
  * Reference: ExpressionCompiler.visitCall dispatch (ExpressionCompiler.java
  * :288-554); div-by-zero→NULL lib/sqllib/src/lib.rs:245-352; bitwise
  * lib/genlib/src/lib.rs:106-204; casts lib/sqllib/src/casts.rs (319 fns);
  * geo lib/sqllib/src/geopoint.rs:26-55. Spark's non-ANSI mode already
  * matches the NULL-propagating semantics (SURVEY §1.2), so nearly all of
  * this is built-in expressions; the oracle SQL encodes reference semantics
  * where DuckDB differs (e.g. DuckDB rounds double→int casts, the reference
  * truncates like Rust `as`).
  */
object Scalar {
  type QFn = (SparkSession, String) => DataFrame
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val defs: Map[String, QFn] = Map(
    // Arithmetic incl. div-by-zero→NULL (never an error, lib.rs:245-352)
    "q44_arith_divzero" -> ((s, d) =>
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") + col("l_suppkey") * 2).as("add_mul"),
        (-col("l_partkey")).as("neg"),
        (col("l_partkey") % 7).as("mod7"),
        // divisor (l_linenumber - 1) is 0 on first lines → NULL, not error
        (col("l_partkey") / (col("l_linenumber") - 1)).as("div_maybe_zero"),
        (col("l_extendedprice") / (col("l_quantity") - col("l_quantity"))).as("ddiv_zero"),
        floor(col("l_partkey") / when(col("l_linenumber") > 1, col("l_linenumber") - 1))
          .cast(LongType).as("idiv"))),

    // Comparisons + IS [NOT] DISTINCT FROM (`<=>`, ExpressionCompiler:315-332)
    "q45_comparisons" -> ((s, d) => {
      val nullableQty = when(col("l_quantity") > 25, col("l_quantity"))
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") < 25).as("lt"),
        (col("l_quantity") >= 25).as("ge"),
        (col("l_returnflag") === "R").as("eq_str"),
        (col("l_returnflag") =!= "R").as("ne_str"),
        nullableQty.as("nq"),
        (nullableQty <=> col("l_quantity")).as("is_not_distinct"),
        (!(nullableQty <=> col("l_quantity"))).as("is_distinct"),
        col("l_quantity").between(20, 30).as("btw"))
    }),

    // 3-valued boolean logic (ExpressionCompiler:333-348; lib.rs:59-147)
    "q46_three_valued" -> ((s, d) => {
      val a = when(col("l_quantity") > 25, col("l_quantity") > 40)     // nullable bool
      val b = when(col("l_discount") > 0.05, col("l_discount") > 0.08) // nullable bool
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        a.as("a"), b.as("b"),
        (a && b).as("a_and_b"),
        (a || b).as("a_or_b"),
        (!a).as("not_a"),
        expr("(CASE WHEN l_quantity > 25 THEN l_quantity > 40 END) IS TRUE").as("a_is_true"),
        expr("(CASE WHEN l_quantity > 25 THEN l_quantity > 40 END) IS NOT FALSE").as("a_is_not_false"),
        a.isNull.as("a_is_null"))
    }),

    // Bitwise & shifts (lib/genlib/src/lib.rs:106-204)
    "q47_bitwise" -> ((s, d) =>
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_partkey").bitwiseAND(col("l_suppkey")).as("band"),
        col("l_partkey").bitwiseOR(col("l_suppkey")).as("bor"),
        col("l_partkey").bitwiseXOR(col("l_suppkey")).as("bxor"),
        bitwise_not(col("l_partkey")).as("bnot"),
        shiftleft(col("l_partkey").cast(IntegerType) % 16, 3).cast(LongType).as("shl"),
        shiftright(col("l_partkey").cast(IntegerType), 2).cast(LongType).as("shr"))),

    // CASE, both forms (switched + searched, ExpressionCompiler:384-433)
    "q48_case_forms" -> ((s, d) =>
      T(s, d, "orders").select(
        col("o_orderkey"),
        // switched CASE on a value
        when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "P", "pending")
          .otherwise("unknown").as("status_word"),
        // searched CASE with fall-through to NULL
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid").as("size_band"))),

    // String concat `||` with NULL propagation (ExpressionCompiler:513-521;
    // the only string op the reference implements, doc/sql/string.rst:4)
    "q49_concat" -> ((s, d) => {
      val maybeName = when(col("c_acctbal") > 0, col("c_name"))
      T(s, d, "customer").select(
        col("c_custkey"),
        concat(lit("Hi "), col("c_name")).as("greet"),
        concat(col("c_name"), lit("#"), col("c_custkey").cast(StringType)).as("tagged"),
        concat(lit("maybe:"), maybeName).as("null_prop"))
    }),

    // Math: ABS/LN/LOG10/POWER/ROUND/SQRT/EXP (ExpressionCompiler:444-509).
    // Transcendentals are fixed to 6 decimals — libm may differ by 1 ULP
    // across engines; sqrt is correctly-rounded IEEE so it stays raw.
    "q50_math" -> ((s, d) =>
      T(s, d, "lineitem")
        .select(col("l_quantity").as("q")).distinct()
        .select(
          col("q"),
          abs(-col("q")).as("abs_neg"),
          fix6(log(col("q") + 1)).as("ln_fix"),
          fix6(log10(col("q") + 1)).as("log10_fix"),
          fix6(pow(col("q"), lit(2.0))).as("pow2_fix"),
          sqrt(col("q")).as("sqrt_q"),
          fix6(exp(col("q") / 50)).as("exp_fix"),
          floor(col("q") * 3.7).as("floor_x"),
          ceil(col("q") * 3.7).as("ceil_x"))),

    // Geo: ST_POINT + ST_DISTANCE (geopoint.rs:26-55) — Euclidean distance
    // between synthetic per-supplier and per-customer points. The gate
    // projection unpacks the point structs into scalar x/y columns (driver
    // pandas can't hash struct cells); the struct-typed ST_POINT form is
    // asserted in DomainSpec.
    "q52_geo" -> ((s, d) => {
      val c = T(s, d, "customer").select(col("c_custkey"),
        stPoint(col("c_custkey") % 100, col("c_nationkey") * 2).as("p1"))
      val n = T(s, d, "nation").select(col("n_nationkey"),
        stPoint(lit(50.0), col("n_nationkey")).as("p2"))
      c.join(broadcast(n), col("c_custkey") % 25 === col("n_nationkey"))
        .select(col("c_custkey"),
          col("p1.x").as("p1_x"), col("p1.y").as("p1_y"),
          col("p2.x").as("p2_x"), col("p2.y").as("p2_y"),
          stDistance(col("p1"), col("p2")).as("dist"))
    }),

    // CAST matrix samples (casts.rs: 319 pairwise casts; reference truncates
    // float→int like Rust `as`, parses 'true'/'false' for string→bool)
    "q51_casts" -> ((s, d) =>
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(IntegerType).cast(LongType).as("d2i"),
        (col("l_extendedprice") * 1.37).cast(LongType).as("d2l_trunc"),
        col("l_partkey").cast(DoubleType).as("i2d"),
        col("l_partkey").cast(StringType).as("i2s"),
        concat(lit(""), col("l_suppkey")).cast(LongType).as("s2i"),
        (col("l_quantity") * 2).cast(StringType).cast(DoubleType).as("s2d"),
        when(col("l_quantity") > 25, "true").otherwise("false")
          .cast(BooleanType).as("s2b"),
        (col("l_quantity") > 25).cast(IntegerType).cast(LongType).as("b2i"),
        col("l_shipdate").cast(DateType).as("ts2date"),
        col("l_shipdate").cast(DateType).cast(TimestampNTZType).as("date2ts"))),

    // Levenshtein edit distance (beyond-reference; the fuzzy-match kernel
    // of entity resolution / near-dup adjudication). Spark's levenshtein
    // and DuckDB's compute the identical classic DP, so values hash-match.
    // The pairing is a keyed self-join over a 25-row dimension — at scale
    // the same expression runs inside the LSH-bucketed candidate verify
    // (Dedup.scala), never over a full cross product.
    "q136_edit_distance" -> ((s, d) => {
      val n1 = T(s, d, "nation")
        .select(col("n_nationkey").as("k1"), col("n_name").as("nm1"))
      val n2 = T(s, d, "nation")
        .select(col("n_nationkey").as("k2"), col("n_name").as("nm2"))
      n1.join(n2, col("k1") < col("k2"))
        .select(col("k1"), col("k2"),
          levenshtein(col("nm1"), col("nm2")).cast(LongType).as("dist"),
          levenshtein(col("nm1"), lit("NATION_0")).cast(LongType).as("dist0"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q136_edit_distance" ->
      """SELECT n1.n_nationkey AS k1, n2.n_nationkey AS k2,
                levenshtein(n1.n_name, n2.n_name) AS dist,
                levenshtein(n1.n_name, 'NATION_0') AS dist0
         FROM nation n1 JOIN nation n2 ON n1.n_nationkey < n2.n_nationkey""",
    "q44_arith_divzero" ->
      """SELECT l_orderkey, l_linenumber,
            (l_partkey + l_suppkey * 2) AS add_mul,
            (-l_partkey) AS neg,
            (l_partkey % 7) AS mod7,
            (l_partkey / NULLIF(l_linenumber - 1, 0)) AS div_maybe_zero,
            (l_extendedprice / NULLIF(l_quantity - l_quantity, 0.0)) AS ddiv_zero,
            CAST(FLOOR(l_partkey / (CASE WHEN l_linenumber > 1 THEN l_linenumber - 1 END)) AS BIGINT) AS idiv
         FROM lineitem""",
    "q45_comparisons" ->
      """SELECT l_orderkey, l_linenumber,
            (l_quantity < 25) AS lt,
            (l_quantity >= 25) AS ge,
            (l_returnflag = 'R') AS eq_str,
            (l_returnflag <> 'R') AS ne_str,
            (CASE WHEN l_quantity > 25 THEN l_quantity END) AS nq,
            ((CASE WHEN l_quantity > 25 THEN l_quantity END) IS NOT DISTINCT FROM l_quantity) AS is_not_distinct,
            ((CASE WHEN l_quantity > 25 THEN l_quantity END) IS DISTINCT FROM l_quantity) AS is_distinct,
            (l_quantity BETWEEN 20 AND 30) AS btw
         FROM lineitem""",
    "q46_three_valued" ->
      """SELECT l_orderkey, l_linenumber, a, b,
            (a AND b) AS a_and_b, (a OR b) AS a_or_b, (NOT a) AS not_a,
            (a IS TRUE) AS a_is_true, (a IS NOT FALSE) AS a_is_not_false,
            (a IS NULL) AS a_is_null
         FROM (SELECT l_orderkey, l_linenumber,
                 CASE WHEN l_quantity > 25 THEN l_quantity > 40 END AS a,
                 CASE WHEN l_discount > 0.05 THEN l_discount > 0.08 END AS b
               FROM lineitem) t""",
    "q47_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
            (l_partkey & l_suppkey) AS band,
            (l_partkey | l_suppkey) AS bor,
            xor(l_partkey, l_suppkey) AS bxor,
            (~l_partkey) AS bnot,
            CAST((CAST(l_partkey AS INT) % 16) << 3 AS BIGINT) AS shl,
            CAST(CAST(l_partkey AS INT) >> 2 AS BIGINT) AS shr
         FROM lineitem""",
    "q48_case_forms" ->
      """SELECT o_orderkey,
            CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
                 WHEN 'P' THEN 'pending' ELSE 'unknown' END AS status_word,
            CASE WHEN o_totalprice > 300000 THEN 'big'
                 WHEN o_totalprice > 100000 THEN 'mid' END AS size_band
         FROM orders""",
    "q49_concat" ->
      """SELECT c_custkey,
            'Hi ' || c_name AS greet,
            c_name || '#' || CAST(c_custkey AS VARCHAR) AS tagged,
            'maybe:' || (CASE WHEN c_acctbal > 0 THEN c_name END) AS null_prop
         FROM customer""",
    "q50_math" -> {
      s"""SELECT q,
            ABS(-q) AS abs_neg,
            ${sqlFix6("LN(q + 1)")} AS ln_fix,
            ${sqlFix6("LOG10(q + 1)")} AS log10_fix,
            ${sqlFix6("POWER(q, 2.0)")} AS pow2_fix,
            SQRT(q) AS sqrt_q,
            ${sqlFix6("EXP(q / 50)")} AS exp_fix,
            CAST(FLOOR(q * 3.7) AS BIGINT) AS floor_x,
            CAST(CEIL(q * 3.7) AS BIGINT) AS ceil_x
          FROM (SELECT DISTINCT l_quantity AS q FROM lineitem) t"""
    },
    "q52_geo" ->
      """SELECT c_custkey,
            CAST(c_custkey % 100 AS DOUBLE) AS p1_x,
            CAST(c_nationkey * 2 AS DOUBLE) AS p1_y,
            CAST(50.0 AS DOUBLE) AS p2_x,
            CAST(n_nationkey AS DOUBLE) AS p2_y,
            SQRT((CAST(c_custkey % 100 AS DOUBLE) - 50.0) * (CAST(c_custkey % 100 AS DOUBLE) - 50.0)
               + (CAST(c_nationkey * 2 AS DOUBLE) - CAST(n_nationkey AS DOUBLE))
               * (CAST(c_nationkey * 2 AS DOUBLE) - CAST(n_nationkey AS DOUBLE))) AS dist
         FROM customer JOIN nation ON c_custkey % 25 = n_nationkey""",
    "q51_casts" ->
      """SELECT l_orderkey, l_linenumber,
            CAST(CAST(TRUNC(l_quantity) AS INT) AS BIGINT) AS d2i,
            CAST(TRUNC(l_extendedprice * 1.37) AS BIGINT) AS d2l_trunc,
            CAST(l_partkey AS DOUBLE) AS i2d,
            CAST(l_partkey AS VARCHAR) AS i2s,
            CAST('' || CAST(l_suppkey AS VARCHAR) AS BIGINT) AS s2i,
            CAST(CAST(l_quantity * 2 AS VARCHAR) AS DOUBLE) AS s2d,
            CAST(CASE WHEN l_quantity > 25 THEN 'true' ELSE 'false' END AS BOOLEAN) AS s2b,
            CAST(CAST(l_quantity > 25 AS INT) AS BIGINT) AS b2i,
            CAST(l_shipdate AS DATE) AS ts2date,
            CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS date2ts
         FROM lineitem"""
  )
}
