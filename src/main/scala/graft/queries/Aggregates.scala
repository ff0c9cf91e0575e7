package graft.queries

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation operators: grouped fold, global fold, COUNT/SUM/SUM0/AVG/
  * MIN/MAX, DISTINCT aggregates, empty-input correction.
  *
  * Reference: DBSPAggregateOperator.java:35 with the fold structure of
  * ir/DBSPAggregate.java:46-120; per-function compilation in
  * AggregateCompiler.java (COUNT :116-148, MIN/MAX :158-181, SUM :183-204,
  * SUM0 :206-231, AVG :233-288); DISTINCT aggregates expanded by Calcite rule
  * AGGREGATE_EXPAND_DISTINCT_AGGREGATES_TO_JOIN (CalciteCompiler.java:335-337).
  * Spark's hash aggregate does map-side partial aggregation automatically, so
  * one shuffle per groupBy — the plan a 1000-executor cluster wants.
  */
object Aggregates {
  type QFn = (SparkSession, String) => DataFrame
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private def tsLit(x: String) = lit(x).cast(TimestampNTZType)

  val defs: Map[String, QFn] = Map(
    // TPC-H Q1 shape: the canonical grouped fold (all six aggregate fns)
    "q03_agg_tpchq1" -> ((s, d) => {
      val disc   = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val charge = disc * (lit(1.0) + col("l_tax"))
      T(s, d, "lineitem")
        .filter(col("l_shipdate") <= tsLit("2001-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Exact.dsum(col("l_quantity")).as("sum_qty"),
          Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
          Exact.dsum(disc).as("sum_disc_price"),
          Exact.dsum(charge).as("sum_charge"),
          Exact.davg(col("l_quantity")).as("avg_qty"),
          Exact.davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
    }),

    // Global (no GROUP BY) aggregate: one row even on big input
    "q04_agg_global" -> ((s, d) =>
      T(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        count(col("l_quantity")).as("n_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))),

    // MIN/MAX over strings and timestamps (ordering semantics)
    "q21_agg_minmax" -> ((s, d) =>
      T(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(
          min(col("o_orderstatus")).as("min_status"),
          max(col("o_orderstatus")).as("max_status"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"),
          count(lit(1)).as("n"))),

    // SUM on empty input → NULL; SUM0 → 0; COUNT → 0 (reference empty-input
    // correction circuit, CalciteToDBSPCompiler.java:349-381)
    "q22_agg_empty" -> ((s, d) => {
      val e = T(s, d, "lineitem").filter(col("l_quantity") < 0)
      e.agg(
        count(lit(1)).as("cnt"),
        Exact.dsum(col("l_quantity")).as("sum_null"),
        coalesce(Exact.dsum(col("l_quantity")), lit(0.0)).as("sum0"))
    }),

    // DISTINCT aggregates (sum over the exact fixed-point image so the
    // distinct-set and reduction are engine-independent)
    "q27_distinct_agg" -> ((s, d) =>
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          (sum_distinct(Exact.fix(col("l_quantity"))).cast(DoubleType) / lit(10000.0)).as("sum_dist_qty"),
          count(lit(1)).as("n"))),

    // ARRAY_AGG (declared in the reference runtime's aggregate list,
    // RustSqlRuntimeLibrary.java:61-70): sorted for determinism. The gate
    // projection renders the array as a '|'-joined string — the driver's
    // pandas compare can't hash array cells; the array-typed form is
    // exercised in DomainSpec/GoldenSpec.
    "q24_array_agg" -> ((s, d) =>
      T(s, d, "lineitem").filter(col("l_orderkey") <= 20)
        .groupBy(col("l_orderkey"))
        .agg(
          concat_ws("|",
            sort_array(collect_list(col("l_linenumber").cast(LongType)))
              .cast(ArrayType(StringType))).as("lines"),
          count(lit(1)).as("n"))),

    // EVERY / ANY boolean aggregates (same runtime list)
    "q28_bool_agg" -> ((s, d) =>
      T(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(
          bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_totalprice") > 400000).as("any_over_400k"),
          count(lit(1)).as("n"))),

    // Sample variance/stddev via deterministic fixed-point sums: the
    // two-pass-free formula (Σx² − (Σx)²/n)/(n−1) over exact decimal sums
    // is bit-identical on any engine, unlike built-in var_samp whose
    // partial-merge order varies
    // Pearson correlation + covariance from EXACT fixed-point component
    // sums (beyond-reference; the reference has neither). Spark's native
    // corr/covar use streaming merge formulas whose float rounding depends
    // on partition order — unreproducible across cluster layouts and
    // unmatchable by any external engine — so both sides here compute the
    // same explicit formula over Exact.dsum component images: bit-stable
    // on any layout, hash-identical to DuckDB evaluating the same text.
    "q65_corr_exact" -> ((s, d) => {
      val x = col("l_quantity"); val y = col("l_extendedprice")
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          Exact.dsum(x).as("sx"), Exact.dsum(y).as("sy"),
          Exact.dsum(x * x).as("sxx"), Exact.dsum(y * y).as("syy"),
          Exact.dsum(x * y).as("sxy"))
        .select(
          col("l_returnflag"), col("n"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
            .as("covar_samp"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
              sqrt(col("syy") - col("sy") * col("sy") / col("n"))))
            .as("corr"))
    }),

    // Bitwise AND/OR/XOR aggregates (beyond-reference) — integer folds,
    // order-independent by construction
    "q66_bit_agg" -> ((s, d) =>
      T(s, d, "orders").groupBy(col("o_orderstatus"))
        .agg(
          expr("bit_and(o_orderkey)").as("band"),
          expr("bit_or(o_orderkey)").as("bor"),
          expr("bit_xor(o_orderkey)").as("bxor"),
          count(lit(1)).as("n"))),

    // Exact interpolated percentiles (beyond-reference: the reference has
    // no percentile aggregate). Spark's `percentile` sorts the group
    // exactly and linearly interpolates with the same formula DuckDB's
    // quantile_cont uses, so the doubles are bit-identical — probed across
    // grouped/global, interior and edge quantiles. At scale this is the
    // exact path (one sort per group); the sketch path would be
    // approx_percentile, which no external engine can hash-match.
    "q39_percentile" -> ((s, d) =>
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
          expr("percentile(l_extendedprice, 0.99)").as("p99_price"))),

    "q29_stats_var" -> ((s, d) => {
      val x = col("l_quantity")
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          count(x).as("n"),
          Exact.dsum(x).as("s1"),
          Exact.dsum(x * x).as("s2"))
        .select(
          col("l_returnflag"), col("n"),
          ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
            .as("var_samp"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
            .as("stddev_samp"))
    }),

    // Beyond-reference: GROUPING SETS / ROLLUP / CUBE (the reference
    // throws Unimplemented for Group.SIMPLE≠, CalciteToDBSPCompiler
    // :304-305 — Spark provides them natively, so our engine exceeds the
    // reference here)
    "q37_rollup" -> ((s, d) =>
      T(s, d, "lineitem").rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast(LongType).as("g_rf"),
          grouping(col("l_linestatus")).cast(LongType).as("g_ls"))),

    "q38_cube" -> ((s, d) =>
      T(s, d, "orders").cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))),

    // ARG_MIN / ARG_MAX (beyond-reference; DuckDB/ClickHouse staples a
    // feature-store needs constantly: "the id of the row with the extreme
    // value"). Spark's max_by/min_by are non-deterministic on ordering
    // ties, so the ordering value is a (price, key) STRUCT — lexicographic
    // struct comparison makes the tie-break explicit and the result
    // partition-order independent on any cluster layout. The oracle states
    // the same tie-break as an ordered-aggregate `first`.
    "q53_argminmax" -> ((s, d) =>
      T(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("key_of_max"),
          min_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("key_of_min"),
          count(lit(1)).as("n"))),

    // MODE with a deterministic tie-break (smallest value wins). Spark's
    // built-in `mode()` is explicitly non-deterministic on frequency ties,
    // so the circuit is the portable two-level fold: count per (group,
    // value), then arg-max by (count, -value) — two shuffles, both with
    // map-side partial aggregation, no sort of the full input.
    "q69_mode" -> ((s, d) => {
      val counts = T(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
      counts.groupBy(col("l_returnflag"))
        .agg(
          max_by(col("l_quantity"), struct(col("n"), -col("l_quantity")))
            .as("mode_qty"),
          max(col("n")).as("n_mode"))
    }),

    // ARRAY_AGG(DISTINCT ... ORDER BY ...) — the distinct-sorted variant
    // of q24's plain array_agg (deterministic: distinct set + total sort;
    // rendered as a joined string for the driver's scalar hash)
    "q152_array_agg_distinct" -> ((s, d) =>
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          concat_ws("|",
            sort_array(collect_set(col("l_linestatus")))).as("statuses"),
          count(lit(1)).as("n"))),

    // FILTER-clause aggregates (SQL:2003; Spark and DuckDB both native):
    // conditional aggregation without CASE scaffolding — one pass, each
    // aggregate sees its own predicate. MAX over double is pure selection
    // (no reduction arithmetic), so it hash-matches without fixed point.
    "q153_filter_agg" -> ((s, d) =>
      T(s, d, "orders").groupBy(col("o_orderstatus"))
        .agg(
          expr("COUNT(*) FILTER (WHERE o_totalprice > 100000)").as("n_big"),
          expr("SUM(o_orderkey) FILTER (WHERE o_orderpriority = '1-URGENT')")
            .as("sum_urgent"),
          expr("MAX(o_totalprice) FILTER (WHERE o_custkey % 2 = 0)")
            .as("max_even"))),

    // AVG with nullable input (NULLIF-made nulls skipped by AVG)
    "q23_avg_nullable" -> ((s, d) => {
      val v = when(col("l_discount") > 0, col("l_extendedprice"))
      T(s, d, "lineitem").groupBy(col("l_linestatus"))
        .agg(
          Exact.davg(v).as("avg_disc_price"),
          count(v).as("n_discounted"),
          count(lit(1)).as("n_total"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q03_agg_tpchq1" -> {
      val disc = "l_extendedprice * (1.0 - l_discount)"
      val charge = s"$disc * (1.0 + l_tax)"
      s"""SELECT l_returnflag, l_linestatus,
            ${Exact.sqlDsum("l_quantity")} AS sum_qty,
            ${Exact.sqlDsum("l_extendedprice")} AS sum_base_price,
            ${Exact.sqlDsum(disc)} AS sum_disc_price,
            ${Exact.sqlDsum(charge)} AS sum_charge,
            ${Exact.sqlDavg("l_quantity")} AS avg_qty,
            ${Exact.sqlDavg("l_extendedprice")} AS avg_price,
            COUNT(*) AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
          GROUP BY l_returnflag, l_linestatus"""
    },
    "q04_agg_global" ->
      s"""SELECT COUNT(*) AS n_rows, COUNT(l_quantity) AS n_qty,
             MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
             ${Exact.sqlDsum("l_extendedprice")} AS sum_price,
             MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
          FROM lineitem""",
    "q21_agg_minmax" ->
      """SELECT o_orderpriority, MIN(o_orderstatus) AS min_status,
                MAX(o_orderstatus) AS max_status, MIN(o_orderdate) AS min_date,
                MAX(o_orderdate) AS max_date, COUNT(*) AS n
         FROM orders GROUP BY o_orderpriority""",
    "q22_agg_empty" ->
      s"""SELECT COUNT(*) AS cnt,
             ${Exact.sqlDsum("l_quantity")} AS sum_null,
             COALESCE(${Exact.sqlDsum("l_quantity")}, 0.0) AS sum0
          FROM lineitem WHERE l_quantity < 0""",
    "q27_distinct_agg" ->
      s"""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
                (CAST(SUM(DISTINCT ${Exact.sqlFix("l_quantity")}) AS DOUBLE) / 10000.0) AS sum_dist_qty,
                COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q24_array_agg" ->
      """SELECT l_orderkey,
                array_to_string(list_sort(list(CAST(l_linenumber AS BIGINT))), '|') AS lines,
                COUNT(*) AS n
         FROM lineitem WHERE l_orderkey <= 20 GROUP BY l_orderkey""",
    "q28_bool_agg" ->
      """SELECT o_orderpriority,
                bool_and(o_totalprice > 1000) AS all_over_1k,
                bool_or(o_totalprice > 400000) AS any_over_400k,
                COUNT(*) AS n
         FROM orders GROUP BY o_orderpriority""",
    "q65_corr_exact" -> {
      val sx = Exact.sqlDsum("l_quantity")
      val sy = Exact.sqlDsum("l_extendedprice")
      val sxx = Exact.sqlDsum("l_quantity * l_quantity")
      val syy = Exact.sqlDsum("l_extendedprice * l_extendedprice")
      val sxy = Exact.sqlDsum("l_quantity * l_extendedprice")
      s"""SELECT l_returnflag, COUNT(*) AS n,
             (($sxy - $sx * $sy / COUNT(*)) / (COUNT(*) - 1)) AS covar_samp,
             (($sxy - $sx * $sy / COUNT(*)) /
              (SQRT($sxx - $sx * $sx / COUNT(*)) *
               SQRT($syy - $sy * $sy / COUNT(*)))) AS corr
          FROM lineitem GROUP BY l_returnflag"""
    },
    "q66_bit_agg" ->
      """SELECT o_orderstatus,
                bit_and(o_orderkey) AS band,
                bit_or(o_orderkey) AS bor,
                bit_xor(o_orderkey) AS bxor,
                COUNT(*) AS n
         FROM orders GROUP BY o_orderstatus""",
    "q39_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS p50_qty,
                quantile_cont(l_quantity, 0.9) AS p90_qty,
                quantile_cont(l_extendedprice, 0.25) AS p25_price,
                quantile_cont(l_extendedprice, 0.99) AS p99_price
         FROM lineitem GROUP BY l_returnflag""",
    "q29_stats_var" -> {
      val s1 = Exact.sqlDsum("l_quantity")
      val s2 = Exact.sqlDsum("l_quantity * l_quantity")
      s"""SELECT l_returnflag, COUNT(l_quantity) AS n,
             (($s2 - $s1 * $s1 / COUNT(l_quantity)) / (COUNT(l_quantity) - 1)) AS var_samp,
             SQRT(($s2 - $s1 * $s1 / COUNT(l_quantity)) / (COUNT(l_quantity) - 1)) AS stddev_samp
          FROM lineitem GROUP BY l_returnflag"""
    },
    "q37_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q38_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q152_array_agg_distinct" ->
      """SELECT l_returnflag,
                array_to_string(list_sort(list_distinct(list(l_linestatus))), '|') AS statuses,
                COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q153_filter_agg" ->
      """SELECT o_orderstatus,
                COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
                CAST(SUM(o_orderkey) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS sum_urgent,
                MAX(o_totalprice) FILTER (WHERE o_custkey % 2 = 0) AS max_even
         FROM orders GROUP BY o_orderstatus""",
    "q53_argminmax" ->
      """SELECT o_orderpriority,
                first(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS key_of_max,
                first(o_orderkey ORDER BY o_totalprice ASC, o_orderkey ASC) AS key_of_min,
                COUNT(*) AS n
         FROM orders GROUP BY o_orderpriority""",
    "q69_mode" ->
      """SELECT l_returnflag,
                first(q ORDER BY n DESC, q ASC) AS mode_qty,
                MAX(n) AS n_mode
         FROM (SELECT l_returnflag, l_quantity AS q, COUNT(*) AS n
               FROM lineitem GROUP BY 1, 2)
         GROUP BY l_returnflag""",
    "q23_avg_nullable" -> {
      val v = "CASE WHEN l_discount > 0 THEN l_extendedprice END"
      s"""SELECT l_linestatus,
             ${Exact.sqlDavg(v)} AS avg_disc_price,
             COUNT($v) AS n_discounted, COUNT(*) AS n_total
          FROM lineitem GROUP BY l_linestatus"""
    }
  )
}
