package graft.queries

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator core: project / filter / joins (all flavors) /
  * distinct / set ops / sort-limit / VALUES / subqueries.
  *
  * Reference semantics: CalciteToDBSPCompiler.java — visitProject :432-464,
  * visitFilter :525-536, joins :569-747, visitUnion :476-490, visitMinus
  * :492-519, visitIntersect :809-853, visitSort :980-1048. Each entry is the
  * idiomatic Spark expression of the same semantics; Catalyst supplies the
  * rewrites the reference gets from its HEP pipeline (SURVEY §4.1).
  *
  * Scale notes (100 TB): every join here either broadcasts a dimension
  * (customer/supplier/nation/region are small in any TPC-H-shaped corpus) or
  * shuffles both sides on the join key — no cartesian products except the
  * deliberately tiny nation×region theta-join. Filters/projections sit
  * directly over the scan so parquet pushdown applies.
  */
object Relational {
  type QFn = (SparkSession, String) => DataFrame
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private def tsLit(s: String) = lit(s).cast(TimestampNTZType)

  val defs: Map[String, QFn] = Map(
    // DBSPMapOperator (map/projection) — per-row double math is IEEE-deterministic
    "q01_project" -> ((s, d) =>
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))),

    // DBSPFilterOperator — predicate pushed to parquet scan
    "q02_filter" -> ((s, d) =>
      T(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
                col("l_shipdate") <  tsLit("1997-01-01") &&
                col("l_quantity").between(10, 30) &&
                col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_shipdate"))),

    // Inner equi-join + broadcast dim (DBSPJoinOperator; 3-way)
    "q05_join_inner" -> ((s, d) => {
      val li = T(s, d, "lineitem").filter(col("l_quantity") > 45)
      val o  = T(s, d, "orders").filter(col("o_orderstatus") === "F")
      val c  = T(s, d, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderdate"),
                col("c_name"), (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),

    // LEFT outer join (reference builds it from inner + padded difference)
    "q06_join_left" -> ((s, d) => {
      val o = T(s, d, "orders")
      val c = T(s, d, "customer").filter(col("c_acctbal") > 5000)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_acctbal"))
    }),

    // RIGHT outer join
    "q07_join_right" -> ((s, d) => {
      val li = T(s, d, "lineitem").filter(col("l_quantity") >= 48)
      val o  = T(s, d, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"), "right")
        .select(col("o_orderkey"), col("o_orderstatus"), col("l_linenumber"), col("l_quantity"))
    }),

    // FULL outer join of two pre-aggregated sides
    "q08_join_full" -> ((s, d) => {
      val cn = T(s, d, "customer").groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      val sn = T(s, d, "supplier").groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full")
        .select(col("c_nationkey"), col("n_cust"), col("s_nationkey"), col("n_supp"))
    }),

    // SEMI join (EXISTS; Calcite rewrites EXISTS→semi upstream of the reference)
    "q09_join_semi" -> ((s, d) => {
      val o  = T(s, d, "orders")
      val li = T(s, d, "lineitem").filter(col("l_quantity") >= 49)
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // ANTI join (NOT EXISTS)
    "q10_join_anti" -> ((s, d) => {
      val o  = T(s, d, "orders")
      val li = T(s, d, "lineitem").filter(col("l_quantity") >= 49)
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
    }),

    // Cross join + residual theta filter (reference: empty key set + filter)
    "q11_join_cross_theta" -> ((s, d) => {
      val n = T(s, d, "nation")
      val r = T(s, d, "region")
      n.crossJoin(broadcast(r))
        .filter(col("n_regionkey") =!= col("r_regionkey"))
        .select(col("n_name"), col("r_name"))
    }),

    // DBSPDistinctOperator
    "q12_distinct" -> ((s, d) =>
      T(s, d, "orders").select(col("o_orderstatus"), col("o_orderpriority")).distinct()),

    // DBSPSumOperator: UNION ALL (weights add)
    "q13_union_all" -> ((s, d) => {
      val a = T(s, d, "lineitem").filter(col("l_quantity") < 3).select(col("l_suppkey").as("k"))
      val b = T(s, d, "supplier").select(col("s_suppkey").as("k"))
      a.unionAll(b)
    }),

    // UNION (distinct)
    "q14_union_distinct" -> ((s, d) => {
      val a = T(s, d, "orders").select(col("o_custkey").as("k"))
      val b = T(s, d, "customer").select(col("c_custkey").as("k"))
      a.union(b).distinct()
    }),

    // DBSPSubtractOperator: EXCEPT ALL (negate + sum, multiset semantics)
    "q15_except_all" -> ((s, d) => {
      val a = T(s, d, "lineitem").filter(col("l_quantity") < 5).select(col("l_suppkey").as("k"))
      val b = T(s, d, "lineitem").filter(col("l_quantity") < 3).select(col("l_suppkey").as("k"))
      a.exceptAll(b)
    }),

    // EXCEPT (distinct)
    "q16_except" -> ((s, d) => {
      val a = T(s, d, "customer").select(col("c_custkey").as("k"))
      val b = T(s, d, "orders").select(col("o_custkey").as("k"))
      a.except(b)
    }),

    // INTERSECT ALL (reference: join on whole row)
    "q17_intersect_all" -> ((s, d) => {
      val a = T(s, d, "lineitem").filter(col("l_quantity") < 5).select(col("l_suppkey").as("k"))
      val b = T(s, d, "lineitem").filter(col("l_quantity") < 4).select(col("l_suppkey").as("k"))
      a.intersectAll(b)
    }),

    // ORDER BY multi-column + LIMIT (top-k; unique tie-break for determinism)
    "q18_orderby_limit" -> ((s, d) =>
      T(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)),

    // DBSPConstantOperator: VALUES literal relation
    "q19_values" -> ((s, _) =>
      s.sql("""SELECT id, name, score FROM VALUES
               (1, 'alpha', CAST(1.5 AS DOUBLE)),
               (2, 'beta',  CAST(2.5 AS DOUBLE)),
               (3, 'gamma', CAST(NULL AS DOUBLE)) AS t(id, name, score)""")),

    // GROUP BY + HAVING
    "q20_having" -> ((s, d) =>
      T(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 15)),

    // Correlated EXISTS (reference: decorrelated by Calcite → semi join)
    "q25_exists_correlated" -> ((s, d) => {
      val c = T(s, d, "customer")
      val o = T(s, d, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Scalar subquery: rows above the global average (exact-decimal threshold)
    "q26_scalar_subquery" -> ((s, d) => {
      val o = T(s, d, "orders")
      val thr = o.agg((Exact.dsum(col("o_totalprice")) / count(lit(1))).as("avg_d"))
      o.crossJoin(broadcast(thr))
        .filter(col("o_totalprice") > col("avg_d"))
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // PIVOT (beyond-reference): long→wide reshaping with an explicit value
    // list (the only scale-safe form — pivot without values needs a
    // distinct-scan planning pass). One shuffle on the group key; missing
    // cells coalesce to 0 to match SQL's COUNT(CASE ...) spelling.
    "q146_pivot" -> ((s, d) => {
      val pv = T(s, d, "orders").groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
      pv.select(col("o_orderstatus"),
        coalesce(col("`1-URGENT`"), lit(0L)).as("p1_urgent"),
        coalesce(col("`2-HIGH`"), lit(0L)).as("p2_high"),
        coalesce(col("`3-MEDIUM`"), lit(0L)).as("p3_medium"),
        coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("p4_not_specified"),
        coalesce(col("`5-LOW`"), lit(0L)).as("p5_low"))
    }),

    // UNPIVOT / melt (beyond-reference): wide→long reshaping — a pure
    // per-row flatMap (no shuffle at all), the feature-matrix →
    // (entity, metric, value) triple shape every ML feature store flips
    // between.
    "q147_unpivot" -> ((s, d) =>
      T(s, d, "lineitem").filter(col("l_orderkey") <= 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")),

    // Skew-resilient salted join under the oracle (operators/SkewJoin):
    // the hot fact side (events — every row matches a customer) shards by
    // a stable hash of event_id across 8 salts, the dimension replicates
    // per salt. Salting is join-invariant — the result, and so the gate
    // hash, equals the plain equi-join the oracle runs; what changes is
    // that no single reducer owns a hot key at 100 TB.
    "q135_skew_salted_join" -> ((s, d) => {
      val ev = T(s, d, "events").withColumnRenamed("user_id", "c_custkey")
      val cust = T(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      _root_.graft.operators.SkewJoin
        .saltedJoinBy(ev, cust, Seq("c_custkey"), col("event_id"), salt = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("sum_value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_project" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS revenue FROM lineitem",
    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_quantity BETWEEN 10 AND 30 AND l_returnflag = 'R'""",
    "q05_join_inner" ->
      """SELECT l_orderkey, l_linenumber, o_orderdate, c_name,
                l_extendedprice * (1.0 - l_discount) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                       JOIN customer ON o_custkey = c_custkey
         WHERE l_quantity > 45 AND o_orderstatus = 'F'""",
    "q06_join_left" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_acctbal
         FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
           ON o_custkey = c_custkey""",
    "q07_join_right" ->
      """SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity
         FROM (SELECT * FROM lineitem WHERE l_quantity >= 48) li
         RIGHT JOIN orders ON l_orderkey = o_orderkey""",
    "q08_join_full" ->
      """SELECT c_nationkey, n_cust, s_nationkey, n_supp
         FROM (SELECT c_nationkey, COUNT(*) n_cust FROM customer GROUP BY 1) a
         FULL JOIN (SELECT s_nationkey, COUNT(*) n_supp FROM supplier GROUP BY 1) b
           ON c_nationkey = s_nationkey""",
    "q09_join_semi" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)""",
    "q10_join_anti" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)""",
    "q11_join_cross_theta" ->
      "SELECT n_name, r_name FROM nation, region WHERE n_regionkey <> r_regionkey",
    "q12_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "q13_union_all" ->
      """SELECT l_suppkey AS k FROM lineitem WHERE l_quantity < 3
         UNION ALL SELECT s_suppkey AS k FROM supplier""",
    "q14_union_distinct" ->
      "SELECT o_custkey AS k FROM orders UNION SELECT c_custkey AS k FROM customer",
    "q146_pivot" ->
      """SELECT o_orderstatus,
                COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1_urgent,
                COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2_high,
                COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3_medium,
                COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4_not_specified,
                COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5_low
         FROM orders GROUP BY o_orderstatus""",
    "q147_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
         FROM lineitem WHERE l_orderkey <= 100
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
         FROM lineitem WHERE l_orderkey <= 100
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
         FROM lineitem WHERE l_orderkey <= 100
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
         FROM lineitem WHERE l_orderkey <= 100""",
    "q135_skew_salted_join" -> {
      val sv = Exact.sqlDsum("value")
      s"""SELECT c_mktsegment, COUNT(*) AS n, $sv AS sum_value
          FROM events e JOIN customer c ON e.user_id = c.c_custkey
          GROUP BY c_mktsegment"""
    },
    "q15_except_all" ->
      """SELECT l_suppkey AS k FROM lineitem WHERE l_quantity < 5
         EXCEPT ALL SELECT l_suppkey AS k FROM lineitem WHERE l_quantity < 3""",
    "q16_except" ->
      "SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders",
    "q17_intersect_all" ->
      """SELECT l_suppkey AS k FROM lineitem WHERE l_quantity < 5
         INTERSECT ALL SELECT l_suppkey AS k FROM lineitem WHERE l_quantity < 4""",
    "q18_orderby_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q19_values" ->
      """SELECT * FROM (VALUES (1, 'alpha', 1.5::DOUBLE), (2, 'beta', 2.5::DOUBLE),
                               (3, 'gamma', NULL::DOUBLE)) t(id, name, score)""",
    "q20_having" ->
      "SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15",
    "q25_exists_correlated" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""",
    "q26_scalar_subquery" ->
      s"""SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_totalprice > (SELECT ${Exact.sqlDsum("o_totalprice")} / COUNT(*) FROM orders)"""
  )
}
