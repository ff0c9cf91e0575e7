package graft.queries

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H-shaped headline queries over the fixture star schema: deep
  * multi-way joins + aggregation + ordering, the canonical stress for join
  * reordering and shuffle planning. Dimension chains (region→nation)
  * broadcast; fact-fact joins shuffle on keys; AQE reorders/sizes at
  * runtime. Revenue sums use the Exact fixed-point reduction for
  * hash-stable results.
  */
object TpcH {
  type QFn = (SparkSession, String) => DataFrame
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private def tsLit(x: String) = lit(x).cast(TimestampNTZType)

  val defs: Map[String, QFn] = Map(
    // Q3 shape: shipping-priority — 3-way join, filter both sides of the
    // date, aggregate revenue, top-10 by revenue with key tie-breaks
    "q92_tpch_q3" -> ((s, d) => {
      val c = T(s, d, "customer")
      val o = T(s, d, "orders").filter(col("o_orderdate") < tsLit("1997-06-17"))
      val l = T(s, d, "lineitem").filter(col("l_shipdate") > tsLit("1997-06-17"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Q5 shape: local-supplier volume — 6-way join through the full
    // dimension chain, grouped by nation
    "q93_tpch_q5" -> ((s, d) => {
      val r = T(s, d, "region")
      val n = T(s, d, "nation")
      val c = T(s, d, "customer")
      val o = T(s, d, "orders").filter(
        col("o_orderdate") >= tsLit("1995-01-01") &&
        col("o_orderdate") < tsLit("1997-01-01"))
      val l = T(s, d, "lineitem")
      val su = T(s, d, "supplier")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
                  col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_items"))
    }),

    // Q6 shape: forecast-revenue change — the pure scan benchmark: all
    // predicates push to the parquet scan, one partial+final global agg,
    // no shuffle of data rows at all
    "q97_tpch_q6" -> ((s, d) =>
      T(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
          col("l_shipdate") < tsLit("1997-01-01") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(Exact.dsum(col("l_extendedprice") * col("l_discount"))
          .as("revenue"), count(lit(1)).as("n_items"))),

    // Q10 shape: returned-item reporting — fact-fact join filtered on the
    // return flag, customer rollup, top-20 by lost revenue
    "q98_tpch_q10" -> ((s, d) => {
      val c = T(s, d, "customer")
      val o = T(s, d, "orders").filter(
        col("o_orderdate") >= tsLit("1996-01-01") &&
        col("o_orderdate") < tsLit("1996-07-01"))
      val l = T(s, d, "lineitem").filter(col("l_returnflag") === "R")
      val n = T(s, d, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // Q4 shape: order-priority checking — EXISTS over lineitem becomes a
    // LEFT SEMI join with a non-equi residual (l_shipdate > o_orderdate);
    // at scale the semi join shuffles once on the order key and never
    // materializes the multiplicity of matching lineitems
    "q116_tpch_q4" -> ((s, d) => {
      val o = T(s, d, "orders").filter(
        col("o_orderdate") >= tsLit("1996-01-01") &&
        col("o_orderdate") < tsLit("1996-04-01"))
      val l = T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q7 shape: volume shipping between two nations — the supplier-nation
    // and customer-nation legs broadcast (25 rows) while the fact-fact
    // orders⋈lineitem shuffles once on the order key
    "q117_tpch_q7" -> ((s, d) => {
      val n1 = T(s, d, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = T(s, d, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val l = T(s, d, "lineitem").filter(
        col("l_shipdate") >= tsLit("1996-01-01") &&
        col("l_shipdate") < tsLit("1998-01-01"))
      T(s, d, "supplier")
        .join(l, col("s_suppkey") === col("l_suppkey"))
        .join(T(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(T(s, d, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
                (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast(LongType).as("l_year"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    }),

    // Q8 shape: national market share — ratio of two deterministic
    // fixed-point sums over the full dimension chain (customer's region
    // filtered, supplier's nation in the numerator CASE)
    "q118_tpch_q8" -> ((s, d) => {
      val n1 = T(s, d, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val n2 = T(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      T(s, d, "part").filter(col("p_type") === "ECONOMY")
        .join(T(s, d, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(T(s, d, "orders").filter(
          col("o_orderdate") >= tsLit("1996-01-01") &&
          col("o_orderdate") < tsLit("1998-01-01")),
          col("o_orderkey") === col("l_orderkey"))
        .join(T(s, d, "customer"), col("c_custkey") === col("o_custkey"))
        .join(T(s, d, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
        .join(broadcast(T(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg((Exact.dsum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(lit(0.0))) /
          Exact.dsum(vol)).as("mkt_share"))
    }),

    // Q9 shape: product-type profit — no partsupp in the fixture schema,
    // so supply cost is adapted to p_retailprice * l_quantity * 0.01
    // (per-row double ops stay deterministic; the reduce is fixed-point)
    "q119_tpch_q9" -> ((s, d) => {
      val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        col("p_retailprice") * col("l_quantity") * lit(0.01)
      T(s, d, "part").filter(col("p_type") === "STANDARD")
        .join(T(s, d, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(T(s, d, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(T(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(T(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(Exact.dsum(amount).as("sum_profit"))
    }),

    // Q13 shape: customer order-count distribution — LEFT join with an ON
    // residual, two cascaded aggregations (per-customer then histogram)
    "q120_tpch_q13" -> ((s, d) => {
      val o = T(s, d, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      T(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q14 shape: promo revenue ratio — one fact-dimension join, ratio of
    // two fixed-point sums
    "q121_tpch_q14" -> ((s, d) => {
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      T(s, d, "lineitem").filter(
        col("l_shipdate") >= tsLit("1996-09-01") &&
        col("l_shipdate") < tsLit("1996-10-01"))
        .join(T(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          Exact.dsum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))) /
          Exact.dsum(vol)).as("promo_revenue"))
    }),

    // Q15 shape: top supplier — quarter revenue per supplier equi-joined
    // to its own broadcast global max (exact equality is safe: both sides
    // come from the same deterministic fixed-point reduction)
    "q122_tpch_q15" -> ((s, d) => {
      val rev = T(s, d, "lineitem").filter(
        col("l_shipdate") >= tsLit("1996-01-01") &&
        col("l_shipdate") < tsLit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
      T(s, d, "supplier")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(mx), col("total_revenue") === col("max_revenue"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }),

    // Q17 shape: small-quantity-order revenue — correlated scalar AVG
    // decorrelates to a grouped aggregate joined back on the part key
    // (avg of integral quantities is exact in double, so the threshold
    // comparison is engine-independent)
    "q123_tpch_q17" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val thresh = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg((avg(col("l_quantity")) * lit(0.2)).as("q_thresh"))
      li.join(T(s, d, "part").filter(col("p_brand") === "Brand#13"),
          col("l_partkey") === col("p_partkey"))
        .join(thresh, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("q_thresh"))
        .agg((Exact.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_items"))
    }),

    // Q18 shape: large-volume customers — HAVING over a grouped quantity
    // sum (integral doubles: exact), semi-joined back to the order detail
    "q124_tpch_q18" -> ((s, d) => {
      val big = T(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("b_orderkey"))
        .agg(sum(col("l_quantity")).as("b_qty"))
        .filter(col("b_qty") > 200)
        .select(col("b_orderkey"))
      val l = T(s, d, "lineitem")
      T(s, d, "customer")
        .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(big), col("o_orderkey") === col("b_orderkey"), "left_semi")
        .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
    }),

    // Q19 shape: discounted revenue — disjunctive brand/size/quantity
    // predicate bands over one part⋈lineitem join; the whole OR pushes
    // into the join filter (no per-band scans)
    "q125_tpch_q19" -> ((s, d) => {
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 40))
      T(s, d, "lineitem")
        .join(T(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_items"))
    }),

    // Q21 shape: suppliers who kept orders waiting — the fixture has no
    // receipt/commit dates, so "late" adapts to shipping >60 days after
    // the order date; EXISTS → LEFT SEMI, NOT EXISTS → LEFT ANTI, both
    // with non-equi residuals referencing the outer order date
    "q126_tpch_q21" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val late = col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL '60' DAY")
      val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
      val l3 = li.select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"), col("l_shipdate").as("l3_shipdate"))
      T(s, d, "supplier")
        .join(li, col("s_suppkey") === col("l_suppkey"))
        .join(T(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("o_orderkey") === col("l_orderkey"))
        .filter(late)
        .join(l2, col("l2_orderkey") === col("l_orderkey") &&
          col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(l3, col("l3_orderkey") === col("l_orderkey") &&
          col("l3_suppkey") =!= col("l_suppkey") &&
          col("l3_shipdate") > col("o_orderdate") + expr("INTERVAL '60' DAY"),
          "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    }),

    // Q22 shape: global sales opportunity — no phone column, so the
    // country code adapts to c_nationkey % 10; NOT EXISTS → LEFT ANTI
    // (over recent-urgent orders: every fixture customer has SOME order),
    // and the acctbal threshold is a broadcast deterministic average
    "q127_tpch_q22" -> ((s, d) => {
      val cu = T(s, d, "customer")
        .withColumn("cntrycode", (col("c_nationkey") % 10).cast(LongType))
        .filter(col("cntrycode").isin(1L, 3L, 5L, 7L))
      val thresh = cu.filter(col("c_acctbal") > 0.0)
        .agg(Exact.davg(col("c_acctbal")).as("avg_bal"))
      val recentUrgent = T(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= tsLit("1999-01-01"))
        .select(col("o_custkey"))
      cu.join(broadcast(thresh), col("c_acctbal") > col("avg_bal"))
        .join(recentUrgent, col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          Exact.dsum(col("c_acctbal")).as("totacctbal"))
    }),

    // Q2 shape: minimum-cost supplier — the fixture has no partsupp, so
    // lineitem is the part↔supplier bridge and "supply cost" is the
    // extended price; the correlated MIN-per-part subquery decorrelates to
    // a grouped-min joined back on the part key (the reference exercises
    // the correlated-aggregate class via EndToEndTests.java:165). MIN over
    // raw parquet doubles is order-independent, so the equality join on
    // price is engine-stable without the fixed-point image.
    "q176_tpch_q2" -> ((s, d) => {
      val asiaNat = broadcast(T(s, d, "nation")
        .join(T(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("n_nationkey"), col("n_name")))
      val sup = T(s, d, "supplier")
        .join(asiaNat, col("s_nationkey") === col("n_nationkey"))
      val li = T(s, d, "lineitem")
      val minOffer = li
        .join(sup.select(col("s_suppkey").as("mo_suppkey")),
          col("l_suppkey") === col("mo_suppkey"), "left_semi")
        .groupBy(col("l_partkey").as("mo_partkey"))
        .agg(min(col("l_extendedprice")).as("min_price"))
      T(s, d, "part")
        .filter(col("p_type") === "ECONOMY" && col("p_size") <= 15)
        .join(li, col("p_partkey") === col("l_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(minOffer, col("p_partkey") === col("mo_partkey") &&
          col("l_extendedprice") === col("min_price"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_type"),
          col("l_extendedprice").as("price"))
        .distinct()
        .orderBy(col("s_acctbal").desc, col("n_name").asc,
          col("s_name").asc, col("p_partkey").asc)
        .limit(100)
    }),

    // Q11 shape: important stock — partsupp value adapts to lineitem
    // revenue per part for one nation's suppliers; the HAVING threshold is
    // a broadcast global aggregate over the same fixed-point sums, so the
    // float comparison is bit-identical in both engines.
    "q177_tpch_q11" -> ((s, d) => {
      val natSup = T(s, d, "supplier")
        .join(broadcast(T(s, d, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val byPart = T(s, d, "lineitem")
        .join(broadcast(natSup), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("value"))
      val thresh = byPart
        .agg((Exact.dsum(col("value")) * lit(0.001)).as("thr"))
      byPart.join(broadcast(thresh), col("value") > col("thr"))
        .select(col("l_partkey"), col("value"))
    }),

    // Q12 shape: shipmode/priority pivot — no shipmode or receipt date in
    // the fixture, so the mode adapts to l_returnflag and "late" to
    // shipping >30 days after the order date; the CASE-sum pivot is the
    // query's point and survives intact.
    "q178_tpch_q12" -> ((s, d) => {
      val high = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      T(s, d, "orders")
        .join(T(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL '30' DAY") &&
          col("l_shipdate") >= tsLit("1996-01-01") &&
          col("l_shipdate") < tsLit("1997-01-01"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
    }),

    // Q16 shape: supplier relationship count — partsupp adapts to the
    // lineitem bridge; the supplier-complaints NOT IN exclusion adapts to
    // negative account balance (no comment column), compiled as a
    // broadcast anti-join (s_suppkey is non-null, so NOT IN ≡ anti).
    "q179_tpch_q16" -> ((s, d) => {
      val excl = T(s, d, "supplier").filter(col("s_acctbal") < 0.0)
        .select(col("s_suppkey").as("x_suppkey"))
      T(s, d, "lineitem")
        .join(T(s, d, "part").filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(excl), col("l_suppkey") === col("x_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // Q20 shape: potential part promotion — availqty adapts to "this
    // supplier shipped >30% of the part's total windowed quantity"; the
    // IN-subquery-containing-a-correlated-aggregate decorrelates to two
    // grouped sums joined on the part key, then a semi-join into the
    // nation-filtered supplier list. Quantity sums ride the fixed-point
    // image so the share threshold compares identically in both engines.
    "q180_tpch_q20" -> ((s, d) => {
      val promo = T(s, d, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val shipped = T(s, d, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
          col("l_shipdate") < tsLit("1997-01-01"))
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"), "left_semi")
      val perSupPart = shipped
        .groupBy(col("l_suppkey").as("sp_suppkey"), col("l_partkey").as("sp_partkey"))
        .agg(Exact.dsum(col("l_quantity")).as("sup_qty"))
      val perPart = shipped
        .groupBy(col("l_partkey").as("pp_partkey"))
        .agg((Exact.dsum(col("l_quantity")) * lit(0.3)).as("part_thresh"))
      val qualifying = perSupPart
        .join(perPart, col("sp_partkey") === col("pp_partkey"))
        .filter(col("sup_qty") > col("part_thresh"))
        .select(col("sp_suppkey"))
      T(s, d, "supplier")
        .join(broadcast(T(s, d, "nation").filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .join(qualifying, col("s_suppkey") === col("sp_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q92_tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
             ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          WHERE o_orderdate < TIMESTAMP '1997-06-17'
            AND l_shipdate > TIMESTAMP '1997-06-17'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "q93_tpch_q5" ->
      s"""SELECT n_name,
             ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             COUNT(*) AS n_items
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1997-01-01'
          GROUP BY n_name""",
    "q97_tpch_q6" ->
      s"""SELECT ${Exact.sqlDsum("l_extendedprice * l_discount")} AS revenue,
             COUNT(*) AS n_items
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
            AND l_discount >= 0.05 AND l_discount <= 0.07
            AND l_quantity < 24""",
    "q98_tpch_q10" ->
      s"""SELECT c_custkey, c_name, n_name,
             ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             COUNT(*) AS n_items
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1996-07-01'
            AND l_returnflag = 'R'
          GROUP BY c_custkey, c_name, n_name
          ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
    "q116_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1996-04-01'
            AND EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey
                          AND l_shipdate > o_orderdate)
          GROUP BY o_orderpriority""",
    "q117_tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l_shipdate) AS l_year,
             ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY 1, 2, 3""",
    "q118_tpch_q8" ->
      s"""SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             ${Exact.sqlDsum("CASE WHEN n2.n_name = 'NATION_3' " +
               "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
             ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")}
               AS mkt_share
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
          GROUP BY 1""",
    "q119_tpch_q9" ->
      s"""SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount) " +
               "- p_retailprice * l_quantity * 0.01")} AS sum_profit
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_type = 'STANDARD'
          GROUP BY 1, 2""",
    "q120_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
                       WHERE o_orderpriority <> '1-URGENT') o
              ON c_custkey = o_custkey
            GROUP BY c_custkey) t
          GROUP BY c_count""",
    "q121_tpch_q14" ->
      s"""SELECT 100.0 *
             ${Exact.sqlDsum("CASE WHEN p_type = 'PROMO' " +
               "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
             ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")}
               AS promo_revenue
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-09-01'
            AND l_shipdate < TIMESTAMP '1996-10-01'""",
    "q122_tpch_q15" ->
      s"""WITH revenue0 AS (
            SELECT l_suppkey,
               ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")}
                 AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
          SELECT s_suppkey, s_name, total_revenue
          FROM supplier JOIN revenue0 ON s_suppkey = l_suppkey
          WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)""",
    "q123_tpch_q17" ->
      s"""SELECT ${Exact.sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly,
             COUNT(*) AS n_items
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#13'
            AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = p_partkey)""",
    "q124_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
             SUM(l_quantity) AS sum_qty
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                               GROUP BY l_orderkey
                               HAVING SUM(l_quantity) > 200)
          GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice""",
    "q125_tpch_q19" ->
      s"""SELECT ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")}
               AS revenue,
             COUNT(*) AS n_items
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 1 AND 21)
             OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 25
                 AND l_quantity BETWEEN 10 AND 30)
             OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
                 AND l_quantity BETWEEN 20 AND 40)""",
    "q126_tpch_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
          FROM supplier
          JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          JOIN orders ON o_orderkey = l1.l_orderkey
          WHERE o_orderstatus = 'F'
            AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
            AND EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lineitem l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey
                              AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
          GROUP BY s_name
          ORDER BY numwait DESC, s_name ASC LIMIT 20""",
    "q127_tpch_q22" ->
      s"""WITH cu AS (
            SELECT c_custkey, c_acctbal,
                   CAST(c_nationkey % 10 AS BIGINT) AS cntrycode
            FROM customer
            WHERE c_nationkey % 10 IN (1, 3, 5, 7))
          SELECT cntrycode, COUNT(*) AS numcust,
             ${Exact.sqlDsum("c_acctbal")} AS totacctbal
          FROM cu
          WHERE c_acctbal > (SELECT ${Exact.sqlDavg("c_acctbal")}
                             FROM cu WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT'
                              AND o_orderdate >= TIMESTAMP '1999-01-01')
          GROUP BY cntrycode""",
    "q176_tpch_q2" ->
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type,
             l_extendedprice AS price
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY' AND p_size <= 15
            AND l_extendedprice =
              (SELECT MIN(l2.l_extendedprice)
               FROM lineitem l2
               JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
               JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
               JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
               WHERE l2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
          ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
          LIMIT 100""",
    "q177_tpch_q11" ->
      s"""WITH np AS (
            SELECT l_partkey,
               ${Exact.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS value
            FROM lineitem
            WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                                JOIN nation ON s_nationkey = n_nationkey
                                WHERE n_name = 'NATION_3')
            GROUP BY l_partkey)
          SELECT l_partkey, value FROM np
          WHERE value > (SELECT ${Exact.sqlDsum("value")} * 0.001 FROM np)""",
    "q178_tpch_q12" ->
      """SELECT l_returnflag,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                             OR o_orderpriority = '2-HIGH'
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                            AND o_orderpriority <> '2-HIGH'
                           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          FROM orders
          JOIN lineitem ON o_orderkey = l_orderkey
          WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_returnflag""",
    "q179_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
             COUNT(DISTINCT l_suppkey) AS supplier_cnt
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_brand <> 'Brand#1'
            AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
            AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0.0)
          GROUP BY p_brand, p_type, p_size""",
    "q180_tpch_q20" ->
      s"""SELECT s_name, s_acctbal
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_5'
            AND s_suppkey IN (
              SELECT ps.sp_suppkey FROM (
                SELECT l_suppkey AS sp_suppkey, l_partkey AS sp_partkey,
                   ${Exact.sqlDsum("l_quantity")} AS sup_qty
                FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_type = 'PROMO')
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY 1, 2) ps
              WHERE ps.sup_qty >
                (SELECT 0.3 * ${Exact.sqlDsum("l2.l_quantity")}
                 FROM lineitem l2
                 WHERE l2.l_partkey = ps.sp_partkey
                   AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l2.l_shipdate < TIMESTAMP '1997-01-01'))"""
  )
}
