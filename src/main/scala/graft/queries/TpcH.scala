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
          ORDER BY revenue DESC, c_custkey ASC LIMIT 20"""
  )
}
