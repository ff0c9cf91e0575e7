package graft.queries

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nexmark q6–q8 query shapes over the synthetic star schema — the
  * reference ships only q0–q5 (NexmarkTest.java:66-222), so these extend
  * parity; WorkloadSpec exercises the literal auction/bid/person forms on
  * the Nexmark fixture, and these entries give each shape a DuckDB oracle
  * row over the driver's parquet tables:
  *
  *  - q6: average selling price per seller over their last 10 closed
  *    auctions → average order price per customer over their 10 most
  *    recent orders (per-group top-N by recency, then re-aggregate);
  *  - q7: highest bid per tumbling window → per-hour max event value with
  *    the achieving rows (tumbling window via date_trunc, max-join-back);
  *  - q8: persons who opened an auction inside their registration window
  *    → users with a signup AND a purchase in the same hour (two slices
  *    of one stream joined on (entity, window)).
  *
  * Scale notes: q6 is one shuffle on o_custkey and a per-partition
  * top-10; q7 broadcasts the per-hour maxima (one row per hour — tiny at
  * any data scale); q8's two distincts and the join all hash-partition on
  * (user_id, w_start), so the join reuses the distincts' exchanges.
  */
object Workloads {
  type QFn = (SparkSession, String) => DataFrame
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val defs: Map[String, QFn] = Map(
    "q171_nexmark6_last10_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      T(s, d, "orders")
        .select(col("o_custkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 10)
        .groupBy(col("o_custkey"))
        .agg(Exact.davg(col("o_totalprice")).as("avg_price"),
          count(lit(1)).as("n_orders"))
    }),

    "q172_nexmark7_window_max" -> ((s, d) => {
      val ev = T(s, d, "events")
        .select(date_trunc("hour", col("ts")).as("w_start"),
          col("user_id"), col("value"))
      val mx = ev.groupBy(col("w_start"))
        .agg(max(col("value")).as("max_value"))
      ev.join(broadcast(mx), Seq("w_start"))
        .filter(col("value") === col("max_value"))
        .select(col("w_start"), col("user_id"), col("max_value"))
    }),

    "q173_nexmark8_same_window_join" -> ((s, d) => {
      val ev = T(s, d, "events")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("w_start"),
          col("event_type"))
      val p = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("w_start")).distinct()
      val a = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("w_start")).distinct()
      p.join(a, Seq("user_id", "w_start"))
        .select(col("user_id"), col("w_start"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q171_nexmark6_last10_avg" ->
      s"""SELECT o_custkey, ${Exact.sqlDavg("o_totalprice")} AS avg_price,
              COUNT(*) AS n_orders
          FROM (SELECT o_custkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM orders) t
          WHERE rn <= 10 GROUP BY o_custkey""",

    "q172_nexmark7_window_max" ->
      """WITH w AS (SELECT date_trunc('hour', ts) AS w_start, user_id, value
                    FROM events),
              mx AS (SELECT w_start, MAX(value) AS max_value
                     FROM w GROUP BY w_start)
         SELECT w.w_start, w.user_id, mx.max_value
         FROM w JOIN mx USING (w_start) WHERE w.value = mx.max_value""",

    "q173_nexmark8_same_window_join" ->
      """SELECT DISTINCT p.user_id, p.w_start
         FROM (SELECT DISTINCT user_id, date_trunc('hour', ts) AS w_start
               FROM events WHERE event_type = 'signup') p
         JOIN (SELECT DISTINCT user_id, date_trunc('hour', ts) AS w_start
               FROM events WHERE event_type = 'purchase') a
           ON p.user_id = a.user_id AND p.w_start = a.w_start"""
  )
}
