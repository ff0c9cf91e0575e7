package graft.queries

import graft.{Exact, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregate-OVER with RANGE frames — the reference's flagship realistic
  * workload (DBSPWindowAggregateOperator.java:34-39, compiled at
  * CalciteToDBSPCompiler.java:855-978; exercised by the NYC-taxi 1-hour
  * rolling features ComplexQueriesTest.java:42-61 and the credit-card fraud
  * 1-day/1-week features :369-440).
  *
  * Spark expresses the whole operator as built-in
  * `Window.partitionBy(p).orderBy(t).rangeBetween(lo, hi)` — one shuffle on
  * the partition key per window spec, then a per-partition sort; at 100 TB
  * the shuffle is keyed on user_id (high cardinality, no skew hot-spot) and
  * each window spec that shares (partition, order) reuses the same exchange.
  *
  * Window sums over doubles go through the Exact fixed-point image: Spark
  * accumulates frames in row order while DuckDB uses segment trees, so a raw
  * double SUM OVER would differ at ULP level; decimal addition is
  * order-independent.
  *
  * The RANGE order key is integral epoch seconds (the reference requires an
  * integer or timestamp order column, CalciteToDBSPCompiler.java:896-901).
  */
object Windows {
  type QFn = (SparkSession, String) => DataFrame
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Integral epoch-second order key, bit-identical in Spark and DuckDB. */
  private def tsSec(c: Column): Column =
    floor(unix_micros(c.cast(TimestampType)) / lit(1000000L)).cast(LongType)
  private val sqlTsSec = "CAST(FLOOR(epoch_us(ts) / 1000000) AS BIGINT)"

  val defs: Map[String, QFn] = Map(
    // Taxi shape: count + sum over the trailing hour per user
    "q30_window_1h" -> ((s, d) => {
      val ev = T(s, d, "events").withColumn("ts_sec", tsSec(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(-3600, 0)
      ev.select(
        col("event_id"), col("user_id"), col("ts_sec"),
        count(lit(1)).over(w).as("n_1h"),
        (sum(Exact.fix(col("value"))).over(w).cast(DoubleType) / 10000.0).as("sum_1h"))
    }),

    // Both-bounds-PRECEDING frame (compileWindowBound :855-870 supports
    // <n> PRECEDING AND <m> PRECEDING): the hour before the last hour
    "q31_window_prec_prec" -> ((s, d) => {
      val ev = T(s, d, "events").withColumn("ts_sec", tsSec(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(-7200, -3601)
      ev.select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_prev_h"),
        (sum(Exact.fix(col("value"))).over(w).cast(DoubleType) / 10000.0).as("sum_prev_h"))
    }),

    // Running totals: RANGE UNBOUNDED PRECEDING .. CURRENT ROW
    "q32_window_running" -> ((s, d) => {
      val ev = T(s, d, "events").withColumn("ts_sec", tsSec(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(Window.unboundedPreceding, 0)
      ev.select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_sofar"),
        (sum(Exact.fix(col("value"))).over(w).cast(DoubleType) / 10000.0).as("sum_sofar"))
    }),

    // Fraud shape: 1-day and 7-day trailing features in one pass — both
    // specs share (partition, order), so Catalyst plans a single exchange
    // + sort and evaluates both frames in one Window node.
    "q33_window_fraud" -> ((s, d) => {
      val ev = T(s, d, "events").withColumn("ts_sec", tsSec(col("ts")))
      val w1d = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(-86400, 0)
      val w7d = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(-7 * 86400, 0)
      ev.select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w1d).as("n_1d"),
        (sum(Exact.fix(col("value"))).over(w1d).cast(DoubleType) / 10000.0 /
          count(lit(1)).over(w1d)).as("avg_1d"),
        count(lit(1)).over(w7d).as("n_7d"),
        (sum(Exact.fix(col("value"))).over(w7d).cast(DoubleType) / 10000.0 /
          count(lit(1)).over(w7d)).as("avg_7d"))
    }),

    // MIN/MAX over a RANGE frame (exact values — no fixed-point needed)
    "q34_window_minmax" -> ((s, d) => {
      val ev = T(s, d, "events").withColumn("ts_sec", tsSec(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(-3600, 0)
      ev.select(
        col("event_id"), col("user_id"),
        min(col("value")).over(w).as("min_1h"),
        max(col("value")).over(w).as("max_1h"))
    }),

    // Beyond-reference ranking: ROW_NUMBER top-k per key (deterministic via
    // unique event_id tie-break). The reference lacks ranking fns (§2.6);
    // Spark gives them free, so we expose them as engine surface.
    "q35_window_rownum" -> ((s, d) => {
      val ev = T(s, d, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id").asc)
      ev.select(col("event_id"), col("user_id"), col("value"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    }),

    // Beyond-reference LAG/LEAD with deterministic unique ordering
    "q36_window_lag" -> ((s, d) => {
      val ev = T(s, d, "events").withColumn("ts_sec", tsSec(col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec").asc, col("event_id").asc)
      ev.select(
        col("event_id"), col("user_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        (col("ts_sec") - lag(col("ts_sec"), 1).over(w)).as("gap_sec"))
    }),

    // AS-OF join (reference doc/sql/grammar.rst ASOF JOIN; DuckDB ASOF is
    // the oracle): each click gets the user's latest purchase at-or-before
    // it. Composed as union + last(ignoreNulls) carry-forward — one keyed
    // shuffle, no range-join explosion (operators/AsOfJoin.scala).
    "q107_asof_join" -> ((s, d) => {
      val ev = T(s, d, "events")
        .withColumn("ts_us", unix_micros(col("ts").cast(TimestampType)))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      // pre-aggregate so build rows are unique per (user, ts): ASOF ties
      // would otherwise be engine-arbitrary
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("value")).as("purchase_value"))
        .withColumn("purchase_ts_us", col("ts_us"))
      _root_.graft.operators.AsOfJoin.asOfLeft(
        clicks, purchases, Seq("user_id"), "ts_us")
    }),

    // Bucketed range join (operators/RangeJoin.scala): every order dated
    // within 30 days after an anchor order, WITHOUT an equality conjunct —
    // the shape Spark itself would plan as BroadcastNestedLoopJoin and the
    // reference as a unit-key cross join (CalciteToDBSPCompiler.java:584).
    // Binning turns it into one equi-shuffle on the bin id; the oracle is
    // DuckDB's native inequality join.
    "q109_range_join" -> ((s, d) => {
      val ord = T(s, d, "orders")
      def day(c: Column) = datediff(c.cast(DateType), to_date(lit("1970-01-01")))
      val anchors = ord.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("a_key"),
          day(col("o_orderdate")).cast(LongType).as("lo"))
        .withColumn("hi", col("lo") + 30L)
      val probe = ord.select(
        day(col("o_orderdate")).cast(LongType).as("p_day"),
        col("o_totalprice").as("p_price"))
      _root_.graft.operators.RangeJoin
        .pointInInterval(probe, "p_day", anchors, "lo", "hi", binWidth = 16L)
        .groupBy(col("a_key"))
        .agg(count(lit(1)).as("n_win"),
          Exact.dsum(col("p_price")).as("sum_win"))
    }),

    // Interval-overlap join (operators/RangeJoin.scala): promotion windows
    // of two order cohorts that intersect in time. Each side is binned and
    // replicated; a qualifying pair is kept only in the bin where the
    // overlap STARTS, so each pair is emitted exactly once with no distinct
    // pass. Oracle is DuckDB's native inequality join.
    "q110_interval_overlap" -> ((s, d) => {
      val ord = T(s, d, "orders")
      def day(c: Column) = datediff(c.cast(DateType), to_date(lit("1970-01-01")))
      def cohort(mod: Int, span: Long, kc: String, lo: String, hi: String) =
        ord.filter(col("o_orderkey") % mod === 0)
          .select(col("o_orderkey").as(kc),
            day(col("o_orderdate")).cast(LongType).as(lo))
          .withColumn(hi, col(lo) + span)
      val a = cohort(59, 20L, "a_key", "a_lo", "a_hi")
      val b = cohort(83, 15L, "b_key", "b_lo", "b_hi")
      _root_.graft.operators.RangeJoin
        .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", binWidth = 16L)
        .groupBy(col("a_key"))
        .agg(count(lit(1)).as("n_overlap"),
          min(col("b_key")).as("first_b"),
          max(col("b_key")).as("last_b"))
    }),

    // Gap-based sessionization (30-min inactivity): the canonical
    // training-data / clickstream segmentation op, gaps-and-islands over
    // one (user, ts) sort, then one aggregate per session.
    "q108_sessionize" -> ((s, d) => {
      val ev = T(s, d, "events").withColumn("ts_sec", tsSec(col("ts")))
        .select(col("user_id"), col("event_id"), col("ts_sec"))
      _root_.graft.operators.AsOfJoin
        .sessionize(ev, Seq("user_id"), "ts_sec", "event_id", 1800L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_sec")).as("sess_start"),
          max(col("ts_sec")).as("sess_end"),
          (max(col("ts_sec")) - min(col("ts_sec"))).as("duration_sec"))
    })
  )

  private def sqlFixSum(x: String, frame: String) =
    s"(CAST(SUM(${Exact.sqlFix(x)}) OVER $frame AS DOUBLE) / 10000.0)"

  val oracles: Map[String, String] = Map(
    "q30_window_1h" -> {
      val fr = "(PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"
      s"""SELECT event_id, user_id, ts_sec,
             COUNT(*) OVER $fr AS n_1h,
             ${sqlFixSum("value", fr)} AS sum_1h
          FROM (SELECT *, $sqlTsSec AS ts_sec FROM events) e"""
    },
    "q31_window_prec_prec" -> {
      val fr = "(PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 7200 PRECEDING AND 3601 PRECEDING)"
      s"""SELECT event_id, user_id,
             COUNT(*) OVER $fr AS n_prev_h,
             ${sqlFixSum("value", fr)} AS sum_prev_h
          FROM (SELECT *, $sqlTsSec AS ts_sec FROM events) e"""
    },
    "q32_window_running" -> {
      val fr = "(PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
      s"""SELECT event_id, user_id,
             COUNT(*) OVER $fr AS n_sofar,
             ${sqlFixSum("value", fr)} AS sum_sofar
          FROM (SELECT *, $sqlTsSec AS ts_sec FROM events) e"""
    },
    "q33_window_fraud" -> {
      val f1 = "(PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)"
      val f7 = "(PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)"
      s"""SELECT event_id, user_id,
             COUNT(*) OVER $f1 AS n_1d,
             (${sqlFixSum("value", f1)} / COUNT(*) OVER $f1) AS avg_1d,
             COUNT(*) OVER $f7 AS n_7d,
             (${sqlFixSum("value", f7)} / COUNT(*) OVER $f7) AS avg_7d
          FROM (SELECT *, $sqlTsSec AS ts_sec FROM events) e"""
    },
    "q34_window_minmax" -> {
      val fr = "(PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"
      s"""SELECT event_id, user_id,
             MIN(value) OVER $fr AS min_1h,
             MAX(value) OVER $fr AS max_1h
          FROM (SELECT *, $sqlTsSec AS ts_sec FROM events) e"""
    },
    "q35_window_rownum" ->
      """SELECT event_id, user_id, value, rn FROM (
           SELECT event_id, user_id, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
           FROM events) t
         WHERE rn <= 3""",
    "q36_window_lag" -> {
      val w = "(PARTITION BY user_id ORDER BY ts_sec ASC, event_id ASC)"
      s"""SELECT event_id, user_id,
             LAG(value, 1) OVER $w AS prev_value,
             LEAD(value, 1) OVER $w AS next_value,
             (ts_sec - LAG(ts_sec, 1) OVER $w) AS gap_sec
          FROM (SELECT *, $sqlTsSec AS ts_sec FROM events) e"""
    },
    "q107_asof_join" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us, MAX(value) AS purchase_value
                    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
              c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
                    FROM events WHERE event_type = 'click')
         SELECT c.event_id, c.user_id, c.ts_us, c.value,
                p.purchase_value, p.ts_us AS purchase_ts_us
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND p.ts_us <= c.ts_us""",
    "q109_range_join" ->
      s"""WITH o AS (SELECT o_orderkey,
                            date_diff('day', DATE '1970-01-01',
                                      CAST(o_orderdate AS DATE)) AS p_day,
                            o_totalprice
                     FROM orders),
               a AS (SELECT o_orderkey AS a_key, p_day AS lo, p_day + 30 AS hi
                     FROM o WHERE o_orderkey % 97 = 0)
          SELECT a_key, COUNT(*) AS n_win,
                 ${Exact.sqlDsum("o.o_totalprice")} AS sum_win
          FROM a JOIN o ON o.p_day >= a.lo AND o.p_day <= a.hi
          GROUP BY a_key""",
    "q110_interval_overlap" ->
      """WITH o AS (SELECT o_orderkey,
                           date_diff('day', DATE '1970-01-01',
                                     CAST(o_orderdate AS DATE)) AS d
                    FROM orders),
              a AS (SELECT o_orderkey AS a_key, d AS a_lo, d + 20 AS a_hi
                    FROM o WHERE o_orderkey % 59 = 0),
              b AS (SELECT o_orderkey AS b_key, d AS b_lo, d + 15 AS b_hi
                    FROM o WHERE o_orderkey % 83 = 0)
         SELECT a_key, CAST(COUNT(*) AS BIGINT) AS n_overlap,
                MIN(b_key) AS first_b, MAX(b_key) AS last_b
         FROM a JOIN b ON a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
         GROUP BY a_key""",
    "q108_sessionize" -> {
      val w = "(PARTITION BY user_id ORDER BY ts_sec, event_id)"
      s"""WITH e AS (SELECT user_id, event_id, $sqlTsSec AS ts_sec FROM events),
               f AS (SELECT *, CASE WHEN LAG(ts_sec) OVER $w IS NULL
                                      OR ts_sec - LAG(ts_sec) OVER $w > 1800
                                    THEN 1 ELSE 0 END AS ns FROM e),
               g AS (SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id
                       ORDER BY ts_sec, event_id ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
                     FROM f)
          SELECT user_id, session_id, COUNT(*) AS n_events,
                 MIN(ts_sec) AS sess_start, MAX(ts_sec) AS sess_end,
                 MAX(ts_sec) - MIN(ts_sec) AS duration_sec
          FROM g GROUP BY 1, 2"""
    }
  )
}
