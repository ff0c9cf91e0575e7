package graft.queries

import graft.Tables
import graft.functions.SqlFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Date/time surface: EXTRACT's 18 units, FLOOR/CEIL(ts TO unit),
  * DAYOFWEEK, TIMESTAMPDIFF, date/interval arithmetic.
  *
  * Reference: lib/sqllib/src/timestamp.rs:158-318 (extract),
  * :114-156 (floor/ceil), doc/sql/datetime.rst:13-40 (interval arithmetic),
  * ComplexQueriesTest.java:400-401 (DAYOFWEEK/TIMESTAMPDIFF usage).
  * All computed with built-in codegen'd expressions (SqlFunctions helpers).
  */
object Temporal {
  type QFn = (SparkSession, String) => DataFrame
  private def T(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val defs: Map[String, QFn] = Map(
    // All 18 EXTRACT units (timestamp.rs:158-318), as BIGINT like EXTRACT
    "q40_extract_units" -> ((s, d) => {
      val ts = col("ts")
      T(s, d, "events").select(
        col("event_id"),
        year(ts).cast(LongType).as("u_year"),
        quarter(ts).cast(LongType).as("u_quarter"),
        month(ts).cast(LongType).as("u_month"),
        dayofmonth(ts).cast(LongType).as("u_day"),
        hour(ts).cast(LongType).as("u_hour"),
        minute(ts).cast(LongType).as("u_minute"),
        second(ts).cast(LongType).as("u_second"),
        dayofyear(ts).cast(LongType).as("u_doy"),
        weekofyear(ts).cast(LongType).as("u_week"),
        dow(ts).as("u_dow"),
        isodow(ts).as("u_isodow"),
        isoyear(ts).as("u_isoyear"),
        decade(ts).as("u_decade"),
        century(ts).as("u_century"),
        millennium(ts).as("u_millennium"),
        epochSecond(ts).as("u_epoch"),
        millisecondOfMinute(ts).as("u_ms"),
        microsecondOfMinute(ts).as("u_us"))
    }),

    // FLOOR/CEIL(ts TO unit) — timestamp.rs:114-156
    "q41_floor_ceil_ts" -> ((s, d) => {
      val ts = col("ts")
      T(s, d, "events").select(
        col("event_id"),
        floorTs(ts, "year").as("fl_year"),
        floorTs(ts, "month").as("fl_month"),
        floorTs(ts, "day").as("fl_day"),
        floorTs(ts, "hour").as("fl_hour"),
        ceilTs(ts, "month").as("ce_month"),
        ceilTs(ts, "hour").as("ce_hour"))
    }),

    // DAYOFWEEK (Calcite: 1=Sunday..7) + TIMESTAMPDIFF units
    "q42_dayofweek_tsdiff" -> ((s, d) => {
      val o = T(s, d, "orders")
      val li = T(s, d, "lineitem")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          dayofweek(col("o_orderdate")).cast(LongType).as("dow_order"),
          timestampdiffSecond(col("o_orderdate"), col("l_shipdate")).as("diff_sec"),
          timestampdiffHour(col("o_orderdate"), col("l_shipdate")).as("diff_hour"),
          timestampdiffDay(col("o_orderdate"), col("l_shipdate")).as("diff_day"),
          timestampdiffMonth(col("o_orderdate"), col("l_shipdate")).as("diff_month"))
    }),

    // Interval arithmetic: ts ± INTERVAL (incl. end-of-month clamping),
    // date difference in days (doc/sql/datetime.rst:13-40)
    "q43_interval_arith" -> ((s, d) =>
      T(s, d, "orders").select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 1 MONTH")).as("plus_1mo"),
        (col("o_orderdate") + expr("INTERVAL 3 DAY")).as("plus_3d"),
        (col("o_orderdate") - expr("INTERVAL 90 MINUTE")).as("minus_90min"),
        (col("o_orderdate") + expr("INTERVAL '1-2' YEAR TO MONTH")).as("plus_1y2mo"),
        datediff(to_date(lit("1998-12-31")), to_date(col("o_orderdate")))
          .cast(LongType).as("days_to_end")))
  )

  private val sqlEpoch = (x: String) => s"CAST(FLOOR(epoch_us($x) / 1000000) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "q40_extract_units" ->
      s"""SELECT event_id,
            extract(year FROM ts) AS u_year,
            extract(quarter FROM ts) AS u_quarter,
            extract(month FROM ts) AS u_month,
            extract(day FROM ts) AS u_day,
            extract(hour FROM ts) AS u_hour,
            extract(minute FROM ts) AS u_minute,
            extract(second FROM ts) AS u_second,
            extract(doy FROM ts) AS u_doy,
            extract(week FROM ts) AS u_week,
            extract(dow FROM ts) AS u_dow,
            extract(isodow FROM ts) AS u_isodow,
            extract(isoyear FROM ts) AS u_isoyear,
            extract(decade FROM ts) AS u_decade,
            extract(century FROM ts) AS u_century,
            extract(millennium FROM ts) AS u_millennium,
            ${sqlEpoch("ts")} AS u_epoch,
            extract(millisecond FROM ts) AS u_ms,
            extract(microsecond FROM ts) AS u_us
          FROM events""",
    "q41_floor_ceil_ts" ->
      """SELECT event_id,
            CAST(date_trunc('year', ts) AS TIMESTAMP) AS fl_year,
            CAST(date_trunc('month', ts) AS TIMESTAMP) AS fl_month,
            CAST(date_trunc('day', ts) AS TIMESTAMP) AS fl_day,
            CAST(date_trunc('hour', ts) AS TIMESTAMP) AS fl_hour,
            CAST(CASE WHEN ts = date_trunc('month', ts) THEN ts
                 ELSE date_trunc('month', ts) + INTERVAL 1 MONTH END AS TIMESTAMP) AS ce_month,
            CAST(CASE WHEN ts = date_trunc('hour', ts) THEN ts
                 ELSE date_trunc('hour', ts) + INTERVAL 1 HOUR END AS TIMESTAMP) AS ce_hour
         FROM events""",
    "q42_dayofweek_tsdiff" -> {
      val e1 = sqlEpoch("o_orderdate"); val e2 = sqlEpoch("l_shipdate")
      s"""SELECT l_orderkey, l_linenumber,
            (extract(dow FROM o_orderdate) + 1) AS dow_order,
            ($e2 - $e1) AS diff_sec,
            CAST(FLOOR(($e2 - $e1) / 3600) AS BIGINT) AS diff_hour,
            CAST(FLOOR(($e2 - $e1) / 86400) AS BIGINT) AS diff_day,
            ((extract(year FROM l_shipdate) - extract(year FROM o_orderdate)) * 12
              + (extract(month FROM l_shipdate) - extract(month FROM o_orderdate))
              - CASE WHEN extract(day FROM l_shipdate) < extract(day FROM o_orderdate)
                     THEN 1 ELSE 0 END) AS diff_month
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""
    },
    "q43_interval_arith" ->
      """SELECT o_orderkey,
            o_orderdate + INTERVAL 1 MONTH AS plus_1mo,
            o_orderdate + INTERVAL 3 DAY AS plus_3d,
            o_orderdate - INTERVAL 90 MINUTE AS minus_90min,
            o_orderdate + INTERVAL 14 MONTH AS plus_1y2mo,
            date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_end
         FROM orders"""
  )
}
