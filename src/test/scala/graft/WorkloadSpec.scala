package graft

import graft.engine.Engine
import graft.functions.SqlFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The reference's realistic complex workloads, end-to-end through the
  * Engine: Nexmark (NexmarkTest.java:37-222 — single wide event table,
  * person/auction/bid views, queries q0–q5) and the NYC-taxi
  * (ComplexQueriesTest.java:42-61) and credit-card-fraud (:369-440)
  * feature pipelines. Expectations are computed independently in Scala, so
  * these pin values, not just plan health. */
class WorkloadSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("workloads")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()
  import spark.implicits._

  // ---- Nexmark ---------------------------------------------------------

  /** person/auction/bid views carved from one wide event table by
    * event_type, exactly like NexmarkTest's DDL (flattened names — Spark
    * temp views don't allow dotted identifiers). */
  private lazy val nexmark: Engine = {
    val e = new Engine(spark)
    e.executeScript(
      """CREATE TABLE NEXMARK_TABLE (
        |  event_type INT NOT NULL,
        |  p_id BIGINT NULL, p_name VARCHAR NULL, p_state VARCHAR NULL,
        |  p_dateTime TIMESTAMP NULL,
        |  a_id BIGINT NULL, a_itemName VARCHAR NULL, a_initialBid BIGINT NULL,
        |  a_dateTime TIMESTAMP NULL, a_expires TIMESTAMP NULL,
        |  a_seller BIGINT NULL, a_category BIGINT NULL,
        |  b_auction BIGINT NULL, b_bidder BIGINT NULL, b_price BIGINT NULL,
        |  b_dateTime TIMESTAMP NULL
        |);
        |CREATE VIEW person AS
        |  SELECT p_id AS id, p_name AS name, p_state AS state, p_dateTime AS dateTime
        |  FROM NEXMARK_TABLE WHERE event_type = 0;
        |CREATE VIEW auction AS
        |  SELECT a_id AS id, a_itemName AS itemName, a_initialBid AS initialBid,
        |         a_dateTime AS dateTime, a_expires AS expires,
        |         a_seller AS seller, a_category AS category
        |  FROM NEXMARK_TABLE WHERE event_type = 1;
        |CREATE VIEW bid AS
        |  SELECT b_auction AS auction, b_bidder AS bidder, b_price AS price,
        |         b_dateTime AS dateTime
        |  FROM NEXMARK_TABLE WHERE event_type = 2""".stripMargin)
    // deterministic synthetic stream: 3 persons, 4 auctions, 40 bids
    def ts(s: Int) = s"TIMESTAMP '2024-01-01 00:00:${f"$s%02d"}'"
    val persons = Seq(
      s"(0, 1, 'alice', 'OR', ${ts(0)}, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)",
      s"(0, 2, 'bob', 'CA', ${ts(1)}, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)",
      s"(0, 3, 'carol', 'NY', ${ts(2)}, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)")
    val auctions = (1 to 4).map { a =>
      val cat = if (a % 2 == 0) 10 else 11
      s"(1, NULL, NULL, NULL, NULL, $a, 'item$a', 100, ${ts(0)}, ${ts(50)}, ${a % 3 + 1}, $cat, NULL, NULL, NULL, NULL)"
    }
    val bids = (0 until 40).map { i =>
      val auc = i % 4 + 1
      s"(2, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, $auc, ${i % 7}, ${100 + i * 7 % 90}, ${ts(i % 45)})"
    }
    e.executeStatement("INSERT INTO NEXMARK_TABLE VALUES " +
      (persons ++ auctions ++ bids).mkString(",\n"))
    e
  }

  test("nexmark q0/q1: pass-through and currency conversion") {
    val q0 = nexmark.spark.sql("SELECT auction, bidder, price, dateTime FROM bid")
    assert(q0.count() === 40)
    val q1 = nexmark.spark.sql("SELECT auction, bidder, 0.908 * price AS price FROM bid")
    val row = q1.agg(min("price"), max("price")).collect()(0)
    assert(row.getDecimal(0).doubleValue() > 0 && row.getDecimal(1).doubleValue() < 0.908 * 190)
  }

  test("nexmark q2: selection every 123rd auction (mod filter)") {
    val q2 = nexmark.spark.sql(
      "SELECT auction, price FROM bid WHERE MOD(auction, 2) = 0")
    assert(q2.count() === 20 && q2.select("auction").distinct().count() === 2)
  }

  test("nexmark q3: local item suggestion (join + filter)") {
    val q3 = nexmark.spark.sql(
      """SELECT P.name, P.state, A.id
        |FROM auction A JOIN person P ON A.seller = P.id
        |WHERE A.category = 10 AND (P.state = 'OR' OR P.state = 'ID' OR P.state = 'CA')""".stripMargin)
    // auctions 2 (seller 3, NY — excluded) and 4 (seller 2, CA — included)
    assert(q3.collect().map(r => (r.getString(0), r.getLong(2))).toSet === Set(("bob", 4L)))
  }

  test("nexmark q4: average winning bid per category") {
    val q4 = nexmark.spark.sql(
      """SELECT Q.category, AVG(Q.final) AS avg_final
        |FROM (
        |  SELECT MAX(B.price) AS final, A.category
        |  FROM auction A, bid B
        |  WHERE A.id = B.auction AND B.dateTime BETWEEN A.dateTime AND A.expires
        |  GROUP BY A.id, A.category
        |) Q GROUP BY Q.category""".stripMargin)
    val got = q4.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent recompute
    val bids = nexmark.spark.table("bid")
      .filter(col("dateTime") <= to_timestamp(lit("2024-01-01 00:00:50")))
    val maxPerAuction = bids.groupBy("auction").agg(max("price").as("final"))
    val cats = Map(1L -> 11L, 2L -> 10L, 3L -> 11L, 4L -> 10L)
    val want = maxPerAuction.collect()
      .map(r => cats(r.getLong(0)) -> r.getLong(1)).groupBy(_._1)
      .map { case (c, xs) => c -> xs.map(_._2.toDouble).sum / xs.length }
    assert(got === want)
  }

  test("nexmark q5: hot items over hopping windows") {
    // HOP(dateTime, 2s slide, 10s size) → Spark window(col, '10 seconds', '2 seconds')
    val bid = nexmark.spark.table("bid")
    val counts = bid.groupBy(col("auction"),
        window(col("dateTime"), "10 seconds", "2 seconds").as("w"))
      .agg(count(lit(1)).as("num"))
    val maxPerWindow = counts.groupBy("w").agg(max("num").as("maxn"))
    val hot = counts.join(maxPerWindow, "w")
      .filter(col("num") >= col("maxn"))
      .select(col("auction"), col("num"))
    assert(hot.count() > 0)
    // every window's winner(s) really have the window max
    val bad = counts.join(maxPerWindow, "w").filter(col("num") > col("maxn")).count()
    assert(bad === 0)
  }

  test("nexmark q6: average selling price per seller over last 10 closed auctions") {
    val q6 = nexmark.spark.sql(
      """SELECT seller, AVG(final) AS avg_price FROM (
        |  SELECT seller, final,
        |         ROW_NUMBER() OVER (PARTITION BY seller
        |                            ORDER BY expires DESC, aid DESC) AS rn
        |  FROM (SELECT A.id AS aid, A.seller, A.expires, MAX(B.price) AS final
        |        FROM auction A, bid B
        |        WHERE A.id = B.auction
        |          AND B.dateTime BETWEEN A.dateTime AND A.expires
        |        GROUP BY A.id, A.seller, A.expires) wins
        |) ranked WHERE rn <= 10 GROUP BY seller""".stripMargin)
    val got = q6.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent recompute: all 4 auctions close (<10 per seller, all kept)
    val bids = nexmark.spark.table("bid")
      .filter(col("dateTime") <= to_timestamp(lit("2024-01-01 00:00:50")))
    val sellers = Map(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 2L)
    val want = bids.groupBy("auction").agg(max("price").as("final")).collect()
      .map(r => sellers(r.getLong(0)) -> r.getLong(1)).groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2.toDouble).sum / xs.length }
    assert(got === want)
  }

  test("nexmark q7: highest bid per tumbling window") {
    val bid = nexmark.spark.table("bid")
    val w = bid.select(window(col("dateTime"), "10 seconds").as("w"),
      col("auction"), col("bidder"), col("price"))
    val mx = w.groupBy("w").agg(max("price").as("mx"))
    val top = w.join(mx, "w").filter(col("price") === col("mx"))
    // every emitted row carries its window's true max, every window emits
    val windows = w.select("w").distinct().count()
    assert(top.select("w").distinct().count() === windows)
    assert(w.join(mx, "w").filter(col("price") > col("mx")).count() === 0)
  }

  test("nexmark q8: persons who opened an auction in their registration window") {
    val p = nexmark.spark.table("person")
      .select(col("id"), col("name"),
        window(col("dateTime"), "10 seconds").as("w"))
    val a = nexmark.spark.table("auction")
      .select(col("seller"), window(col("dateTime"), "10 seconds").as("w"))
    val got = p.join(a, p("id") === a("seller") && p("w") === a("w"))
      .select(col("id"), col("name")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // fixture: persons register at 0/1/2s, all auctions open at 0s — every
    // person is a seller (sellers {1,2,3}) in window [0,10)
    assert(got === Set((1L, "alice"), (2L, "bob"), (3L, "carol")))
  }

  // ---- taxi rolling-window feature (ComplexQueriesTest.java:42-61) -----

  test("taxi: trailing-1h trip count per pickup zone, 1 PRECEDING bound") {
    val trips = Seq(
      // (pickup_epoch_sec, pickup_location)
      (0L, 1L), (1000L, 1L), (3000L, 1L), (4000L, 1L), (8000L, 1L),
      (0L, 2L), (100L, 2L))
      .toDF("pickup_sec", "pickup_location_id")
    val w = Window.partitionBy(col("pickup_location_id"))
      .orderBy(col("pickup_sec")).rangeBetween(-3600, -1)
    val got = trips.select(col("pickup_location_id"), col("pickup_sec"),
        count(lit(1)).over(w).as("count_trips_window_1h_pickup_zip"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // zone 1: t=0→0 prior, 1000→1, 3000→2, 4000→3 (0 is exactly 3600+400 away? 4000-3600=400 ⇒ excludes t=0? no: range [400,3999] excludes 0, includes 1000,3000) → 2
    assert(got((1L, 0L)) === 0)
    assert(got((1L, 1000L)) === 1)
    assert(got((1L, 3000L)) === 2)
    assert(got((1L, 4000L)) === 2) // t=0 fell out of the 1h window
    assert(got((1L, 8000L)) === 0) // all prior trips older than 1h
    assert(got((2L, 100L)) === 1)
  }

  // ---- fraud feature pipeline (ComplexQueriesTest.java:369-440) --------

  test("fraud: demographic join + age/distance/window features") {
    val demographics = Seq(
      (101L, "First", "OR", "1990-01-15", 45.0, -122.0),
      (102L, "Second", "CA", "1978-06-01", 34.0, -118.0))
      .toDF("cc_num", "first", "state", "dob", "lat", "long")
    val transactions = Seq(
      (101L, 10.0, 1000L, "2024-03-01 10:00:00", 45.5, -122.5, 0),
      (101L, 20.0, 2000L, "2024-03-01 10:16:40", 45.5, -122.5, 0),
      (101L, 30.0, 86000L, "2024-03-02 10:00:00", 46.0, -123.0, 1),
      (102L, 99.0, 500L, "2024-03-01 09:00:00", 34.1, -118.1, 0))
      .toDF("cc_num", "amt", "unix_time", "trans_time_s", "merch_lat", "merch_long", "is_fraud")
      .withColumn("trans_date_trans_time",
        to_timestamp(col("trans_time_s")).cast("timestamp_ntz"))
    val joined = transactions.join(demographics, Seq("cc_num"), "left")
    val wDay = Window.partitionBy(col("cc_num")).orderBy(col("unix_time"))
      .rangeBetween(-86400, -1)
    val wWeek = Window.partitionBy(col("cc_num")).orderBy(col("unix_time"))
      .rangeBetween(-604800, -1)
    val feats = joined.select(
      col("cc_num"), col("unix_time"),
      dayofweek(col("trans_date_trans_time")).as("d"),
      SqlFunctions.stDistance(
        SqlFunctions.stPoint(col("long"), col("lat")),
        SqlFunctions.stPoint(col("merch_long"), col("merch_lat"))).as("distance"),
      avg(col("amt")).over(wWeek).as("avg_spend_pw"),
      count(lit(1)).over(wDay).as("trans_freq_24"),
      col("is_fraud"))
    val rows = feats.collect().map(r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getDouble(3), Option(r.get(4)), r.getLong(5))).toMap
    // card 101, third txn: window [-86400,-1] from 86000 covers 1000 & 2000
    assert(rows((101L, 86000L))._4 === 2L)
    assert(rows((101L, 86000L))._3 === Some(15.0)) // avg(10,20) in week window
    assert(rows((101L, 1000L))._4 === 0L)
    // Euclidean geo distance (geopoint.rs:26-55 semantics)
    val d = rows((101L, 1000L))._2
    assert(math.abs(d - math.sqrt(0.5 * 0.5 + 0.5 * 0.5)) < 1e-12)
    // day-of-week: 2024-03-01 is a Friday → Calcite DAYOFWEEK = 6
    assert(rows((101L, 1000L))._1 === 6)
  }
}
