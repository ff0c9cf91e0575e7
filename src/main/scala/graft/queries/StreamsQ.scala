package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Native Structured Streaming surface under the driver's DuckDB oracle:
  * the `Streams` transforms run through REAL micro-batches (MemoryStream →
  * writeStream → memory sink) and the final emitted state must hash-match
  * a batch SQL query over the same events — the same batch ≡ streaming
  * axis the Z-set Runner queries prove, here for Spark's own state store.
  *
  * Fixture plumbing (NOT the operator's scale path): the events table is
  * collected and fed time-ordered in a few batches, with a far-future
  * sentinel key advancing the watermark so every real window/session
  * finalizes (append mode only emits finalized state). The operator under
  * test — `Streams.windowedAgg` / `Streams.sessionize` — is a pure
  * transform on an unbounded stream; in deployment the same code hangs
  * off `readStream` and the state store bounds memory by the watermark.
  *
  * Session hygiene: each fixture runs its streaming query on a FORKED
  * session (GraftSqlBridge.cloneSession) with its own shuffle-partition
  * count — never a `conf.set` on the shared session, which would
  * transiently re-plan concurrent queries. Event times are derived from
  * the NTZ source column via wall-clock epoch arithmetic (timestampdiff
  * against the NTZ epoch), so no value ever routes through the session
  * timezone.
  */
object StreamsQ {
  type QFn = (SparkSession, String) => DataFrame

  private val SENT = "__sentinel"
  private val nameSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Fork the session with its own conf (shared SparkContext). The state
    * store runs one instance per shuffle partition per batch; the fixtures
    * drive a handful of micro-batches over small keyed state, so the batch
    * session's partition count would multiply pure store-commit latency.
    * These queries start from a fresh checkpoint every run, so the count
    * is free to choose here — deployed streams size it once for peak state
    * and keep it for the query's life. */
  private def fork(s: SparkSession, parts: Int = 4): SparkSession = {
    val f = org.apache.spark.sql.GraftSqlBridge.cloneSession(s)
    f.conf.set("spark.sql.shuffle.partitions", parts.toString)
    f
  }

  /** Driver-size guard for the MemoryStream fixtures: MemoryStream is
    * driver-side by nature, so the source table is collected — bounded,
    * with a LOUD failure past the cap, so a future large-SF run fails
    * explicitly instead of silently OOMing the driver. */
  private val MaxFixtureRows = 2000000
  private def collectBounded(df: DataFrame, what: String): Array[Row] = {
    val rows = df.limit(MaxFixtureRows + 1).collect()
    require(rows.length <= MaxFixtureRows,
      s"$what: streaming fixture would collect > $MaxFixtureRows source " +
        "rows to the driver; sample the source or feed it via files, not " +
        "MemoryStream, at this scale")
    rows
  }

  /** NTZ-safe epoch seconds of the `ts` column: pure wall-clock difference
    * (truncating, like unix_timestamp) — never routed through the session
    * timezone, so it matches DuckDB's tz-free epoch(ts) everywhere. */
  private val tsEpochSec =
    expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")

  /** Feed `rows` (already time-ordered) in `parts` batches, then two
    * sentinel batches that advance the watermark far past every event and
    * fire all event-time timeouts; return the memory-sink table (bound to
    * the forked session that ran the query). */
  private def drive[T](forked: SparkSession, mem: MemoryStream[T],
                       writer: => org.apache.spark.sql.streaming.DataStreamWriter[_],
                       rows: Seq[T], sentinels: Seq[T], parts: Int): DataFrame = {
    val qn = s"graft_stream_sink_${nameSeq.getAndIncrement()}"
    val q = writer.queryName(qn).start()
    try {
      val per = math.max(1, rows.length / parts + 1)
      rows.grouped(per).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      sentinels.foreach { s =>
        mem.addData(s)
        q.processAllAvailable()
      }
    } finally q.stop()
    forked.table(qn)
  }

  val defs: Map[String, QFn] = Map(
    // Watermarked tumbling 1h windowed aggregate (Streams.windowedAgg)
    // through micro-batches; finalized (append-mode) windows must equal
    // DuckDB's hour-bucket GROUP BY. The summed value is integral
    // (event_id % 97) so the result is partition-order independent.
    "q113_stream_windowed_agg" -> ((s, d) => {
      val f = fork(s)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = f.sqlContext
      import f.implicits._
      val ev = collectBounded(Tables.load(f, d, "events")
        .select(tsEpochSec.as("t"),
          col("user_id").cast("string").as("k"),
          (col("event_id") % 97).cast("long").as("v"))
        .orderBy(col("t")), "q113")
      val rows = ev.map(r =>
        (new java.sql.Timestamp(r.getLong(0) * 1000L), r.getString(1), r.getLong(2))).toSeq
      val lastMs = rows.last._1.getTime
      val sent1 = new java.sql.Timestamp(lastMs + 1000L * 3600 * 24)
      val sent2 = new java.sql.Timestamp(sent1.getTime + 60000L)
      val mem = MemoryStream[(java.sql.Timestamp, String, Long)]
      val agg = graft.streaming.Streams.windowedAgg(
        mem.toDF().toDF("ts", "k", "v"), "ts", "k", "v", "1 hour",
        watermark = "0 seconds")
      val table = drive(f, mem,
        agg.writeStream.outputMode("append").format("memory"),
        rows, Seq((sent1, SENT, 0L), (sent2, SENT, 0L)), parts = 3)
      table.filter(col("k") =!= SENT)
        .select(unix_timestamp(col("win_start")).as("win_start_sec"),
          col("k").as("user_id"), col("n"), col("total"))
    }),

    // Gap sessionization with per-key state (Streams.sessionize,
    // flatMapGroupsWithState + event-time timeout) through micro-batches;
    // the emitted closed sessions must equal DuckDB's gaps-and-islands
    // query (gap > 1h starts a new session).
    "q114_stream_sessionize" -> ((s, d) => {
      val f = fork(s)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = f.sqlContext
      import f.implicits._
      val ev = collectBounded(Tables.load(f, d, "events")
        .select(col("user_id").cast("string").as("k"), tsEpochSec.as("t"))
        .orderBy(col("t")), "q114")
      val rows = ev.map(r =>
        (r.getString(0), new java.sql.Timestamp(r.getLong(1) * 1000L))).toSeq
      val lastMs = rows.last._2.getTime
      val sent1 = (SENT, new java.sql.Timestamp(lastMs + 1000L * 3600 * 24))
      val sent2 = (SENT, new java.sql.Timestamp(sent1._2.getTime + 60000L))
      val mem = MemoryStream[(String, java.sql.Timestamp)]
      val out = graft.streaming.Streams
        .sessionize(mem.toDS(), gapMs = 3600L * 1000L)
        .toDF("user_id", "start_ms", "end_ms", "n")
      val table = drive(f, mem,
        out.writeStream.outputMode("append").format("memory"),
        rows, Seq(sent1, sent2), parts = 3)
      table.filter(col("user_id") =!= SENT)
    }),

    // NATIVE SESSION WINDOWS (Streams.sessionWindowAgg): Spark's
    // session_window state-merge operator — the built-in alternative to
    // q114's hand-rolled flatMapGroupsWithState sessionize. Boundary
    // semantics differ from q114 BY DESIGN: session_window starts a new
    // session at a gap of EXACTLY 1 h (new event joins iff t < last + gap),
    // so the oracle breaks on diff >= 3600 where q114's breaks on > 3600.
    // Last-event time is recovered as window end − gap.
    "q162_stream_session_window" -> ((s, d) => {
      val f = fork(s)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = f.sqlContext
      import f.implicits._
      val ev = collectBounded(Tables.load(f, d, "events")
        .select(col("user_id").cast("string").as("k"), tsEpochSec.as("t"))
        .orderBy(col("t")), "q162")
      val rows = ev.map(r =>
        (r.getString(0), new java.sql.Timestamp(r.getLong(1) * 1000L))).toSeq
      val lastMs = rows.last._2.getTime
      val sent1 = (SENT, new java.sql.Timestamp(lastMs + 1000L * 3600 * 24))
      val sent2 = (SENT, new java.sql.Timestamp(sent1._2.getTime + 60000L))
      val mem = MemoryStream[(String, java.sql.Timestamp)]
      val agg = graft.streaming.Streams.sessionWindowAgg(
        mem.toDF().toDF("k", "ts"), "ts", "k", gap = "1 hour")
      val table = drive(f, mem,
        agg.writeStream.outputMode("append").format("memory"),
        rows, Seq(sent1, sent2), parts = 3)
      table.filter(col("k") =!= SENT)
        .select(col("k").as("user_id"),
          unix_timestamp(col("s_start")).as("start_sec"),
          (unix_timestamp(col("s_end")) - 3600L).as("end_sec"),
          col("n"))
    }),

    // SLIDING (overlapping) windowed aggregate: window(ts, 2h, 1h) — each
    // event lands in TWO hour-aligned windows, the moving-average shape
    // tumbling q113 cannot express. Same watermark/append cadence; the
    // oracle replicates each event into its two covering windows.
    "q163_stream_sliding_agg" -> ((s, d) => {
      val f = fork(s)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = f.sqlContext
      import f.implicits._
      val ev = collectBounded(Tables.load(f, d, "events")
        .select(tsEpochSec.as("t"),
          col("user_id").cast("string").as("k"),
          (col("event_id") % 97).cast("long").as("v"))
        .orderBy(col("t")), "q163")
      val rows = ev.map(r =>
        (new java.sql.Timestamp(r.getLong(0) * 1000L), r.getString(1),
          r.getLong(2))).toSeq
      val lastMs = rows.last._1.getTime
      val sent1 = new java.sql.Timestamp(lastMs + 1000L * 3600 * 24)
      val sent2 = new java.sql.Timestamp(sent1.getTime + 60000L)
      val mem = MemoryStream[(java.sql.Timestamp, String, Long)]
      val agg = graft.streaming.Streams.windowedAgg(
        mem.toDF().toDF("ts", "k", "v"), "ts", "k", "v", "2 hours",
        slide = Some("1 hour"), watermark = "0 seconds")
      val table = drive(f, mem,
        agg.writeStream.outputMode("append").format("memory"),
        rows, Seq((sent1, SENT, 0L), (sent2, SENT, 0L)), parts = 3)
      table.filter(col("k") =!= SENT)
        .select(unix_timestamp(col("win_start")).as("win_start_sec"),
          col("k").as("user_id"), col("n"), col("total"))
    }),

    // transformWithState SESSIONIZATION (Streams.sessionizeTws): the same
    // gap semantics as q114, re-expressed on Spark 4's arbitrary-state
    // API — StatefulProcessor, typed ValueState, explicit event-time
    // timers — over the RocksDB state store provider (the only store the
    // API supports; set on the forked session). Same DuckDB
    // gaps-and-islands oracle as q114: a green row certifies the modern
    // state API end-to-end, including timer-driven close of quiet keys.
    "q166_stream_session_tws" -> ((s, d) => {
      val f = fork(s)
      f.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = f.sqlContext
      import f.implicits._
      val ev = collectBounded(Tables.load(f, d, "events")
        .select(col("user_id").cast("string").as("k"), tsEpochSec.as("t"))
        .orderBy(col("t")), "q166")
      val rows = ev.map(r =>
        (r.getString(0), new java.sql.Timestamp(r.getLong(1) * 1000L))).toSeq
      val lastMs = rows.last._2.getTime
      val sent1 = (SENT, new java.sql.Timestamp(lastMs + 1000L * 3600 * 24))
      val sent2 = (SENT, new java.sql.Timestamp(sent1._2.getTime + 60000L))
      val mem = MemoryStream[(String, java.sql.Timestamp)]
      val out = graft.streaming.Streams
        .sessionizeTws(mem.toDS(), gapMs = 3600L * 1000L)
        .toDF("user_id", "start_ms", "end_ms", "n")
      val table = drive(f, mem,
        out.writeStream.outputMode("append").format("memory"),
        rows, Seq(sent1, sent2), parts = 3)
      table.filter(col("user_id") =!= SENT)
    }),

    // MULTI-STATEFUL STREAMING PIPELINE: watermarked dedup CHAINED into a
    // tumbling windowed aggregate inside ONE streaming query — two state
    // stores in series with watermark propagation between them (the
    // continuous-ingest shape: dedup the firehose, then aggregate the
    // clean stream; at 100 TB/day both stores stay watermark-bounded).
    // Every event is fed twice, so the aggregate is only correct if the
    // dedup stage actually suppressed the duplicates BEFORE counting.
    "q165_stream_dedup_then_window" -> ((s, d) => {
      val f = fork(s)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = f.sqlContext
      import f.implicits._
      val ev = collectBounded(Tables.load(f, d, "events")
        .select(tsEpochSec.as("t"),
          col("user_id").cast("string").as("k"),
          (col("event_id") % 97).cast("long").as("v"))
        .orderBy(col("t"), col("k"), col("v")), "q165")
      val base = ev.map(r => (new java.sql.Timestamp(r.getLong(0) * 1000L),
        r.getString(1), r.getLong(2), r.getLong(0))).toSeq
      val rows = base.flatMap(x => Seq(x, x))
      val lastMs = base.last._1.getTime
      val sent1 =
        (new java.sql.Timestamp(lastMs + 1000L * 3600 * 24), SENT, 0L, 0L)
      val sent2 =
        (new java.sql.Timestamp(sent1._1.getTime + 60000L), SENT, 0L, 0L)
      val mem = MemoryStream[(java.sql.Timestamp, String, Long, Long)]
      val cleaned = mem.toDF().toDF("ts", "k", "v", "t")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("k", "v", "t")
      val agg = cleaned
        .groupBy(window(col("ts"), "1 hour").as("win"), col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
        .select(col("win.start").as("win_start"), col("k"), col("n"),
          col("total"))
      val table = drive(f, mem,
        agg.writeStream.outputMode("append").format("memory"),
        rows, Seq(sent1, sent2), parts = 3)
      table.filter(col("k") =!= SENT)
        .select(unix_timestamp(col("win_start")).as("win_start_sec"),
          col("k").as("user_id"), col("n"), col("total"))
    }),

    // Stream-stream interval join (Spark's watermarked state-store join —
    // the attribution shape: each purchase joined to the same user's
    // clicks in the preceding hour). Both sides are REAL MemoryStreams fed
    // the same time-ordered chunks, so the min-policy global watermark
    // advances together; the 2 h watermark delay exceeds the 1 h join
    // window, so no in-window row is ever late. State per side is bounded
    // by watermark + window — at 100 TB/day the store holds ~3 h of keyed
    // events, not history. The oracle is DuckDB's batch interval join.
    "q133_stream_stream_join" -> ((s, d) =>
      attributionJoin(s, d, "inner")),

    // Stream-stream LEFT OUTER interval join: unattributed purchases emit
    // with NULL click columns — but only once the global watermark passes
    // their join window (Spark holds the left row until no matching click
    // can still arrive), which is exactly what the sentinel batches
    // advance past. Same state bound as the inner join; the NULL-padded
    // rows are the unattributed-conversion report every funnel needs.
    "q145_stream_stream_left_join" -> ((s, d) =>
      attributionJoin(s, d, "left_outer")),

    // STREAMING DEDUPLICATION through the state store: dropDuplicates on
    // a key subset keeps the first-seen row per key across micro-batches
    // — the continuous-ingest dedup every training pipeline runs in
    // front of its corpus. Output is restricted to the key columns
    // (which row of a key "arrived first" inside one micro-batch is
    // parallelism-dependent, the key SET is not), so the oracle is the
    // batch DISTINCT. State here grows with key cardinality — q161 below
    // is the 100 TB/day variant, where dropDuplicatesWithinWatermark
    // evicts state by watermark instead.
    "q157_stream_dedup" -> ((s, d) => {
      val f = fork(s)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = f.sqlContext
      import f.implicits._
      val ev = collectBounded(Tables.load(f, d, "events")
        .select(col("user_id"), col("event_type"), tsEpochSec.as("t"))
        .orderBy(col("t"), col("user_id")), "q157")
      val rows = ev.map(r => (r.getLong(0), r.getString(1))).toSeq
      val mem = MemoryStream[(Long, String)]
      val dedup = mem.toDF().toDF("user_id", "event_type")
        .dropDuplicates("user_id", "event_type")
      drive(f, mem,
        dedup.writeStream.outputMode("append").format("memory"),
        rows, Seq.empty, parts = 4)
    }),

    // WATERMARK-EVICTING STREAMING DEDUP — the 100 TB/day deployment
    // shape q157's doc names: dropDuplicatesWithinWatermark keyed on
    // (user_id, event_type, event-time-second) evicts a key's state once
    // the watermark passes its event time + the 1 h delay, so the store
    // holds ~1 h of keys instead of growing with key cardinality forever.
    // The fixture feeds EVERY event twice (adjacent, hence inside the
    // delay), so the operator has real duplicates to suppress; events are
    // fed time-ordered, so no row is ever late, and the sentinel batches
    // push the watermark past all real state, exercising eviction. The
    // event time rides as its NTZ-safe epoch-second long (`t`), so no
    // value routes through the session timezone; the oracle is the batch
    // DISTINCT over the same triple.
    "q161_stream_dedup_watermark" -> ((s, d) => {
      val f = fork(s)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = f.sqlContext
      import f.implicits._
      val ev = collectBounded(Tables.load(f, d, "events")
        .select(col("user_id"), col("event_type"), tsEpochSec.as("t"))
        .orderBy(col("t"), col("user_id"), col("event_type")), "q161")
      val base = ev.map(r => (new java.sql.Timestamp(r.getLong(2) * 1000L),
        r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val rows = base.flatMap(x => Seq(x, x))
      val lastMs = base.last._1.getTime
      val sent1 =
        (new java.sql.Timestamp(lastMs + 1000L * 3600 * 24), -1L, SENT, 0L)
      val sent2 =
        (new java.sql.Timestamp(sent1._1.getTime + 60000L), -1L, SENT, 0L)
      val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
      val dedup = mem.toDF().toDF("ts", "user_id", "event_type", "t")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type", "t")
      val table = drive(f, mem,
        dedup.writeStream.outputMode("append").format("memory"),
        rows, Seq(sent1, sent2), parts = 4)
      table.filter(col("user_id") >= 0)
        .select(col("user_id"), col("event_type"), col("t"))
    }),

    // STREAM-STATIC JOIN: each micro-batch enriches against a static
    // dimension (re-planned per batch, broadcast here — the lookup-table
    // enrichment shape). No state, no watermark: rows emit as they
    // arrive; the oracle is the batch join.
    "q158_stream_static_join" -> ((s, d) => {
      val f = fork(s)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = f.sqlContext
      import f.implicits._
      val nat = Tables.load(f, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val ev = collectBounded(Tables.load(f, d, "events")
        .select(col("event_id"), col("user_id"), tsEpochSec.as("t"))
        .orderBy(col("t"), col("event_id")), "q158")
      val rows = ev.map(r => (r.getLong(0), r.getLong(1))).toSeq
      val mem = MemoryStream[(Long, Long)]
      val joined = mem.toDF().toDF("event_id", "user_id")
        .join(broadcast(nat), col("user_id") % 25 === col("n_nationkey"))
        .select(col("event_id"), col("user_id"), col("n_name"))
      drive(f, mem,
        joined.writeStream.outputMode("append").format("memory"),
        rows, Seq.empty, parts = 4)
    }),

    // Stream-stream FULL OUTER interval join: BOTH unmatched sides emit
    // NULL-padded on watermark crossing — unattributed purchases AND
    // clicks that never converted, in one standing join (the complete
    // funnel ledger). Same state bound; Spark evicts each side's state by
    // its own watermark + window and pads whatever never matched.
    "q154_stream_stream_full_join" -> ((s, d) =>
      attributionJoin(s, d, "full_outer")),

    // Stream-stream RIGHT OUTER interval join — the click-side ledger
    // (every click, with its converting purchase or NULL), completing the
    // inner/LEFT/FULL/RIGHT outer matrix over the same watermarked
    // state-store join. Spark holds the right (click) row until the
    // watermark proves no purchase can still match it, then pads.
    "q159_stream_stream_right_join" -> ((s, d) =>
      attributionJoin(s, d, "right_outer"))
  )

  /** Purchase←click attribution join (same user, click within the
    * preceding hour) through REAL micro-batches on two MemoryStreams.
    * Both sides are fed the same time-ordered chunks, so the min-policy
    * global watermark advances together; the 2 h watermark delay exceeds
    * the 1 h join window, so no in-window row is ever late. */
  private def attributionJoin(s: SparkSession, d: String,
                              joinType: String): DataFrame = {
    val f = fork(s)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = f.sqlContext
    import f.implicits._
    // FULL microsecond precision (the oracle's interval arithmetic is at
    // micros): NTZ-safe epoch micros, re-materialized as an instant
    val ev = collectBounded(Tables.load(f, d, "events")
      .select(col("event_id"), col("user_id"),
        expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").as("t_us"),
        col("event_type"))
      .orderBy(col("t_us")), s"attribution($joinType)")
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def rowsOf(kind: String) = ev.toSeq
      .filter(_.getString(3) == kind)
      .map(r => (r.getLong(0), r.getLong(1), tsOf(r.getLong(2))))
    val purchases = rowsOf("purchase"); val clicks = rowsOf("click")
    // an empty side is a valid input (a click-free corpus should emit all
    // purchases NULL-padded in the outer join) — the sentinel must still
    // advance both watermarks, so anchor it past whatever rows exist
    val lastMs = (purchases ++ clicks).map(_._3.getTime)
      .maxOption.getOrElse(0L)
    def sent(off: Long) = (-1L, -1L, new java.sql.Timestamp(lastMs + off))
    val memP = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memC = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val p = memP.toDF().toDF("purchase_id", "p_user", "p_ts")
      .withWatermark("p_ts", "2 hours")
    val c = memC.toDF().toDF("click_id", "c_user", "c_ts")
      .withWatermark("c_ts", "2 hours")
    // user_id coalesces both sides: in the full-outer shape an unmatched
    // click has no purchase row to take the user from (NULL-safe for
    // inner/left too, where p_user is never NULL)
    val joined = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("interval 1 hour") &&
          col("c_ts") <= col("p_ts"),
        joinType)
      .select(col("purchase_id"), col("click_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"))
    val qn = s"graft_stream_sink_${nameSeq.getAndIncrement()}"
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName(qn).start()
    try {
      // same time-span chunk to BOTH sides per step (3 chunks), then TWO
      // sentinel rounds: outer-join NULL padding emits in the batch
      // AFTER the one whose end advanced the watermark past the window
      val np = math.max(1, purchases.length / 3 + 1)
      val nc = math.max(1, clicks.length / 3 + 1)
      purchases.grouped(np).toSeq.zipAll(
          clicks.grouped(nc).toSeq, Seq.empty, Seq.empty)
        .foreach { case (pc, cc) =>
          if (pc.nonEmpty) memP.addData(pc)
          if (cc.nonEmpty) memC.addData(cc)
          q.processAllAvailable()
        }
      Seq(1000L * 3600 * 24, 1000L * 3600 * 25).foreach { off =>
        memP.addData(sent(off))
        memC.addData(sent(off))
        q.processAllAvailable()
      }
    } finally q.stop()
    f.table(qn).filter(col("user_id") >= 0)
  }

  val oracles: Map[String, String] = Map(
    "q113_stream_windowed_agg" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start_sec,
                CAST(user_id AS VARCHAR) AS user_id,
                COUNT(*) AS n,
                CAST(SUM(event_id % 97) AS BIGINT) AS total
         FROM events
         GROUP BY 1, 2""",
    "q114_stream_sessionize" ->
      """-- FLOOR(epoch), not CAST: Spark's epoch-second derivation
         -- truncates the sub-second fraction while DuckDB's BIGINT cast
         -- would round it
         WITH e AS (SELECT CAST(user_id AS VARCHAR) AS user_id,
                           CAST(FLOOR(epoch(ts)) AS BIGINT) * 1000 AS t
                    FROM events),
              m AS (SELECT user_id, t,
                           CASE WHEN t - lag(t) OVER w > 3600000
                                  OR lag(t) OVER w IS NULL
                                THEN 1 ELSE 0 END AS brk
                    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
              g AS (SELECT user_id, t,
                           SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS sid
                    FROM m)
         SELECT user_id, MIN(t) AS start_ms, MAX(t) AS end_ms,
                COUNT(*) AS n
         FROM g GROUP BY user_id, sid""",
    "q166_stream_session_tws" ->
      """-- same gaps-and-islands semantics as q114 (break on gap > 1h)
         WITH e AS (SELECT CAST(user_id AS VARCHAR) AS user_id,
                           CAST(FLOOR(epoch(ts)) AS BIGINT) * 1000 AS t
                    FROM events),
              m AS (SELECT user_id, t,
                           CASE WHEN t - lag(t) OVER w > 3600000
                                  OR lag(t) OVER w IS NULL
                                THEN 1 ELSE 0 END AS brk
                    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
              g AS (SELECT user_id, t,
                           SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS sid
                    FROM m)
         SELECT user_id, MIN(t) AS start_ms, MAX(t) AS end_ms,
                COUNT(*) AS n
         FROM g GROUP BY user_id, sid""",
    "q133_stream_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                p.user_id AS user_id
         FROM events p JOIN events c
           ON p.event_type = 'purchase' AND c.event_type = 'click'
          AND p.user_id = c.user_id
          AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts""",
    "q145_stream_stream_left_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                p.user_id AS user_id
         FROM events p LEFT JOIN events c
           ON c.event_type = 'click'
          AND p.user_id = c.user_id
          AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
         WHERE p.event_type = 'purchase'""",
    "q157_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events""",
    "q161_stream_dedup_watermark" ->
      """-- FLOOR(epoch), not CAST: Spark's epoch-second derivation
         -- truncates the sub-second fraction, DuckDB's cast would round
         SELECT DISTINCT user_id, event_type,
                CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
         FROM events""",
    "q162_stream_session_window" ->
      """-- session_window boundary: a gap of EXACTLY 1h starts a NEW
         -- session (Spark: event joins iff t < last + gap) -> brk >= 3600
         WITH e AS (SELECT CAST(user_id AS VARCHAR) AS user_id,
                           CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
                    FROM events),
              m AS (SELECT user_id, t,
                           CASE WHEN t - lag(t) OVER w >= 3600
                                  OR lag(t) OVER w IS NULL
                                THEN 1 ELSE 0 END AS brk
                    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
              g AS (SELECT user_id, t,
                           SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS sid
                    FROM m)
         SELECT user_id, MIN(t) AS start_sec, MAX(t) AS end_sec,
                COUNT(*) AS n
         FROM g GROUP BY user_id, sid""",
    "q165_stream_dedup_then_window" ->
      """-- dedup (distinct user/value/second triples) THEN hour-bucket agg
         WITH e AS (SELECT DISTINCT
                      CAST(user_id AS VARCHAR) AS user_id,
                      event_id % 97 AS v,
                      CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
                    FROM events)
         SELECT (t - t % 3600) AS win_start_sec, user_id,
                COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS total
         FROM e GROUP BY 1, 2""",
    "q163_stream_sliding_agg" ->
      """-- window(2h, slide 1h): each event belongs to the hour-aligned
         -- window starting at its own hour and the one before
         WITH e AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                             AS h,
                           CAST(user_id AS VARCHAR) AS user_id,
                           event_id % 97 AS v
                    FROM events),
              w AS (SELECT h AS win_start_sec, user_id, v FROM e
                    UNION ALL
                    SELECT h - 3600 AS win_start_sec, user_id, v FROM e)
         SELECT win_start_sec, user_id, COUNT(*) AS n,
                CAST(SUM(v) AS BIGINT) AS total
         FROM w GROUP BY win_start_sec, user_id""",
    "q158_stream_static_join" ->
      """SELECT e.event_id, e.user_id, n.n_name
         FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey""",
    "q154_stream_stream_full_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                COALESCE(p.user_id, c.user_id) AS user_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts""",
    "q159_stream_stream_right_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                c.user_id AS user_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         RIGHT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts"""
  )
}
