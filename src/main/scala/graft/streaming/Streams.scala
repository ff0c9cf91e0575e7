package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Native Structured Streaming surface — the Spark-managed-state
  * counterpart to the Z-set Runner (Incremental.scala).
  *
  * The reference deploys its circuits as long-running processes fed record
  * streams (SURVEY §3: the pipeline/ ingestion drivers); on Spark the same
  * deployments come in two shapes:
  *
  *  - the incremental Runner inside `foreachBatch` (exact Z-set deltas,
  *    retractions, recursive views — StreamingSpec's deployment tests);
  *  - NATIVE streaming operators, where Spark manages the state store:
  *    watermarked windowed aggregates (state is bounded by the watermark —
  *    late rows beyond it are dropped and finalized windows are evicted,
  *    which is what makes a 100 TB/day stream's state O(window × keys)
  *    instead of O(history)), and arbitrary per-key state via
  *    `mapGroupsWithState` (the reference's custom stateful operators).
  *
  * Everything here is a pure *transform*: callers plug a `readStream`
  * source in and a `writeStream` sink out, so the same code serves batch
  * DataFrames in tests and streaming DataFrames in deployment (the
  * transforms use only operations legal in both modes).
  */
object Streams {

  /** Watermarked tumbling (or sliding, when `slide` is set) window
    * aggregate: per (window, key) row count and value sum.
    *
    * Scale notes: the state store holds only windows the watermark has not
    * passed; the aggregation shuffles once on (window, key) with map-side
    * partial aggregation — the same plan shape as the batch groupBy. */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
                  valCol: String, windowDur: String,
                  slide: Option[String] = None,
                  watermark: String = "10 minutes"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), windowDur, s)
      case None    => window(col(tsCol), windowDur)
    }
    events.withWatermark(tsCol, watermark)
      .groupBy(win.as("win"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valCol)).as("total"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col(keyCol), col("n"), col("total"))
  }

  /** Native session-window aggregate (Spark's `session_window` — the
    * state store MERGES overlapping per-key session windows, a different
    * operator from `sessionize`'s hand-rolled flatMapGroupsWithState):
    * events of a key belong to one session while each arrives strictly
    * within `gap` of the previous (Spark's window end is last-event +
    * gap, and a new event joins iff its time < that end — so a gap of
    * EXACTLY `gap` starts a new session, the boundary the oracle must
    * mirror). Append mode emits a session only once the watermark proves
    * no event can extend it; state per key is bounded by the watermark,
    * the 100 TB/day property. */
  def sessionWindowAgg(events: DataFrame, tsCol: String, keyCol: String,
                       gap: String, watermark: String = "0 seconds")
      : DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("win"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("win.start").as("s_start"),
        col("win.end").as("s_end"), col("n"))

  /** Per-key running totals via `mapGroupsWithState` — the minimal shape
    * of a custom stateful operator (the reference's aggregate operators
    * keep exactly this: a per-key accumulator advanced by each delta).
    * Emits the post-batch state of every key seen in the batch. */
  final case class Running(n: Long, total: Long)
  def runningTotals(events: Dataset[(String, Long)]): Dataset[(String, Long, Long)] = {
    implicit val stEnc: Encoder[Running] = Encoders.product[Running]
    implicit val outEnc: Encoder[(String, Long, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
    events.groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState[Running, (String, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Running]) =>
          val (dn, dTotal) = rows.foldLeft((0L, 0L)) {
            case ((a, b), (_, v)) => (a + 1L, b + v)
          }
          val prev = state.getOption.getOrElse(Running(0L, 0L))
          val next = Running(prev.n + dn, prev.total + dTotal)
          state.update(next)
          (key, next.n, next.total)
      }
  }

  /** Session windows with an inactivity gap via `flatMapGroupsWithState`:
    * a key's events extend its open session while each gap to the next
    * event stays ≤ `gapMs`; a larger gap CLOSES the session and emits one
    * summary row (key, start_ms, end_ms, n). Gap splitting happens
    * IN-FUNCTION over the batch's sorted timestamps — not only at the
    * event-time timeout — so a gap-exceeding event that arrives in the
    * same micro-batch (or before the watermark passed the old session)
    * still starts a fresh session exactly where a batch gaps-and-islands
    * query would. The timeout (watermark past end + gap — deterministic,
    * unlike wall-clock timeouts) flushes sessions whose keys go quiet.
    * The reference has no session operator — this is the beyond-reference
    * shape every training-data event pipeline ends up needing.
    *
    * State per key is O(1) (bounds, count); the timeout evicts closed
    * sessions, so total state is O(active keys), bounded by the
    * watermark exactly like the windowed aggregate's. */
  final case class Session(start: Long, end: Long, n: Long)
  def sessionize(events: Dataset[(String, java.sql.Timestamp)], gapMs: Long,
                 watermarkDelay: String = "0 seconds")
      : Dataset[(String, Long, Long, Long)] = {
    implicit val stEnc: Encoder[Session] = Encoders.product[Session]
    implicit val outEnc: Encoder[(String, Long, Long, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong)
    events.withWatermark("_2", watermarkDelay)
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[Session, (String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator((key, s.start, s.end, s.n))
          } else {
            val ts = rows.map(_._2.getTime).toArray.sorted
            val closed = Seq.newBuilder[(String, Long, Long, Long)]
            var cur = state.getOption
            ts.foreach { t =>
              cur = cur match {
                case Some(s) if t - s.end > gapMs =>
                  closed += ((key, s.start, s.end, s.n))
                  Some(Session(t, t, 1L))
                case Some(s) =>
                  Some(Session(s.start, math.max(s.end, t), s.n + 1L))
                case None => Some(Session(t, t, 1L))
              }
            }
            val open = cur.get
            state.update(open)
            state.setTimeoutTimestamp(open.end + gapMs)
            closed.result().iterator
          }
      }
  }

  /** [[sessionize]]'s semantics re-expressed on Spark 4's
    * `transformWithState` arbitrary-state API — StatefulProcessor with a
    * TYPED ValueState and explicit event-time TIMERS, the designated
    * successor to flatMapGroupsWithState (finer state kinds, multiple
    * named states per key, timer management decoupled from input arrival).
    * In-batch gap splitting is identical; quiet keys close via a timer
    * registered at session end + gap, deleted and re-registered as the
    * session extends so a stale timer can never mis-fire (and a guard in
    * the handler re-checks anyway). Requires the RocksDB state store
    * provider — Spark supports transformWithState only there; fixtures
    * set it on their forked session. */
  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, (String, java.sql.Timestamp),
        (String, Long, Long, Long)] {
    @transient private var sess: ValueState[Session] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState("session", Encoders.product[Session],
        TTLConfig.NONE)
    override def handleInputRows(key: String,
        rows: Iterator[(String, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
      val ts = rows.map(_._2.getTime).toArray.sorted
      val closed = Seq.newBuilder[(String, Long, Long, Long)]
      var cur = if (sess.exists) Some(sess.get) else None
      cur.foreach(s => getHandle.deleteTimer(s.end + gapMs))
      ts.foreach { t =>
        cur = cur match {
          case Some(s) if t - s.end > gapMs =>
            closed += ((key, s.start, s.end, s.n))
            Some(Session(t, t, 1L))
          case Some(s) =>
            Some(Session(s.start, math.max(s.end, t), s.n + 1L))
          case None => Some(Session(t, t, 1L))
        }
      }
      val open = cur.get
      sess.update(open)
      getHandle.registerTimer(open.end + gapMs)
      closed.result().iterator
    }
    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[(String, Long, Long, Long)] = {
      if (sess.exists && sess.get.end + gapMs <= expired.getExpiryTimeInMs) {
        val s = sess.get
        sess.clear()
        Iterator((key, s.start, s.end, s.n))
      } else Iterator.empty
    }
  }

  def sessionizeTws(events: Dataset[(String, java.sql.Timestamp)],
                    gapMs: Long, watermarkDelay: String = "0 seconds")
      : Dataset[(String, Long, Long, Long)] = {
    implicit val outEnc: Encoder[(String, Long, Long, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong)
    events.withWatermark("_2", watermarkDelay)
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append(), outEnc)
  }
}
