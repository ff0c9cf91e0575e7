package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Structured Streaming as the append-only incremental mode (SURVEY §2.9,
  * §7.2 step 6): the reference's incremental aggregate / distinct
  * operators (DBSPIncrementalAggregateOperator.java:35,
  * DBSPIncrementalDistinctOperator.java:31) map to stateful streaming
  * groupBy/dropDuplicates in update mode when inputs are append-only
  * (retraction-bearing inputs use graft.streaming.Incremental instead).
  * Each micro-batch = one circuit step; results after N steps must equal
  * the batch query over the union of all step inputs. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("streaming")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("streaming grouped aggregate over micro-batches equals batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("k", "v")
      .groupBy($"k").agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
      .writeStream.format("memory").queryName("agg_out").outputMode("complete")
      .start()
    try {
      mem.addData(("a", 1L), ("b", 2L)); q.processAllAvailable()
      mem.addData(("a", 10L), ("c", 5L)); q.processAllAvailable()
      val got = spark.table("agg_out").as[(String, Long, Long)].collect().sortBy(_._1)
      val want = Seq(("a", 1L), ("b", 2L), ("a", 10L), ("c", 5L)).toDF("k", "v")
        .groupBy($"k").agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
        .as[(String, Long, Long)].collect().sortBy(_._1)
      assert(got === want)
    } finally q.stop()
  }

  test("streaming dropDuplicates equals batch distinct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("k").dropDuplicates("k")
      .writeStream.format("memory").queryName("dd_out").outputMode("append")
      .start()
    try {
      mem.addData("x", "y", "x"); q.processAllAvailable()
      mem.addData("y", "z"); q.processAllAvailable()
      val got = spark.table("dd_out").as[String].collect().sorted
      assert(got === Array("x", "y", "z"))
    } finally q.stop()
  }

  test("foreachBatch deployment: a Runner consumes micro-batches and survives restart via checkpoint") {
    import spark.implicits._
    import graft.streaming.Incremental._
    import graft.zset.ZSet
    implicit val sqlCtx = spark.sqlContext
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    val circuit = source("T").aggregateRows(Seq("k"),
      Seq(count(lit(1)).as("cnt"), sum($"v").as("sv")), Seq("k", "cnt", "sv"))
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_runner_ckpt_").toString

    // phase 1: a streaming query drives the runner; every micro-batch is
    // one circuit step and the consolidated state lands in the durable
    // checkpoint tables — the deployment shape for a cluster.
    val r1 = new Runner(spark, circuit, Map("T" -> empty))
    val mem1 = MemoryStream[(String, Long, Long)]
    val q1 = mem1.toDF().toDF("k", "v", ZSet.W).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        r1.step(Map("T" -> batch))
        r1.checkpoint(ckpt)
      }.start()
    try {
      mem1.addData(("a", 5L, 1L), ("b", 7L, 1L)); q1.processAllAvailable()
      mem1.addData(("a", 5L, -1L), ("c", 9L, 2L)); q1.processAllAvailable()
    } finally q1.stop()
    val outPhase1 = canon(ZSet.toRows(ZSet.consolidate(r1.output)))

    // phase 2: simulated restart — a NEW runner restores from the
    // checkpoint and a NEW stream continues feeding deltas (a retraction
    // of pre-restart state among them).
    val r2 = new Runner(spark, circuit, Map("T" -> empty))
    r2.restore(ckpt)
    assert(canon(ZSet.toRows(ZSet.consolidate(r2.output))) === outPhase1,
      "restored output must equal pre-restart output")
    val mem2 = MemoryStream[(String, Long, Long)]
    val q2 = mem2.toDF().toDF("k", "v", ZSet.W).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        r2.step(Map("T" -> batch))
        r2.checkpoint(ckpt)
      }.start()
    try {
      mem2.addData(("b", 7L, -1L), ("d", 1L, 1L)); q2.processAllAvailable()
    } finally q2.stop()

    assert(canon(ZSet.toRows(ZSet.consolidate(r2.output))) ===
      canon(r2.recompute.drop(ZSet.W)), "post-restart incremental != recompute")
    val got = ZSet.toRows(ZSet.consolidate(r2.output)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // net state: c(9) with weight 2, d(1) with weight 1 — a and b fully retracted
    assert(got === Set(("c", 2L, 18L), ("d", 1L, 1L)))
  }

  test("foreachBatch deployment of a standing RECURSIVE view (closure) with restart") {
    import spark.implicits._
    import graft.streaming.Incremental._
    import graft.zset.ZSet
    implicit val sqlCtx = spark.sqlContext
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("src", "dst").as[(Long, Long)].collect().toSet
    val circuit = source("E").closure("src", "dst")
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_closure_ckpt_").toString

    val r1 = new Runner(spark, circuit, Map("E" -> empty))
    val mem1 = MemoryStream[(Long, Long, Long)]
    val q1 = mem1.toDF().toDF("src", "dst", ZSet.W).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        r1.step(Map("E" -> batch))
        r1.checkpoint(ckpt)
      }.start()
    try {
      mem1.addData((1L, 2L, 1L), (2L, 3L, 1L)); q1.processAllAvailable()
      mem1.addData((3L, 4L, 1L), (1L, 5L, 1L), (5L, 3L, 1L)); q1.processAllAvailable()
    } finally q1.stop()
    assert(pairs(ZSet.toRows(ZSet.consolidate(r1.output))) ===
      Set(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 3L, 2L -> 4L, 1L -> 4L,
        1L -> 5L, 5L -> 3L, 5L -> 4L))

    // restart: a new runner restores the closure trace and keeps
    // maintaining through a retraction micro-batch. Cutting 2→3 exercises
    // DRed AGAINST THE RESTORED STATE: (1,3) and (1,4) are over-deleted
    // but must be rederived through the alternate 1→5→3 path, proving the
    // kept/over-deleted split works from checkpoint tables, not only from
    // in-session traces.
    val r2 = new Runner(spark, circuit, Map("E" -> empty))
    r2.restore(ckpt)
    val mem2 = MemoryStream[(Long, Long, Long)]
    // Pin the distributed regime: this test asserts the DRed counters
    // (the small-regime driver kernel would otherwise absorb the step).
    // Set BEFORE start() — streaming clones the session conf at query start.
    spark.conf.set("graft.closure.localMaxBytes", "0")
    val q2 = mem2.toDF().toDF("src", "dst", ZSet.W).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        r2.step(Map("E" -> batch)); ()
      }.start()
    try {
      mem2.addData((2L, 3L, -1L)); q2.processAllAvailable()
    } finally {
      q2.stop()
      spark.conf.unset("graft.closure.localMaxBytes")
    }
    import graft.streaming.Incremental.ClosureInc
    assert(ClosureInc.lastOverDeleted === 4L) // (1,3),(1,4),(2,3),(2,4)
    assert(ClosureInc.lastRederived === 2L) // (1,3),(1,4) via 1→5→3
    assert(pairs(ZSet.toRows(ZSet.consolidate(r2.output))) ===
      Set(1L -> 2L, 3L -> 4L, 1L -> 5L, 5L -> 3L, 5L -> 4L,
        1L -> 3L, 1L -> 4L))
  }

  test("watermarked windowed aggregate finalizes windows in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(java.sql.Timestamp, String, Long)]
    val agg = graft.streaming.Streams.windowedAgg(
      mem.toDF().toDF("ts", "k", "v"), "ts", "k", "v", "1 hour",
      watermark = "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_agg").start()
    try {
      // window [00:00, 01:00) gets two rows for k=a, one for k=b
      mem.addData(
        (ts("2026-01-01 00:10:00"), "a", 1L),
        (ts("2026-01-01 00:20:00"), "a", 2L),
        (ts("2026-01-01 00:30:00"), "b", 5L))
      q.processAllAvailable()
      // nothing emitted yet: the watermark has not passed the window end
      assert(spark.table("win_agg").count() === 0)
      // advance event time far past 01:00 + 10min, then one more batch so
      // the post-batch watermark finalizes the first window
      mem.addData((ts("2026-01-01 03:00:00"), "a", 7L))
      q.processAllAvailable()
      mem.addData((ts("2026-01-01 03:30:00"), "b", 9L))
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .select(col("win_start").cast("string"), col("k"), col("n"), col("total"))
        .as[(String, String, Long, Long)].collect().toSet
      assert(got === Set(
        ("2026-01-01 00:00:00", "a", 2L, 3L),
        ("2026-01-01 00:00:00", "b", 1L, 5L)))
      // LATE row beyond the watermark is dropped, not re-aggregated
      mem.addData((ts("2026-01-01 00:40:00"), "a", 100L))
      q.processAllAvailable()
      assert(spark.table("win_agg").count() === 2)
    } finally q.stop()
  }

  test("two-state-store pipeline (dedup -> windowed agg) survives a REAL " +
    "process restart via checkpoint") {
    // q165's shape across an actual JVM death: graft.tools.RestartDrive
    // phase A feeds 2 batches and exits; phase B (a NEW process) appends
    // a batch that REPLAYS phase-A rows — only the RESTORED dedup store
    // can drop them — plus the watermark-advancing tail; phase C is the
    // uninterrupted oracle in one process. Post-restore output must equal
    // the uninterrupted run exactly (both state stores restored, windows
    // finalized once).
    import scala.sys.process._
    val work = java.nio.file.Files.createTempDirectory("restart").toString
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
      "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def drivePhase(phase: String): Unit = {
      val cmd = Seq("java", "-cp",
        "target/scala-2.13/classes:/opt/spark/jars/*") ++ opens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-Xmx2g", "graft.tools.RestartDrive", phase, work)
      val rc = Process(cmd).!(ProcessLogger(_ => (), _ => ()))
      assert(rc === 0, s"RestartDrive phase $phase exited $rc")
    }
    drivePhase("A") // run, then the process DIES
    drivePhase("B") // new process restores both stores from the checkpoint
    drivePhase("C") // uninterrupted oracle
    def sink(leg: String): Set[(String, String, Long, Long)] =
      spark.read.parquet(s"$work/out-$leg")
        .select(col("win_start").cast("string"), col("k"), col("n"),
          col("total"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    val restarted = sink("AB")
    val oracle = sink("C")
    assert(restarted === oracle,
      s"post-restore output diverged: $restarted vs $oracle")
    // the cross-restart duplicates were dropped by RESTORED state: the
    // first window's 'a' count is 2 (not 3) and 'b' is 1 (not 2)
    assert(restarted.contains(("2026-01-01 00:00:00", "a", 2L, 3L)))
    assert(restarted.contains(("2026-01-01 00:00:00", "b", 1L, 5L)))
  }

  test("mapGroupsWithState running totals advance per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val out = graft.streaming.Streams.runningTotals(mem.toDS())
    val q = out.toDF("k", "n", "total").writeStream.outputMode("update")
      .format("memory").queryName("run_tot").start()
    try {
      mem.addData(("a", 1L), ("a", 2L), ("b", 10L))
      q.processAllAvailable()
      mem.addData(("a", 4L))
      q.processAllAvailable()
      val got = spark.table("run_tot")
        .as[(String, Long, Long)].collect().toSeq
      // batch 1 snapshots, then a's advanced state in batch 2
      assert(got.toSet === Set(("a", 2L, 3L), ("b", 1L, 10L), ("a", 3L, 7L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions at the event-time gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val out = graft.streaming.Streams.sessionize(mem.toDS(), gapMs = 5000L)
    val q = out.toDF("k", "start_ms", "end_ms", "n").writeStream
      .outputMode("append").format("memory").queryName("sess").start()
    try {
      mem.addData(("a", ts(1000L)), ("a", ts(2000L)))
      q.processAllAvailable() // a's session open: [1000, 2000], n=2
      assert(spark.table("sess").count() === 0)
      mem.addData(("b", ts(100000L)))
      q.processAllAvailable() // post-batch watermark → 100000
      mem.addData(("b", ts(101000L)))
      q.processAllAvailable() // a's timeout (2000+5000 < wm) fires → emit
      val got = spark.table("sess").as[(String, Long, Long, Long)]
        .collect().toSet
      assert(got === Set(("a", 1000L, 2000L, 2L)))
    } finally q.stop()
  }

  test("transformWithState sessionization: exact gap extends, gap+1 closes, timer flushes quiet keys") {
    // Spark supports transformWithState only on the RocksDB state store —
    // forked session, like the q166 fixture
    val f = org.apache.spark.sql.GraftSqlBridge.cloneSession(spark)
    f.conf.set("spark.sql.shuffle.partitions", "2")
    f.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    implicit val sqlCtx = f.sqlContext
    import f.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val out = graft.streaming.Streams.sessionizeTws(mem.toDS(), gapMs = 5000L)
    val q = out.toDF("k", "start_ms", "end_ms", "n").writeStream
      .outputMode("append").format("memory").queryName("sesstws").start()
    try {
      // gap of EXACTLY gapMs extends (sessionize's inclusive boundary)
      mem.addData(("a", ts(1000L)), ("a", ts(6000L)))
      q.processAllAvailable()
      assert(f.table("sesstws").count() === 0)
      // gap of gapMs+1 closes in-batch and opens a new session
      mem.addData(("a", ts(11001L)))
      q.processAllAvailable()
      assert(f.table("sesstws").as[(String, Long, Long, Long)]
        .collect().toSet === Set(("a", 1000L, 6000L, 2L)))
      // advance the watermark far past a's open session: its TIMER (not
      // any new 'a' event) must flush the session
      mem.addData(("b", ts(100000L)))
      q.processAllAvailable()
      mem.addData(("b", ts(101000L)))
      q.processAllAvailable()
      assert(f.table("sesstws").as[(String, Long, Long, Long)]
        .collect().toSet ===
        Set(("a", 1000L, 6000L, 2L), ("a", 11001L, 11001L, 1L)))
    } finally q.stop()
  }

  test("stream-stream inner join on key (bilinear op, append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(String, Long)]
    val r = MemoryStream[(String, String)]
    val joined = l.toDF().toDF("k", "v")
      .join(r.toDF().toDF("k", "name"), "k")
    val q = joined.writeStream.format("memory").queryName("jn_out")
      .outputMode("append").start()
    try {
      l.addData(("a", 1L)); r.addData(("a", "alpha")); q.processAllAvailable()
      l.addData(("a", 2L), ("b", 9L)); r.addData(("b", "beta")); q.processAllAvailable()
      val got = spark.table("jn_out").as[(String, Long, String)].collect().toSet
      assert(got === Set(("a", 1L, "alpha"), ("a", 2L, "alpha"), ("b", 9L, "beta")))
    } finally q.stop()
  }
}
