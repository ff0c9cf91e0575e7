package graft

import graft.streaming.Incremental._
import graft.zset.ZSet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the step-shuffle-width sizing MECHANISM (timing-free): widths are
  * asserted, not wall times.
  *
  *  - first step: no CPU measurement yet → full session width (errs wide);
  *  - steady small deltas whose prior step was cheap → byte-sized narrow
  *    width (the q160-class win: kilobyte partitions stop paying 32
  *    scheduling floors per stage);
  *  - a prior step that measured COMPUTE-heavy → the next step keeps
  *    width via the derived CPU floor even though its bytes are tiny
  *    (the q151-class regression: a fixpoint serialized onto 8
  *    partitions ran 27.6 s vs 8.8 s at full width — previously guarded
  *    by a hardcoded operator whitelist, now by measurement, so the next
  *    compute-bound operator added is covered without declaring itself).
  */
class StepWidthSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("step-width")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def df(rows: Seq[(Int, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private val sql = "SELECT k, SUM(v) AS s FROM SWT GROUP BY k"

  private def mkRunner(): Runner = {
    df(Nil).createOrReplaceTempView("SWT")
    val circuit = graft.engine.SqlIncremental.compile(spark, sql, Set("SWT"))
    new Runner(spark, circuit, Map("SWT" -> df(Nil)))
  }

  test("first step runs at full session width; cheap steady steps narrow") {
    spark.conf.unset("spark.graft.incremental.stepCpuMsPerSlot")
    val r = mkRunner()
    r.step(Map("SWT" -> ZSet.fromRows(df(Seq((1, 2), (2, 3))))))
    assert(r.lastStepShuffleWidth === 16,
      "first step has no CPU history and must keep the session width")
    r.step(Map("SWT" -> ZSet.fromRows(df(Seq((1, 5))))))
    assert(r.lastStepShuffleWidth === 8,
      "a kilobyte delta after a cheap step must narrow to the byte-sized floor")
  }

  test("a compute-heavy prior step widens the next step despite tiny bytes") {
    // Per-slot CPU target of 1 ms: even this small circuit's measured task
    // CPU derives a floor ≥ the session width, simulating a fixpoint step
    // whose CPU dwarfs its shuffled bytes.
    spark.conf.set("spark.graft.incremental.stepCpuMsPerSlot", "1")
    try {
      val r = mkRunner()
      r.step(Map("SWT" -> ZSet.fromRows(df((1 to 2000).map(i => (i % 7, i))))))
      r.step(Map("SWT" -> ZSet.fromRows(df(Seq((1, 5))))))
      assert(r.lastStepShuffleWidth === 16,
        "a compute-bound prior step must keep the session width via the " +
          s"measured CPU floor (got ${r.lastStepShuffleWidth})")
    } finally spark.conf.unset("spark.graft.incremental.stepCpuMsPerSlot")
  }

  test("explicit stepShufflePartitions pin overrides the sizing") {
    spark.conf.set("spark.graft.incremental.stepShufflePartitions", "3")
    try {
      val r = mkRunner()
      r.step(Map("SWT" -> ZSet.fromRows(df(Seq((1, 2))))))
      assert(r.lastStepShuffleWidth === 3)
    } finally spark.conf.unset("spark.graft.incremental.stepShufflePartitions")
  }

  test("shuffle width restored (and stays unset if never set) after a step") {
    val prev = spark.conf.getOption("spark.sql.shuffle.partitions")
    val r = mkRunner()
    r.step(Map("SWT" -> ZSet.fromRows(df(Seq((1, 2))))))
    r.step(Map("SWT" -> ZSet.fromRows(df(Seq((2, 3))))))
    assert(spark.conf.getOption("spark.sql.shuffle.partitions") === prev,
      "stepAll must restore the exact prior shuffle-partitions setting")
  }
}
