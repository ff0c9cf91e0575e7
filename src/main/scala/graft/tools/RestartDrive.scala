package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Checkpoint-restart harness for the q165 pipeline shape — TWO state
  * stores in series (dropDuplicatesWithinWatermark → watermarked windowed
  * aggregate) driven across a REAL process restart. StreamingSpec spawns
  * this main three times in separate JVMs:
  *
  *   phase A  — feed batches 1-2, run the query to quiescence, exit
  *              (process death = the restart the reference's checkpoint/
  *              restore axis models);
  *   phase B  — feed batch 3 (which REPLAYS batch-1 duplicates — only
  *              restored dedup state can drop them — plus the
  *              watermark-advancing tail), resume the SAME query from the
  *              checkpoint, run to quiescence;
  *   phase C  — the uninterrupted oracle: same three batches, one
  *              process, fresh checkpoint.
  *
  * The spec asserts the phase-B sink equals the phase-C sink exactly.
  * Args: <phase A|B|C> <workdir>
  */
object RestartDrive {
  private val schemaDDL = "ts TIMESTAMP, k STRING, v BIGINT, t BIGINT"

  def main(args: Array[String]): Unit = {
    val Array(phase, work) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName(s"restart-$phase")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: two users in window [00:00,01:00), with in-batch dup
    val b1 = Seq(
      (ts("2026-01-01 00:10:00"), "a", 1L, 1L),
      (ts("2026-01-01 00:10:00"), "a", 1L, 1L), // in-batch duplicate
      (ts("2026-01-01 00:20:00"), "a", 2L, 2L),
      (ts("2026-01-01 00:30:00"), "b", 5L, 3L))
    // batch 2: window [01:00,02:00) rows; watermark still < 01:00+delay
    val b2 = Seq(
      (ts("2026-01-01 01:05:00"), "a", 3L, 4L),
      (ts("2026-01-01 01:15:00"), "b", 7L, 5L))
    // batch 3 (post-restart): REPLAYS two batch-1 rows — the restored
    // dedup store must drop them (a fresh store would pass them through
    // and corrupt the [00:00,01:00) window) — plus far-future rows that
    // push the watermark past both windows so they finalize
    val b3 = Seq(
      (ts("2026-01-01 00:10:00"), "a", 1L, 1L), // cross-restart duplicate
      (ts("2026-01-01 00:30:00"), "b", 5L, 3L), // cross-restart duplicate
      (ts("2026-01-01 01:45:00"), "b", 9L, 6L),
      (ts("2026-01-01 09:00:00"), "z", 0L, 7L),
      (ts("2026-01-01 09:30:00"), "z", 0L, 8L))

    val leg = if (phase == "C") "C" else "AB"
    val in = s"$work/in-$leg"
    val ck = s"$work/ck-$leg"
    val out = s"$work/out-$leg"
    def writeBatch(rows: Seq[(java.sql.Timestamp, String, Long, Long)]): Unit =
      rows.toDF("ts", "k", "v", "t").coalesce(1)
        .write.mode("append").parquet(in)

    phase match {
      case "A" =>
        writeBatch(b1); writeBatch(b2)
      case "B" =>
        // same input dir as A (the source tracks consumed files in the
        // checkpoint); only the new batch lands
        writeBatch(b3)
      case "C" =>
        writeBatch(b1); writeBatch(b2); writeBatch(b3)
    }
    // declared AFTER the batch writes so the source path exists
    val stream = spark.readStream.schema(schemaDDL).parquet(in)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("k", "v", "t")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .select(col("win.start").as("win_start"), col("k"), col("n"),
        col("total"))
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", ck)
      .format("parquet").option("path", out).start()
    q.processAllAvailable()
    q.stop()
    spark.stop()
  }
}
