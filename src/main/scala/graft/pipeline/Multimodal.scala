package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `BINARY` columns with typed metadata;
  * decode / feature-extraction runs batch-wise inside `mapPartitions` (the
  * Scala analogue of `mapInPandas` — one decoder instantiation per
  * partition, rows streamed through it), so the expensive native decoder
  * amortizes across a partition and executors never hold more than a batch
  * of frames in memory.
  *
  * The actual byte→pixels/samples decode is STUBBED (`decodeStub`): this
  * container has no image/audio codecs. Everything around it — schema,
  * batching, partition sizing, null/corrupt handling, feature schema — is
  * real and tested, and a production deployment swaps `decodeStub` for a
  * JNI/javacpp decoder without touching any plan shape.
  *
  * Scale notes: media rows are KB–MB sized, so the operative knob is bytes
  * per partition, not rows (`repartitionForMedia`); decode is per-row CPU
  * work with no shuffle; downstream joins against text tables broadcast
  * the (tiny) metadata side.
  */
object Multimodal {

  /** The canonical media schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("doc_id", LongType),
    StructField("modality", StringType),   // image | audio | video
    StructField("mime", StringType),
    StructField("content", BinaryType),    // opaque encoded bytes
    StructField("meta", MapType(StringType, StringType))))

  /** Feature row produced by decode/extract. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),     // image/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),  // audio/video
    StructField("feature", ArrayType(FloatType)), // pooled embedding
    StructField("decode_ok", BooleanType)))

  /** Build a synthetic media table from the documents corpus (the test
    * fixture has no binary column): payload = UTF-8 bytes, modality
    * assigned round-robin. Deterministic. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("modality"),
      lit("application/octet-stream").as("mime"),
      encode(col("text"), "UTF-8").cast(BinaryType).as("content"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))

  /** STUB decoder: a real implementation would hand `content` to an image/
    * audio codec here (this is the only line that changes in production).
    * The stub derives deterministic fake dimensions/features from the
    * bytes so plumbing and tests are end-to-end real. */
  private def decodeStub(modality: String, content: Array[Byte]):
      (Int, Int, Long, Array[Float], Boolean) = {
    if (content == null) (0, 0, 0L, Array.empty[Float], false)
    else {
      val n = content.length
      val h = java.util.Arrays.hashCode(content)
      val width = math.abs(h % 1920) + 1
      val height = math.abs((h / 1920) % 1080) + 1
      val durationMs = if (modality == "image") 0L else (n.toLong * 8)
      // fake pooled embedding: 8 bucketed byte-histogram values
      val hist = new Array[Float](8)
      var i = 0
      while (i < n) { hist((content(i) & 0xFF) / 32) += 1.0f; i += 1 }
      var j = 0
      while (j < 8) { hist(j) = hist(j) / math.max(n, 1); j += 1 }
      (width, height, durationMs, hist, true)
    }
  }

  /** Decode + feature-extract, batchwise per partition. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "modality", "content").rdd.mapPartitions { it =>
      // per-partition decoder init happens here (stubbed)
      it.map { r =>
        val id = r.getLong(0); val mod = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val (w, h, dur, feat, ok) = decodeStub(mod, bytes)
        Row(id, mod, if (bytes == null) 0L else bytes.length.toLong,
          w, h, dur, feat.toSeq, ok)
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

  /** Size partitions by payload bytes (not row count): target ~128 MB of
    * media per task so decode work is even and memory bounded. */
  def repartitionForMedia(media: DataFrame, targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    val totalBytes = media.agg(sum(length(col("content")))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    media.repartition(parts, col("media_id"))
  }

  /** Image resize, batchwise per partition: the decode→scale→re-encode
    * happens where a codec would run (STUB: deterministic byte transform
    * standing in for the scaler; the plan shape — per-partition batching,
    * target dims carried as columns, output schema — is the real one). */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("content", BinaryType)))
    val rows = media.filter(col("modality") === "image")
      .select("media_id", "content").rdd.mapPartitions { it =>
        // per-partition scaler init happens here (stubbed)
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val scaled = // STUB: real impl decodes, scales to width×height, re-encodes
            if (bytes == null) null
            else java.util.Arrays.copyOf(bytes, math.min(bytes.length, width * height))
          Row(r.getLong(0), width, height, scaled)
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** Video frame-sampling plan: one row per sampled frame offset — the
    * explode happens *before* decode so each task decodes only its frames. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("modality") === "video")
      .withColumn("duration_ms", (length(col("content")) * 8).cast(LongType)) // stub duration
      .withColumn("frame_ms", explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("doc_id"), col("frame_ms"), col("content"))
}
