package graft

import graft.pipeline._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Value-level tests for the LLM-pipeline operators that have no SQL
  * oracle: MinHash/SimHash near-dup (planted duplicates must be found,
  * unrelated docs must not pair), ANN recall vs brute force, multimodal
  * plumbing, text analysis. */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("pipeline")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()
  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches the " +
    "birds in the garden and the sun shines over the quiet green valley today"

  test("exact dedup groups byte-identical docs and keeps min id") {
    val docs = docsDf((1L, base), (2L, base), (3L, "something else entirely"),
      (4L, base))
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length === 2)
    val big = groups.find(_.getAs[Long]("n_copies") == 3L).get
    assert(big.getAs[Long]("keep_id") === 1L)
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L))
  }

  test("minhash LSH finds planted near-duplicates, not unrelated docs") {
    val nearDup = base.replace("lazy", "sleepy") // one word changed
    val unrelated = "completely different content about database engines " +
      "and distributed query processing with columnar storage formats here"
    val docs = docsDf((1L, base), (2L, nearDup), (3L, unrelated),
      (4L, base + " extra tail words appended"))
    val pairs = Dedup.nearDuplicates(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash jaccard estimates are in [0,1] and exact for identity") {
    val docs = docsDf((1L, base), (2L, base))
    val pairs = Dedup.nearDuplicates(docs, threshold = 0.5).collect()
    assert(pairs.length === 1 && pairs(0).getAs[Double]("jaccard") === 1.0)
  }

  test("simhash: hamming 0 for identical, small for near-dup, large for unrelated") {
    val nearDup = base.replace("lazy", "sleepy")
    val unrelated = "totally disjoint vocabulary concerning astrophysics " +
      "spectroscopy telescopes galaxies quasars and cosmic background radiation"
    val df = docsDf((1L, base), (2L, base), (3L, nearDup), (4L, unrelated))
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sim"))
    val sims = df.as[(Long, Long)].collect().toMap
    assert(sims(1L) === sims(2L))
    val dNear = java.lang.Long.bitCount(sims(1L) ^ sims(3L))
    val dFar = java.lang.Long.bitCount(sims(1L) ^ sims(4L))
    assert(dNear < dFar)
    assert(dNear <= 7)
    val pairs = Dedup.simhashNearDuplicates(docsDf((1L, base), (2L, nearDup),
      (3L, unrelated)), maxHamming = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash bucket cap bounds a degenerate all-identical corpus") {
    // 10k identical signatures land in ONE bucket of every chunk table:
    // uncapped, the self-join would enumerate ~50M pairs × 8 chunks; the
    // cap drops those buckets so the job completes with zero pairs (exact
    // dedup is the operator for byte-identical docs).
    val degenerate = (0 until 10000).map(i => (i.toLong, 0x5A5A5A5A5A5AL))
      .toDF("doc_id", "sim")
    assert(Dedup.simhashPairsFromSignatures(degenerate, maxBucket = 100)
      .count() === 0L)
    // the cap must not eat legitimate small buckets: a planted near-pair
    // (hamming 2) still surfaces among scattered signatures
    val scattered = (0 until 200).map(i =>
      (i.toLong, i.toLong * 0x9E3779B97F4A7C15L)) :+ (900L, 0x5A5AL) :+ (901L, 0x5A59L)
    val pairs = Dedup.simhashPairsFromSignatures(
      scattered.toDF("doc_id", "sim"), maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((900L, 901L)))
  }

  test("simhash 4×16-bit banding: hamming ≤ 3 pairs found, key space wide") {
    // 0x5A5A vs 0x5A59: bits differ only in the low 16-bit field — the
    // other three fields agree, so the pair must bucket together; an
    // unrelated signature shares no field.
    val sigs = Seq((1L, 0x123456789ABCL), (2L, 0x123456789ABCL ^ 0x7L),
      (3L, -1L)).toDF("doc_id", "sim")
    val pairs = Dedup.simhashPairsHamming3(sigs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    // all-identical degenerate corpus is likewise capped
    val degenerate = (0 until 10000).map(i => (i.toLong, 42L)).toDF("doc_id", "sim")
    assert(Dedup.simhashPairsHamming3(degenerate, maxBucket = 100).count() === 0L)
  }

  private def syntheticVectors(n: Int, dim: Int): DataFrame = {
    // deterministic pseudo-random unit-ish vectors in a few clusters
    val rows = (0 until n).map { i =>
      val cluster = i % 5
      val v = (0 until dim).map { d =>
        val h = ((i.toLong * 31 + d) * 2654435761L + cluster * 97) & 0xFFFF
        (h.toFloat / 65535f - 0.5f) + (if (d % 5 == cluster) 2.0f else 0.0f)
      }.toArray
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("brute-force cosine top-k: self is always rank 1 with cos ≈ 1") {
    val corpus = syntheticVectors(50, 16)
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = Similarity.bruteForceTopK(corpus, queries, 3)
    val r1 = top.filter(col("rank") === 1).select("q_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect()
    assert(r1.length === 5)
    r1.foreach { case (q, v, c) => assert(q === v && math.abs(c - 1.0) < 1e-12) }
  }

  test("LSH ANN recall@5 ≥ 0.6 vs brute force on clustered vectors") {
    val corpus = syntheticVectors(200, 16)
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(corpus, queries, 5, nBits = 12)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall was $recall")
  }

  test("IVF ANN recall@5 ≥ 0.6 vs brute force; self always retrieved") {
    val corpus = syntheticVectors(200, 16)
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(corpus, queries, 5, nCentroids = 8, nProbe = 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall was $recall")
    // a query's own vector shares its bucket by construction
    (0L until 10L).foreach(q => assert(approx.contains((q, q)), s"query $q lost itself"))
  }

  test("cosine near-duplicate pairs via LSH find planted duplicates") {
    val corpus = syntheticVectors(40, 16)
    val dup = corpus.filter(col("vec_id") === 0)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val pairs = Similarity.cosineNearDuplicates(corpus.unionAll(dup), 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1000L)))
  }

  test("cosine near-dup bucket cap bounds a degenerate all-identical corpus") {
    // 5000 identical vectors hash to ONE signature bucket: uncapped, the
    // self-join would build ~12.5M pairs; the cap drops the bucket so the
    // result is empty and the job completes in bounded time.
    val v = (0 until 16).map(_.toFloat + 1f).toArray
    val degenerate = (0 until 5000).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDuplicates(degenerate, 0.9, maxBucket = 100)
    assert(pairs.count() === 0L)
    // the cap must not eat legitimate small buckets: planted dup still found
    val corpus = syntheticVectors(40, 16)
    val dup = corpus.filter(col("vec_id") === 0)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val found = Similarity.cosineNearDuplicates(corpus.unionAll(dup), 0.999, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.contains((0L, 1000L)))
  }

  test("text analysis: token counts, language id, quality") {
    val df = Seq(
      (1L, "the cat and the dog sat in the garden to watch the birds"),
      (2L, "der hund und die katze sind nicht in das haus und der garten"),
      (3L, ""),
      (4L, "x")).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("n"),
        TextAnalysis.languageId(col("text")).as("lang"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2), r.getDouble(3))).toMap
    assert(rows(1L)._1 === 13L && rows(1L)._2 === "en")
    assert(rows(2L)._2 === "de")
    assert(rows(3L)._1 === 0L && rows(3L)._2 === "und")
    assert(rows(1L)._3 > rows(4L)._3) // real sentence beats single char
    // fingerprint stable under whitespace normalization
    val fp2 = Seq((9L, "  the   cat and the dog sat in the garden to watch the birds "))
      .toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint(col("text"))).collect()(0).getLong(0)
    assert(df.filter(col("doc_id") === 1).select("fp").collect()(0).getLong(0) === fp2)
  }

  // real in-JVM fixtures: a PNG via ImageIO and a PCM WAV via javax.sound
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / w) << 16) | (y * 255 / math.max(h, 1)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(ms: Int, hz: Double = 440.0): Array[Byte] = {
    val rate = 8000f
    val n = (rate * ms / 1000).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * hz * i / rate) * 16000).toInt
      pcm(2 * i) = (s & 0xFF).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("multimodal: real PNG/WAV decode, corrupt handling, resize, frame sampling") {
    val rows = Seq(
      Row(1L, 1L, "image", "image/png", pngBytes(20, 10), Map("k" -> "v")),
      Row(2L, 2L, "audio", "audio/wav", wavBytes(250), Map("k" -> "v")),
      Row(3L, 3L, "video", "video/mp4", Array.fill[Byte](64)(7), Map("k" -> "v")),
      Row(4L, 4L, "image", "image/png", "not an image".getBytes, Map("k" -> "v")))
    val media = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
      Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    // image: true dimensions through ImageIO, normalized luminance histogram
    assert(feats(1L).getAs[Boolean]("decode_ok"))
    assert(feats(1L).getAs[Int]("width") === 20 && feats(1L).getAs[Int]("height") === 10)
    val hsum = feats(1L).getAs[Seq[Float]]("feature").map(_.toDouble).sum
    assert(math.abs(hsum - 1.0) < 1e-5)
    // audio: true duration through javax.sound (8 kHz PCM, 250 ms)
    assert(feats(2L).getAs[Boolean]("decode_ok"))
    assert(math.abs(feats(2L).getAs[Long]("duration_ms") - 250L) <= 1L)
    assert(feats(2L).getAs[Seq[Float]]("feature").exists(_ > 0.1f)) // audible RMS
    // video: fenced stub still produces deterministic features
    assert(feats(3L).getAs[Boolean]("decode_ok"))
    // corrupt image: decode_ok=false instead of task failure
    assert(!feats(4L).getAs[Boolean]("decode_ok"))
    // resize: real Java2D scale — output PNG decodes to the target size
    val resized = Multimodal.resize(media, 64, 48).collect()
      .map(r => r.getLong(0) -> r).toMap
    val scaled = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(1L).getAs[Array[Byte]]("content")))
    assert(scaled.getWidth === 64 && scaled.getHeight === 48)
    assert(resized(4L).getAs[Array[Byte]]("content") === null) // corrupt → NULL
    // frame sampling explodes video rows only
    val frames = Multimodal.sampleFrames(media, everyMs = 50L)
    assert(frames.select("media_id").distinct().count() === 1L)
  }

  /** An animated GIF built with the JDK's own GIF writer: `n` frames of
    * `w`×`h`, each a different solid shade. */
  private def gifBytes(w: Int, h: Int, n: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (i <- 0 until n) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(40 * i + 20, 40 * i + 20, 40 * i + 20))
      g.fillRect(0, 0, w, h)
      g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close()
    bos.toByteArray
  }

  test("multimodal: animated-GIF video decodes for REAL — dims, duration, sampled frames") {
    val rows = Seq(
      Row(10L, 10L, "video", "image/gif", gifBytes(16, 12, 4), Map.empty[String, String]),
      Row(11L, 11L, "video", "video/mp4", Array.fill[Byte](64)(7), Map.empty[String, String]))
    val media = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
      Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    // GIF: true frame dimensions + 100 ms/frame duration through ImageIO
    assert(feats(10L).getAs[Boolean]("decode_ok"))
    assert(feats(10L).getAs[Int]("width") === 16)
    assert(feats(10L).getAs[Int]("height") === 12)
    assert(feats(10L).getAs[Long]("duration_ms") === 400L)
    // non-GIF video still routes through the fence
    assert(feats(11L).getAs[Boolean]("decode_ok"))
    // sampleFrames uses the REAL duration: 4 frames at 100 ms each
    val sampled = Multimodal.sampleFrames(media, everyMs = 100L)
      .filter(col("media_id") === 10L)
    assert(sampled.count() === 4L)
    // decodeFrames returns true dimensions for every sampled GIF frame
    val decoded = Multimodal.decodeFrames(sampled).collect()
    assert(decoded.length === 4)
    assert(decoded.forall(_.getAs[Boolean]("decode_ok")))
    assert(decoded.forall(r => r.getAs[Int]("width") === 16 &&
      r.getAs[Int]("height") === 12))
  }

  test("multimodal: synthetic media schema plumbing stays intact") {
    val docs = Seq((1L, "hello world", "en", "srcA", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.syntheticMedia(docs)
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "doc_id", "modality", "mime", "content", "meta"))
    // text bytes are NOT a valid image/audio payload: the real codecs must
    // reject them, not fabricate dimensions
    val feats = Multimodal.extractFeatures(media).collect()
    feats.filter(r => Set("image", "audio")(r.getString(1)))
      .foreach(r => assert(!r.getAs[Boolean]("decode_ok")))
  }
}
