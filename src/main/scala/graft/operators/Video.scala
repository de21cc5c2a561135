package graft.operators

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Video-column feature extraction (round 14) — the temporal member
  * of the §2f multimodal family. Real containers with real JDK
  * support: animated GIF is the one multi-frame format `javax.imageio`
  * both reads AND writes with zero dependencies, so the whole
  * render→decode→featurize chain here is genuine frame-sequence code,
  * not a stub — `ImageReader.getNumImages`/`read(i)` walk actual
  * frames. MP4/WebM have no JDK codec and take the opaque byte path
  * ([[Multimodal.FakeDecoder]] / [[Multimodal.chunkSample]] for frame
  * sampling by byte stride); the Spark-side plumbing (schema, frame
  * explode shape, batching, partition parallelism) is exactly what a
  * production ffmpeg-backed decoder would plug into.
  *
  * Per-frame features are the image featurizer's (dimensions, mean
  * sample value); the TEMPORAL features (inter-frame delta — the
  * scene-cut / static-clip signal a video curation gate filters on)
  * compose declaratively on top via a lag window, so they stay inside
  * codegen and oracle-expressible.
  *
  * The gated entry follows the audio gate's discipline: deterministic
  * solid-gray frame sequences are rendered from per-doc parameters
  * (GIF's palette preserves a solid color exactly, so decoded means
  * are closed-form), written through the real GIF encoder, decoded
  * through the real reader, featurized — hash-gated end-to-end.
  */
object Video {

  final case class VideoRow(doc_id: Long, payload: Array[Byte])
  final case class FrameRow(doc_id: Long, frame_idx: Int, width: Int,
                            height: Int, mean_byte: Double)

  /** Render an animated GIF from frames — the real JDK encoder
    * (`writeToSequence`), our independent render side of the gate. */
  def renderAnimatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bo = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bo)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { img =>
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bo.toByteArray
  }

  /** One solid-color RGB frame. */
  def solidFrame(w: Int, h: Int, gray: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    img
  }

  /** Decode every frame of a multi-frame payload: true frame count via
    * `getNumImages(allowSearch = true)`, per-frame pixel features with
    * the image decoder's O(width) row-at-a-time reads. Fails loudly on
    * undecodable payloads (a video pipeline routes those to the byte
    * path explicitly rather than silently featurizing garbage). */
  def decodeFrames(docId: Long, payload: Array[Byte]): Seq[FrameRow] = {
    val ios = Multimodal.ImageDecoder.memStream(payload)
    val readers = javax.imageio.ImageIO.getImageReaders(ios)
    require(readers.hasNext, s"doc $docId: no JDK reader for payload")
    val reader = readers.next()
    try {
      reader.setInput(ios)
      val n = reader.getNumImages(true)
      (0 until n).map { i =>
        val img = reader.read(i)
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        val mean = if (w * h == 0) 0.0 else sum.toDouble / (3L * w * h)
        FrameRow(docId, i, w, h, math.floor(mean * 10000 + 0.5) / 10000)
      }
    } finally reader.dispose()
  }

  /** Partition-parallel frame featurization over any (doc_id, payload)
    * frame, plus the temporal delta (|mean − lag(mean)| per doc in
    * frame order — the scene-cut signal) composed declaratively. */
  def frameFeaturesOf(frame: DataFrame): DataFrame = {
    val spark = frame.sparkSession
    import spark.implicits._
    val frames = frame.select(col("doc_id"), col("payload")).as[VideoRow]
      .mapPartitions(_.grouped(16).flatMap(_.flatMap(r => decodeFrames(r.doc_id, r.payload))))
      .toDF()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames.withColumn("delta_prev",
      round(abs(col("mean_byte") - lag(col("mean_byte"), 1).over(w)), 4))
  }

  // ---- gated entry ------------------------------------------------------

  /** Per-doc synth parameters (shared in structure with the oracle):
    * 2-5 frames, small frames, per-frame gray from doc_id and index. */
  private[graft] def grayOf(docId: Long, k: Int): Int =
    ((docId * 37 + k * 71) % 240).toInt + 8

  /** Gated `mm_video_frames`: render each doc's solid-gray animated
    * GIF through the real encoder, decode through the real reader,
    * featurize + temporal delta — closed-form oracle. */
  def videoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val payloads = docs.mapPartitions(_.map { id =>
      val w = (8 + id % 8).toInt
      val n = (2 + id % 4).toInt
      VideoRow(id, renderAnimatedGif(
        (0 until n).map(k => solidFrame(w, 8, grayOf(id, k)))))
    }).toDF()
    frameFeaturesOf(payloads)
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("mean_byte"), col("delta_prev"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val videoFramesOracle: String = """
    WITH f AS (
      SELECT doc_id, CAST(k AS INT) AS frame_idx,
        CAST(8 + doc_id % 8 AS INT) AS width, CAST(8 AS INT) AS height,
        CAST((doc_id * 37 + k * 71) % 240 + 8 AS DOUBLE) AS mean_byte
      FROM (SELECT doc_id, unnest(range(2 + doc_id % 4)) AS k FROM documents))
    SELECT doc_id, frame_idx, width, height, mean_byte,
      round(abs(mean_byte - lag(mean_byte) OVER
        (PARTITION BY doc_id ORDER BY frame_idx)), 4) AS delta_prev
    FROM f
    ORDER BY doc_id, frame_idx"""
}
