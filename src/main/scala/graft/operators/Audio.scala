package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Audio-column feature extraction (round 14) — extends the §2f
  * multimodal story past images with a REAL codec, zero external
  * dependencies: WAV/RIFF PCM is a pure byte format (the interchange
  * format audio pipelines normalize to before featurization), so the
  * parser here is exact chunk-walking byte math, not a stub. Features
  * are the standard cheap audio descriptors (duration, peak, RMS
  * level, zero-crossing count — the VAD/energy-gate inputs a corpus
  * curation pass filters on) computed in one partition-parallel pass,
  * the [[Multimodal.decodeFeaturesOf]] batch shape.
  *
  * The gated entry (`mm_audio_features`) follows the warc/csv
  * roundtrip discipline: deterministic square-wave WAVs are RENDERED
  * from per-doc parameters, parsed back through the real codec, and
  * featurized — the oracle computes the same features in closed form
  * from the parameters (a ±a square wave has peak = RMS = a exactly;
  * crossings and duration are integer arithmetic), so the whole
  * render→parse→featurize chain is hash-gated.
  *
  * Compressed formats (MP3/Opus/AAC) have no JDK codec — they take
  * [[Multimodal.FakeDecoder]]'s byte path like any opaque payload;
  * the plumbing (schema, batching, partition parallelism) is
  * identical, only the decode call would swap.
  */
object Audio {

  final case class Wav(sampleRate: Int, channels: Int, bits: Int,
                       samples: Array[Short]) // channel-0 samples
  final case class AudioRow(doc_id: Long, payload: Array[Byte])
  final case class AudioFeatures(doc_id: Long, sample_rate: Int, channels: Int,
                                 bits: Int, n_samples: Long, duration_ms: Long,
                                 peak: Int, rms: Double, zero_crossings: Long)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** Render a mono 16-bit PCM WAV — our own independent writer (the
    * WarcSource.render discipline), so the parser is never tested
    * against its own output format assumptions alone. */
  def renderWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Chunk-walking RIFF parser: finds `fmt ` and `data` wherever they
    * sit (unknown chunks skipped with odd-size pad bytes, per spec),
    * fails LOUDLY on non-WAV/truncated/compressed input — the
    * FAILFAST contract of the sibling sources. Returns channel-0
    * samples (16-bit PCM; 8-bit is widened, unsigned-centered). */
  def parseWav(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      s"not a RIFF/WAVE payload (${bytes.length} bytes)")
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = le32(bytes, pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length,
        s"truncated WAV chunk '$id' at byte $pos (len $len of ${bytes.length})")
      if (id == "fmt ") {
        require(len >= 16, s"fmt chunk too short: $len")
        val audioFormat = le16(bytes, pos + 8)
        require(audioFormat == 1,
          s"only PCM WAV supported (audioFormat=$audioFormat — compressed " +
            "payloads take the opaque byte path)")
        fmt = Some((le16(bytes, pos + 10), le32(bytes, pos + 12), le16(bytes, pos + 22)))
      } else if (id == "data") data = Some((pos + 8, len))
      pos += 8 + len + (len & 1) // odd chunk sizes carry a pad byte
    }
    val (channels, rate, bits) = fmt.getOrElse(sys.error("WAV has no fmt chunk"))
    val (off, len) = data.getOrElse(sys.error("WAV has no data chunk"))
    require(channels >= 1 && (bits == 8 || bits == 16), s"channels=$channels bits=$bits")
    val bytesPerSample = bits / 8
    val frame = bytesPerSample * channels
    val n = len / frame
    val ch0 = new Array[Short](n)
    var i = 0
    while (i < n) {
      ch0(i) =
        if (bits == 16) le16(bytes, off + i * frame).toShort
        else (((bytes(off + i * frame) & 0xFF) - 128) << 8).toShort
      i += 1
    }
    Wav(rate, channels, bits, ch0)
  }

  /** One payload → features: exact integer peak/crossings, RMS as an
    * IEEE double (exact for square waves — the gate's closed form). */
  def featuresOf(docId: Long, payload: Array[Byte]): AudioFeatures = {
    val w = parseWav(payload)
    val n = w.samples.length
    var peak = 0
    var sumSq = 0.0
    var crossings = 0L
    var i = 0
    while (i < n) {
      val s = w.samples(i).toInt
      val a = math.abs(s)
      if (a > peak) peak = a
      sumSq += s.toDouble * s
      if (i > 0 && ((s < 0) != (w.samples(i - 1) < 0))) crossings += 1
      i += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
    AudioFeatures(docId, w.sampleRate, w.channels, w.bits, n.toLong,
      n.toLong * 1000L / w.sampleRate, peak,
      math.floor(rms * 10000 + 0.5) / 10000, crossings)
  }

  /** Partition-parallel featurize over any (doc_id, payload) frame —
    * the [[Multimodal.decodeFeaturesOf]] batch shape. */
  def audioFeaturesOf(frame: DataFrame): DataFrame = {
    val spark = frame.sparkSession
    import spark.implicits._
    frame.select(col("doc_id"), col("payload")).as[AudioRow]
      .mapPartitions(_.grouped(64).flatMap(_.map(r => featuresOf(r.doc_id, r.payload))))
      .toDF()
  }

  // ---- gated entry ------------------------------------------------------

  /** Square-wave synth parameters per doc — integer arithmetic shared
    * verbatim (in structure) with the oracle below. */
  private def synthParams(docId: Long, nChars: Long): (Int, Int, Int, Int) = {
    val rate = (docId % 3) match {
      case 0 => 8000; case 1 => 16000; case _ => 44100
    }
    val amp = (1000 + (docId % 100) * 250).toInt
    val half = (4 + docId % 16).toInt
    val n = (400 + nChars % 200).toInt
    (rate, amp, half, n)
  }

  /** Deterministic square wave: +amp for blocks of `half` samples,
    * then -amp, alternating. Peak = RMS = amp exactly; crossings =
    * (n-1) div half; duration_ms = n*1000 div rate. */
  private def squareWave(amp: Int, half: Int, n: Int): Array[Short] =
    Array.tabulate(n)(i => (if ((i / half) % 2 == 0) amp else -amp).toShort)

  /** Gated `mm_audio_features`: per document, render the parameterized
    * square-wave WAV, parse it back through the real codec, featurize
    * — against the closed-form oracle. */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
    val frame = docs.mapPartitions(_.map { case (id, nChars) =>
      val (rate, amp, half, n) = synthParams(id, nChars)
      AudioRow(id, renderWav(rate, squareWave(amp, half, n)))
    }).toDF()
    audioFeaturesOf(frame).orderBy(col("doc_id"))
  }

  val audioFeaturesOracle: String = """
    WITH p AS (
      SELECT doc_id,
        CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS rate,
        CAST(1000 + (doc_id % 100) * 250 AS INT) AS amp,
        4 + doc_id % 16 AS half,
        400 + n_chars % 200 AS n
      FROM documents)
    SELECT doc_id,
      CAST(rate AS INT) AS sample_rate,
      CAST(1 AS INT) AS channels,
      CAST(16 AS INT) AS bits,
      CAST(n AS BIGINT) AS n_samples,
      CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
      amp AS peak,
      CAST(amp AS DOUBLE) AS rms,
      CAST((n - 1) // half AS BIGINT) AS zero_crossings
    FROM p
    ORDER BY doc_id"""
}
