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

  // ---- clip-level near-dup (round 19, the r18 verdict's #3) -------------
  // The audio sibling of the video clip dedup: a 64-bit ROBUST
  // signature from the zero-crossing structure — 16 equal time windows,
  // per-window crossing count, GRAY-CODED to a nibble (adjacent counts
  // differ by ONE bit, so mild tempo/length jitter costs Hamming 1 per
  // touched window instead of up to 4) — then the shared 4-block
  // pigeonhole pair machinery ([[Multimodal.blockPairsOf]]). ZCR is
  // amplitude-INVARIANT by construction: a volume-changed re-encode of
  // a clip has the identical signature (the crafted seed pair), where
  // an RMS-based signature would miss exactly that transform. Counts
  // come from the REAL parsed samples (the codec path); the gated
  // corpus renders parameterized square waves whose per-window
  // crossing counts have a closed form the oracle mirrors.

  /** Gray-coded per-window ZCR nibbles of a sample array: window w of
    * 16 counts crossings STRICTLY INSIDE itself (indices i ∈
    * (w·n/16, (w+1)·n/16) — the window-boundary crossing belongs to
    * neither window, which keeps the count independent of the previous
    * window's final sign and therefore closed-form per window). */
  private[graft] def zcrSignature(samples: Array[Short]): Array[Int] = {
    val n = samples.length
    val nib = new Array[Int](16)
    var w = 0
    while (w < 16) {
      val lo = (w.toLong * n / 16).toInt
      val hi = ((w + 1).toLong * n / 16).toInt
      var c = 0
      var i = lo + 1
      while (i < hi) {
        if ((samples(i) < 0) != (samples(i - 1) < 0)) c += 1
        i += 1
      }
      nib(w) = (c ^ (c >> 1)) & 15
      w += 1
    }
    nib
  }

  /** (doc_id, b0..b3): the ZCR signature of every WAV payload as four
    * 16-bit blocks (4 nibbles each) — the dHash block layout, so the
    * pigeonhole candidate machinery is shared verbatim. */
  def audioSigOf(frame: DataFrame): DataFrame = {
    val spark = frame.sparkSession
    import spark.implicits._
    frame.select(col("doc_id"), col("payload")).as[AudioRow]
      .mapPartitions(_.grouped(64).flatMap(_.map { r =>
        val nib = zcrSignature(parseWav(r.payload).samples)
        def blk(j: Int) =
          nib(4 * j) | (nib(4 * j + 1) << 4) | (nib(4 * j + 2) << 8) | (nib(4 * j + 3) << 12)
        (r.doc_id, blk(0), blk(1), blk(2), blk(3))
      }))
      .toDF("doc_id", "b0", "b1", "b2", "b3")
  }

  /** Per-window half-period of a clip: seeds carry a FIXED period
    * (constant tone); corpus clips are frequency-MODULATED — each
    * window's period is md5-derived from (doc_id, window), so organic
    * signatures are pseudorandom 16-nibble vectors and distinct clips
    * essentially never collide (a single uniform tone per doc made
    * every similar-frequency doc a "near-dup": 580 k pairs at sf0.1,
    * measured — an artifact of a too-narrow synthetic frequency space,
    * not of the operator). */
  private[graft] def winHalf(pat: Long, w: Int, fix: Int): Int =
    if (fix > 0) fix
    else {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"aud:$pat:$w".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      4 + (d(0) & 0xFF) % 12
    }

  /** Segment-modulated square wave: each of the 16 windows restarts at
    * +amp and flips every `halves(w)` samples — so the in-window
    * crossing count is exactly (len_w − 1) div half_w, the closed form
    * the oracle mirrors. Window boundaries are the SAME
    * ⌊w·n/16⌋ grid [[zcrSignature]] reads (not ⌊i·16/n⌋ — the two
    * partitions disagree when 16∤n, and a sample rendered under the
    * previous window's phase let window w's first strictly-inside
    * comparison see a crossing the closed form can't predict; caught
    * by simulation at ≥sf1 doc counts, invisible at sf0.01/sf0.1
    * where both engines emitted zero organic pairs). */
  private[graft] def segWave(amp: Int, n: Int, halves: Array[Int]): Array[Short] = {
    val lo = Array.tabulate(17)(w => (w.toLong * n / 16).toInt)
    val out = new Array[Short](n)
    var w = 0
    while (w < 16) {
      var i = lo(w)
      while (i < lo(w + 1)) {
        val r = i - lo(w)
        out(i) = (if ((r / halves(w)) % 2 == 0) amp else -amp).toShort
        i += 1
      }
      w += 1
    }
    out
  }

  /** Seed clips (doc_id, amp, fixed half, n): -2 is -3 at DOUBLE the
    * volume (must pair at Hamming 0 — ZCR ignores amplitude); -1 is a
    * different tone (must not pair). */
  private[graft] val AudioSigSeeds: Seq[(Long, Int, Int, Int)] = Seq(
    (-3L, 2000, 6, 480),
    (-2L, 4000, 6, 480),
    (-1L, 2000, 11, 480))

  /** Gated `mm_audio_sig_dedup`: near-dup audio pairs over the
    * frequency-modulated corpus + the seed trio, through the real WAV
    * writer and parser. */
  def audioSigDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val corpus = docs.mapPartitions(_.map { id =>
      val amp = (1000 + (id % 89) * 100).toInt
      val n = (400 + id % 391).toInt
      AudioRow(id, renderWav(8000,
        segWave(amp, n, Array.tabulate(16)(w => winHalf(id, w, 0)))))
    })
    val seeds = AudioSigSeeds.map { case (id, amp, half, n) =>
      AudioRow(id, renderWav(8000,
        segWave(amp, n, Array.fill(16)(half))))
    }
    audioSigDedupOf(corpus.union(seeds.toDS()).toDF())
  }

  /** Near-dup pairs (da, db, hamming ≤ 3) over any (doc_id, payload)
    * WAV frame — the composable serve form. */
  def audioSigDedupOf(frame: DataFrame): DataFrame =
    Multimodal.blockPairsOf(audioSigOf(frame).cache(),
        logDropsAs = Some("mm_audio_sig_dedup"))
      .orderBy(col("da"), col("db"))

  // ---- trim-robust audio matching (round 19) ----------------------------
  // [[audioSigDedup]]'s 16 windows are RELATIVE fractions of the clip —
  // right for whole-clip volume/re-encode invariance, structurally
  // blind to TRIMMING (cut 10% off the front and every window boundary
  // moves). The trim matcher uses ABSOLUTE-time windows: fixed
  // 64-sample hops, one gray-coded ZCR nibble token per hop, winnowed
  // exactly like the video frame sequence (k=2, w=2) — a clip trimmed
  // by a multiple of the hop shares its whole token suffix and pairs
  // at any offset via the fingerprint equi-join. Sub-hop trims break
  // alignment (the standard hop-quantization caveat of every
  // frame-hash audio fingerprint; production systems overlap hops).

  private[graft] val HopSamples = 64
  private val AwK = 2
  private val AwW = 2

  /** Gray-coded ZCR nibble per FIXED 64-sample hop (strictly-inside
    * counting, the [[zcrSignature]] convention); the tail remainder
    * shorter than a hop is dropped. */
  private[graft] def zcrHopTokens(samples: Array[Short]): Seq[String] = {
    val nw = samples.length / HopSamples
    (0 until nw).map { w =>
      val lo = w * HopSamples
      val hi = lo + HopSamples
      var c = 0
      var i = lo + 1
      while (i < hi) {
        if ((samples(i) < 0) != (samples(i - 1) < 0)) c += 1
        i += 1
      }
      ((c ^ (c >> 1)) & 15).toString
    }
  }

  /** Offset-robust candidate pairs (da, db, n_shared) over any
    * (doc_id, payload) WAV corpus. */
  def audioWinnowPairsOf(frame: DataFrame,
                         maxDf: Option[Long] = Some(Multimodal.DefaultMaxBlockDf)): DataFrame = {
    val spark = frame.sparkSession
    import spark.implicits._
    val seqs = frame.select(col("doc_id"), col("payload")).as[AudioRow]
      .mapPartitions(_.grouped(64).flatMap(_.map { r =>
        (r.doc_id, zcrHopTokens(parseWav(r.payload).samples))
      }))
      .toDF("doc_id", "t")
      .filter(size(col("t")) >= AwK + AwW - 1)
    val fpd = seqs.select(col("doc_id"),
        explode(graft.functions.WinnowFps.of(col("t"), AwK, AwW)).as("f"))
      .select(col("doc_id"), col("f.fp").as("fp")).distinct()
      .cache() // both join sides
    // hot-fingerprint cap (the shared mm candidate-key discipline) —
    // doubly important here given the documented ~3-bit per-hop entropy
    val fps = maxDf.fold(fpd)(m => Skew.capByFrequency(fpd, "fp", "doc_id",
      m, Some("audio_winnow"), distinctPairs = true))
    fps.select(col("doc_id").as("da"), col("fp"))
      .join(fps.select(col("doc_id").as("db"), col("fp")), Seq("fp"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .orderBy(col("da"), col("db"))
  }

  /** One hop-aligned segment wave: `nseg` segments of exactly
    * [[HopSamples]] samples, segment s restarting at +amp and flipping
    * every `halves(s)` — window w IS segment w, so the in-hop crossing
    * count is (HopSamples−1) div half_w, the oracle's closed form. */
  private[graft] def hopWave(amp: Int, halves: Array[Int]): Array[Short] =
    Array.tabulate(halves.length * HopSamples) { i =>
      val s = i / HopSamples
      val r = i % HopSamples
      (if ((r / halves(s)) % 2 == 0) amp else -amp).toShort
    }

  // SPEC-ONLY by design (the ORC-source precedent): a per-hop ZCR
  // nibble carries ~3 bits, so k=2 winnow grams over a synthetic
  // square-wave corpus have ≤64 distinct values and the fingerprint
  // join degenerates toward all-pairs as the corpus grows — a gated
  // entry over this testdata would be weak-by-construction (the video
  // matcher's tokens are 64-bit frame hashes; no such problem). Real
  // audio fingerprints raise per-hop entropy with multi-band features
  // (Haitsma-Kalker) — which is exactly what [[hkTokens]] below adds
  // (round 20): this ZCR-only matcher stays as the documented low-
  // entropy baseline, spec-proven on crafted clips through the real
  // codec; the HK matcher is the gateable production form.

  // ---- multi-band audio fingerprint (round 20, the r19 verdict's #4:
  // Haitsma–Kalker 2002 "A Highly Robust Audio Fingerprint System",
  // adapted to the opaque-payload corpus) ---------------------------------
  // HK derives one bit per (frame, band) from the SIGN of the energy
  // delta across band and time: F(n,m) = [E(n,m) − E(n,m+1) −
  // (E(n−1,m) − E(n−1,m+1)) > 0] — gain-invariant (a volume change
  // scales every E by c², signs survive) and robust because only signs
  // ship. The spectral filterbank needs an FFT the synthetic corpus
  // can't closed-form through an oracle, so the bands here are the
  // TIME-SLICED energy profile of the hop: 8 sub-blocks of 8 samples,
  // E(n,m) = Σ x² — for the amplitude-modulated square waves the
  // corpus renders ([[hkWave]]), E is EXACTLY 8·amp², an integer both
  // engines compute in closed form. 7 HK bits + the gray ZCR nibble
  // ≈ 11 bits per hop (vs the ~3 that kept the ZCR matcher spec-only),
  // so winnow grams stop colliding and the trim matcher can gate.

  private[graft] val HkBands = 8
  private val HkSub = HopSamples / HkBands // 8 samples per band

  /** One token per hop n ≥ 1 (HK frames need a predecessor):
    * `(hkBits << 4) | grayZcrNibble` as a decimal string. Energies are
    * exact Long sums of squared samples from the REAL parsed PCM. */
  private[graft] def hkTokens(samples: Array[Short]): Seq[String] = {
    val nHops = samples.length / HopSamples
    val e = Array.ofDim[Long](nHops, HkBands)
    var n = 0
    while (n < nHops) {
      var m = 0
      while (m < HkBands) {
        var s = 0L
        var i = n * HopSamples + m * HkSub
        val hi = i + HkSub
        while (i < hi) { s += samples(i).toLong * samples(i); i += 1 }
        e(n)(m) = s
        m += 1
      }
      n += 1
    }
    (1 until nHops).map { h =>
      var bits = 0
      var m = 0
      while (m < HkBands - 1) {
        if ((e(h)(m) - e(h)(m + 1)) - (e(h - 1)(m) - e(h - 1)(m + 1)) > 0)
          bits |= 1 << m
        m += 1
      }
      val lo = h * HopSamples
      var c = 0
      var i = lo + 1
      while (i < lo + HopSamples) {
        if ((samples(i) < 0) != (samples(i - 1) < 0)) c += 1
        i += 1
      }
      ((bits << 4) | ((c ^ (c >> 1)) & 15)).toString
    }
  }

  /** k = 3 token grams (not the ZCR matcher's 2): the realized ~9-bit
    * per-token entropy makes 2-grams collide quadratically at corpus
    * scale (measured: 41 chance pairs at 500 docs, 3 804 at 5 000 —
    * the r19 degenerate-corpus curve), while cubing the gram space
    * plus [[HkMinShared]] kills the noise without touching true pairs
    * (a real trim overlap shares a RUN of fingerprints). */
  private[graft] val HkK = 3

  /** A pair must share ≥ 2 winnow fingerprints: one shared fp happens
    * by md5 chance between unrelated clips; a genuine overlap of ≥
    * k+w hops shares several. */
  private[graft] val HkMinShared = 2L

  /** Trim-robust near-dup pairs over the HK hop tokens — the
    * [[audioWinnowPairsOf]] machinery with the multi-band tokens. */
  def audioHkPairsOf(frame: DataFrame,
                     maxDf: Option[Long] = Some(Multimodal.DefaultMaxBlockDf)): DataFrame = {
    val spark = frame.sparkSession
    import spark.implicits._
    val seqs = frame.select(col("doc_id"), col("payload")).as[AudioRow]
      .mapPartitions(_.grouped(64).flatMap(_.map { r =>
        (r.doc_id, hkTokens(parseWav(r.payload).samples))
      }))
      .toDF("doc_id", "t")
      .filter(size(col("t")) >= HkK + AwW - 1)
    val fpd = seqs.select(col("doc_id"),
        explode(graft.functions.WinnowFps.of(col("t"), HkK, AwW)).as("f"))
      .select(col("doc_id"), col("f.fp").as("fp")).distinct()
      .cache() // both join sides
    val fps = maxDf.fold(fpd)(m => Skew.capByFrequency(fpd, "fp", "doc_id",
      m, Some("mm_audio_hk_dedup"), distinctPairs = true))
    fps.select(col("doc_id").as("da"), col("fp"))
      .join(fps.select(col("doc_id").as("db"), col("fp")), Seq("fp"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= HkMinShared)
      .orderBy(col("da"), col("db"))
  }

  /** Amplitude-modulated hop-aligned square wave: hop s restarts at
    * +amps(s)(0), flips sign every halves(s) samples, and band m of
    * the hop carries amplitude amps(s)(m) — so E(s,m) = 8·amps(s)(m)²
    * exactly (HkSub | halves is NOT required: sign and amplitude are
    * independent dimensions of each sample). */
  private[graft] def hkWave(amps: Array[Array[Int]], halves: Array[Int]): Array[Short] =
    Array.tabulate(amps.length * HopSamples) { i =>
      val s = i / HopSamples
      val r = i % HopSamples
      val a = amps(s)(r / HkSub)
      (if ((r / halves(s)) % 2 == 0) a else -a).toShort
    }

  private[graft] def hkAmp(pat: Long, hop: Int, m: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hka:$pat:$hop:$m".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    500 + (d(0) & 0xFF) * 25
  }

  private[graft] def hkHalf(pat: Long, hop: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hkh:$pat:$hop".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    4 + (d(0) & 0xFF) % 12
  }

  /** HK seed clips (doc_id, pattern, first hop, hops, volume): −2 is
    * −3 TRIMMED by two hops at DOUBLE the volume — it must pair (the
    * token stream is a suffix shift and HK signs are gain-invariant),
    * which [[audioSigDedup]]'s whole-clip grid structurally cannot do
    * and [[audioWinnowPairsOf]] could not GATE for want of entropy.
    * −1 is a distinct clip (must not pair). */
  private[graft] val HkSeeds: Seq[(Long, Long, Int, Int, Int)] = Seq(
    (-3L, -3L, 0, 12, 1),
    (-2L, -3L, 2, 10, 2),
    (-1L, -1L, 0, 12, 1))

  /** One rendered HK clip — module-level (not a local def) so the
    * corpus-generator closure captures nothing but the module. */
  private[graft] def hkRender(pat: Long, start: Int, nHops: Int, vol: Int): Array[Byte] =
    renderWav(8000, hkWave(
      Array.tabulate(nHops, HkBands)((h, m) => vol * hkAmp(pat, start + h, m)),
      Array.tabulate(nHops)(h => hkHalf(pat, start + h))))

  /** Gated `mm_audio_hk_dedup`: md5-parameterized amplitude-modulated
    * clips + the trim seed trio, through the real WAV writer/parser. */
  def audioHkDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
    val corpus = docs.mapPartitions(_.map { id =>
      AudioRow(id, Audio.hkRender(id, 0, (8 + id % 5).toInt, 1))
    })
    val seeds = HkSeeds.map { case (id, pat, start, n, vol) =>
      AudioRow(id, hkRender(pat, start, n, vol))
    }
    audioHkPairsOf(corpus.union(seeds.toDS()).toDF())
  }

  val audioHkDedupOracle: String = s"""
    WITH clips(doc_id, pat, hstart, nh, vol) AS (
      SELECT doc_id, doc_id, 0, 8 + doc_id % 5, 1 FROM documents
      ${HkSeeds.map { case (id, pat, start, n, vol) =>
        s"UNION ALL SELECT CAST($id AS BIGINT), CAST($pat AS BIGINT), $start, CAST($n AS BIGINT), $vol"
      }.mkString("\n      ")}),
    eband AS (
      SELECT doc_id, h, m,
        8 * CAST(vol * (500 + CAST(concat('0x', substr(md5(
              'hka:' || CAST(pat AS VARCHAR) || ':' || CAST(hstart + h AS VARCHAR) ||
              ':' || CAST(m AS VARCHAR)), 1, 2)) AS BIGINT) * 25) AS BIGINT)
          * CAST(vol * (500 + CAST(concat('0x', substr(md5(
              'hka:' || CAST(pat AS VARCHAR) || ':' || CAST(hstart + h AS VARCHAR) ||
              ':' || CAST(m AS VARCHAR)), 1, 2)) AS BIGINT) * 25) AS BIGINT) AS e
      FROM clips, (SELECT unnest(range($HkBands)) AS m), (SELECT unnest(range(16)) AS h)
      WHERE h < nh),
    hkb AS (
      SELECT a.doc_id, a.h,
        CAST(sum(CASE WHEN (a.e - b.e) - (c.e - d.e) > 0
                      THEN 1 << CAST(a.m AS INT) ELSE 0 END) AS BIGINT) AS bits
      FROM eband a
      JOIN eband b ON b.doc_id = a.doc_id AND b.h = a.h AND b.m = a.m + 1
      JOIN eband c ON c.doc_id = a.doc_id AND c.h = a.h - 1 AND c.m = a.m
      JOIN eband d ON d.doc_id = a.doc_id AND d.h = a.h - 1 AND d.m = a.m + 1
      WHERE a.h >= 1 AND a.m < ${HkBands - 1}
      GROUP BY a.doc_id, a.h),
    zc AS (
      SELECT doc_id, h,
        (${HopSamples} - 1) // (4 + CAST(concat('0x', substr(md5(
            'hkh:' || CAST(pat AS VARCHAR) || ':' || CAST(hstart + h AS VARCHAR)), 1, 2)) AS BIGINT) % 12) AS c
      FROM clips, (SELECT unnest(range(16)) AS h)
      WHERE h >= 1 AND h < nh),
    hktoks AS (
      SELECT hkb.doc_id,
        list(CAST((hkb.bits << 4) | CAST(xor(zc.c, zc.c >> 1) & 15 AS BIGINT) AS VARCHAR)
             ORDER BY hkb.h) AS t
      FROM hkb JOIN zc ON zc.doc_id = hkb.doc_id AND zc.h = hkb.h
      GROUP BY hkb.doc_id
      HAVING count(*) >= ${HkK + AwW - 1}),
    ${TextAnalysis.winnowCtesFromToksKW("hktoks", HkK, AwW)},
    fpd AS (SELECT DISTINCT doc_id, fp FROM wfp),
    keep AS (SELECT fp FROM fpd GROUP BY fp
             HAVING count(*) <= ${Multimodal.DefaultMaxBlockDf})
    SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS n_shared
    FROM fpd a JOIN keep USING (fp) JOIN fpd b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= $HkMinShared
    ORDER BY da, db"""

  val audioSigDedupOracle: String = s"""
    WITH ap(doc_id, fixh, n) AS (
      SELECT doc_id, 0, 400 + doc_id % 391 FROM documents
      ${AudioSigSeeds.map { case (id, _, half, n) =>
        s"UNION ALL SELECT CAST($id AS BIGINT), CAST($half AS BIGINT), CAST($n AS BIGINT)"
      }.mkString("\n      ")}),
    wn AS (
      SELECT doc_id, w,
        CASE WHEN fixh > 0 THEN fixh
             ELSE 4 + CAST(concat('0x', substr(md5(
               'aud:' || CAST(doc_id AS VARCHAR) || ':' || CAST(w AS VARCHAR)), 1, 2)) AS INT) % 12
        END AS half,
        ((w + 1) * n) // 16 - (w * n) // 16 AS len
      FROM ap, (SELECT unnest(range(16)) AS w)),
    nb AS (
      SELECT doc_id, w, CAST(xor(c, c >> 1) & 15 AS BIGINT) AS g
      FROM (SELECT doc_id, w, (len - 1) // half AS c FROM wn)),
    h AS (
      SELECT doc_id,
        ${(0 until 4).map(j =>
          s"CAST(sum(CASE WHEN w // 4 = $j THEN g << CAST((w % 4) * 4 AS INT) ELSE 0 END) AS INT) AS b$j")
          .mkString(",\n        ")}
      FROM nb GROUP BY doc_id),
    bl AS (
      SELECT doc_id, b0, b1, b2, b3, k,
        CASE k WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS bv
      FROM h, (SELECT unnest(range(4)) AS k)),
    keep AS (SELECT k, bv FROM bl GROUP BY k, bv HAVING count(*) <= ${Multimodal.DefaultMaxBlockDf}),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
        a.b0 AS ab0, a.b1 AS ab1, a.b2 AS ab2, a.b3 AS ab3,
        b.b0 AS bb0, b.b1 AS bb1, b.b2 AS bb2, b.b3 AS bb3
      FROM bl a JOIN keep kp ON kp.k = a.k AND kp.bv = a.bv
      JOIN bl b ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id)
    SELECT da, db,
      CAST(bit_count(xor(ab0, bb0)) + bit_count(xor(ab1, bb1)) +
           bit_count(xor(ab2, bb2)) + bit_count(xor(ab3, bb3)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(ab0, bb0)) + bit_count(xor(ab1, bb1)) +
          bit_count(xor(ab2, bb2)) + bit_count(xor(ab3, bb3)) <= 3
    ORDER BY da, db"""

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
