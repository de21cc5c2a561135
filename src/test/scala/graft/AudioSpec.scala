package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Audio

/** WAV/RIFF PCM codec + audio featurization (round 14): roundtrip
  * through real bytes, chunk-walking robustness (unknown chunks, odd
  * sizes, pad bytes), loud failure on malformed/compressed input, and
  * the closed-form square-wave feature identities the gate rests on. */
class AudioSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("roundtrip: rendered mono 16-bit PCM parses back sample-exact") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 5, -5)
    val w = Audio.parseWav(Audio.renderWav(16000, samples))
    assert(w.sampleRate == 16000 && w.channels == 1 && w.bits == 16)
    assert(w.samples.toSeq == samples.toSeq)
  }

  test("chunk walking: unknown chunks (odd-size + pad byte) before fmt/data are skipped") {
    val base = Audio.renderWav(8000, Array[Short](10, -10, 20))
    // splice a 3-byte (odd) LIST chunk right after the RIFF header; the
    // parser must skip len + pad to land on fmt
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // 3 data + 1 pad
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val size = spliced.length - 8
    spliced(4) = (size & 0xFF).toByte; spliced(5) = ((size >> 8) & 0xFF).toByte
    spliced(6) = ((size >> 16) & 0xFF).toByte; spliced(7) = ((size >> 24) & 0xFF).toByte
    val w = Audio.parseWav(spliced)
    assert(w.samples.toSeq == Seq[Short](10, -10, 20))
  }

  test("stereo + 8-bit parse: channel 0 extracted, widened and centered") {
    // hand-build a stereo 8-bit PCM WAV: frames (L,R) = (128+i, 0)
    val frames = Array[Byte](
      (128 + 10).toByte, 0, (128 - 10).toByte, 0, 128.toByte, 0)
    val out = java.nio.ByteBuffer.allocate(44 + frames.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + frames.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(8000 * 2)
      .putShort(2).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(frames.length)
      .put(frames)
    val w = Audio.parseWav(out.array())
    assert(w.channels == 2 && w.bits == 8)
    assert(w.samples.toSeq == Seq[Short]((10 << 8).toShort, (-10 << 8).toShort, 0))
  }

  test("malformed input fails loudly: non-RIFF, truncated chunk, compressed format") {
    intercept[Exception] { Audio.parseWav("not audio at all".getBytes) }
    val good = Audio.renderWav(8000, Array[Short](1, 2, 3))
    intercept[Exception] { Audio.parseWav(good.take(30)) } // truncated data
    // audioFormat 7 (mu-law): must refuse, not mis-decode
    val mulaw = good.clone(); mulaw(20) = 7
    val e = intercept[Exception] { Audio.parseWav(mulaw) }
    assert(e.getMessage.contains("PCM"))
  }

  test("square-wave identities: peak == rms == amp, crossings == (n-1) div half") {
    for ((amp, half, n) <- Seq((1000, 4, 400), (25750, 19, 599), (3250, 16, 401))) {
      val wave = Array.tabulate(n)(i => (if ((i / half) % 2 == 0) amp else -amp).toShort)
      val f = Audio.featuresOf(7L, Audio.renderWav(16000, wave))
      assert(f.peak == amp && f.rms == amp.toDouble,
        s"amp=$amp half=$half n=$n: peak=${f.peak} rms=${f.rms}")
      assert(f.zero_crossings == (n - 1) / half)
      assert(f.n_samples == n && f.duration_ms == n.toLong * 1000 / 16000)
    }
  }

  test("audioFeaturesOf is partition-parallel and total over a payload frame") {
    val frame = (0L until 20L).map { i =>
      (i, Audio.renderWav(8000, Array.tabulate(100)(j => ((j % 7) * 100).toShort)))
    }.toDF("doc_id", "payload").repartition(4)
    val got = Audio.audioFeaturesOf(frame)
    assert(got.count() == 20)
    assert(got.select("sample_rate").distinct().as[Int].collect().toSeq == Seq(8000))
  }

  test("ZCR signature: volume-invariant (scaled clip pairs at Hamming 0), tone change breaks the pair, length jitter stays near") {
    val halves = Array.tabulate(16)(w => 4 + (w * 3) % 9)
    def clip(amp: Int, n: Int, hs: Array[Int]) =
      Audio.renderWav(8000, Audio.segWave(amp, n, hs))
    val base = clip(2000, 640, halves)
    val louder = clip(6000, 640, halves) // 3x volume
    val otherTone = clip(2000, 640, halves.map(_ + 2))
    val jitter = clip(2000, 644, halves) // +4 samples: ±1 count on a few windows
    val frame = Seq((1L, base), (2L, louder), (3L, otherTone), (4L, jitter))
      .toDF("doc_id", "payload")
    val sigs = Audio.audioSigOf(frame).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(sigs(1L) == sigs(2L), "ZCR signature must ignore amplitude")
    assert(sigs(1L) != sigs(3L), "a different tone profile must change the signature")
    def hamming(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
      Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
        Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)
    // gray coding: a ±1 count costs exactly ONE bit per touched window,
    // so even with every other window shifted the jitter distance stays
    // far under the tone change's
    val hJit = hamming(sigs(1L), sigs(4L))
    val hTone = hamming(sigs(1L), sigs(3L))
    assert(hJit <= 8, s"gray coding keeps length jitter near: $hJit")
    assert(hTone > 3, "tone change must leave the Hamming ball")
    assert(hJit < hTone, s"jitter ($hJit) must stay closer than a tone change ($hTone)")
    // end to end through the pair machinery: only the volume pair survives
    val pairs = Audio.audioSigDedupOf(frame)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && !pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("segWave/zcrSignature boundary parity: closed form holds for every window at sf1-scale doc counts") {
    // The r19 bug: segWave assigned sample i to window floor(i*16/n) while
    // zcrSignature reads windows on the floor(w*n/16) grid — misaligned
    // when 16 does not divide n, so window w's first strictly-inside
    // comparison could see a crossing inherited from window w-1's phase.
    // Simulation showed 186/200 corpus docs off; both gated SFs passed
    // only because both engines emitted zero organic pairs there. This
    // spec IS the >=sf1 re-verify: every corpus doc id the sf1 gate
    // would render (n = 400 + id % 391, md5 halves) must match the
    // oracle's (len-1) div half closed form in all 16 windows.
    var id = 0L
    while (id < 60000L) {
      val n = (400 + id % 391).toInt
      val halves = Array.tabulate(16)(w => Audio.winHalf(id, w, 0))
      val got = Audio.zcrSignature(Audio.segWave(1000, n, halves))
      var w = 0
      while (w < 16) {
        val len = ((w + 1).toLong * n / 16 - w.toLong * n / 16).toInt
        val c = (len - 1) / halves(w)
        assert(got(w) == ((c ^ (c >> 1)) & 15),
          s"id=$id w=$w n=$n half=${halves(w)}: got ${got(w)}, closed form ${(c ^ (c >> 1)) & 15}")
        w += 1
      }
      id += 1
    }
    // and the seed trio (fixed half, n=480 — 16 | 480, but keep it gated)
    for ((sid, amp, half, n) <- Audio.AudioSigSeeds) {
      val got = Audio.zcrSignature(Audio.segWave(amp, n, Array.fill(16)(half)))
      val len = n / 16
      val c = (len - 1) / half
      assert(got.forall(_ == ((c ^ (c >> 1)) & 15)), s"seed $sid")
    }
  }

  test("HK tokens: closed form through the real codec; gain-invariant; trim+volume pair gates where ZCR entropy could not") {
    // closed form: E(h,m) = 8·amp² exactly for the amplitude-modulated
    // square wave, HK bit = sign of the band/time energy delta, ZCR
    // nibble = gray((64-1) div half) — all integers, codec-exact
    for (pat <- Seq(-3L, 7L, 123L); vol <- Seq(1, 2)) {
      val nHops = 10
      val got = Audio.hkTokens(Audio.parseWav(Audio.hkRender(pat, 0, nHops, vol)).samples)
      val want = (1 until nHops).map { h =>
        def e(hh: Int, m: Int): Long = {
          val a = vol.toLong * Audio.hkAmp(pat, hh, m)
          8L * a * a
        }
        var bits = 0
        for (m <- 0 until Audio.HkBands - 1)
          if ((e(h, m) - e(h, m + 1)) - (e(h - 1, m) - e(h - 1, m + 1)) > 0) bits |= 1 << m
        val c = (Audio.HopSamples - 1) / Audio.hkHalf(pat, h)
        ((bits << 4) | ((c ^ (c >> 1)) & 15)).toString
      }
      assert(got == want, s"pat=$pat vol=$vol")
    }
    // gain invariance: the ×2 clip has IDENTICAL tokens (HK ships signs)
    val t1 = Audio.hkTokens(Audio.parseWav(Audio.hkRender(-3L, 0, 12, 1)).samples)
    val t2 = Audio.hkTokens(Audio.parseWav(Audio.hkRender(-3L, 0, 12, 2)).samples)
    assert(t1 == t2, "HK tokens must be volume-invariant")
    // end to end: the trimmed+re-leveled clip pairs; distinct does not;
    // the whole-clip relative-window signature structurally misses it
    val frame = Audio.HkSeeds.map { case (id, pat, start, n, vol) =>
      (id, Audio.hkRender(pat, start, n, vol))
    }.toDF("doc_id", "payload")
    val hk = Audio.audioHkPairsOf(frame)
      .select($"da", $"db", $"n_shared").as[(Long, Long, Long)].collect()
    assert(hk.map(p => (p._1, p._2)).toSet == Set((-3L, -2L)),
      s"only the trim pair must survive: ${hk.toSeq}")
    assert(hk.head._3 >= Audio.HkMinShared,
      s"a genuine overlap shares a run of fingerprints: ${hk.head._3}")
    val rel = Audio.audioSigDedupOf(frame)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(!rel.contains((-3L, -2L)),
      "the relative-window signature cannot pair a trimmed clip — the gap HK closes")
  }

  test("trimmed audio: hop-token winnow pairs it at any hop offset; the relative-window signature cannot") {
    // 12 hop-aligned segments with varied periods, real WAV roundtrip
    val halves = Array(4, 7, 11, 5, 9, 13, 4, 6, 10, 8, 12, 5)
    val full = Audio.renderWav(8000, Audio.hopWave(2000, halves))
    val trimmed = Audio.renderWav(8000, Audio.hopWave(3000, halves.drop(2))) // + volume change
    val distinct = Audio.renderWav(8000, Audio.hopWave(2000, halves.map(h => 17 - h)))
    val frame = Seq((1L, full), (2L, trimmed), (3L, distinct)).toDF("doc_id", "payload")
    val win = Audio.audioWinnowPairsOf(frame)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(win.contains((1L, 2L)),
      s"the trimmed (and re-leveled) clip must share hop fingerprints: $win")
    assert(!win.exists(p => p._1 == 3L || p._2 == 3L),
      s"a distinct clip must not pair: $win")
    // the relative-window signature's grid moved with the trim: the
    // 16-window nibbles differ, so the whole-clip matcher misses it
    val rel = Audio.audioSigDedupOf(frame)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(!rel.contains((1L, 2L)),
      "the relative-window signature cannot pair a trimmed clip — the gap the hop matcher closes")
  }
}
