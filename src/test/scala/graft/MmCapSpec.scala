package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audio, Multimodal, Video}

/** Crafted hot-key corpora for the multimodal candidate-join caps
  * (round 20, the r19 top verdict task): on real media, flat/black
  * regions make block values collide and fade-to-black frame runs make
  * one winnow fingerprint corpus-wide hot — k docs sharing a candidate
  * key is k² join rows, the repo's one quadratic-on-skew path before
  * the cap. Each spec plants a hot key ABOVE the default df cap plus a
  * true near-dup pair that must survive via its other (cold) keys, and
  * where the operator exposes the knob, contrasts capped vs uncapped
  * to prove the cap (not the corpus) removes the hot pairs. */
class MmCapSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private def b16(s: String, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$s:$j".getBytes("UTF-8"))
    ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
  }

  test("blockPairsOf: a hot block value above the cap is dropped from discovery; true pairs survive via cold blocks") {
    val Hot = 0xBEEF
    // 400 docs share b0 = Hot (a flat region) — b1..b3 md5-random, so
    // none of them is a near-dup of anything; their only effect is the
    // 400²-candidate hot key the cap must remove
    val flat = (1L to 400L).map(id =>
      (id, Hot, b16(s"f$id", 1), b16(s"f$id", 2), b16(s"f$id", 3)))
    // true near-dup pair: identical signatures whose b0 is ALSO the hot
    // value — must still pair (hamming 0) via its unique b1/b2/b3 keys
    val tru = Seq(
      (-1L, Hot, 0x1234, 0x5678, 0x4321),
      (-2L, Hot, 0x1234, 0x5678, 0x4321))
    // hot-only pair: b0 equal (hot), exactly ONE differing bit in each
    // of b1/b2/b3 → hamming 3, discoverable ONLY via the hot key — the
    // pair the cap knowingly gives up
    val hotOnly = Seq(
      (-11L, Hot, 0x0F0F, 0x3C3C, 0x5A5A),
      (-12L, Hot, 0x0F0E, 0x3C3D, 0x5A5B))
    val hashed = (flat ++ tru ++ hotOnly).toDF("doc_id", "b0", "b1", "b2", "b3")

    val capped = Multimodal.blockPairsOf(hashed, maxDf = Some(256))
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    val uncapped = Multimodal.blockPairsOf(hashed, maxDf = None)
      .select($"da", $"db").as[(Long, Long)].collect().toSet

    assert(capped.contains((-2L, -1L)),
      s"the true pair must be discovered via its cold b1/b2/b3 keys: $capped")
    assert(!capped.contains((-12L, -11L)),
      s"a pair sharing ONLY the hot key must be dropped by the cap: $capped")
    assert(uncapped == capped + ((-12L, -11L)),
      s"capped output must differ from uncapped by exactly the hot-only pair: " +
        s"capped=$capped uncapped=$uncapped")
  }

  test("video aligned dedup: 300 black clips collapse to zero pairs under the cap; the textured true pair survives") {
    def frame(f: Int => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(24, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 24) {
        val g = f(y * 24 + x) & 0xFF
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val black = frame(_ => 0)
    // 300 identical all-black 2-frame clips: EVERY aligned candidate
    // key is hot (df 300 > 256) → uncapped they are C(300,2) = 44 850
    // hamming-0 pairs; capped, zero (the flat-content recall trade the
    // cap documents — mirrored by the oracle keep CTE)
    val blackClips = (1L to 300L).map(id =>
      (id, Video.renderAnimatedGif(Seq(black, black))))
    // the true near-dup pair: identical TEXTURED clips, unique content
    def tex(seed: Int) = frame(c => (c * 7 + seed * 131 + (c * c) % 97))
    val truPair = Seq(
      (-1L, Video.renderAnimatedGif(Seq(tex(5), tex(9)))),
      (-2L, Video.renderAnimatedGif(Seq(tex(5), tex(9)))))
    val clips = (blackClips ++ truPair).toDF("doc_id", "payload")

    val capped = Video.videoDhashDedupOf(clips)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(capped == Set((-2L, -1L)),
      s"capped: only the textured true pair survives (black-clip pairs dropped): $capped")

    // the cap (not the corpus) removes them: uncapped on a SMALL black
    // population (20 clips, below the cap to keep the spec fast) shows
    // the quadratic pair set the hot key generates
    val few = (blackClips.take(20) ++ truPair).toDF("doc_id", "payload")
    val fewPairs = Video.videoDhashDedupOf(few, maxDf = None).count()
    assert(fewPairs == 20L * 19 / 2 + 1,
      s"uncapped, k black clips are k(k-1)/2 pairs: $fewPairs")
  }

  test("video winnow dedup: a corpus-wide black frame run is a hot fingerprint; the trimmed true pair survives the cap") {
    // md5-derived pixels (the r19 lesson): an arithmetic formula's
    // constant per-frame offset cancels in dHash's neighbor comparisons
    // and distinct frames collapse to a handful of tokens
    def frame(seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(24, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val d = java.security.MessageDigest.getInstance("MD5")
      for (y <- 0 until 16; x <- 0 until 24) {
        val g = d.digest(s"vwc:$seed:${y * 24 + x}".getBytes("UTF-8"))(0) & 0xFF
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val black = {
      val img = new java.awt.image.BufferedImage(24, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img
    }
    // 300 clips that all OPEN with the same 3-black-frame run (a fade
    // from black) then diverge: the black run's winnow fingerprint has
    // df 300 > 256 — without the cap that is ~45k candidate pairs
    val fade = (1L to 300L).map(id =>
      (id, Video.renderAnimatedGif(
        Seq(black, black, black, frame(id.toInt), frame(id.toInt + 1000)))))
    // true pair: a trim of a unique textured clip (the operator's job)
    val full = (0 until 6).map(frame)
    val truPair = Seq(
      (-1L, Video.renderAnimatedGif(full)),
      (-2L, Video.renderAnimatedGif(full.drop(2))))
    val clips = (fade ++ truPair).toDF("doc_id", "payload")

    val capped = Video.videoWinnowPairsOf(clips)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(capped == Set((-2L, -1L)),
      s"capped: only the trimmed true pair survives (hot black-run fingerprint dropped): $capped")

    // contrast on a small sub-population: uncapped, the shared black
    // run pairs every fade clip with every other
    val few = (fade.take(12) ++ truPair).toDF("doc_id", "payload")
    val fewPairs = Video.videoWinnowPairsOf(few, maxDf = None).count()
    assert(fewPairs == 12L * 11 / 2 + 1,
      s"uncapped, k fade-in clips are k(k-1)/2 pairs: $fewPairs")
  }

  test("audio winnow: a corpus-wide hot hop fingerprint is dropped; the trimmed true pair survives") {
    // 300 IDENTICAL constant-tone clips (the flat-content population —
    // any varied 300-clip corpus would also pair organically through
    // the documented ~3-bit per-hop token entropy, which is exactly why
    // this operator is spec-only); every one of their fingerprints has
    // df 300 > 256 → all dropped. The true pair is a hop-aligned trim
    // of a unique clip whose adjacent hop counts are all distinct.
    def clip(halves: Array[Int], amp: Int) =
      Audio.renderWav(8000, Audio.hopWave(amp, halves))
    val hot = (1L to 300L).map(id => (id, clip(Array.fill(8)(6), 2000)))
    val halves = Array(4, 7, 11, 5, 9, 13, 4, 6, 10, 8, 12, 5)
    val truPair = Seq(
      (-1L, clip(halves, 2000)),
      (-2L, clip(halves.drop(2), 3000)))
    val frame = (hot ++ truPair).toDF("doc_id", "payload")
    val capped = Audio.audioWinnowPairsOf(frame)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(capped == Set((-2L, -1L)),
      s"capped: only the trimmed true pair survives (identical-clip fps all hot): $capped")
    val few = (hot.take(10) ++ truPair).toDF("doc_id", "payload")
    val fewPairs = Audio.audioWinnowPairsOf(few, maxDf = None)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert((1L to 10L).combinations(2).forall(c => fewPairs.contains((c(0), c(1)))),
      s"uncapped, identical clips pair all-with-all: $fewPairs")
  }
}
