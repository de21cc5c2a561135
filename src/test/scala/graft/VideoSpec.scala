package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Video

/** Multi-frame GIF decode + temporal features (round 14): real
  * encoder→reader roundtrip frame-exact, frame counting via the JDK
  * reader, loud failure on undecodable payloads, and the lag-window
  * delta composition. */
class VideoSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("animated GIF roundtrip: every frame decodes with its exact solid gray") {
    val grays = Seq(8, 120, 247, 64)
    val gif = Video.renderAnimatedGif(grays.map(g => Video.solidFrame(10, 8, g)))
    val frames = Video.decodeFrames(5L, gif)
    assert(frames.length == grays.length, "frame count must survive the roundtrip")
    frames.zip(grays).foreach { case (f, g) =>
      assert(f.width == 10 && f.height == 8)
      assert(f.mean_byte == g.toDouble, s"frame ${f.frame_idx}: mean ${f.mean_byte} != $g")
    }
  }

  test("two-tone frame: mean is the exact pixel average, not a palette artifact") {
    // half 0, half 200 → mean exactly 100; exercises a 2-color palette
    val img = Video.solidFrame(8, 8, 0)
    (0 until 8).foreach(y => (0 until 4).foreach(x => img.setRGB(x, y, 200 << 16 | 200 << 8 | 200)))
    val gif = Video.renderAnimatedGif(Seq(img))
    val f = Video.decodeFrames(1L, gif).head
    assert(f.mean_byte == 100.0, s"mean ${f.mean_byte}")
  }

  test("undecodable payload fails loudly") {
    val e = intercept[Exception] { Video.decodeFrames(9L, "not a gif".getBytes) }
    assert(e.getMessage.contains("no JDK reader"))
  }

  test("frameFeaturesOf: temporal delta composes per doc in frame order") {
    val gifA = Video.renderAnimatedGif(Seq(100, 150, 150).map(Video.solidFrame(8, 8, _)))
    val gifB = Video.renderAnimatedGif(Seq(30, 10).map(Video.solidFrame(8, 8, _)))
    val df = Seq((1L, gifA), (2L, gifB)).toDF("doc_id", "payload")
    val got = Video.frameFeaturesOf(df)
      .select($"doc_id", $"frame_idx", $"mean_byte", $"delta_prev")
      .orderBy($"doc_id", $"frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 0, 100.0, null), (1L, 1, 150.0, 50.0), (1L, 2, 150.0, 0.0),
      (2L, 0, 30.0, null), (2L, 1, 10.0, 20.0)))
  }

  test("clip near-dup: a re-encode and an interior crop pair with the original; a distinct clip doesn't") {
    // real gradient frames (smooth structure — dHash's home regime),
    // through the real encoder/reader end to end
    def gradFrame(w: Int, h: Int, k: Int, flip: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v0 = (x * 200 / w + y * 40 / h + k * 7) % 256
          val g = if (flip) 255 - v0 else v0
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      img
    }
    def crop(img: java.awt.image.BufferedImage, b: Int) =
      img.getSubimage(b, b, img.getWidth - 2 * b, img.getHeight - 2 * b)
    val base = (0 until 3).map(k => gradFrame(90, 80, k, flip = false))
    val gifBase = Video.renderAnimatedGif(base)
    // re-encode: decode the encoded clip and encode again
    val reenc = Video.renderAnimatedGif {
      val ios = graft.operators.Multimodal.ImageDecoder.memStream(gifBase)
      val reader = javax.imageio.ImageIO.getImageReaders(ios).next()
      reader.setInput(ios)
      try (0 until reader.getNumImages(true)).map(reader.read(_)) finally reader.dispose()
    }
    val cropped = Video.renderAnimatedGif(base.map(crop(_, 2)))
    val distinct = Video.renderAnimatedGif((0 until 3).map(k => gradFrame(90, 80, k, flip = true)))
    val clips = Seq((10L, gifBase), (11L, reenc), (12L, cropped), (13L, distinct))
      .toDF("doc_id", "payload")
    val pairs = Video.videoDhashDedupOf(clips)
      .select($"da", $"db", $"max_hamming")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.contains((10L, 11L)) && pairs((10L, 11L)) == 0,
      s"re-encode must pair at Hamming 0: $pairs")
    assert(pairs.contains((10L, 12L)),
      s"the interior crop must pair within the Hamming ball: $pairs")
    assert(!pairs.keys.exists(p => p._1 == 13L || p._2 == 13L),
      s"the distinct clip must not pair: $pairs")
  }

  test("trimmed + re-encoded clip: offset voting pairs it while BOTH existing matchers reject it") {
    // md5-derived pixels (the r19 lesson — arithmetic gradients collapse
    // to one dHash); 36×32 with the 9×8 grid = exact 4×4 cells, so the
    // "re-encode" watermark (one 4×4 corner cell forced to 255) perturbs
    // EXACTLY one grid cell → Hamming 1-3 per frame — breaks the winnow
    // matcher's exact tokens but stays inside the Hamming ball
    def mFrame(seed: Int, tweak: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val d = java.security.MessageDigest.getInstance("MD5")
      for (y <- 0 until 32; x <- 0 until 36) {
        val g = if (tweak && x < 4 && y < 4) 255
                else d.digest(s"vth:$seed:${y * 36 + x}".getBytes("UTF-8"))(0) & 0xFF
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val full = (0 until 7).map(mFrame(_, tweak = false))
    val trimmedReenc = (2 until 7).map(mFrame(_, tweak = true)) // drop 2 + watermark
    val clips = Seq(
      (30L, Video.renderAnimatedGif(full)),
      (31L, Video.renderAnimatedGif(trimmedReenc)),
      (32L, Video.renderAnimatedGif((10 until 15).map(mFrame(_, tweak = false)))))
      .toDF("doc_id", "payload")
    // the crafted perturbation must actually exercise the tolerance:
    // per-frame Hamming in [1, 3] (0 would mean winnow pairs it too)
    val pairs = Video.videoTrimHammingPairsOf(clips).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2).toLong, r.getLong(3), r.getInt(4)))).toMap
    assert(pairs.contains((30L, 31L)),
      s"the trimmed+re-encoded clip must pair via offset voting: ${pairs.keys}")
    val (off, nOv, maxHm) = pairs((30L, 31L))
    assert(off == 2L && nOv == 5L, s"true offset 2 with full 5-frame overlap: off=$off n=$nOv")
    assert(maxHm >= 1 && maxHm <= 3,
      s"the perturbation must flip 1-3 bits per frame (0 = vacuous, >3 = out of ball): $maxHm")
    assert(!pairs.keys.exists(p => p._1 == 32L || p._2 == 32L),
      s"a distinct clip must not pair: ${pairs.keys}")
    // both existing matchers reject this pair — the gap this closes
    val aligned = Video.videoDhashDedupOf(clips)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(!aligned.contains((30L, 31L)), "aligned matcher: different frame counts")
    val win = Video.videoWinnowPairsOf(clips)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(!win.contains((30L, 31L)),
      "winnow matcher: exact tokens cannot absorb the re-encode Hamming")
  }

  test("trimmed clip: the winnow matcher pairs it at any offset; the aligned matcher structurally cannot") {
    def gradFrame(k: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 36) {
          val g = (x * 5 + y * 3 + k * 37) % 256
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      img
    }
    val full = (0 until 6).map(gradFrame)
    val clips = Seq(
      (20L, Video.renderAnimatedGif(full)),             // the original, 6 frames
      (21L, Video.renderAnimatedGif(full.drop(2))),     // trimmed: frames 2..5
      (22L, Video.renderAnimatedGif((10 until 14).map(gradFrame)))) // distinct
      .toDF("doc_id", "payload")
    val win = Video.videoWinnowPairsOf(clips)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(win.contains((20L, 21L)),
      s"the trimmed clip must share winnow fingerprints with the original: $win")
    assert(!win.exists(p => p._1 == 22L || p._2 == 22L),
      s"a distinct clip must not pair: $win")
    val aligned = Video.videoDhashDedupOf(clips)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(!aligned.contains((20L, 21L)),
      "the aligned matcher cannot pair clips of different frame counts — the gap the winnow matcher closes")
  }
}
