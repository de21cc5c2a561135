package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TokenizeWs

/** Property proofs that the native codegen expressions match their
  * composable reference formulations on arbitrary inputs — the guard
  * that performance rewrites can never drift semantically.
  * (Generators driven directly with fixed seeds: deterministic, and no
  * scalatest-scalacheck bridge needed.)
  */
class NativeExprPropertySpec extends AnyFunSuite {
  lazy val spark = GraftSession.test

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** The original regex-chain tokenizer (api.py:470-489), driver-side. */
  private def regexTokens(s: String): Seq[String] =
    s.replaceAll("[^\\w\\s]", " ").toLowerCase
      .split("\\s+").toSeq.filter(_.nonEmpty)

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.const(' '), Gen.const('_'), Gen.const('\t'),
    Gen.const('\n'), Gen.oneOf("!@#$%^&*(),.;:'\"-+=/\\[]{}«é漢 ".toSeq)
  )).map(_.mkString)

  test("TokenizeWs == regex-chain tokenizer on arbitrary strings") {
    samples(textGen, 500).foreach { s =>
      val native = TokenizeWs.tokenize(UTF8String.fromString(s))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(native == regexTokens(s), s"input=${s.map(_.toInt)}")
    }
  }

  test("DotProduct == sequential fold on arbitrary double vectors") {
    import spark.implicits._
    // equal-length pairs: the library contract is fixed-dim embeddings
    // (zip_with null-pads ragged pairs; DotProduct stops at min length)
    val pairGen = Gen.chooseNum(0, 16).flatMap { n =>
      val v = Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6).map(_.toDouble))
      v.flatMap(a => v.map(b => (a, b)))
    }
    val pairs = samples(pairGen, 40)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      graft.functions.VectorFns.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("folded"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, f) => assert(java.lang.Double.compare(n, f) == 0) }
  }

  test("MinHashSignature == explode+groupBy composable formulation, bit-for-bit") {
    import spark.implicits._
    import graft.operators.Dedup
    // random multi-token docs, including short ones (<3 tokens → no
    // shingles → excluded by BOTH formulations) and duplicated tokens
    val docGen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 30).map(i => s"tok$i")).map(_.mkString(" ")))
    val docs = samples(docGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    val native = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composable = Dedup.minhashSignaturesComposable(Dedup.shingleSets(docs))
      .collect().map(r => r.getLong(0) -> (1 to 32).map(i => r.getLong(i))).toMap
    assert(native.nonEmpty)
    assert(native.keySet == composable.keySet) // same doc exclusion rule
    native.foreach { case (id, sig) =>
      assert(sig == composable(id), s"signature drift for doc $id")
    }

    // fused band hashes == concat_ws(",", m..)+xxhash64 over the
    // composable signature columns, byte-for-byte
    val nativeBands = docs.select(col("doc_id"),
        posexplode(graft.functions.MinHashBands.of(
          graft.functions.TextFns.shinglesFromTokens(
            graft.functions.TextFns.tokens(col("text")), 3)))
          .as(Seq("band", "bh")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val composableBands = Dedup.minhashSignaturesComposable(Dedup.shingleSets(docs))
      .select(col("doc_id"),
        explode(array((0 until 8).map { b =>
          struct(lit(b).as("band"),
            xxhash64(concat_ws(",", (0 until 4).map(r => col(s"m${b * 4 + r}")): _*)).as("bh"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(nativeBands == composableBands && nativeBands.nonEmpty)
  }

  test("Misra-Gries heavy hitters: MG bounds hold vs the exact histogram") {
    import spark.implicits._
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
      .cache()
    val n = toks.count()
    val k = 256
    val exact = toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    val mg = toks.agg(graft.functions.MisraGriesTopK.of(col("token"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.est")).as[(String, Long)].collect().toMap
    assert(mg.nonEmpty && mg.size <= k)
    // estimates never exceed truth and undercount by at most n/k
    mg.foreach { case (t, est) =>
      val truth = exact(t)
      assert(est <= truth && est >= truth - n / k,
        s"token $t: est=$est truth=$truth bound=${n / k}")
    }
    // every true heavy hitter above the n/k threshold is retained
    exact.collect { case (t, c) if c > n / k => t }
      .foreach(t => assert(mg.contains(t), s"heavy hitter $t dropped"))
    toks.unpersist()
  }

  test("WinnowFps == composable HOF winnowing, per-doc set-identical") {
    import spark.implicits._
    // crafted edges (repeats force min-ties; short docs hit the guard)
    // plus the sf0.001 corpus
    val crafted = Seq(
      (9001L, ("tok " * 20).trim),                 // all grams identical
      (9002L, (0 until 30).map(i => s"w${i % 7}").mkString(" ")), // periodic
      (9003L, "a b c d e f g h"),                  // exactly k+w-1 tokens
      (9004L, "a b c d e f g"),                    // one below the guard
      (9005L, (0 until 50).map(i => s"u$i").mkString(" "))) // all distinct
      .toDF("doc_id", "text")
    val sf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(50)
    for (docs <- Seq(crafted, sf)) {
      val native = graft.operators.TextAnalysis.winnowFingerprintOf(docs)
        .as[(Long, Int, Long)].collect().toSet
      val hof = graft.operators.TextAnalysis.winnowFingerprintHof(docs)
        .as[(Long, Int, Long)].collect().toSet
      assert(native == hof,
        s"diff: native-only=${native -- hof}, hof-only=${hof -- native}")
    }
  }

  test("CdcCuts == the declarative filter/md5/conv cut rule, on arbitrary token arrays and real docs") {
    import spark.implicits._
    // arbitrary token arrays, biased to the edges: empty, shorter than
    // the window, exactly the window, long
    val tokGen: Gen[Seq[String]] = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "d0", "ee_e", "f", "gg")))
    val crafted = samples(tokGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("doc_id", "text")
    val sf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(crafted, sf)) {
      val base = docs.select(col("doc_id"),
        graft.functions.TextFns.tokens(col("text")).as("t"))
      val diff = base.select(col("doc_id"),
          graft.functions.CdcCuts.of(col("t"),
            graft.operators.TextAnalysis.CdcWin,
            graft.operators.TextAnalysis.CdcMask).as("native"),
          graft.operators.TextAnalysis.cdcCutsComposable.as("hof"))
        .filter(not(col("native") <=> col("hof")))
        .collect()
      assert(diff.isEmpty, s"cut mismatch on ${diff.take(3).mkString("; ")}")
    }
  }

  test("CharStats == explode formulation == HOF fold, on crafted and real docs (count/distinct/entropy bit-exact)") {
    import spark.implicits._
    // crafted edges: single symbol (entropy 0), uniform 2/4/37-symbol
    // alphabets (exact log2 points), skewed rationals, long repeats
    val crafted = Seq(
      (1L, "aaaaaaaa"),
      (2L, "abababab"),
      (3L, "abcd" * 25),
      (4L, ('a' to 'z').mkString + "0123456789_"),
      (5L, "a" * 999 + "b"),
      (6L, "the quick brown fox jumps over the lazy dog 0123456789"),
      (7L, "x"),
      (8L, ("z9_" * 7) + "qq")).toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(crafted, real)) {
      val native = graft.operators.TextAnalysis.charEntropyOf(docs)
        .as[(Long, Long, Long, Double)].collect().toSet
      val explode = graft.operators.TextAnalysis.charEntropyExplodeRef(docs)
        .as[(Long, Long, Long, Double)].collect().toSet
      val hof = graft.streaming.EventStream.charEntropyScoreHof(docs)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(native == explode,
        s"native vs explode: only-native=${(native -- explode).take(3)}, only-explode=${(explode -- native).take(3)}")
      assert(native == hof,
        s"native vs hof: only-native=${(native -- hof).take(3)}, only-hof=${(hof -- native).take(3)}")
    }
  }

  test("CdcCuts: null array elements match array_join semantics (skipped with their delimiter), no NPE") {
    import spark.implicits._
    // arrays with nulls in every position class: leading, interior,
    // trailing, all-null, null inside the first window
    val rows: Seq[(Long, Seq[String])] = Seq(
      (1L, Seq(null, "a", "b", "c", "d", "e", "f")),
      (2L, Seq("a", "b", null, "c", "d", null, "e", "f", "g")),
      (3L, Seq("a", "b", "c", "d", "e", null)),
      (4L, Seq(null, null, null, null, null)),
      (5L, (0 until 30).map(i => if (i % 5 == 0) null else s"w$i")))
    val base = rows.toDF("doc_id", "t")
    val diff = base.select(col("doc_id"),
        graft.functions.CdcCuts.of(col("t"),
          graft.operators.TextAnalysis.CdcWin,
          graft.operators.TextAnalysis.CdcMask).as("native"),
        graft.operators.TextAnalysis.cdcCutsComposable.as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .collect()
    assert(diff.isEmpty, s"null-element cut mismatch on ${diff.take(3).mkString("; ")}")
  }
}
