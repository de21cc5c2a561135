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
}
