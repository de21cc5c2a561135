package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Differential proof for [[TextFns.tokensScriptWords]] (r20): the
  * word-run-only extraction is token-for-token identical to extracting
  * the full script alternation and filtering out the unspaced
  * singletons — on every fixture doc (documents ∪ held-out ∪ seed
  * prose ∪ garble twins at sf0.001) and on crafted mixed-script edges
  * (runs bounded by unspaced codepoints, punctuation, string ends;
  * casing; empty/whitespace/singleton-only strings). */
class SegWordsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private def viaFilter(c: org.apache.spark.sql.Column) =
    filter(TextFns.tokensScript(c), x => !x.rlike(TextFns.UnspacedSingletonPattern))

  test("extraction == filter on the full multilingual fixture corpus") {
    val docs = graft.operators.TextAnalysis
      .mlDocs3(spark, "/root/testdata/sf0.001")
    val n = docs
      .select(viaFilter(col("text")).as("a"),
        TextFns.tokensScriptWords(col("text")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(n == 0)
  }

  test("extraction == filter on crafted mixed-script edges") {
    val rows = Seq(
      "Hello世界foo bar日本語baz",       // runs bounded by unspaced codepoints
      "naïve поезд שלום العربية देवनागरी", // spaced-script runs stay whole
      "日本語",                            // singletons only → empty
      "",                                  // empty
      "   ",                               // whitespace only
      "MiXeD世CaSe界RUNS",                 // ASCII lowering inside runs
      "a中b中c",                           // 1-char runs between singletons
      "ก ข ค abcไทย",                      // Thai singletons + trailing run
      "x" * 300 + "界" + "y" * 300         // long runs
    )
    val df = rows.toDF("text")
      .select(viaFilter(col("text")).as("a"),
        TextFns.tokensScriptWords(col("text")).as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() == 0)
  }
}
