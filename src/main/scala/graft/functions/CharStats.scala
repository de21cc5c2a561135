package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass character-distribution statistics over a string:
  * total character count, distinct character count, and the Shannon
  * entropy of the per-character distribution under the EXACT
  * `text_char_entropy` recipe (TextAnalysis round 17): per-character
  * terms `-(p)·log2(p)` round at 8 dp as doubles, are summed EXACTLY
  * as DECIMAL(28,12) (order-free), and the sum rounds at 4 dp.
  *
  * Replaces the gated batch form's corpus-characters explode (one row
  * per character of the corpus — shuffle volume was bounded by the
  * (doc,char) map-side combine, but the explode volume was honest-
  * linear in characters) and the streaming twin's higher-order-function
  * fold (HOF lambdas evaluate INTERPRETED, and its `size(filter(cs,
  * _ === c))` per distinct character was O(37·n) per row). One fused
  * pass per document, inside whole-stage codegen, zero explode, zero
  * shuffle — the CdcCuts treatment (PLANS.md per-gram-string tax).
  *
  * Bit-compatibility contract (differential-spec'd against BOTH prior
  * formulations; the unchanged DuckDB oracle re-gates the entry):
  * characters are CODE POINTS of the input string (`split(st, '')`
  * semantics — the gated alphabet is ASCII `[a-z0-9_]` so units and
  * points coincide; code points keep regen corpora unambiguous),
  * p = cnt/n in double arithmetic, log2(x) = log(x)/log(2), rounding
  * HALF_UP via BigDecimal at each stage exactly like Spark's `round`
  * and double→DECIMAL(28,12) cast. Empty strings yield (0, 0, 0.0) —
  * callers filter like the prior forms did. */
case class CharStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    CharStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

object CharStats {

  private val Ln2 = java.lang.Math.log(2.0)

  private def roundHalfUp(d: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Static entry point for interpreted eval and codegen. */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    // per-code-point counts; the gated alphabet is 37 ASCII symbols so
    // a small map stays small — sized generously for regen corpora
    val counts = new java.util.HashMap[Integer, Long](64)
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var entropy = java.math.BigDecimal.ZERO
    if (n > 0L) {
      val it = counts.values().iterator()
      while (it.hasNext) {
        val cnt = it.next()
        val p = cnt.toDouble / n
        // the declarative recipe verbatim: round8 the double term, then
        // the exact double→DECIMAL(28,12) cast (round8 output has ≤8 dp,
        // so setScale(12) is lossless), summed exactly
        val term = roundHalfUp(-p * (java.lang.Math.log(p) / Ln2), 8)
        entropy = entropy.add(
          java.math.BigDecimal.valueOf(term)
            .setScale(12, java.math.RoundingMode.HALF_UP))
      }
    }
    new GenericInternalRow(Array[Any](
      n, counts.size().toLong, roundHalfUp(entropy.doubleValue(), 4)))
  }

  /** Column builder over a string column. */
  def of(s: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CharStats(ColumnBridge.expression(s)))
  }
}
