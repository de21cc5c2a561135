package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass content-defined-chunking cut finder over a token
  * array: the 1-based positions j where a chunk boundary falls BEFORE
  * token j — j ≥ win and the md5-derived hash of the win-token window
  * ENDING at j is ≡ 0 mod mask (the `TextAnalysis.cdcChunkFrame` rule).
  *
  * Replaces the higher-order-function formulation (`filter(sequence(…),
  * j -> conv(substr(md5(array_join(slice(…))))…)`): HOF lambdas
  * evaluate interpreted, and each position built a window string, an
  * md5 HEX string, and a conv parse — the per-gram-string tax
  * (PLANS.md, rounds 9/15). Measured at the 1 M-doc corpus: the frame
  * alone paid ~72 s through the HOF chain; this one imperative pass
  * with a reused digest and a reused StringBuilder is the raw-md5
  * cost, fused into whole-stage codegen. (Windows overlap win−1 tokens
  * but md5 needs the full window bytes per call, so the hash cost
  * itself is irreducible without changing the gated rule.)
  *
  * Bit-compatibility contract (differential-spec'd vs the composable
  * formulation; the unchanged DuckDB oracle re-gates both consumers):
  * per window g = tokens[j-win+1..j] space-joined (1-based, inclusive),
  * hash = first 15 hex chars of md5(g) parsed base-16 (= bytes 0..6
  * plus the high nibble of byte 7 — 60 bits, sign-safe), cut iff
  * hash % mask == 0. Fewer than win tokens yields no cuts (one chunk).
  */
case class CdcCuts(child: Expression, win: Int, mask: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcCuts.cuts(input.asInstanceOf[ArrayData], win, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcCuts.cuts($c, $win, $mask)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point for interpreted eval and codegen. */
  def cuts(tokens: ArrayData, win: Int, mask: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < win) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val sb = new java.lang.StringBuilder(64)
    var out = new Array[Int](8)
    var cnt = 0
    var j = win // 1-based position of the window's LAST token
    while (j <= n) {
      sb.setLength(0)
      var i = j - win
      var first = true
      while (i < j) {
        // skip null elements WITH their delimiter — exactly what the
        // declarative twin's array_join(…, ' ') does (advice r17: the
        // old getUTF8String on a null slot NPE'd inside executor tasks,
        // a bit-compat divergence outside the gated all-non-null frame)
        if (!tokens.isNullAt(i)) {
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(i).toString)
          first = false
        }
        i += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars base-16 = bytes 0..6 + high nibble of byte 7
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0xfL)
      if (v % mask == 0) {
        if (cnt == out.length) out = java.util.Arrays.copyOf(out, cnt * 2)
        out(cnt) = j
        cnt += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt).map(x => x: Any))
  }

  /** Column builder: cut positions of an array<string> token column. */
  def of(tokens: Column, win: Int, mask: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CdcCuts(ColumnBridge.expression(tokens), win, mask))
  }
}
