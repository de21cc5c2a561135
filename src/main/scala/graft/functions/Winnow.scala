package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass winnowing (Schleimer, Wilkerson & Aiken 2003) over a
  * token array: k-gram md5 hashes, sliding w-window minima with
  * rightmost tie-break, position-dedup'd — array<struct<pos,fp>>.
  *
  * Replaces the composable higher-order-function formulation (shingle
  * concat_ws → md5 hex → conv → per-window slice/array_min/filter),
  * which paid ~5 s at sf0.1 building ~1M intermediate gram strings, hex
  * strings, and per-window array allocations. One imperative pass with a
  * reused digest and a primitive long array cuts that to the raw md5
  * cost; whole-stage codegen keeps it fused with the scan.
  *
  * Bit-compatibility contract (differential-spec'd vs the composable
  * formulation): per gram g = tokens[i..i+k-1] space-joined,
  * fp = first 15 hex chars of md5("win:" + g) parsed base-16 (= bytes
  * 0..6 plus the high nibble of byte 7 — 60 bits, signed-safe); window
  * s ∈ [1, n_grams−w+1] selects min(gh[s..s+w−1]) with the RIGHTMOST
  * position on ties; duplicates dedup on position (the fingerprint at a
  * selected position is always gh[pos], so position-dedup ≡ the
  * (pos,fp)-array_distinct of the composable path), emitted in
  * ascending-position order (consumers sort/join — order-insensitive).
  */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowFps.fps(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFps.fps($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point for interpreted eval and codegen. Fewer than
    * k+w−1 tokens (i.e. fewer than w grams) yields an empty array —
    * explode then drops the row, matching the composable path's guard. */
  def fps(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val ng = n - k + 1
    if (ng < w) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val gh = new Array[Long](ng)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      sb.append("win:")
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars base-16 = bytes 0..6 + high nibble of byte 7
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      gh(i) = (v << 4) | ((d(7) >> 4) & 0xfL)
      i += 1
    }
    val sel = new Array[Boolean](ng)
    var cnt = 0
    var s = 0
    while (s <= ng - w) {
      var m = Long.MaxValue
      var p = -1
      var j = s
      while (j < s + w) {
        if (gh(j) <= m) { m = gh(j); p = j } // <= keeps the rightmost tie
        j += 1
      }
      if (!sel(p)) { sel(p) = true; cnt += 1 }
      s += 1
    }
    val out = new Array[Any](cnt)
    var idx = 0
    var q = 0
    while (q < ng) {
      if (sel(q)) {
        out(idx) = new GenericInternalRow(Array[Any](q + 1, gh(q))) // 1-based pos
        idx += 1
      }
      q += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder: winnowed fingerprints of an array<string> token
    * column. Reference the result once (or explode it) — projection
    * collapse inlines multi-referenced scalars (see MinHashSignature). */
  def of(tokens: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(tokens), k, w))
  }
}
