package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native one-pass MinHash signature (k=32 permutations, 8×4 banding
  * downstream). Replaces the composable formulation — explode shingles →
  * `pmod(xxhash64(s), P)` → groupBy(doc) with 32 min aggregates — which
  * shuffles the ENTIRE shingle table just to reduce it per-doc. As a
  * per-row expression the signature costs one scan with zero shuffle,
  * and whole-stage codegen keeps it fused with the tokenizer
  * ([[TokenizeWs]]) that feeds it.
  *
  * Bit-compatibility contract (property-spec'd): per element,
  * `h = xxhash64(s)` with Spark's seed 42, `x = pmod(h, P)`,
  * `m_i = min(pmod(x·a_i + b_i, P))` with the same (a_i, b_i) constants
  * the composable path used — so signatures, band hashes, and every
  * gated output downstream are byte-identical. Duplicate shingles can't
  * change a minimum, so the input array needs no `array_distinct`.
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSignature.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val P = 2147483647L // 2^31 - 1
  val K = 32

  // identical constant stream to the round-1 composable path: permA
  // fully drawn before permB from Random(42)
  val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(K)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
     Array.fill(K)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Static entry point for interpreted eval and codegen. Empty input
    * yields an all-P sentinel signature (P > any pmod result) — callers
    * exclude empty-shingle docs, matching the groupBy path where such
    * docs simply had no row. */
  def signature(arr: ArrayData): ArrayData = {
    val mins = Array.fill(K)(P)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val x = ((h % P) + P) % P
      var j = 0
      while (j < K) {
        // x, a, b ≥ 0 and x·a < 2^62: plain % is pmod, no overflow
        val v = (x * permA(j) + permB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column builder: 32-long signature of an array<string> column.
    * CAUTION: reference the result exactly once per projection —
    * Catalyst's projection collapse inlines the expression into every
    * reference, recomputing the full pass each time (measured 6× slower
    * when the 8 band extracts each re-derived it). Band hashing should
    * go through [[MinHashBands]], whose generator child evaluates once. */
  def of(shingles: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles)))
  }
}

/** Signature + banding fused: array of 8 band hashes (4 minima per
  * band, comma-joined decimal string, xxhash64 with Spark's seed — the
  * byte-identical formulation of the previous
  * `xxhash64(concat_ws(",", m0..m3))` columns). Emitting the bands as
  * ONE array lets callers `posexplode` it — a generator child is
  * evaluated once per row, immune to the projection-collapse
  * recomputation that hits multi-referenced scalar expressions. An
  * empty shingle array yields an empty band array, so shingle-less docs
  * drop out of the explode exactly like the groupBy path dropped them. */
case class MinHashBands(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashBands.bands(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashBands.bands($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  import org.apache.spark.unsafe.Platform

  val Bands = 8
  val RowsPerBand = 4

  def bands(arr: ArrayData): ArrayData = {
    if (arr.numElements() == 0) return new GenericArrayData(Array.empty[Long])
    val sig = MinHashSignature.signature(arr)
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      // byte-identical to concat_ws(",", m0..m3) over long columns:
      // decimal Long.toString, comma-joined, xxhash64 seed 42
      val sb = new java.lang.StringBuilder(48)
      var r = 0
      while (r < RowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(sig.getLong(b * RowsPerBand + r))
        r += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out(b) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      b += 1
    }
    new GenericArrayData(out)
  }

  def of(shingles: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashBands(ColumnBridge.expression(shingles)))
  }
}
