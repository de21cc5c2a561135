package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass char-ngram NB language scoring: all 2/3/4-gram md5
  * buckets of the (normalized) input string, folded into one exact
  * per-class score sum — array<struct<<lang>_bits double …>> with
  * EXACTLY ONE element, so callers `inline()` it and the expression
  * evaluates once per row inside the Generate operator (the
  * WinnowFps/MinHashSignature projection-collapse lesson: a
  * multi-referenced scalar would re-inline the whole md5 tree per
  * referenced field).
  *
  * Replaces the composable formulation (per-gram substr → md5 hex →
  * conv → per-(doc,bucket) aggregate → broadcast-join → 4 decimal
  * sums), which paid ~37 s at sf0.1 building ~4.4 M gram strings, hex
  * strings and conv parses. One imperative pass with a reused digest
  * over the string's UTF-8 bytes cuts that to the raw md5 cost.
  *
  * Bit-compatibility contract (differential-spec'd vs the decimal-fold
  * formulation, and hash-gated vs the DuckDB groupBy oracle):
  *  - grams are CODE-POINT substrings (Spark substr / DuckDB substr
  *    semantics) — the byte walk tracks code-point starts, and a gram's
  *    md5 input is exactly the UTF-8 bytes of "nblang:" + gram;
  *  - bucket = (first 15 md5 hex chars base-16) % B — 60 bits from
  *    digest bytes 0..6 plus the high nibble of byte 7, non-negative;
  *  - λ values are 8-dp decimals, carried as Longs in 1e-8 units, so
  *    the per-class sum is EXACT integer arithmetic ≡ the DECIMAL(28,12)
  *    fold ≡ the gated entry's c·λ decimal aggregate (addition over a
  *    common 1e-8 grid is associative and exact);
  *  - bits = sum rounded HALF-AWAY-FROM-ZERO at 4 dp via integer
  *    quotient/remainder ≡ decimal round(…, 4), then one exact
  *    quotient-by-1e4 double division (IEEE correctly rounded, same
  *    double as decimal→double).
  * Strings with fewer than 2 code points yield an EMPTY array — inline
  * drops the row, matching the gated entry's zero-gram-doc drop. */
case class NbLangBits(child: Expression, langs: Seq[String],
                      lamScaled: Array[Array[Long]], buckets: Int)
    extends UnaryExpression {
  require(langs.length == lamScaled.length &&
    lamScaled.forall(_.length == buckets),
    s"model shape mismatch: ${langs.length} langs, ${lamScaled.map(_.length).toSeq} x $buckets")

  /** BUCKET-major flat transpose of the per-class λ tables: the hot
    * loop touches one bucket × K classes per gram, so laying those K
    * longs contiguously turns K scattered array-of-array reads into
    * one cache line (round 16 — at K=20 the scorer went compute-bound
    * at sf10; same adds, same order per class, bit-identical sums). */
  @transient private lazy val flatLams: Array[Long] = NbLangBits.transpose(lamScaled, buckets)

  override def dataType: DataType = ArrayType(
    StructType(langs.map(l => StructField(s"${l}_bits", DoubleType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NbLangBits.bits(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      flatLams, langs.length, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbLamsFlat", flatLams, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NbLangBits.bits($c, $ref, ${langs.length}, $buckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): NbLangBits =
    copy(child = newChild)
}

object NbLangBits {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Prefix = "nblang:".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** `flat(b * k + c)` = λ of class c at bucket b. */
  private[functions] def transpose(lams: Array[Array[Long]], buckets: Int): Array[Long] = {
    val k = lams.length
    val flat = new Array[Long](buckets * k)
    var b = 0
    while (b < buckets) {
      var c = 0
      while (c < k) { flat(b * k + c) = lams(c)(b); c += 1 }
      b += 1
    }
    flat
  }

  /** Static entry point for interpreted eval and codegen. */
  def bits(s: org.apache.spark.unsafe.types.UTF8String,
           flat: Array[Long], k: Int, buckets: Int): ArrayData = {
    val bytes = s.getBytes
    // code-point start offsets (UTF-8 lead bytes), +1 sentinel end
    var ncp = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) ncp += 1
      i += 1
    }
    if (ncp < 2) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](ncp + 1)
    var cp = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(cp) = i; cp += 1 }
      i += 1
    }
    starts(ncp) = bytes.length
    val md = digest.get()
    val sums = new Array[Long](k)
    var n = 2
    while (n <= 4) {
      var g = 0
      val last = ncp - n
      while (g <= last) {
        md.reset()
        md.update(Prefix)
        md.update(bytes, starts(g), starts(g + n) - starts(g))
        val d = md.digest()
        // first 15 hex chars base-16: bytes 0..6 + high nibble of byte 7
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        v = (v << 4) | ((d(7) >> 4) & 0xfL)
        val base = (v % buckets).toInt * k
        var c = 0
        while (c < k) { sums(c) += flat(base + c); c += 1 }
        g += 1
      }
      n += 1
    }
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      // exact HALF-AWAY 4-dp round of the 1e-8-unit sum, then one exact
      // quotient-by-1e4 division (≡ decimal round + decimal→double)
      val x = sums(c)
      var q = x / 10000L
      val r = x % 10000L
      if (r >= 5000L) q += 1L else if (r <= -5000L) q -= 1L
      out(c) = q / 1e4
      c += 1
    }
    new GenericArrayData(Array[Any](new GenericInternalRow(out)))
  }

  /** Column builder over a normalized string column. `inline()` the
    * result — see the projection-collapse note above. */
  def of(s: Column, langs: Seq[String], lamScaled: Array[Array[Long]],
         buckets: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      NbLangBits(ColumnBridge.expression(s), langs, lamScaled, buckets))
  }
}
