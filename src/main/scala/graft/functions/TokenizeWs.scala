package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native reference-faithful tokenizer (api.py:470-489).
  *
  * Semantics identical to
  * `filter(split(lower(regexp_replace(c, "[^\w\s]", " ")), "\s+"), _ != "")`:
  * since `\w` is ASCII `[0-9A-Za-z_]` and every non-`\w`-non-`\s` char
  * becomes a separator before splitting, tokens are exactly the maximal
  * runs of `[0-9A-Za-z_]`, lowercased. One char scan per row instead of
  * two regex passes + a lambda filter — the tokenizer feeds a dozen
  * operators (counts, stats, shingles, fingerprints, lang-id, histogram),
  * so the scan is the hot loop of the whole text suite. Codegen emits a
  * static call, keeping whole-stage codegen unbroken.
  */
case class TokenizeWs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenizeWs.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeWs.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeWs =
    copy(child = newChild)
}

object TokenizeWs {
  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** Static entry point used by both interpreted eval and codegen. */
  def tokenize(s: UTF8String): ArrayData = {
    // UTF-8 multi-byte sequences have the high bit set on every byte, so
    // they can never satisfy isWordByte — byte-level scanning is safe.
    val bytes = s.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && !isWordByte(bytes(i))) i += 1
      val start = i
      while (i < n && isWordByte(bytes(i))) i += 1
      if (i > start) {
        val tok = new Array[Byte](i - start)
        var k = 0
        while (k < i - start) {
          val b = bytes(start + k)
          tok(k) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          k += 1
        }
        out += UTF8String.fromBytes(tok)
      }
    }
    new GenericArrayData(out.toArray)
  }
}
