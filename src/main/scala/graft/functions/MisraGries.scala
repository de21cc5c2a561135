package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a custom mergeable aggregation
  * expression — the 100 TB shape of "top tokens": exact counting needs a
  * full groupBy over every distinct token; the sketch keeps a bounded
  * `capacity`-entry summary per partition, combines map-side, and
  * guarantees (classic MG bounds, public algorithm):
  *   - every item with true count > n/capacity survives;
  *   - every reported estimate e satisfies  true ≥ e ≥ true − n/capacity.
  *
  * This demonstrates the third Catalyst extension axis the engine uses
  * (scalar codegen expressions, a physical operator, and now a
  * TypedImperativeAggregate with partial-merge state). Counts depend on
  * partition merge order (bounded, not exact) → rows-only gate + spec
  * asserting the error bounds against the exact histogram.
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesTopK.Buffer] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType), StructField("est", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): MisraGriesTopK.Buffer =
    new MisraGriesTopK.Buffer(capacity)

  override def update(b: MisraGriesTopK.Buffer, input: InternalRow): MisraGriesTopK.Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString, 1L)
    b
  }

  override def merge(b: MisraGriesTopK.Buffer, o: MisraGriesTopK.Buffer): MisraGriesTopK.Buffer = {
    o.counts.foreach { case (t, c) => b.add(t, c) }
    b
  }

  /** Entries sorted by estimate desc then token — deterministic GIVEN
    * the buffer contents (the contents themselves carry MG error). */
  override def eval(b: MisraGriesTopK.Buffer): Any = {
    val rows = b.counts.toSeq.sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(b: MisraGriesTopK.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (t, c) =>
      val bytes = t.getBytes(UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesTopK.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MisraGriesTopK.Buffer(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val tb = new Array[Byte](len); in.readFully(tb)
      b.counts.update(new String(tb, UTF_8), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = c.head)
}

object MisraGriesTopK {

  /** Bounded counter map with the MG decrement rule: adding a new key to
    * a full buffer decrements every counter by the evicted weight
    * instead of growing — each decrement "pairs up" capacity+1 distinct
    * items, which is what yields the n/capacity error bound. */
  final class Buffer(capacity: Int) {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]

    def add(token: String, weight: Long): Unit = {
      counts.get(token) match {
        case Some(c) => counts.update(token, c + weight)
        case None if counts.size < capacity => counts.update(token, weight)
        case None =>
          // decrement-all by the smallest of (weight, current min);
          // repeat until the new item is absorbed or fully cancelled
          var w = weight
          while (w > 0) {
            val minC = counts.valuesIterator.min
            val dec = math.min(w, minC)
            var emptied = false
            counts.mapValuesInPlace((_, c) => c - dec)
            counts.filterInPlace { (_, c) => val keep = c > 0; emptied |= !keep; keep }
            w -= dec
            if (w > 0 && counts.size < capacity) {
              counts.update(token, w)
              w = 0
            } else if (!emptied && w > 0) {
              // full and nothing evicted can't happen (dec == minC empties
              // at least one entry); guard against infinite loop anyway
              w = 0
            }
          }
      }
    }
  }

  /** Column builder: `mg_topk(tokenCol, capacity)` aggregate. */
  def of(token: Column, capacity: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      MisraGriesTopK(ColumnBridge.expression(token), capacity).toAggregateExpression())
  }
}
