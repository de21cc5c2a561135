package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's OWN runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the exact
  * expressions Catalyst's InjectRuntimeFilter plants under
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`), surfaced as an
  * explicit operator so a pipeline can build a filter ONCE, persist it
  * next to a catalog, and probe it across many later jobs — the
  * cross-job amortization the optimizer's per-query injection can't do.
  *
  * Contract notes (from the Spark source, not re-invented here):
  * - both sides key on `xxhash64(value)` — the build aggregates hashes,
  *   the probe tests hashes, so build and probe MUST use the same
  *   column expression;
  * - the aggregate's distributed form is per-partition filters merged
  *   by bit-OR (TypedImperativeAggregate), i.e. one narrow pass plus a
  *   driver-sized reduce — the corpus never shuffles to build it;
  * - `mightContain` has NO false negatives, bounded false positives —
  *   so a definite-miss is truth, and a hit needs an exact confirm if
  *   exactness matters (Dedup.bloomAntiJoin does exactly that).
  */
object Bloom {

  /** Aggregate a column into one serialized Bloom filter (binary).
    * `numBits` is the explicit memory budget: filters are driver/
    * broadcast objects, so callers size them like codebooks — e.g.
    * 8 bits/key ≈ 2% fpp, 1 MB per million keys. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(c))),
        Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())

  /** Probe a serialized filter: true = MAYBE member, false = definitely
    * not. The filter bytes ride as a binary plan literal — model-sized
    * by the `numBits` budget, the withCodebook trade. */
  def mightContain(filterBytes: Array[Byte], c: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        Literal(filterBytes, BinaryType),
        new XxHash64(Seq(ColumnBridge.expression(c)))))
}
