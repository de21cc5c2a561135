package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, Predicate, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

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
    * 8 bits/key ≈ 2% fpp, 1 MB per million keys.
    *
    * CLAMP WARNING (measured, ScaleBloom): the aggregate silently caps
    * both arguments at `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems` / `.maxNumBits` (defaults 4 M / 8 MiB — sized for
    * the optimizer's injected per-join filters, not for catalog-scale
    * builds). A 10 M-key build under default caps degrades to ~11%
    * fpp with no error; raise the confs for catalogs past 4 M keys. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(c))),
        Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())

  /** Probe a serialized filter: true = MAYBE member, false = definitely
    * not. The filter bytes ride as a binary plan literal — fine at the
    * withCodebook literal budget (≤ ~1 MiB), but a LITERAL is part of
    * every stage's task binary and is deserialized PER TASK: measured
    * in ScaleBloom, a 9 MiB filter probed across a 6-stage plan cost
    * ~20 s of pure task-deser (32 tasks × stages × 9 MiB). Past the
    * literal budget use [[mightContainBc]]. */
  def mightContain(filterBytes: Array[Byte], c: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        Literal(filterBytes, BinaryType),
        new XxHash64(Seq(ColumnBridge.expression(c)))))

  /** Broadcast-handle probe for big filters: the expression carries only
    * the `Broadcast` handle (bytes move once per executor via torrent),
    * and deserialization into the probe-ready [[BloomFilter]] happens
    * ONCE PER JVM through [[filterFor]]'s id-keyed cache — not per task,
    * not per stage. Same xxhash64 semantics as [[mightContain]], so the
    * two forms are value-interchangeable (BloomSpec). */
  def mightContainBc(filter: Broadcast[Array[Byte]], c: Column): Column =
    ColumnBridge.column(
      BloomProbeBroadcast(filter,
        new XxHash64(Seq(ColumnBridge.expression(c)))))

  /** Broadcast a serialized filter for [[mightContainBc]] — call once,
    * probe from every later batch (the serve amortization). */
  def broadcastFilter(spark: SparkSession, bytes: Array[Byte]): Broadcast[Array[Byte]] =
    spark.sparkContext.broadcast(bytes)

  // once-per-JVM deserialized-filter cache, keyed by broadcast id (ids
  // are unique per SparkContext; entries are a few MiB and bounded by
  // the number of DISTINCT filters a process serves — catalog-count,
  // not batch-count)
  private val filterCache =
    new java.util.concurrent.ConcurrentHashMap[Long, BloomFilter]()
  private[graft] def filterFor(b: Broadcast[Array[Byte]]): BloomFilter =
    filterCache.computeIfAbsent(b.id,
      _ => BloomFilter.readFrom(new java.io.ByteArrayInputStream(b.value)))
}

/** `might_contain` over a broadcast filter handle — see
  * [[Bloom.mightContainBc]]. `child` must be the xxhash64 of the probed
  * value (LongType), mirroring Spark's own BloomFilterMightContain
  * contract so the two probe forms agree bit-for-bit. */
case class BloomProbeBroadcast(filter: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(h: Any): Any = probe(h.asInstanceOf[Long])

  def probe(h: Long): Boolean = Bloom.filterFor(filter).mightContainLong(h)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomProbeBroadcast].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeBroadcast =
    copy(child = newChild)
}
