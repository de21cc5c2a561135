package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as codegen'd higher-order functions — no UDFs.
  *
  * Everything is computed in double (the parquet columns are float32;
  * float accumulation would neither match the oracle nor be stable), with
  * a strictly sequential `aggregate` fold so results are reproducible.
  */
object VectorFns {

  /** float[] → double[] element cast. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential dot product over two double arrays — a native codegen'd
    * [[DotProduct]] expression (bit-identical to the composable
    * `aggregate(zip_with(...))` fold, ~10× faster at pair-join volume). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded for engine-portable comparison/ranking. */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)

  /** Unit-normalize against a pre-materialized norm column (materialize
    * the norm with withColumn first — an expression inside the transform
    * lambda would re-evaluate per element). Pairwise cosine over
    * normalized vectors is then a single dot fold instead of three
    * array reductions per pair. */
  def normalize(v: Column, materializedNorm: Column): Column =
    transform(v, x => x / materializedNorm)

  /** Cosine of pre-normalized vectors, rounded like cosine6. */
  def dot6(a: Column, b: Column): Column = round(dot(a, b), 6)
}
