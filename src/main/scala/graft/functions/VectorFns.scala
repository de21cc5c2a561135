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

  /** Sequential-fold dot product over two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded for engine-portable comparison/ranking. */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)
}
