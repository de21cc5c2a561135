package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the other columnar interchange format Spark ships
  * natively (Hive-ecosystem tooling reads/writes ORC where the rest of
  * the lake speaks parquet). Both directions distributed; predicate
  * pushdown and column pruning reach the ORC reader the same way they
  * reach parquet (stripe/row-group stats).
  *
  * Same read rule as the other sources here: EXPLICIT schema. ORC files
  * carry types, but pinning the schema keeps reads stable when a
  * directory mixes file generations (schema evolution lands as
  * null-filled columns, not a surprise merge pass).
  *
  * Spec-only component (SinksAndSqlSpec-style): the driver's DuckDB
  * oracle cannot read ORC, so the roundtrip is proven by a
  * value-and-type equality spec against the parquet-read frame instead
  * of a gated entry. */
object OrcSource {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
