package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) source/sink — the de-facto
  * interchange format of LLM training corpora (each line one document,
  * text + metadata). Spark's native JSON datasource IS line-delimited
  * JSON by default, so both directions are fully distributed: the
  * writer emits one part file per partition (no driver funnel), the
  * reader splits by line. The ONE rule this wrapper enforces: reads
  * take an EXPLICIT schema. Schema inference is a full extra pass over
  * the data at 100 TB, and worse, it is sample-dependent — a column
  * that is integral in the sampled lines and fractional later silently
  * flips types between runs. Roundtrip identity (values AND types) is
  * driver-gated via `jsonl_roundtrip` against the documents parquet.
  */
object JsonlSource {

  /** Write one JSON object per row, one line each, distributed. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSONL with a pinned schema (never inferred — see above).
    * `columnNameOfCorruptRecord` stays at Spark's default PERMISSIVE
    * null-fill; pipelines wanting hard failure pass FAILFAST. */
  def read(spark: SparkSession, path: String, schema: StructType,
           mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)
}
