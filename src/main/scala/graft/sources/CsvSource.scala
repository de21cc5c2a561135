package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink — interchange with spreadsheet/warehouse tooling
  * (the reference's pandas world reads and writes CSV freely; this is
  * the Spark-native twin). Both directions distributed: one part file
  * per partition out, per-line splits in.
  *
  * Two rules, both scale-driven and both the same philosophy as
  * [[JsonlSource]]:
  *
  *  1. Reads take an EXPLICIT schema. CSV carries no types at all —
  *     inference is an extra full pass AND sample-dependent.
  *  2. `multiLine` is an OPT-IN flag, default false. RFC-4180 quoting
  *     lets a field carry embedded newlines, but a reader that honors
  *     that cannot split a file on line boundaries — each file becomes
  *     one task. Flat scalar frames (the common CSV payload) stay
  *     splittable with the default; corpora with newline-bearing text
  *     should travel as JSONL (line-escaped by construction), not CSV.
  *
  * Null vs empty string: CSV's classic ambiguity ("" means which?).
  * Spark's writer emits nulls as the `nullValue` token and the reader
  * maps that token back — but BOTH default to "", silently collapsing
  * empty strings to null across a roundtrip. We pin the sentinel `\N`
  * (the Hive/MySQL dump convention) on both sides so `""` and NULL
  * survive as themselves. The residual, inherent to CSV: a field whose
  * literal TEXT is exactly `\N` reads back as NULL (the token is
  * matched after unquoting, so quoting can't protect it) — pinned by
  * spec as the documented boundary; data that can carry the sentinel
  * literally should travel as JSONL. Roundtrip identity (values AND
  * types) is driver-gated via `csv_roundtrip` against the documents
  * parquet.
  */
object CsvSource {

  private val NullToken = "\\N"

  /** Write RFC-4180 CSV with a header row, distributed; quotes and
    * embedded quote chars are escaped by doubling (`escape` = `"`,
    * the RFC form, not the backslash default). Spark's CSV writer
    * TRIMS leading/trailing field whitespace by default — a silent
    * value mutation — so both ignore*WhiteSpace flags are pinned off
    * (spec: "trailing space " survives). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", NullToken)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Read CSV with a pinned schema (never inferred — see above).
    * `multiLine=true` only for quoted-newline payloads, accepting the
    * per-file (non-splittable) task granularity that implies. */
  def read(spark: SparkSession, path: String, schema: StructType,
           multiLine: Boolean = false, mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", NullToken)
      .option("multiLine", multiLine.toString)
      .option("mode", mode)
      .csv(path)
}
