package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Reader for the RAW wikIR on-disk distribution — the exact files the
  * reference's `ir_datasets.load("wikir/...")` call iterates
  * (api.py:219-232). Closes the last format gap: a user holding a raw
  * wikIR download needed a parquet-conversion step before
  * [[WikirSource]] could see it; this reads the distribution directly.
  *
  * The layout is public (wikIR builder, github.com/getalp/wikIR — Frej
  * et al., LREC 2020 — and the ir_datasets wikir integration that
  * parses its output):
  *
  * {{{
  *   <root>/documents.csv            header id_right,text_right
  *   <root>/<split>/queries.csv      header id_left,text_left
  *   <root>/<split>/qrels            TREC qrels: qid iter docid rel
  * }}}
  *
  * with split ∈ {training, validation, test}. The CSVs are pandas
  * `to_csv` output: RFC-4180 quoting (fields quoted when they carry
  * commas/quotes/newlines, embedded quotes doubled), UTF-8, header row.
  * qrels is whitespace-separated, one judgment per line.
  *
  * Scale notes, same philosophy as [[CsvSource]]:
  *  - Schemas are PINNED (ids long, text string) — never inferred; CSV
  *    carries no types and inference is an extra sample-dependent pass.
  *  - `multiLine` is opt-in, default false: wikIR's builder strips
  *    newlines from document text, so the distributed line-splittable
  *    parse is both correct and the scale path for the one corpus-sized
  *    file (documents.csv). Quoted-newline payloads from OTHER
  *    wikIR-shaped exports flip the flag and accept one task per file.
  *  - qrels/queries are split-sized (thousands of rows) — read
  *    distributed anyway, they join against corpus-sized frames.
  */
object WikirRawSource {

  val documentsSchema: StructType = StructType(Seq(
    StructField("id_right", LongType), StructField("text_right", StringType)))

  val queriesSchema: StructType = StructType(Seq(
    StructField("id_left", LongType), StructField("text_left", StringType)))

  private def csv(spark: SparkSession, path: String, schema: StructType,
                  multiLine: Boolean): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")          // RFC-4180 doubled-quote escaping
      .option("multiLine", multiLine.toString)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("mode", "FAILFAST")      // a malformed corpus file should fail loudly
      .csv(path)

  /** `<root>/documents.csv` → (doc_id, text). */
  def readDocuments(spark: SparkSession, root: String,
                    multiLine: Boolean = false): DataFrame =
    csv(spark, s"$root/documents.csv", documentsSchema, multiLine)
      .select(col("id_right").as("doc_id"), col("text_right").as("text"))

  /** `<root>/<split>/queries.csv` → (query_id, query_text). */
  def readQueries(spark: SparkSession, root: String, splitName: String,
                  multiLine: Boolean = false): DataFrame =
    csv(spark, s"$root/$splitName/queries.csv", queriesSchema, multiLine)
      .select(col("id_left").as("query_id"), col("text_left").as("query_text"))

  /** `<root>/<split>/qrels` → (query_id, iteration, doc_id, relevance).
    * TREC qrels: four whitespace-separated fields per line; blank lines
    * skipped. Tabs and spaces both occur in the wild — split on runs of
    * either. */
  def readQrels(spark: SparkSession, root: String, splitName: String): DataFrame = {
    // FAILFAST parity with the CSV readers above: text+split+cast would
    // otherwise turn a malformed line (<4 fields, non-numeric ids/rel)
    // into silent nulls that vanish in downstream joins. The guard is a
    // FILTER (`assert_true(...).isNull` — null on success, throws on a bad
    // line), not a projection: a filter predicate survives column pruning,
    // so even a consumer that prunes every output column (df.count(), an
    // existence-only join) still validates each line. Reader stays lazy and
    // single-pass — no eager validation count() scanning the file twice.
    val f = split(trim(col("value")), "\\s+")
    val qid = element_at(f, 1).cast("long")
    val did = element_at(f, 3).cast("long")
    val rel = element_at(f, 4).cast("long")
    val guard = assert_true(
      size(f) >= 4 && qid.isNotNull && did.isNotNull && rel.isNotNull,
      concat(lit(s"qrels $root/$splitName/qrels: malformed line '"),
        col("value"),
        lit("' (expected: <qid> <iteration> <docid> <relevance> per line)")))
    spark.read.text(s"$root/$splitName/qrels")
      .filter(length(trim(col("value"))) > 0)
      .filter(guard.isNull)
      .select(
        qid.as("query_id"),
        element_at(f, 2).as("iteration"),
        did.as("doc_id"),
        rel.as("relevance"))
  }

  /** Raw distribution → the normalized (doc_id, filename, title,
    * content) frame every wikir tail consumes. Raw wikIR docs carry
    * only (id, text), so the reference's fallback chain resolves title
    * to "Document {id}" — same rows the parquet-snapshot path yields on
    * identical data ([[WikirSource.normalize]] is shared, not
    * reimplemented). */
  def load(spark: SparkSession, root: String,
           multiLine: Boolean = false): DataFrame =
    WikirSource.normalize(readDocuments(spark, root, multiLine))

  // ---- fixture renderers ----------------------------------------------
  // Hand-rolled RFC-4180 so specs exercise OUR reader against text
  // produced independently of Spark's CSV writer (writer-vs-reader of
  // the same library would be a vacuous roundtrip).

  private[graft] def csvQuote(s: String): String =
    if (s == null) ""
    else if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  def renderDocumentsCsv(rows: Seq[(Long, String)]): String =
    ("id_right,text_right" +: rows.map { case (id, t) => s"$id,${csvQuote(t)}" })
      .mkString("", "\n", "\n")

  def renderQueriesCsv(rows: Seq[(Long, String)]): String =
    ("id_left,text_left" +: rows.map { case (id, t) => s"$id,${csvQuote(t)}" })
      .mkString("", "\n", "\n")

  def renderQrels(rows: Seq[(Long, Long, Long)]): String =
    rows.map { case (qid, did, rel) => s"$qid\t0\t$did\t$rel" }
      .mkString("", "\n", "\n")
}
