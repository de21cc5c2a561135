package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.functions.TextFns
import graft.sinks.DocumentExportSink

/** Source adapter for wikir/ir-datasets-shaped document tables
  * (api.py:193-383, 491-567): docs carry a `doc_id` plus an open set of
  * optional attributes — `title`, `url`, `text`, `body`, and anything
  * else — and the reference resolves what to display per document with
  * an attribute-fallback chain evaluated row by row. Here the "attributes"
  * are columns, so the chain becomes a codegen'd CASE cascade and the
  * whole normalization is one narrow projection over the scan — no
  * driver-side iteration, works at any corpus size.
  *
  * Fallback chains (api.py:262-306):
  *   title:   title → "URL: "+url → "Document "+doc_id, truncated to 80
  *            chars; if the result has codepoints outside latin-1 the
  *            whole title is ASCII-sanitized (api.py:271-277).
  *   content: text → body → "Available attributes:" dump of every other
  *            non-empty string column (dir()-ordered = sorted by name,
  *            each value capped at 100 chars + "...") → "No text content
  *            available for this document"; then html-unescape, ASCII
  *            sanitize, truncate to 50 000 (api.py:311-331).
  */
object WikirSource {

  /** Normalize any wikir-shaped DataFrame to (doc_id, filename, title,
    * content) with the reference's per-row fallback chains. */
  def normalize(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    def opt(name: String): Column =
      if (cols(name)) col(name).cast("string") else lit(null).cast("string")
    def nonEmpty(c: Column): Column = c.isNotNull && length(c) > 0

    val title0 =
      when(nonEmpty(opt("title")), opt("title"))
        .when(nonEmpty(opt("url")), concat(lit("URL: "), opt("url")))
        .otherwise(concat(lit("Document "), col("doc_id").cast("string")))
    val t80 = substring(title0, 1, 80)
    // api.py:271-277: sanitize only when latin-1 encoding would fail
    val title = when(t80.rlike("[^\\x00-\\xFF]"), TextFns.asciiSanitize(t80))
      .otherwise(t80)

    // attribute dump: every other string column, sorted (python dir()
    // returns sorted names), non-empty, values capped at 100 chars
    val attrCols = df.schema.fields
      .filter(f => f.dataType == StringType)
      .map(_.name)
      .filterNot(Set("title", "url", "text", "body").contains)
      .sorted
    val attrDump =
      if (attrCols.isEmpty) lit(null).cast("string")
      else {
        val entries = attrCols.map { n =>
          when(nonEmpty(col(n)),
            concat(lit(n + ": "),
              when(length(col(n)) > 100, concat(substring(col(n), 1, 100), lit("...")))
                .otherwise(col(n))))
        }
        val joined = array_join(filter(array(entries: _*), _.isNotNull), "\n\n")
        when(length(joined) > 0, concat(lit("Available attributes:\n\n"), joined))
      }

    val content0 =
      when(nonEmpty(opt("text")), opt("text"))
        .when(nonEmpty(opt("body")), opt("body"))
        .otherwise(coalesce(attrDump, lit("No text content available for this document")))
    val content = TextFns.truncateContent(
      TextFns.asciiSanitize(TextFns.htmlUnescape(content0)))

    df.select(
      col("doc_id").cast("long").as("doc_id"),
      concat(lit("wikir_"), col("doc_id").cast("string"), lit(".pdf")).as("filename"),
      title.as("title"),
      content.as("content"))
  }

  /** Full wikir extract (api.py:193-383): normalize, take the first
    * `limit` docs in doc_id order (the deterministic analog of the
    * reference's docs_iter() prefix; hard cap 500 like MAX_DOCS), export
    * one PDF per doc. Returns the output manifest. */
  def extract(spark: SparkSession, df: DataFrame, outputDir: String,
              limit: Int = 100): DataFrame = {
    val capped = math.min(limit, 500)
    val docs = normalize(df).orderBy(col("doc_id")).limit(capped)
      // the global top-n collapses to one partition — spread back out so
      // the per-doc file sink writes in parallel
      .repartition(math.max(spark.sparkContext.defaultParallelism, 4))
    DocumentExportSink.export(docs, outputDir,
      DocumentExportSink.PdfRenderer, prefix = "wikir")
  }
}
