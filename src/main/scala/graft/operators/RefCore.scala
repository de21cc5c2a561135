package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{CisiSource, Tables, WikirRawSource}
import graft.sinks.MarkdownFileSink
import graft.functions.TextFns

/** Reference-derived core operators (SURVEY §2a) as oracle-checked
  * queries over the `documents` table.
  */
object RefCore {

  // ---- shared expressions (Spark side) --------------------------------

  private def mdColumn: Column = concat(
    lit("---\ndoc_id: "), col("doc_id").cast("string"),
    lit("\nlang: "), col("lang"),
    lit("\nsource: "), col("source"),
    lit("\nn_chars: "), col("n_chars").cast("string"),
    lit("\n---\n"), col("text"))

  // %04d is MIN-width like the reference's f"{i:04d}" — lpad would
  // TRUNCATE ranks beyond 9999 and collide filenames (found by the 50k-doc
  // scale test; Python zfill/%04d never truncate)
  private def filenameColumn: Column =
    concat(lit("paper_"), format_string("%04d", col("sample_rank")), lit(".md"))

  // ---- shared SQL fragments (DuckDB side) -----------------------------

  private val tokensSql =
    "list_filter(regexp_split_to_array(lower(regexp_replace(text, '[^\\w\\s]', ' ', 'g')), '\\s+'), x -> x <> '')"

  private val sampleSql = """
    SELECT doc_id, text, lang, source, n_chars,
           row_number() OVER (ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
    FROM documents
    ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 100"""

  private val mdSql =
    "'---' || chr(10) || 'doc_id: ' || CAST(doc_id AS VARCHAR)" +
      " || chr(10) || 'lang: ' || lang" +
      " || chr(10) || 'source: ' || source" +
      " || chr(10) || 'n_chars: ' || CAST(n_chars AS VARCHAR)" +
      " || chr(10) || '---' || chr(10) || text"

  private val filenameSql =
    "'paper_' || printf('%04d', sample_rank) || '.md'"

  /** Per-sfDir scratch dir for file-sink round trips — under the
    * conf-able cache root (round 18; the last caller family still
    * spelling `target/tmp` inline after the round-17 store-cache
    * port — on a cluster the gate scratch must land on a shared FS
    * like everything else). Round 19 (advice): namespaced under
    * `refcore_scratch/` so `Layout.gcStores` can age-sweep the fixture
    * dirs — directly under the root they were invisible to GC (not a
    * store family) and accumulated unboundedly on a shared FS. */
  private def scratch(spark: SparkSession, dir: String, name: String): String =
    s"${Layout.cacheRoot(spark)}/refcore_scratch/" +
      s"${name}_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  /** Driver-side fixture write through the path's own Hadoop FS (so a
    * non-local cache root works; Hadoop `create` makes parent dirs). */
  private def putText(spark: SparkSession, path: String, body: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  // ---- 1. schema inspection + column-role detection -------------------
  def schemaColumns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val detected = ColumnDetect.detect(docs)
    docs.schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, detected.roleOf(f.name)))
      .sortBy(_._1)
      .toDF("column_name", "data_type", "role")
  }

  val schemaColumnsOracle: String = """
    SELECT * FROM (VALUES
      ('doc_id','bigint','id'),
      ('lang','string','metadata'),
      ('n_chars','bigint','metadata'),
      ('source','string','metadata'),
      ('text','string','content')) AS t(column_name, data_type, role)
    ORDER BY column_name"""

  // ---- 2. deterministic seeded sampling -------------------------------
  def samplePapers(spark: SparkSession, dir: String): DataFrame =
    Sampling.sampleN(Tables.documents(spark, dir), col("doc_id"), 100)
      .select(col("sample_rank"), col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("sample_rank"))

  val samplePapersOracle: String =
    s"SELECT sample_rank, doc_id, lang, source, n_chars FROM ($sampleSql) ORDER BY sample_rank"

  // ---- 3. markdown render (frontmatter + filename) --------------------
  def markdownRender(spark: SparkSession, dir: String): DataFrame =
    Sampling.sampleN(Tables.documents(spark, dir), col("doc_id"), 100)
      .select(
        filenameColumn.as("filename"),
        col("doc_id"),
        mdColumn.as("markdown"))
      .orderBy(col("filename"))

  val markdownRenderOracle: String =
    s"SELECT $filenameSql AS filename, doc_id, $mdSql AS markdown FROM ($sampleSql) ORDER BY filename"

  // ---- 4. CISI source round-trip --------------------------------------
  def cisiRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val fixture = scratch(spark, dir, "cisi") + "/corpus.all"
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(500)
      .collect()  // fixture generation only (≤500 docs); the parse below is distributed
      .map(r => (r.getLong(0) + 1,
        s"doc ${r.getLong(0)} title", s"author_${r.getLong(0) % 7}", r.getString(1)))
    putText(spark, fixture, CisiSource.renderCisi(rows.toIndexedSeq))
    CisiSource.read(spark, fixture)
      .select(
        (col("cisi_id") - 1).as("doc_id"),
        col("title"), col("author"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  val cisiRoundtripOracle: String = """
    SELECT doc_id,
           'doc ' || CAST(doc_id AS VARCHAR) || ' title' AS title,
           'author_' || CAST(doc_id % 7 AS VARCHAR) AS author,
           md5(text) AS content_md5
    FROM documents
    ORDER BY doc_id
    LIMIT 500"""

  // ---- 4b. RAW wikIR distribution round-trip --------------------------
  // The exact on-disk files ir_datasets iterates for the reference
  // (api.py:219-232): documents.csv + <split>/queries.csv + TREC qrels.
  // Fixture text is decorated with a comma+quoted suffix so the RFC-4180
  // quoting path is exercised on EVERY row (the synthetic corpus text
  // itself carries no CSV-special characters); the oracle recomputes the
  // same decoration.
  def wikirRawRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "wikir_raw")
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(500)
      .collect()  // fixture generation only (≤500 docs); the parse below is distributed
      .map(r => (r.getLong(0), r.getString(1) + ", \"q" + (r.getLong(0) % 5) + "\""))
    val queries = (0L to 19L).map(q => (q, s"synthetic query $q"))
    val qrels = rows.map(_._1).map(id => (id % 20, id, 1 + id % 3)).toIndexedSeq
    def put(path: String, body: String): Unit = putText(spark, path, body)
    put(s"$root/documents.csv",
      WikirRawSource.renderDocumentsCsv(rows.toIndexedSeq))
    put(s"$root/validation/queries.csv",
      WikirRawSource.renderQueriesCsv(queries))
    put(s"$root/validation/qrels", WikirRawSource.renderQrels(qrels))
    WikirRawSource.readQrels(spark, root, "validation")
      .join(WikirRawSource.readQueries(spark, root, "validation"), Seq("query_id"))
      .join(WikirRawSource.readDocuments(spark, root), Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("relevance"),
        col("query_text"), md5(col("text")).as("content_md5"))
      .orderBy(col("query_id"), col("doc_id"))
  }

  val wikirRawRoundtripOracle: String = """
    SELECT doc_id % 20 AS query_id, doc_id, 1 + doc_id % 3 AS relevance,
           'synthetic query ' || CAST(doc_id % 20 AS VARCHAR) AS query_text,
           md5(text || ', "q' || CAST(doc_id % 5 AS VARCHAR) || '"') AS content_md5
    FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 500)
    ORDER BY query_id, doc_id"""

  // ---- 5. per-document token count ------------------------------------
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokenCount(col("text")).as("n_tokens"))
      .orderBy(col("doc_id"))

  val tokenCountOracle: String =
    s"SELECT doc_id, len($tokensSql) AS n_tokens FROM documents ORDER BY doc_id"

  // ---- 6. corpus token statistics -------------------------------------
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(spark, dir)
      .select(TextFns.tokenCount(col("text")).as("n"))
    perDoc.agg(
      count(lit(1)).as("document_count"),
      sum(col("n")).as("total_tokens"),
      round(sum(col("n")).cast("double") / count(lit(1)), 4).as("average_tokens_per_doc"),
      min(col("n")).as("min_tokens"),
      max(col("n")).as("max_tokens"))
  }

  val tokenStatsOracle: String = s"""
    SELECT count(*) AS document_count,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           round(CAST(sum(n) AS DOUBLE) / count(*), 4) AS average_tokens_per_doc,
           min(n) AS min_tokens,
           max(n) AS max_tokens
    FROM (SELECT len($tokensSql) AS n FROM documents)"""

  // ---- 7. ASCII sanitize + truncate (wikir-style export prep) ---------
  def asciiSanitize(spark: SparkSession, dir: String): DataFrame = {
    val clean = TextFns.truncateContent(
      TextFns.asciiSanitize(TextFns.htmlUnescape(col("text"))))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        octet_length(clean).as("n_bytes"),
        md5(clean).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  val asciiSanitizeOracle: String = """
    SELECT doc_id, strlen(clean) AS n_bytes, md5(clean) AS content_md5
    FROM (
      SELECT doc_id,
        substr(regexp_replace(
          replace(replace(replace(replace(replace(text,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
          '[^\x00-\x7F]', '_', 'g'), 1, 50000) AS clean
      FROM documents)
    ORDER BY doc_id"""

  // ---- 8. end-to-end extract pipeline → file manifest -----------------
  def extractManifest(spark: SparkSession, dir: String): DataFrame = {
    val outDir = scratch(spark, dir, "extract")
    // clean slate so stale files can't pollute the manifest (through
    // the dir's own Hadoop FS, like the sink it feeds)
    val rootP = new org.apache.hadoop.fs.Path(outDir)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rootP)) fs.listStatus(rootP).foreach(s => fs.delete(s.getPath, true))
    val rendered = Sampling.sampleN(Tables.documents(spark, dir), col("doc_id"), 100)
      .select(filenameColumn.as("filename"), mdColumn.as("content"))
    MarkdownFileSink.write(rendered, outDir)
    MarkdownFileSink.manifest(spark, outDir).orderBy(col("filename"))
  }

  val extractManifestOracle: String =
    s"SELECT $filenameSql AS filename, strlen($mdSql) AS n_bytes FROM ($sampleSql) ORDER BY filename"

  // ---- 9. wikir-shaped source: attribute-fallback field selection ------
  // Shapes `documents` into a wikir/ir-datasets-style table (optional
  // title/url/text/body per row, deterministic by doc_id) and runs
  // WikirSource.normalize (api.py:262-331 fallback chains). Every branch
  // is exercised: %3 picks the title chain (title / url / doc_id), %2
  // and %4 pick the content chain (text / body / attribute dump).
  def wikirFields(spark: SparkSession, dir: String): DataFrame = {
    val shaped = Tables.documents(spark, dir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(lit("T:"), col("source"), lit(" #"), col("doc_id").cast("string")))
        .otherwise(lit("")).as("title"),
      when(col("doc_id") % 3 === 1,
        concat(lit("http://example.org/doc/"), col("doc_id").cast("string"))).as("url"),
      when(col("doc_id") % 2 === 0, col("text")).otherwise(lit("")).as("text"),
      when(col("doc_id") % 4 === 1, col("text")).as("body"),
      col("lang"), col("source"))
    graft.sources.WikirSource.normalize(shaped).orderBy(col("doc_id"))
  }

  val wikirFieldsOracle: String = """
    WITH shaped AS (
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'T:' || source || ' #' || CAST(doc_id AS VARCHAR) ELSE '' END AS title,
        CASE WHEN doc_id % 3 = 1 THEN 'http://example.org/doc/' || CAST(doc_id AS VARCHAR) END AS url,
        CASE WHEN doc_id % 2 = 0 THEN text ELSE '' END AS text,
        CASE WHEN doc_id % 4 = 1 THEN text END AS body,
        lang, source
      FROM documents),
    picked AS (
      SELECT doc_id,
        'wikir_' || CAST(doc_id AS VARCHAR) || '.pdf' AS filename,
        substr(CASE WHEN length(title) > 0 THEN title
                    WHEN url IS NOT NULL AND length(url) > 0 THEN 'URL: ' || url
                    ELSE 'Document ' || CAST(doc_id AS VARCHAR) END, 1, 80) AS title,
        CASE WHEN length(text) > 0 THEN text
             WHEN body IS NOT NULL AND length(body) > 0 THEN body
             ELSE 'Available attributes:' || chr(10) || chr(10) ||
                  'lang: ' || lang || chr(10) || chr(10) || 'source: ' || source
        END AS content
      FROM shaped)
    SELECT doc_id, filename, title,
      substr(regexp_replace(
        replace(replace(replace(replace(replace(content,
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
        '[^\x00-\x7F]', '_', 'g'), 1, 50000) AS content
    FROM picked
    ORDER BY doc_id"""

  // ---- JSONL roundtrip (round 11; engine capability, not reference
  // parity) — the de-facto LLM-corpus interchange format through
  // [[graft.sources.JsonlSource]]: full documents table → distributed
  // JSONL write → pinned-schema read → identity projection. The gate
  // proves VALUE identity through JSON string escaping (md5 of the
  // text survives the encode/decode) and TYPE identity through the
  // pinned schema (the driver compare is type-strict). ---------------
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val out = scratch(spark, dir, "jsonl") + "/docs"
    graft.sources.JsonlSource.write(Tables.documents(spark, dir), out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    graft.sources.JsonlSource.read(spark, out, schema)
      .select(col("doc_id"), md5(col("text")).as("content_md5"),
        col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val jsonlRoundtripOracle: String = """
    SELECT doc_id, md5(text) AS content_md5, lang, source, n_chars
    FROM documents
    ORDER BY doc_id"""

  // ---- CSV roundtrip (round 11) — same gate shape as jsonl_roundtrip
  // through [[graft.sources.CsvSource]]: full documents table →
  // distributed RFC-4180 write → pinned-schema read → identity
  // projection. Proves the quoting/escape/null-token choices are
  // actually lossless (md5 of text survives quote-doubling; the \N
  // null token keeps "" and NULL distinct; types rehydrate from the
  // pinned schema under the driver's type-strict compare). -----------
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val out = scratch(spark, dir, "csv") + "/docs"
    graft.sources.CsvSource.write(Tables.documents(spark, dir), out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    graft.sources.CsvSource.read(spark, out, schema)
      .select(col("doc_id"), md5(col("text")).as("content_md5"),
        col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val csvRoundtripOracle: String = jsonlRoundtripOracle

  // ---- WARC roundtrip (round 14) — the crawl-archive ingest format
  // through [[graft.sources.WarcSource]]: full documents table →
  // distributed WARC write (one gzip member per record, the Common
  // Crawl layout; lang/source/n_chars thread through as WARC
  // extension headers) → record parse → identity projection. The gate
  // proves Content-Length-driven parsing is lossless (md5 of the
  // payload bytes survives; embedded header-lookalike text cannot
  // break record framing) and that extension headers roundtrip. ------
  def warcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch(spark, dir, "warc") + "/docs"
    val recs = Tables.documents(spark, dir).select(
      lit("conversion").as("warc_type"),
      concat(lit("http://example.org/doc/"), col("doc_id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      concat(lit("<urn:uuid:doc-"), col("doc_id"), lit(">")).as("record_id"),
      lit("text/plain").as("content_type"),
      encode(col("text"), "UTF-8").as("payload"),
      map(lit("WARC-X-Lang"), col("lang"), lit("WARC-X-Source"), col("source"),
        lit("WARC-X-NChars"), col("n_chars").cast("string")).as("extra"))
    graft.sources.WarcSource.write(recs, out)
    graft.sources.WarcSource.read(spark, out).toDF()
      .select(
        element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
        md5(col("payload")).as("content_md5"),
        element_at(col("headers"), "warc-x-lang").as("lang"),
        element_at(col("headers"), "warc-x-source").as("source"),
        element_at(col("headers"), "warc-x-nchars").cast("long").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  val warcRoundtripOracle: String = jsonlRoundtripOracle

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jsonl_roundtrip"      -> (jsonlRoundtrip _),
    "csv_roundtrip"        -> (csvRoundtrip _),
    "warc_roundtrip"       -> (warcRoundtrip _),
    "ref_wikir_fields"     -> (wikirFields _),
    "ref_schema_columns"   -> (schemaColumns _),
    "ref_sample_papers"    -> (samplePapers _),
    "ref_markdown_render"  -> (markdownRender _),
    "ref_cisi_roundtrip"   -> (cisiRoundtrip _),
    "ref_wikir_raw"        -> (wikirRawRoundtrip _),
    "ref_token_count"      -> (tokenCount _),
    "ref_token_stats"      -> (tokenStats _),
    "ref_ascii_sanitize"   -> (asciiSanitize _),
    "ref_extract_manifest" -> (extractManifest _))

  val oracle: Map[String, String] = Map(
    "jsonl_roundtrip"      -> jsonlRoundtripOracle,
    "csv_roundtrip"        -> csvRoundtripOracle,
    "warc_roundtrip"       -> warcRoundtripOracle,
    "ref_wikir_fields"     -> wikirFieldsOracle,
    "ref_schema_columns"   -> schemaColumnsOracle,
    "ref_sample_papers"    -> samplePapersOracle,
    "ref_markdown_render"  -> markdownRenderOracle,
    "ref_cisi_roundtrip"   -> cisiRoundtripOracle,
    "ref_wikir_raw"        -> wikirRawRoundtripOracle,
    "ref_token_count"      -> tokenCountOracle,
    "ref_token_stats"      -> tokenStatsOracle,
    "ref_ascii_sanitize"   -> asciiSanitizeOracle,
    "ref_extract_manifest" -> extractManifestOracle)
}
