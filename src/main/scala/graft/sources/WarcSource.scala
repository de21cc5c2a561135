package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record. `headers` carries EVERY header verbatim
  * (lower-cased names) so extension headers (`WARC-X-*`) survive a
  * roundtrip; the named fields are the ones every consumer wants. */
case class WarcRecord(
    warc_file: String,
    warc_type: String,
    target_uri: String,
    warc_date: String,
    record_id: String,
    content_type: String,
    content_length: Long,
    headers: Map[String, String],
    payload: Array[Byte])

/** WARC/WET source + sink (ISO 28500 / WARC 1.0) — the de-facto
  * ingest format of web-crawl pretraining corpora (Common Crawl ships
  * WARC captures and WET text conversions in exactly this layout).
  * The reference has no crawl-archive reader; this closes the
  * "pipeline starts from parquet" gap for graft.
  *
  * Record grammar: `WARC/1.0\r\n`, then `Name: value\r\n` header
  * lines, a blank `\r\n`, exactly `Content-Length` payload BYTES, then
  * the `\r\n\r\n` record separator. Parsing is Content-Length-driven,
  * so payloads containing header-lookalike bytes (even an embedded
  * `WARC/1.0` block) roundtrip unharmed — the csv_roundtrip
  * adversarial-payload discipline, gated via `warc_roundtrip`.
  *
  * Compression and SPLITTABILITY: the crawl convention is one gzip
  * MEMBER per record, members concatenated into a `.warc.gz` — the
  * writer here emits that layout and the reader's `GZIPInputStream`
  * walks the members transparently. A gzip stream is not
  * block-splittable, so the unit of parallelism is the FILE: one task
  * per archive, exactly how the format is consumed at scale (Common
  * Crawl shards a crawl into ~1 GB archives so file-granularity IS
  * cluster-granularity; 100 TB ≈ 10⁵ files ≫ any executor count).
  * The `binaryFile` scan underneath prunes on pathGlobFilter and
  * never assembles more than one archive per task.
  *
  * Malformed input fails LOUDLY (the FAILFAST contract of the sibling
  * readers): a record without the WARC/ magic, a missing
  * Content-Length, or a truncated payload throws with file context.
  */
object WarcSource {

  /** Render ONE record — header block + payload + separator. Our own
    * independent renderer (the WikirRawSource fixture discipline);
    * `extra` headers let callers thread metadata through the archive
    * as WARC extension headers. */
  def render(warcType: String, targetUri: String, warcDate: String,
             recordId: String, contentType: String,
             payload: Array[Byte],
             extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    sb.append(s"WARC-Target-URI: $targetUri\r\n")
    sb.append(s"WARC-Date: $warcDate\r\n")
    sb.append(s"WARC-Record-ID: $recordId\r\n")
    extra.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload); out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bo)
    gz.write(bytes); gz.finish(); gz.close()
    bo.toByteArray
  }

  /** Distributed WARC writer: `df` columns (warc_type, target_uri,
    * warc_date, record_id, content_type, payload binary, extra
    * map<string,string>) → one archive per partition, each record its
    * own gzip member (the Common Crawl layout) or raw when
    * `gzip=false`. Filenames are partition-id-stable, so task retries
    * overwrite their own file (MarkdownFileSink idempotence). */
  def write(df: DataFrame, path: String, gzip: Boolean = true): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    val ext = if (gzip) "warc.gz" else "warc"
    df.select(col("warc_type"), col("target_uri"), col("warc_date"),
        col("record_id"), col("content_type"), col("payload"), col("extra"))
      .rdd.mapPartitionsWithIndex { (pid, rows) =>
        val target = java.nio.file.Paths.get(path, f"part-$pid%05d.$ext")
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(target))
        try rows.foreach { r =>
          val extra = Option(r.getAs[Map[String, String]]("extra"))
            .getOrElse(Map.empty).toSeq.sortBy(_._1)
          val rec = render(r.getString(0), r.getString(1), r.getString(2),
            r.getString(3), r.getString(4), r.getAs[Array[Byte]]("payload"), extra)
          out.write(if (gzip) gzipMember(rec) else rec)
        } finally out.close()
        Iterator.empty
      }.count(): Unit
  }

  private val GzMagic = Array[Byte](0x1f.toByte, 0x8b.toByte)

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length < 2 || bytes(0) != GzMagic(0) || bytes(1) != GzMagic(1)) bytes
    else {
      // GZIPInputStream walks concatenated members transparently
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
      val bo = new ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { bo.write(buf, 0, n); n = in.read(buf) }
      bo.toByteArray
    }

  /** Parse every record of one (decompressed) archive. */
  private[sources] def parseArchive(file: String, bytes: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = 0
      private def skipSeparators(): Unit =
        while (pos < bytes.length &&
               (bytes(pos) == '\r'.toByte || bytes(pos) == '\n'.toByte)) pos += 1
      skipSeparators()
      def hasNext: Boolean = pos < bytes.length
      def next(): WarcRecord = {
        // header block ends at the first blank line; headers are ASCII
        // by spec, so byte-level line scanning is exact
        require(bytes.length - pos >= 5 &&
          new String(bytes, pos, 5, UTF_8) == "WARC/",
          s"$file: expected WARC/ record magic at byte $pos")
        var headerEnd = -1
        var i = pos
        while (headerEnd < 0 && i + 3 < bytes.length) {
          if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
              bytes(i + 2) == '\r' && bytes(i + 3) == '\n') headerEnd = i
          i += 1
        }
        require(headerEnd > 0, s"$file: unterminated WARC header block at byte $pos")
        val lines = new String(bytes, pos, headerEnd - pos, UTF_8).split("\r\n")
        val headers = lines.drop(1).map { ln =>
          val c = ln.indexOf(':')
          require(c > 0, s"$file: malformed WARC header line '$ln'")
          (ln.substring(0, c).trim.toLowerCase, ln.substring(c + 1).trim)
        }.toMap
        val len = headers.getOrElse("content-length",
          sys.error(s"$file: record at byte $pos missing Content-Length")).toLong
        val payloadStart = headerEnd + 4
        require(payloadStart + len <= bytes.length,
          s"$file: truncated payload at byte $payloadStart (want $len bytes)")
        val payload = java.util.Arrays.copyOfRange(
          bytes, payloadStart, payloadStart + len.toInt)
        pos = payloadStart + len.toInt
        skipSeparators()
        WarcRecord(file,
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-date", ""),
          headers.getOrElse("warc-record-id", ""),
          headers.getOrElse("content-type", ""),
          len, headers, payload)
      }
    }

  /** Archive frame → records: the shared parse tail of the batch and
    * STREAMING readers (one definition, identical record semantics). */
  private def parseFrame(files: DataFrame): Dataset[WarcRecord] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parseArchive(file, gunzipAll(bytes)) }
  }

  /** Read every record of every archive under `path` (both `.warc`
    * and `.warc.gz`). One task per archive — see the splittability
    * note above. */
  def read(spark: SparkSession, path: String): Dataset[WarcRecord] =
    parseFrame(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path))

  // binaryFile's fixed schema, spelled out because streaming file
  // sources require an explicit schema
  private val BinaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))

  /** STREAMING archive reader — the continuous-crawl ingest shape: a
    * directory archives keep landing in becomes an unbounded record
    * stream (each new `.warc[.gz]` file is one source unit, exactly
    * the batch reader's parallelism grain), parsed by the SAME
    * [[parseFrame]] tail. Compose with `readWet`-style projections
    * and a checkpointed sink for end-to-end exactly-once (the file
    * sink's commit log dedups task retries). */
  def readStream(spark: SparkSession, path: String): Dataset[WarcRecord] =
    parseFrame(spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .load(path))

  /** `conversion` records → the text-document frame a crawl-curation
    * pipeline ingests (uri, capture date, UTF-8 text) — ONE projection
    * shared by the batch and streaming WET views. */
  private def wetView(records: DataFrame): DataFrame =
    records
      .filter(col("warc_type") === "conversion")
      .select(col("target_uri"), col("warc_date"), col("record_id"),
        col("headers"),
        decode(col("payload"), "UTF-8").as("text"),
        col("content_length").as("n_bytes"))

  /** WET view of a directory of archives. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    wetView(read(spark, path).toDF())

  /** Streaming WET view — [[readStream]] through the same projection. */
  def readWetStream(spark: SparkSession, path: String): DataFrame =
    wetView(readStream(spark, path).toDF())
}
