package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WarcSource

/** WARC/WET crawl-archive source (round 14): record framing is
  * Content-Length-driven, so adversarial payloads (embedded WARC
  * magic, bare separators, multi-byte UTF-8) cannot break parsing;
  * gzip archives are one member per record (the Common Crawl layout)
  * and GZIPInputStream walks the members; malformed archives fail
  * loudly with file context. */
class WarcSourceSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text").select(
      lit("conversion").as("warc_type"),
      concat(lit("http://x.test/"), col("doc_id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      concat(lit("<urn:uuid:"), col("doc_id"), lit(">")).as("record_id"),
      lit("text/plain").as("content_type"),
      encode(col("text"), "UTF-8").as("payload"),
      map(lit("WARC-X-Id"), col("doc_id").cast("string")).as("extra"))

  // payloads chosen to break naive line-oriented parsers
  private val adversarial = Seq(
    1L -> "plain text",
    2L -> "embedded\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nrecord",
    3L -> "trailing separators\r\n\r\n\r\n\r\n",
    4L -> "", // empty payload
    5L -> "unicode: ünïcödé — 日本語 🚀",
    6L -> "Content-Length: 9999\r\nnot a header")

  test("gzip roundtrip: multi-record, multi-member, adversarial payloads") {
    val dir = tmp("warc_gz")
    WarcSource.write(docsDf(adversarial).repartition(2), dir, gzip = true)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 2, "one archive per partition")
    val back = WarcSource.read(spark, dir).collect()
    assert(back.length == adversarial.size)
    val byId = back.map(r => r.headers("warc-x-id").toLong ->
      new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)).toMap
    assert(byId == adversarial.toMap, "payload bytes must roundtrip exactly")
    val r2 = back.find(_.target_uri == "http://x.test/2").get
    assert(r2.warc_type == "conversion" && r2.content_type == "text/plain")
    assert(r2.content_length == r2.payload.length)
  }

  test("uncompressed roundtrip + WET view decodes text") {
    val dir = tmp("warc_plain")
    WarcSource.write(docsDf(adversarial).coalesce(1), dir, gzip = false)
    val wet = WarcSource.readWet(spark, dir)
      .select(col("target_uri"), col("text"), col("n_bytes")).collect()
    assert(wet.length == adversarial.size)
    val u5 = wet.find(_.getString(0) == "http://x.test/5").get
    assert(u5.getString(1) == "unicode: ünïcödé — 日本語 🚀")
    assert(u5.getLong(2) ==
      u5.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
  }

  test("malformed archives fail loudly with file context") {
    def writeRaw(name: String, bytes: Array[Byte]): String = {
      val dir = tmp("warc_bad")
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
      dir
    }
    // wrong magic
    val d1 = writeRaw("bad.warc", "HTTP/1.1 200 OK\r\n\r\n".getBytes)
    val e1 = intercept[Exception] { WarcSource.read(spark, d1).collect() }
    assert(e1.getMessage != null)
    // truncated payload: Content-Length says 100, file ends early
    val d2 = writeRaw("trunc.warc",
      "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 100\r\n\r\nshort".getBytes)
    intercept[Exception] { WarcSource.read(spark, d2).collect() }
    // missing Content-Length
    val d3 = writeRaw("nolen.warc",
      "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nbody\r\n\r\n".getBytes)
    intercept[Exception] { WarcSource.read(spark, d3).collect() }
  }

  test("streaming ingest: archives landing incrementally == batch WET read; exactly-once sink") {
    // the continuous-crawl front door: drop archive 1, drain, drop
    // archive 2, drain — the sink table must equal the batch readWet
    // over both, with no duplicates (file-sink commit log)
    val warcDir = tmp("warc_stream_in")
    val outPath = tmp("warc_stream_out") + "/docs"
    val ck = tmp("warc_stream_ck")
    val (b1, b2) = (adversarial.take(3), adversarial.drop(3))
    WarcSource.write(docsDf(b1).coalesce(1), warcDir, gzip = true)
    val q = graft.streaming.EventStream.warcIngestStream(spark, warcDir, outPath, ck)
    q.processAllAvailable()
    val afterOne = spark.read.parquet(outPath).count()
    assert(afterOne == 3, s"first archive should yield 3 docs, got $afterOne")
    // second archive lands while the query runs — but the writer names
    // files part-<pid>; use a subdir-free second file name to not clash
    val rec2 = b2.map { case (id, text) =>
      WarcSource.render("conversion", s"http://x.test/$id", "2026-01-01T00:00:00Z",
        s"<urn:uuid:$id>", "text/plain", text.getBytes("UTF-8"),
        extra = Seq("WARC-X-Id" -> id.toString))
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(warcDir, "second.warc"),
      rec2.flatten.toArray)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(outPath)
      .select(col("target_uri"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val batch = WarcSource.readWet(spark, warcDir)
      .select(col("target_uri"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == batch && got.size == adversarial.size,
      "streamed ingest must equal the batch WET read over all archives")
  }

  test("charset-aware WET decode: Content-Type charset is honored, UTF-8 is the fallback") {
    val dir = tmp("warc_charset")
    val latin1 = "café à la crème".getBytes("ISO-8859-1")
    val recs =
      WarcSource.render("conversion", "http://x.test/l1", "2026-01-01T00:00:00Z",
        "<urn:uuid:l1>", "text/plain; charset=ISO-8859-1", latin1) ++
      WarcSource.render("conversion", "http://x.test/cp", "2026-01-01T00:00:00Z",
        "<urn:uuid:cp>", "text/plain; charset=\"windows-1252\"", latin1) ++
      WarcSource.render("conversion", "http://x.test/u16", "2026-01-01T00:00:00Z",
        "<urn:uuid:u16>", "text/plain; charset=UTF-16BE", "café".getBytes("UTF-16BE")) ++
      // no charset parameter: UTF-8 convention; latin-1 bytes under it
      // must REPLACEMENT-CHAR, not throw (and not silently decode)
      WarcSource.render("conversion", "http://x.test/bad", "2026-01-01T00:00:00Z",
        "<urn:uuid:bad>", "text/plain", latin1)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "cs.warc"), recs)
    val got = WarcSource.readWet(spark, dir)
      .select(col("target_uri"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("http://x.test/l1") == "café à la crème")
    assert(got("http://x.test/cp") == "café à la crème",
      "cp1252 decodes via byte-complete ISO-8859-1")
    assert(got("http://x.test/u16") == "café")
    assert(got("http://x.test/bad").contains('�'),
      "charset-less latin-1 bytes must surface as replacement chars, not silently pass")
  }

  test("memory bound is per RECORD, not per archive: archive >> cap parses; one record over cap fails loudly") {
    // every record under the cap, archive total far over it — proves
    // the parser never buffers the whole archive
    val dir = tmp("warc_cap")
    val many = (1L to 50L).map(i => i -> ("x" * 100)) // 50 × 100 B records, 5 KB archive
    WarcSource.write(docsDf(many).coalesce(1), dir, gzip = true)
    spark.conf.set(WarcSource.MaxRecordBytesConf, "256")
    try {
      assert(WarcSource.read(spark, dir).count() == 50,
        "archive 20× the record cap must parse when each record fits")
      val dir2 = tmp("warc_cap_over")
      WarcSource.write(docsDf(Seq(1L -> ("y" * 1000))).coalesce(1), dir2, gzip = false)
      val e = intercept[Exception] { WarcSource.read(spark, dir2).collect() }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
          .map(x => Option(x.getMessage).getOrElse("")).toSeq
      assert(chain(e).exists(_.contains(WarcSource.MaxRecordBytesConf)),
        s"over-cap record must name the conf; got: ${chain(e).mkString(" | ")}")
    } finally spark.conf.unset(WarcSource.MaxRecordBytesConf)
  }

  test("header-line cap: a newline-free non-gzip blob fails loudly instead of buffering the file") {
    // r15 advice: readLine buffered until '\n' with no bound, so a
    // mislabeled binary blob (not gzip, no newlines) buffered the whole
    // file in one task before the WARC/ magic check ever ran
    val dir = tmp("warc_noline")
    new java.io.File(dir).mkdirs()
    val blob = new Array[Byte](128 * 1024)
    java.util.Arrays.fill(blob, 'z'.toByte)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/blob.warc"), blob)
    val e = intercept[Exception] { WarcSource.read(spark, dir).collect() }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m => m.contains("header line exceeds") && m.contains("blob.warc")),
      s"newline-free blob must fail the header-line cap naming the file; got: ${chain(e).mkString(" | ")}")
  }

  test("JVM array ceiling: a >2^31-byte Content-Length fails loudly even under a huge conf cap") {
    // r15 advice: len.toInt would silently truncate 2^32+100 to 100
    // bytes and mis-frame the rest of the archive if the conf admitted it
    val dir = tmp("warc_hugelen")
    new java.io.File(dir).mkdirs()
    val header = "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 4294967396\r\n\r\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/huge.warc"),
      header.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    spark.conf.set(WarcSource.MaxRecordBytesConf, "8589934592") // 8 GiB — above any int
    try {
      val e = intercept[Exception] { WarcSource.read(spark, dir).collect() }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
          .map(x => Option(x.getMessage).getOrElse("")).toSeq
      assert(chain(e).exists(_.contains("JVM array ceiling")),
        s"huge Content-Length must hit the array-ceiling guard; got: ${chain(e).mkString(" | ")}")
    } finally spark.conf.unset(WarcSource.MaxRecordBytesConf)
  }

  test("render rejects CR/LF in header values at WRITE time") {
    intercept[IllegalArgumentException] {
      WarcSource.render("conversion", "http://x.test/\r\nWARC-Type: fake",
        "2026-01-01T00:00:00Z", "<urn:uuid:inj>", "text/plain", "x".getBytes)
    }
    intercept[IllegalArgumentException] {
      WarcSource.render("conversion", "http://x.test/ok", "2026-01-01T00:00:00Z",
        "<urn:uuid:inj>", "text/plain", "x".getBytes,
        extra = Seq("WARC-X-Note" -> "a\nb"))
    }
  }

  test("raw-HTML ingest stream: response archives → charset-decoded text docs == batch path") {
    val warcDir = tmp("warc_html_in")
    val outPath = tmp("warc_html_out") + "/docs"
    val pages = Seq(
      ("http://h.test/1", "text/html",
        "<html><body><h1>One</h1><p>first page</p></body></html>".getBytes("UTF-8")),
      ("http://h.test/2", "text/html; charset=ISO-8859-1",
        "<html><body><p>café numéro deux</p></body></html>".getBytes("ISO-8859-1")))
    val recs = pages.flatMap { case (uri, ct, body) =>
      WarcSource.render("response", uri, "2026-01-01T00:00:00Z",
        s"<urn:uuid:${uri.hashCode}>", ct, body)
    }.toArray
    java.nio.file.Files.write(java.nio.file.Paths.get(warcDir, "pages.warc"), recs)
    val q = graft.streaming.EventStream.htmlIngestStream(
      spark, warcDir, outPath, tmp("warc_html_ck"))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(outPath)
      .select(col("target_uri"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("http://h.test/1") == "One\nfirst page")
    assert(got("http://h.test/2") == "café numéro deux",
      s"latin-1 page must decode per charset in the stream: ${got("http://h.test/2")}")
    // batch twin produces the same table
    val batch = WarcSource.readResponses(spark, warcDir)
      .select(col("target_uri"),
        graft.operators.TextAnalysis.htmlToText(col("html")).as("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(batch == got, "streamed HTML ingest must equal the batch extraction")
  }

  test("header names parse case-insensitively; values keep inner whitespace") {
    val dir = tmp("warc_case")
    val rec = WarcSource.render("conversion", "http://x.test/ws", "2026-01-01T00:00:00Z",
      "<urn:uuid:ws>", "text/plain", "x".getBytes,
      extra = Seq("WARC-X-Note" -> "two  words"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "one.warc"), rec)
    val r = WarcSource.read(spark, dir).head()
    assert(r.headers("warc-x-note") == "two  words")
    assert(r.headers("warc-type") == "conversion")
  }
}
