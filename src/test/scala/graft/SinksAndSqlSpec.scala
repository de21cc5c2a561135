package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.DocumentExportSink

class SinksAndSqlSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("document export: real PDFs with sanitize/truncate semantics") {
    val out = java.nio.file.Files.createTempDirectory("pdf").toString
    val docs = Seq(
      (7L, "Graph Theory", "plain body"),
      (8L, "", "unicodeé body"), // empty title → fallback; é → '_'
    ).toDF("doc_id", "title", "content")
    val manifest = DocumentExportSink.export(docs, out, DocumentExportSink.PdfRenderer)
    val names = manifest.select("filename").as[String].collect().sorted
    assert(names.toSeq == Seq("doc_7.pdf", "doc_8.pdf"))
    val f7 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "doc_7.pdf")), "UTF-8")
    assert(f7.startsWith("%PDF-1.4"))
    assert(f7.contains("(Graph Theory)") && f7.contains("(plain body)"))
    assert(f7.contains("(Document ID: 7)"))
    val f8 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "doc_8.pdf")), "UTF-8")
    assert(f8.contains("(Document 8)") && f8.contains("(unicode_ body)"))
  }

  test("file sinks write through the Hadoop FS of an explicit file: URI — manifest round-trips, no checksum sidecars") {
    import graft.sinks.MarkdownFileSink
    // an EXPLICIT URI root: on a cluster this is the hdfs://-s3a:// case
    // (the old java.nio writer landed files on each executor's local
    // disk instead); file: keeps the spec hermetic while exercising the
    // same Hadoop-FS code path
    val local = java.nio.file.Files.createTempDirectory("hfsink").toString
    val out = "file:" + local + "/export"
    val docs = Seq(
      ("a.md", "alpha content\n"),
      ("b.md", "béta ünïcode content\n"), // multi-byte: n_bytes must be BYTE length
      ("c.md", "")).toDF("filename", "content")
    MarkdownFileSink.write(docs, out)
    // bytes land at the URI's target, byte-identical to the old writer
    val aPath = java.nio.file.Paths.get(local, "export", "a.md")
    assert(new String(java.nio.file.Files.readAllBytes(aPath), "UTF-8") == "alpha content\n")
    val bBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(local, "export", "b.md"))
    assert(bBytes.length == "béta ünïcode content\n".getBytes("UTF-8").length)
    // exactly one file per document — no .crc checksum sidecars
    val listed = new java.io.File(local, "export").listFiles().map(_.getName).sorted.toSeq
    assert(listed == Seq("a.md", "b.md", "c.md"), s"unexpected dir content: $listed")
    // manifest (the /api/files surface) round-trips through the Hadoop listing
    val m = MarkdownFileSink.manifest(spark, out)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(m == Seq(("a.md", 14L), ("b.md", bBytes.length.toLong), ("c.md", 0L)))
    // idempotence: a re-write (task retry semantics) overwrites in place
    MarkdownFileSink.write(docs, out)
    assert(MarkdownFileSink.manifest(spark, out).count() == 3)
    // a missing dir answers an empty manifest, not an error
    assert(MarkdownFileSink.manifest(spark, "file:" + local + "/nope").count() == 0)
    // DocumentExportSink through the same URI root
    val pdfOut = "file:" + local + "/pdf"
    val pdocs = Seq((7L, "T", "body")).toDF("doc_id", "title", "content")
    val pm = DocumentExportSink.export(pdocs, pdfOut, DocumentExportSink.PdfRenderer)
      .as[(String, Long)].collect().toSeq
    assert(pm.map(_._1) == Seq("doc_7.pdf"))
    val pdfBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(local, "pdf", "doc_7.pdf"))
    assert(pm.head._2 == pdfBytes.length.toLong &&
      new String(pdfBytes.take(8), "US-ASCII") == "%PDF-1.4")
    assert(new java.io.File(local, "pdf").listFiles().map(_.getName).toSeq == Seq("doc_7.pdf"))
  }

  test("PDF writer: page tree, xref, pagination, and escaping are structurally valid") {
    // short doc = one page
    val one = new String(graft.sinks.Pdf.render("T", 1L, "short"), "US-ASCII")
    assert(one.contains("/Count 1"))
    assert("/Type /Page\\b".r.findAllIn(one).size >= 1)

    // ~300 wrapped lines forces multiple pages (56 rows/page)
    val longBody = (1 to 300).map(i => s"line number $i of the body").mkString("\n")
    val multi = new String(graft.sinks.Pdf.render("Long Doc", 2L, longBody), "US-ASCII")
    val pages = "/Count (\\d+)".r.findFirstMatchIn(multi).get.group(1).toInt
    assert(pages >= 5, s"expected >=5 pages for 302 rows, got $pages")
    assert("(?m)^\\d+ 0 obj << /Type /Page ".r.findAllIn(multi).size == pages)
    // body text lands in the page streams, first and last line included
    assert(multi.contains("(line number 1 of the body)"))
    assert(multi.contains("(line number 300 of the body)"))
    // xref: entry count == objects + free head, startxref points at 'xref'
    val size = "/Size (\\d+)".r.findFirstMatchIn(multi).get.group(1).toInt
    assert(size == 5 + 2 * pages + 1)
    val xrefOff = "startxref\n(\\d+)".r.findFirstMatchIn(multi).get.group(1).toInt
    assert(multi.substring(xrefOff).startsWith("xref"))
    // object offsets in the xref table point at the right objects
    val entries = "(?m)^(\\d{10}) 00000 n ".r.findAllMatchIn(multi).map(_.group(1).toInt).toVector
    assert(entries.length == size - 1)
    entries.zipWithIndex.foreach { case (off, i) =>
      assert(multi.substring(off).startsWith(s"${i + 1} 0 obj"),
        s"xref entry ${i + 1} points at '${multi.substring(off, off + 12)}'")
    }
    // parens and backslashes in text are escaped
    val esc = new String(graft.sinks.Pdf.render("(t)", 3L, "a (b) c\\d"), "US-ASCII")
    assert(esc.contains("(\\(t\\))") && esc.contains("(a \\(b\\) c\\\\d)"))
  }

  test("SQL surface: registered graft functions work from spark.sql") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c,
        |       graft_token_count('Hello, World! 42') AS n,
        |       graft_sanitize_filename('A/B: C') AS f
        |""".stripMargin).collect().head
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 1.0)
    assert(row.getInt(2) == 3)
    assert(row.getString(3) == "A_B__C")

    // the custom aggregate is SQL-reachable too
    val hh = spark.sql(
      """SELECT mg_topk(t, 8) AS hh FROM VALUES ('a'),('a'),('a'),('b'),('b'),('c') AS v(t)
        |""".stripMargin).selectExpr("explode(hh) AS e").selectExpr("e.token", "e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("a" -> 3L, "b" -> 2L, "c" -> 1L)) // capacity ≥ distinct → exact

    // the native CDC cut finder is SQL-reachable and matches the
    // operator's shared frame rule (default win/mask = the gated
    // constants; explicit literals accepted)
    val toks = (0 until 40).map(i => s"tok$i")
    val cutsSql = spark.sql(
      s"SELECT cdc_cuts(array(${toks.map("'" + _ + "'").mkString(",")})) AS c")
      .selectExpr("explode(c) AS p").collect().map(_.getInt(0)).toSeq
    val frame = graft.operators.TextAnalysis.cdcChunkFrame(
      spark.createDataFrame(Seq((1L, toks.mkString(" ")))).toDF("doc_id", "text"))
      .selectExpr("n_tokens").collect().map(_.getLong(0)).toSeq
    // the cut positions partition the 40 tokens into the frame's chunks
    assert(cutsSql.sorted == cutsSql && cutsSql.forall(p => p >= 4 && p <= 40))
    assert(frame.sum == 40 && frame.length == cutsSql.length + 1,
      s"cuts $cutsSql must split 40 tokens into ${frame.length} chunks")

    // win/mask are validated at ANALYSIS time — a bad literal fails the
    // query plan, not an executor task mid-job (r17 advice)
    for (bad <- Seq("cdc_cuts(array('a','b'), 0, 8)",
                    "cdc_cuts(array('a','b'), 4, 0)",
                    "cdc_cuts(array('a','b'), -1, -2)")) {
      val e = intercept[Exception](spark.sql(s"SELECT $bad").collect())
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains("cdc_cuts")), s"expected analysis-time rejection for $bad, got $e")
    }
  }
}
