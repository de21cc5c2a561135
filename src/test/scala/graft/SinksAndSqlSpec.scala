package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.DocumentExportSink

class SinksAndSqlSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("document export: pdf-stub files with sanitize/truncate semantics") {
    val out = java.nio.file.Files.createTempDirectory("pdf").toString
    val docs = Seq(
      (7L, "Graph Theory", "plain body"),
      (8L, "", "unicodeé body"), // empty title → fallback; é → '_'
    ).toDF("doc_id", "title", "content")
    val manifest = DocumentExportSink.export(docs, out, DocumentExportSink.PdfStubRenderer)
    val names = manifest.select("filename").as[String].collect().sorted
    assert(names.toSeq == Seq("doc_7.pdf", "doc_8.pdf"))
    val f7 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "doc_7.pdf")), "UTF-8")
    assert(f7.startsWith("%PDF-1.4"))
    assert(f7.contains("(Graph Theory)") && f7.contains("plain body"))
    val f8 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "doc_8.pdf")), "UTF-8")
    assert(f8.contains("(Document 8)") && f8.contains("unicode_ body"))
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
  }
}
