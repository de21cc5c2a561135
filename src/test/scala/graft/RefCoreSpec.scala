package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{ColumnDetect, Sampling}
import graft.sources.CisiSource
import graft.sinks.MarkdownFileSink
import graft.api.Extractor

class RefCoreSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("tokenizer matches reference semantics (api.py:470-489)") {
    val df = Seq("Hello, World! foo_bar  42", "", "!!!", "a.b,c").toDF("text")
    val got = df.select(TextFns.tokens(col("text"))).as[Seq[String]].collect()
    assert(got(0) == Seq("hello", "world", "foo_bar", "42"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
    assert(got(3) == Seq("a", "b", "c"))
  }

  test("filename sanitization matches reference (main.py:79-81)") {
    val got = Seq("A Study: of Graphs/Trees (v2)")
      .toDF("t").select(TextFns.sanitizeFilename(col("t"))).as[String].head()
    assert(got == "A_Study__of_Graphs_Trees__v2_")
  }

  test("html unescape handles double-escaped entities correctly") {
    val got = Seq("&amp;lt; &lt;b&gt; &quot;x&quot; &#39;y&#39; a&amp;b")
      .toDF("t").select(TextFns.htmlUnescape(col("t"))).as[String].head()
    assert(got == "&lt; <b> \"x\" 'y' a&b")
  }

  test("shingles: n-grams over tokens, empty when too short") {
    val df = Seq("a b c d", "a b").toDF("text")
    val got = df.select(TextFns.shingles(col("text"), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
  }

  test("column detection: preferred names, then long-string fallback, title") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(ColumnDetect.detect(docs) == ColumnDetect.Detected(Some("text"), None))

    val fallback = Seq((1L, "x" * 200, "t")).toDF("id", "blob_col", "title")
    assert(ColumnDetect.detect(fallback) ==
      ColumnDetect.Detected(Some("blob_col"), Some("title")))

    val none = Seq((1L, 2L)).toDF("a", "b")
    assert(ColumnDetect.detect(none) == ColumnDetect.Detected(None, None))
  }

  test("sampling is deterministic and partition-layout independent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Sampling.sampleN(docs, col("doc_id"), 10).select("doc_id").as[Long].collect()
    val b = Sampling.sampleN(docs.repartition(7), col("doc_id"), 10)
      .select("doc_id").as[Long].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 10)
  }

  test("large-n threshold sampling == full-sort sampling") {
    import org.apache.spark.sql.functions.lit
    // 20k synthetic keys: n=8000 triggers the pre-filter path; compare
    // against the naive full-sort formulation
    val df = spark.range(20000).toDF("doc_id")
    val fast = Sampling.sampleN(df, col("doc_id"), 8000)
      .select("sample_rank", "doc_id").as[(Int, Long)].collect().toSeq
    val naive = df
      .withColumn("__h", org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.concat(lit("42:"), col("doc_id").cast("string"))))
      .orderBy(col("__h"), col("doc_id")).limit(8000)
      .collect().map(_.getLong(0)).toSeq
    assert(fast.map(_._2) == naive)
    assert(fast.map(_._1) == (1 to 8000))
  }

  test("CISI source: sections parsed, .X dropped, .B kept as extra, missing author empty") {
    val fixture = java.nio.file.Files.createTempDirectory("cisi").resolve("t.all")
    val text = ".I 1\n.T\nFirst Title\n.A\nSmith, J.\n.B\nJournal 1971\n.W\nbody one\nline two\n.X\n1 5 1\n" +
      ".I 2\n.T\nSecond\n.W\nbody two\n"
    java.nio.file.Files.write(fixture, text.getBytes("UTF-8"))
    val got = CisiSource.read(spark, fixture.toString)
      .orderBy("cisi_id")
      .as[(Long, String, String, String, Map[String, String])].collect()
    assert(got(0) == ((1L, "First Title", "Smith, J.", "body one\nline two",
      Map("B" -> "Journal 1971"))))
    assert(got(1) == ((2L, "Second", "", "body two", Map.empty[String, String])))
  }

  test("extractPapers end-to-end: files on disk with YAML frontmatter") {
    val out = java.nio.file.Files.createTempDirectory("extract").toString
    val manifest = Extractor.extractPapers(spark, s"$sf/documents.parquet", out, numPapers = 5)
    assert(manifest.count() == 5)
    val first = new java.io.File(out).listFiles().filter(_.isFile).sortBy(_.getName).head
    val content = new String(java.nio.file.Files.readAllBytes(first.toPath), "UTF-8")
    assert(first.getName.matches("paper_\\d{4}\\.md"))
    assert(content.startsWith("---\n"))
    assert(content.contains("\nlang: "))
    assert(content.contains("\n---\n"))
  }

  test("extractPapers: requesting more than available extracts all (main.py:65-67)") {
    val out = java.nio.file.Files.createTempDirectory("extract_all").toString
    val manifest = Extractor.extractPapers(spark, s"$sf/documents.parquet", out, numPapers = 100000)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(manifest.count() == total)
  }

  test("convertCisi end-to-end: cisi_NNNN_title.md files") {
    val dirP = java.nio.file.Files.createTempDirectory("cisi2")
    val fixture = dirP.resolve("c.all")
    java.nio.file.Files.write(fixture,
      ".I 7\n.T\nGraph Theory!\n.A\nA. B.\n.W\ncontent here\n".getBytes("UTF-8"))
    val out = dirP.resolve("out").toString
    val manifest = Extractor.convertCisi(spark, fixture.toString, out)
    val names = manifest.select("filename").as[String].collect()
    assert(names.toSeq == Seq("cisi_0007_Graph_Theory_.md"))
  }

  test("analyzeTokens: stats shape matches api.py result dict") {
    val df = Seq("one two three", "four five").toDF("text")
    val row = Extractor.analyzeTokens(df, "text").collect().head
    assert(row.getLong(0) == 2L)        // document_count
    assert(row.getLong(1) == 5L)        // total_tokens
    assert(row.getDouble(2) == 2.5)     // average
    assert(row.getInt(3) == 2)          // min
    assert(row.getInt(4) == 3)          // max
  }
}
