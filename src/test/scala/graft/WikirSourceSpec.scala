package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.WikirSource

/** Attribute-fallback semantics of the wikir-shaped source
  * (api.py:262-331) on handcrafted rows covering every branch. */
class WikirSourceSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("title chain: title, then URL:, then Document id; 80-char cap; latin-1 gate") {
    val df = Seq(
      (1L, "A Title", "http://u", "body text"),
      (2L, "", "http://u2", "x"),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String], "x"),
      (4L, "é" * 200, null.asInstanceOf[String], "x"), // latin-1 ok: kept, capped at 80
      (5L, "日本語タイトル", null.asInstanceOf[String], "x")) // non-latin-1 → sanitized
      .toDF("doc_id", "title", "url", "text")
    val out = WikirSource.normalize(df).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("title") == "A Title")
    assert(out(1).getAs[String]("title") == "URL: http://u2")
    assert(out(2).getAs[String]("title") == "Document 3")
    assert(out(3).getAs[String]("title") == "é" * 80)
    assert(out(4).getAs[String]("title") == "_" * "日本語タイトル".length)
  }

  test("content chain: text, body, attribute dump (sorted, 100-char cap), placeholder") {
    val df = Seq(
      (1L, "the text", "the body", "en", "s1"),
      (2L, "", "the body", "en", "s2"),
      (3L, "", "", "zz", "y" * 150),
      (4L, "", "", "", "")) // nothing at all
      .toDF("doc_id", "text", "body", "lang", "source")
    val out = WikirSource.normalize(df).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("content") == "the text")
    assert(out(1).getAs[String]("content") == "the body")
    assert(out(2).getAs[String]("content") ==
      "Available attributes:\n\nlang: zz\n\nsource: " + "y" * 100 + "...")
    assert(out(3).getAs[String]("content") == "No text content available for this document")
  }

  test("content is unescaped, ascii-sanitized, truncated — in that order") {
    val df = Seq((1L, "&lt;b&gt; café " + "x" * 60000)).toDF("doc_id", "text")
    val c = WikirSource.normalize(df).head().getAs[String]("content")
    assert(c.startsWith("<b> caf_ "))
    assert(c.length == 50000)
  }

  test("extract writes one stub PDF per doc with wikir_{id}.pdf names, capped at 500") {
    val out = java.nio.file.Files.createTempDirectory("wikir").toString
    val docs = spark.range(0, 7).select(
      col("id").as("doc_id"),
      concat(lit("t"), col("id")).as("title"),
      lit("content words").as("text"))
    val manifest = WikirSource.extract(spark, docs, out, limit = 5)
    assert(manifest.count() == 5)
    val names = new java.io.File(out).list().sorted.toSeq
    assert(names == Seq("wikir_0.pdf", "wikir_1.pdf", "wikir_2.pdf", "wikir_3.pdf", "wikir_4.pdf"))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out, "wikir_0.pdf"))
    assert(new String(bytes).startsWith("%PDF-1.4"))
  }

  test("crawl source stub: reference category-walk selection semantics") {
    import graft.sources.CrawlSource
    // primary category first, related categories in order, ns-0 only,
    // first-occurrence dedupe, hard cap at limit (api.py:647-714)
    val listing: Map[String, Seq[(String, Int)]] = Map(
      "World_War_II" -> Seq(("D-Day", 0), ("Talk:D-Day", 1), ("Blitz", 0)),
      "World_War_II_by_country" -> Seq(("Blitz", 0), ("Pacific War", 0)),
      "Battles_of_World_War_II" -> Seq(("Battle of Midway", 0)))
    val provider = (c: String) => listing.getOrElse(c, throw new RuntimeException("listing failed"))

    assert(CrawlSource.articleTitles(provider, 10) ==
      Seq("D-Day", "Blitz", "Pacific War", "Battle of Midway"))
    assert(CrawlSource.articleTitles(provider, 3) == Seq("D-Day", "Blitz", "Pacific War"))
    // a failing category listing is skipped, not fatal
    val flaky = (c: String) =>
      if (c == "World_War_II_by_country") throw new RuntimeException("http 503")
      else listing.getOrElse(c, Seq.empty)
    assert(CrawlSource.articleTitles(flaky, 10) == Seq("D-Day", "Blitz", "Battle of Midway"))
    // endpoint clamp + DataFrame shape
    assert(CrawlSource.clampLimit(5000) == 1000)
    val df = CrawlSource.articles(spark, provider, 2)
    assert(df.columns.toSeq == Seq("title"))
    assert(df.as[String].collect().toSeq == Seq("D-Day", "Blitz"))
  }
}
