package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.sources.WarcSource

/** HTML → text extraction (round 14): the boilerplate strip between a
  * raw crawl capture and WET-style text. Crafted edge cases plus the
  * composition it exists for — a WARC `response` record's HTML payload
  * flowing into readable text. */
class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(TextAnalysis.htmlToText(col("h")).as("t"))
      .head.getString(0)

  test("script/style/comment bodies drop whole, even with tag lookalikes inside") {
    val html = "<p>keep</p><script>if (a < b) { document.write('</div>'); }</script>" +
      "<style>.x > .y { }</style><!-- <p>not text</p> --><p>also</p>"
    assert(extract(html) == "keep\nalso")
  }

  test("block tags become newlines, inline tags spaces, case-insensitive, self-closing") {
    val html = "<H1>Title</H1><P>one <b>bold</b> two<BR/>three</P><span>tail</span>"
    assert(extract(html) == "Title\none bold two\nthree\ntail")
  }

  test("entities decode with &amp; last: '&amp;lt;' stays '&lt;'") {
    assert(extract("<p>a &lt; b &amp; c &gt; d</p>") == "a < b & c > d")
    assert(extract("<p>literal &amp;lt; entity</p>") == "literal &lt; entity")
    assert(extract("<p>&quot;q&quot; &#39;s&#39;&nbsp;end</p>") == "\"q\" 's' end")
  }

  test("whitespace collapses: runs with newlines to one newline, spaces to one space") {
    val html = "<div>  a   b </div>\n\n  <div> c </div>  "
    assert(extract(html) == "a b\nc")
  }

  test("composition: WARC response records extract to readable text, charset honored") {
    val html = "<html><head><script>var x=1;</script></head><body>" +
      "<h1>Page</h1><p>body text here</p></body></html>"
    // a latin-1 page: the readResponses charset policy must decode it
    // before the boilerplate strip (hard-coded UTF-8 would mojibake)
    val htmlL1 = "<html><body><p>café crème</p></body></html>"
    val dir = java.nio.file.Files.createTempDirectory("warc_html").toString
    val recs = WarcSource.render("response", "http://x.test/page",
        "2026-01-01T00:00:00Z", "<urn:uuid:p>", "text/html", html.getBytes("UTF-8")) ++
      WarcSource.render("response", "http://x.test/l1",
        "2026-01-01T00:00:00Z", "<urn:uuid:l1>", "text/html; charset=ISO-8859-1",
        htmlL1.getBytes("ISO-8859-1"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "one.warc"), recs)
    val got = WarcSource.readResponses(spark, dir)
      .select(col("target_uri"), TextAnalysis.htmlToText(col("html")).as("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("http://x.test/page") == "Page\nbody text here")
    assert(got("http://x.test/l1") == "café crème",
      s"latin-1 response must decode per its charset: ${got("http://x.test/l1")}")
  }
}
