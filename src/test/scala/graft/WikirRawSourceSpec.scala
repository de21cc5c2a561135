package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.WikirRawSource

/** Raw wikIR distribution reader (the files ir_datasets iterates for
  * the reference, api.py:219-232): documents.csv / queries.csv RFC-4180
  * parse edge cases, TREC qrels whitespace variants, and the shared
  * normalize tail. Fixtures are rendered by our own independent
  * renderer, not Spark's writer. */
class WikirRawSourceSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test

  private def fixture(docsCsv: String, queriesCsv: String, qrels: String): String = {
    val root = java.nio.file.Files.createTempDirectory("wikir_raw").toString
    def put(path: String, body: String): Unit = {
      val p = java.nio.file.Paths.get(path)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    put(s"$root/documents.csv", docsCsv)
    put(s"$root/validation/queries.csv", queriesCsv)
    put(s"$root/validation/qrels", qrels)
    root
  }

  test("documents.csv: plain, comma-quoted, doubled-quote, and empty fields parse") {
    val root = fixture(
      "id_right,text_right\n" +
        "1,plain words\n" +
        "2,\"a, comma\"\n" +
        "3,\"she said \"\"hi\"\" twice\"\n" +
        "4,\n",
      "id_left,text_left\n10,q\n",
      "10\t0\t1\t1\n")
    val docs = WikirRawSource.readDocuments(spark, root).orderBy("doc_id").collect()
    assert(docs.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(docs(0).getString(1) == "plain words")
    assert(docs(1).getString(1) == "a, comma")
    assert(docs(2).getString(1) == "she said \"hi\" twice")
    assert(docs(3).isNullAt(1)) // trailing empty field → null text
  }

  test("renderers roundtrip through the reader, including the quoting cases") {
    val rows = Seq(
      (7L, "no specials"),
      (8L, "comma, and \"quotes\""),
      (9L, ""))
    val root = fixture(
      WikirRawSource.renderDocumentsCsv(rows),
      WikirRawSource.renderQueriesCsv(Seq((1L, "a query, quoted \"q\""))),
      WikirRawSource.renderQrels(Seq((1L, 7L, 2L))))
    val docs = WikirRawSource.readDocuments(spark, root).orderBy("doc_id").collect()
    assert(docs(0).getString(1) == "no specials")
    assert(docs(1).getString(1) == "comma, and \"quotes\"")
    // empty string renders unquoted → reads back null (CSV's inherent
    // ""-vs-null ambiguity; wikIR corpora carry no empty documents)
    assert(docs(2).isNullAt(1))
    val q = WikirRawSource.readQueries(spark, root, "validation").head()
    assert(q.getLong(0) == 1L && q.getString(1) == "a query, quoted \"q\"")
  }

  test("multiLine opt-in: quoted embedded newline survives") {
    val root = fixture(
      "id_right,text_right\n1,\"line one\nline two\"\n",
      "id_left,text_left\n", "")
    val doc = WikirRawSource.readDocuments(spark, root, multiLine = true).head()
    assert(doc.getString(1) == "line one\nline two")
  }

  test("qrels: tabs, runs of spaces, and blank lines all parse") {
    val root = fixture(
      "id_right,text_right\n",
      "id_left,text_left\n",
      "5\t0\t100\t2\n" +
        "5 0 101 1\n" +
        "\n" +
        "6  0   102  0\n")
    val qr = WikirRawSource.readQrels(spark, root, "validation")
      .orderBy("query_id", "doc_id").collect()
    assert(qr.length == 3)
    assert(qr.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((5L, "0", 100L, 2L), (5L, "0", 101L, 1L), (6L, "0", 102L, 0L)))
  }

  test("qrels: malformed lines fail loudly (FAILFAST parity with the CSV readers)") {
    val root = fixture(
      "id_right,text_right\n",
      "id_left,text_left\n",
      "5 0 100 2\n" +
        "not-a-qid 0 101 1\n" + // non-numeric qid → null after cast
        "6 0\n") // <4 fields → null doc_id/relevance
    val e = intercept[IllegalArgumentException] {
      WikirRawSource.readQrels(spark, root, "validation").collect()
    }
    assert(e.getMessage.contains("malformed"))
    assert(e.getMessage.contains("2")) // both bad lines counted
  }

  test("qrels: validation survives full column pruning — count() on malformed qrels throws") {
    // r15 advice: the guard rode inside the four output columns, so a
    // consumer that prunes them all (df.count(), an existence-only
    // join) never evaluated it and malformed lines passed silently.
    // The guard is a FILTER predicate now — pruning can't remove it.
    val root = fixture(
      "id_right,text_right\n",
      "id_left,text_left\n",
      "5 0 100 2\nnot-a-qid 0 101 1\n")
    val e = intercept[Exception] {
      WikirRawSource.readQrels(spark, root, "validation").count()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("malformed")),
      s"count() must still validate every line; got: ${msgs.mkString(" | ")}")
  }

  test("load: raw docs flow through the shared normalize (Document-id title fallback)") {
    val root = fixture(
      "id_right,text_right\n42,some body text\n",
      "id_left,text_left\n", "")
    val out = WikirRawSource.load(spark, root).head()
    assert(out.getAs[Long]("doc_id") == 42L)
    assert(out.getAs[String]("title") == "Document 42")
    assert(out.getAs[String]("content") == "some body text")
    assert(out.getAs[String]("filename") == "wikir_42.pdf")
  }
}
