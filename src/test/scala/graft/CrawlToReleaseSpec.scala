package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation
import graft.sources.WarcSource

/** The CAPSTONE composition (round 14) — the pipeline a user actually
  * runs, end to end: crawl archives land in a directory → streaming
  * WARC ingest → documents table → `curation_release_manifest`
  * (curate → leak-safe split → pack → per-source card). Every stage
  * is the gated definition; this spec proves they COMPOSE: dupes
  * planted in the archives collapse in the card, junk documents never
  * reach it, splits partition the survivors, and block counts are the
  * packing core's own arithmetic. */
class CrawlToReleaseSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(n).toString

  // ~40-token English-ish body, unique per id, gate-passing (stopword
  // ratio, token lengths, low repetition)
  private def body(id: Long): String =
    (0 until 8).map { s =>
      s"the quick study ${id}x$s of a corpus and its tokens is " +
        s"useful to measure in practice ${id * 7 + s}"
    }.mkString(" ")

  test("crawl archives → streaming ingest → documents → release manifest") {
    // 14 records: 10 unique good docs, 2 exact dups of doc 0 (planted),
    // 2 junk (too short for the quality gate)
    val good = (0L until 10L).map(i => (i, body(i)))
    val dups = Seq(100L -> body(0L), 101L -> body(0L))
    val junk = Seq(200L -> "too short", 201L -> "also tiny")
    val all = good ++ dups ++ junk
    val warcDir = tmp("c2r_warc")
    WarcSource.write(
      all.toDF("doc_id", "text").repartition(2).select(
        lit("conversion").as("warc_type"),
        concat(lit("http://crawl.test/"), col("doc_id")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:uuid:"), col("doc_id"), lit(">")).as("record_id"),
        lit("text/plain").as("content_type"),
        encode(col("text"), "UTF-8").as("payload"),
        map(lit("WARC-X-Src"), lit("webcrawl")).as("extra")),
      warcDir, gzip = true)

    // streaming ingest → parquet sink
    val ingested = tmp("c2r_docs") + "/wet"
    val q = graft.streaming.EventStream.warcIngestStream(
      spark, warcDir, ingested, tmp("c2r_ck"))
    q.processAllAvailable(); q.stop()

    // WET frame → the documents table shape the whole engine consumes
    val corpusDir = tmp("c2r_corpus")
    spark.read.parquet(ingested)
      .select(
        element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
        col("text"),
        lit("en").as("lang"),
        element_at(col("headers"), "warc-x-src").as("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.parquet(s"$corpusDir/documents.parquet")

    val card = Curation.releaseManifest(spark, corpusDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(card.nonEmpty)
    // every card row is source 'webcrawl' (threaded through the WARC
    // extension header, not invented downstream)
    assert(card.forall(_._2 == "webcrawl"))
    // junk never reaches the card; the 2 planted dups collapsed
    val nDocs = card.map(_._3).sum
    val nDupes = card.map(_._5).sum
    assert(nDocs == 10, s"card holds $nDocs docs, want the 10 unique good ones")
    assert(nDupes == 2, s"card counts $nDupes collapsed dupes, want the 2 planted")
    // splits partition the survivors; block counts are ceil(tokens/1024)
    // per split (contiguous packing arithmetic)
    card.groupBy(_._1).foreach { case (_, rows) =>
      val tok = rows.map(_._4).sum
      val blocks = rows.map(_._6).head
      assert(blocks == (tok + 1023) / 1024,
        s"split ${rows.head._1}: $blocks blocks for $tok tokens")
    }
    assert(card.map(_._1).distinct.forall(Set("train", "val", "test")))
  }
}
