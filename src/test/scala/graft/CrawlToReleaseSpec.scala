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

  test("crawl corpus → release manifest v2 (decontam + PII) → per-split shard handoff") {
    // v2 runs winnow decontamination against the doc_id < 5 probe
    // slice, so THIS corpus must not share ≥8-token passages across
    // docs the way body()'s template deliberately does — every 3-token
    // window here carries a doc-unique token (the
    // IncrementalReleaseSpec corpus), while interleaved stopwords keep
    // docs past the gate
    val commons = Seq("the", "and", "with", "near", "over", "from",
      "into", "upon", "that", "when", "then")
    def body2(i: Long): String =
      (1 to 12).map(k => s"crawl${i}_$k").zipAll(commons, "", "")
        .flatMap { case (u, c) => Seq(u, c) }.filter(_.nonEmpty).mkString(" ")
    // 10 good docs + one with PII + one contaminated (carries the
    // winnow seed passage, gate-passing)
    val pii = 300L -> (body2(300L) +
      " contact curator@example.org or +1 415 555 0199 for the archive")
    val contaminated = 301L -> (body2(301L) +
      s" and this page also copies ${Curation.WinnowSeedPassage} verbatim")
    val all = (0L until 10L).map(i => (i, body2(i))) ++ Seq(pii, contaminated)
    val corpusDir = tmp("c2r2_corpus")
    all.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("webcrawl").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.parquet(s"$corpusDir/documents.parquet")

    val card = Curation.releaseManifestV2(spark, corpusDir).cache()
    val crawlRows = card.filter(col("source") === "webcrawl").collect()
    val nContam = crawlRows.map(_.getAs[Long]("n_contaminated")).sum
    val nDocs = crawlRows.map(_.getAs[Long]("n_docs")).sum
    val nRedact = crawlRows.filter(!_.isNullAt(crawlRows.head.fieldIndex("n_redacted")))
      .map(_.getAs[Long]("n_redacted")).sum
    assert(nContam == 1, s"planted contaminated crawl doc must drop: $nContam")
    assert(nDocs == 11, s"10 good + the redacted PII doc must ship: $nDocs")
    assert(nRedact == 2, s"the PII doc's email + phone must count: $nRedact")
    card.unpersist()

    // dataloader handoff: per-split shards over the crawl corpus
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val splits = Curation.splitLeakSafeOf(
      docs.select(col("doc_id"), col("source")),
      graft.operators.Dedup.clustersCached(spark, corpusDir))
    val shardDir = tmp("c2r2_shards")
    val manifest = graft.operators.ShardExport
      .exportSplitShards(docs, splits, shardDir, blocksPerShard = 2L)
      .collect()
    val splitNames = manifest.map(_.getAs[String]("split")).distinct.sorted
    assert(splitNames.nonEmpty && splitNames.forall(Set("train", "val", "test")))
    // every split's tree reads back; the union is exactly the corpus
    val back = splitNames.map(s => spark.read.parquet(s"$shardDir/split=$s")
      .select(col("doc_id")).as[Long].collect().toSet)
    assert(back.reduce(_ ++ _) == all.map(_._1).toSet,
      "per-split shard trees must union to exactly the corpus")
    assert(back.map(_.size).sum == all.size, "no doc may appear in two splits")
    // manifests agree with their trees
    splitNames.zip(back).foreach { case (s, ids) =>
      val m = manifest.filter(_.getAs[String]("split") == s)
      assert(m.map(_.getAs[Long]("n_docs")).sum == ids.size,
        s"split $s manifest/tree doc-count mismatch")
    }
  }
}
