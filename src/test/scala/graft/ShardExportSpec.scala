package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ShardExport

/** Training-shard export (round 15): deterministic md5-order shuffle →
  * block packing → document-aligned shard files + manifest. The
  * dataloader contract: shard tree readable as plain parquet, row order
  * within a shard replays the shuffle, manifest closed-form over the
  * tree, re-export idempotent. */
class ShardExportSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("roundtrip: shard tree holds exactly the non-empty corpus, whole docs, manifest-consistent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = ShardExport.exportShards(docs, out, blocksPerShard = 2L).cache()

    // multi-shard at this sizing, ids contiguous from 0 (block streams are)
    val shardIds = manifest.select(col("shard_id")).as[Long].collect().sorted.toSeq
    assert(shardIds.size > 2, s"want a multi-shard export, got $shardIds")
    assert(shardIds == (0L until shardIds.size).toSeq, s"shard ids not contiguous: $shardIds")

    // the tree reads back as ONE parquet table; every non-empty doc
    // appears exactly once with its text intact (document-aligned:
    // nothing splits, nothing duplicates)
    val back = spark.read.parquet(out).cache()
    val want = docs
      .filter(size(graft.functions.TextFns.tokens(col("text"))) > 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSet
    val got = back.select(col("doc_id"), col("text")).as[(Long, String)].collect().toSet
    assert(got == want, "shard tree must hold exactly the non-empty corpus")

    // per-shard doc counts and token sums equal the manifest's
    val perShard = back
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n"),
        sum(size(graft.functions.TextFns.tokens(col("text"))).cast("long")).as("toks"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    manifest.select(col("shard_id"), col("n_docs"), col("n_tokens"))
      .as[(Long, Long, Long)].collect().foreach { case (s, nd, nt) =>
        assert(perShard(s) == ((nd, nt)), s"shard $s tree/manifest mismatch")
      }

    // one data file per shard directory (fixed-size shard FILES, not
    // a spray of parts), manifest invisible to the tree read
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard_id="))
    assert(dirs.length == shardIds.size)
    dirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName}: want 1 shard file, got ${parts.length}")
    }

    // within a shard, row order replays the deterministic shuffle
    // (okey ascending) — what lets a loader stream the file as-is
    val first = spark.read.parquet(s"$out/shard_id=${shardIds.head}")
      .select(col("okey")).as[String].collect().toSeq
    assert(first == first.sorted, "shard rows must be in shuffle (okey) order")

    // each shard's first block sits in its own block window, and first
    // blocks strictly increase. last_block MAY spill into the next
    // window — that's the straddling document that document alignment
    // keeps whole (the one deliberate deviation from exact tiling)
    val ranges = manifest.orderBy(col("shard_id"))
      .select(col("shard_id"), col("first_block"), col("last_block"))
      .as[(Long, Long, Long)].collect()
    ranges.foreach { case (s, f, l) =>
      assert(f / 2L == s && l >= f, s"shard $s first_block $f outside its window")
    }
    ranges.sliding(2).foreach {
      case Array((_, f1, _), (_, f2, _)) =>
        assert(f2 > f1, "shard first blocks must strictly increase")
      case _ =>
    }

    // idempotence: a re-export rewrites the same manifest (mode
    // overwrite + partitionBy — the writeCorpusPartitioned rules)
    val manifest2 = ShardExport.exportShards(docs, out, blocksPerShard = 2L)
    val m1 = manifest.collect().map(_.toString).toSeq
    val m2 = manifest2.collect().map(_.toString).toSeq
    assert(m1 == m2, "re-export must be byte-stable")
    manifest.unpersist(); back.unpersist()
  }

  test("shard assignment plans window-free (distributed prefix sum, not a global WindowExec)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = graft.operators.ShardExport.shardAssign(docs, 2L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"the md5-order pack must be the distributed prefix sum, not a global window:\n$plan")
  }

  test("releaseShards ships exactly what the v2 card says: kept docs, redacted text, per split") {
    import graft.operators.Curation
    val out = java.nio.file.Files.createTempDirectory("release_shards").toString
    val manifest = Curation.releaseShards(spark, sf, out, blocksPerShard = 2L).cache()
    val card = Curation.releaseManifestV2(spark, sf).cache()
    // per-split doc counts: shard manifest == card
    val mDocs = manifest.groupBy(col("split")).agg(sum(col("n_docs")).as("n"))
      .as[(String, Long)].collect().toMap
    val cDocs = card.groupBy(col("split")).agg(sum(col("n_docs")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(mDocs == cDocs, s"shard trees $mDocs != card $cDocs")
    // the contaminated seed never ships; the PII seed ships REDACTED
    val shipped = mDocs.keys.map(s => spark.read.parquet(s"$out/split=$s")
      .select(col("doc_id"), col("text"))).reduce(_ unionByName _)
      .as[(Long, String)].collect().toMap
    assert(!shipped.contains(9000000001L), "contaminated seed must not ship")
    val piiText = shipped(9000000002L)
    assert(piiText.contains("<EMAIL>") && piiText.contains("<PHONE>"),
      s"shipped text must be the redacted text: $piiText")
    assert(!piiText.contains("curator@") && !piiText.contains("415"),
      s"raw PII must not ship: $piiText")
    manifest.unpersist(); card.unpersist()
  }

  test("gated manifest: totals equal the corpus, shards are block-budget-sized") {
    val m = ShardExport.shardExport(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val wantToks = docs
      .select(size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0).agg(sum(col("n"))).as[Long].head()
    val gotToks = m.agg(sum(col("n_tokens"))).as[Long].head()
    assert(gotToks == wantToks, "manifest token total must equal the corpus")
    // every shard but the last spans exactly the block budget
    val spans = m.orderBy(col("shard_id"))
      .select((col("last_block") - col("first_block")).as("s")).as[Long].collect()
    spans.dropRight(1).foreach { s =>
      assert(s >= ShardExport.GateBlocksPerShard - 1,
        s"non-final shard spans $s blocks — under the budget")
    }
    m.unpersist()
  }
}
