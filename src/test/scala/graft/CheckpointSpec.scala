package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Similarity}

/** Round 13: the reliable-checkpoint option for the iterative graph
  * family. `spark.graft.checkpointDir` swaps the per-round
  * localCheckpoint for a reliable `rdd.checkpoint` into that directory
  * (IterCheckpoint) — same cadence, same free-the-previous-round
  * lifecycle, bit-identical results; round files are cleaned as the
  * loop advances, so at most two round-artifacts ever live on disk.
  */
class CheckpointSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private def withReliable[A](body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try body(dir)
    finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("labelPropagateOf: reliable checkpoint path is bit-identical to local") {
    val sf = "/root/testdata/sf0.001"
    val knn = Similarity.knnGraph(spark, sf)
      .select(col("vec_id").as("src"), col("nid").as("dst"))
    val sym = knn.union(knn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    val nodes = Similarity.emb(spark, sf).select(col("vec_id"))
    val local = Similarity.labelPropagateOf(nodes, sym)
      .as[(Long, Long, Int)].collect().toSet
    val reliable = withReliable { dir =>
      val r = Similarity.labelPropagateOf(nodes, sym)
        .as[(Long, Long, Int)].collect().toSet
      // the loop freed every round but the last: at most one round's
      // checkpoint files remain under the conf'd directory
      val left = new java.io.File(dir).listFiles().flatMap(_.listFiles())
        .count(_.getName.startsWith("rdd-"))
      assert(left <= 1, s"$left round checkpoints left on disk, expected <= 1")
      r
    }
    assert(reliable == local, "reliable-checkpoint LPA diverged from local path")
  }

  test("labelPropagateOf at 12 rounds: reliable == local, labels stable vs the 4-round fixed point") {
    // the verdict-r17 depth ask: a DEEP loop (12 rounds ≫ the gated 4)
    // through both durability modes — per-round lineage stays one round
    // deep either way, and the reliable path's round files recover the
    // exact same labels
    val sf = "/root/testdata/sf0.001"
    val knn = Similarity.knnGraph(spark, sf)
      .select(col("vec_id").as("src"), col("nid").as("dst"))
    val sym = knn.union(knn.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    val nodes = Similarity.emb(spark, sf).select(col("vec_id"))
    val local12 = Similarity.labelPropagateOf(nodes, sym, rounds = 12)
      .as[(Long, Long, Int)].collect().toSet
    val reliable12 = withReliable { dir =>
      val r = Similarity.labelPropagateOf(nodes, sym, rounds = 12)
        .as[(Long, Long, Int)].collect().toSet
      val left = new java.io.File(dir).listFiles().flatMap(_.listFiles())
        .count(_.getName.startsWith("rdd-"))
      assert(left <= 1, s"$left round checkpoints left on disk, expected <= 1")
      r
    }
    assert(reliable12 == local12, "12-round reliable LPA diverged from local path")
  }

  test("pagerankOf: reliable checkpoint path is bit-identical to local, shallow and 12-round deep") {
    val sf = "/root/testdata/sf0.001"
    val edges = Similarity.knnGraph(spark, sf)
      .select(col("vec_id").as("src"), col("nid").as("dst")).cache()
    val nodes = Similarity.emb(spark, sf).select(col("vec_id"))
    for (rounds <- Seq(3, 12)) {
      val local = Similarity.pagerankOf(nodes, edges, rounds = rounds)
        .as[(Long, Long)].collect().toSet
      val reliable = withReliable { dir =>
        val r = Similarity.pagerankOf(nodes, edges, rounds = rounds)
          .as[(Long, Long)].collect().toSet
        val left = new java.io.File(dir).listFiles().flatMap(_.listFiles())
          .count(_.getName.startsWith("rdd-"))
        assert(left <= 1, s"$left round checkpoints left on disk, expected <= 1")
        r
      }
      assert(reliable == local,
        s"$rounds-round reliable pagerank diverged from local path")
    }
  }

  test("connectedComponents: reliable checkpoint path is bit-identical to local") {
    // a 60-node path graph (worst case for propagation depth) plus
    // isolated vertices that must come back as their own components
    val edges = (0L until 59L).map(i => (i, i + 1)).toDF("src", "dst")
    val verts = (0L until 70L).toDF("id")
    val local = Graph.connectedComponents(verts, edges)
      .as[(Long, Long)].collect().toSet
    val reliable = withReliable { _ =>
      Graph.connectedComponents(verts, edges).as[(Long, Long)].collect().toSet
    }
    assert(reliable == local)
    assert(local.count(_._2 == 0L) == 60, "path graph should collapse to component 0")
  }

  test("moving spark.graft.checkpointDir mid-session re-points the SparkContext dir") {
    // ADVICE r13: the reliable path used to set the SC checkpoint dir
    // only when unset, so a conf change mid-session silently kept
    // writing rounds into the OLD directory. Run once under dir A,
    // then under dir B, and assert B actually received round files.
    val edges = (0L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val verts = (0L until 20L).toDF("id")
    val a = withReliable { dirA =>
      Graph.connectedComponents(verts, edges).collect()
      dirA
    }
    val b = withReliable { dirB =>
      Graph.connectedComponents(verts, edges).collect()
      val files = new java.io.File(dirB).listFiles()
      assert(files != null && files.nonEmpty,
        s"checkpoint dir B ($dirB) untouched — rounds still landing in A ($a)")
      dirB
    }
    assert(a != b)
  }
}
