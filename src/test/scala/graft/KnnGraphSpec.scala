package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Structural properties of the round-11 graph-shaped ANN outputs:
  * sim_knn_graph (per-vector top-J within-cell neighbor lists) and
  * curation_density_prune (SemDeDup-style keep-the-local-minimum rule
  * over that graph). The DuckDB hash gate proves value-exactness; this
  * spec pins the graph invariants and the plan shape so a rewrite that
  * keeps values but breaks the scale story (e.g. loses the top-J
  * WindowGroupLimit pushdown) fails loudly.
  */
class KnnGraphSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.01"

  test("knnGraph: <=J dense-ranked rows per vector, no self-edges, sims sorted") {
    val g = Similarity.knnGraph(spark, SfDir)
      .select("vec_id", "nid", "sim", "rn")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(g.nonEmpty)
    assert(g.forall { case (v, n, _, _) => v != n }, "self-edge found")
    g.groupBy(_._1).foreach { case (v, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.size <= 3, s"vec $v has ${sorted.size} > J rows")
      assert(sorted.map(_._4) == (1 to sorted.size), s"vec $v ranks not dense")
      // sims non-increasing with rank; ties broken by ascending nid
      sorted.sliding(2).foreach {
        case Seq((_, n1, s1, _), (_, n2, s2, _)) =>
          assert(s1 > s2 || (s1 == s2 && n1 < n2), s"vec $v order violated")
        case _ => ()
      }
    }
    // the graph must cover most of the corpus (only vectors alone in
    // their cell may be absent — documented contract)
    val nVecs = Similarity.emb(spark, SfDir).count()
    assert(g.map(_._1).distinct.size >= nVecs * 0.9,
      "more than 10% of vectors have no within-cell neighbors")
  }

  test("knnGraphMerge: merged == full rebuild under frozen centroids; untouched cells reuse stored edges") {
    // the ivfPqIndexMerge proof shape for the graph family: train
    // centroids on the WHOLE corpus (frozen model), build the stored
    // graph from half, merge the second half in — must equal the
    // one-shot build over everything, bit for bit
    val all = Similarity.emb(spark, SfDir).cache()
    val k = Similarity.knnCellsFor(all.count())
    val cents = Similarity.kmeansCentroidSeqs(all, k, iters = 3)
    val assigned = Similarity.assignCellsCosine(all, cents)
      .select($"vec_id", $"vec", $"cid").cache()
    val cells1 = assigned.filter($"vec_id" % 2 === 0).cache()
    val arriving = assigned.filter($"vec_id" % 2 =!= 0)
    val stored = Similarity.knnGraphOf(cells1).cache()
    val merged = Similarity.knnGraphMerge(stored, cells1, arriving)
      .select($"vec_id", $"nid", $"sim", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    val rebuilt = Similarity.knnGraphOf(assigned)
      .select($"vec_id", $"nid", $"sim", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(merged == rebuilt && merged.nonEmpty,
      "merged graph must equal the frozen-centroid rebuild exactly")

    // a batch that touches ONE cell: every other vector's rows must
    // come through the merge as the STORED rows, verbatim
    val oneCell = arriving.orderBy($"vec_id").limit(1).cache()
    val cid0 = oneCell.select($"cid").as[Int].head()
    val merged1 = Similarity.knnGraphMerge(stored, cells1, oneCell)
    val untouchedStored = stored.join(cells1.filter($"cid" =!= cid0)
        .select($"vec_id"), Seq("vec_id"))
      .select($"vec_id", $"nid", $"sim", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    val untouchedMerged = merged1.join(cells1.filter($"cid" =!= cid0)
        .select($"vec_id"), Seq("vec_id"))
      .select($"vec_id", $"nid", $"sim", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(untouchedMerged == untouchedStored && untouchedStored.nonEmpty,
      "merge must not disturb cells the batch didn't land in")

    // drift gate on the frozen cells: sane on the organic assignment,
    // fires when a batch piles into one cell
    val (skew, retrain) = Similarity.knnGraphDriftGate(assigned)
    assert(skew >= 1.0 && !retrain, s"organic cells flagged: skew=$skew")
    val piled = assigned.select($"vec_id", $"vec", lit(1).as("cid"))
      .limit(400).union(assigned.filter($"vec_id" < 10)
        .select($"vec_id" + 10000, $"vec", ($"vec_id" % 5 + 2).cast("int").as("cid")))
    val (skew2, retrain2) = Similarity.knnGraphDriftGate(piled)
    assert(retrain2, s"400-in-one-cell pile must trigger retrain (skew=$skew2)")
    assert(Similarity.knnGraphDriftGate(piled.filter($"cid" < 0)) == ((0.0, false)))
  }

  test("densityPrune: one row per vector; dense neighborhoods keep their local min id") {
    val g = Similarity.knnGraph(spark, SfDir)
      .select("vec_id", "nid", "sim")
      .as[(Long, Long, Double)].collect().toSeq
    val p = Similarity.densityPrune(spark, SfDir)
      .as[(Long, Int, Boolean)].collect().toSeq
    val nVecs = Similarity.emb(spark, SfDir).count()
    assert(p.size == nVecs, "prune must emit one decision per vector")
    val close = g.filter(_._3 >= 0.40).groupBy(_._1)
    p.foreach { case (v, cnt, keep) =>
      val nbrs = close.getOrElse(v, Seq.empty).map(_._2)
      assert(cnt == nbrs.size, s"vec $v close_cnt $cnt != ${nbrs.size}")
      assert(keep == (nbrs.isEmpty || v < nbrs.min), s"vec $v keep rule violated")
    }
    // non-vacuous at the gated SF: some vectors must actually be dropped
    assert(p.exists(!_._3), "density prune is vacuous at sf0.01 — recalibrate tau")
    assert(p.count(_._3) > p.size / 2, "prune dropped most of the corpus")
  }

  test("graphPagerank: one score per vector, positive, non-uniform, mass bounded") {
    // pr is FIXED-POINT BIGINT (1e12-scale micro-rank units — no float
    // op ever touches the rank; see the PrE scaladoc for why)
    val E = 1000000000000L
    val pr = Similarity.graphPagerank(spark, SfDir)
      .as[(Long, Long)].collect().toSeq
    val nVecs = Similarity.emb(spark, SfDir).count()
    assert(pr.size == nVecs)
    assert(pr.forall(_._2 > 0), "pagerank scores must be positive")
    // the graph must actually separate hubs from leaves: a uniform
    // vector would mean the edge join contributed nothing
    assert(pr.map(_._2).distinct.size > 10, "pagerank collapsed to near-uniform")
    // dangling mass and truncation only SHRINK totals: sum <= E, and
    // the floor term keeps it above (1-d)*E = 0.15*E (minus truncation)
    val total = pr.map(_._2).sum
    assert(total <= E && total >= (3L * E) / 20L - nVecs,
      s"total mass $total out of range")
    // in-degree-0 vectors sit exactly on the integer floor term
    val g = Similarity.knnGraph(spark, SfDir).select("nid").distinct()
      .as[Long].collect().toSet
    val base = (3L * E) / (20L * nVecs)
    val floor = pr.filter(p => !g.contains(p._1)).map(_._2)
    assert(floor.forall(_ == base),
      "in-degree-0 vectors must hold exactly the (1-d)E/N floor")
  }

  test("pagerankOf/densityPruneOf: a parquet-roundtripped graph serves identically to inline") {
    val dir = "/root/testdata/sf0.001"
    val out = "target/tmp/knn_graph_spec"
    Similarity.knnGraph(spark, dir).write.mode("overwrite").parquet(out)
    val stored = spark.read.parquet(out)
    val nodes = Similarity.emb(spark, dir).select(col("vec_id"))
    val prInline = Similarity.graphPagerank(spark, dir)
      .as[(Long, Long)].collect().toSeq
    val prStored = Similarity.pagerankOf(nodes,
        stored.select(col("vec_id").as("src"), col("nid").as("dst")))
      .as[(Long, Long)].collect().toSeq
    assert(prInline == prStored, "pagerank from the stored graph must bit-match inline")
    val dpInline = Similarity.densityPrune(spark, dir)
      .as[(Long, Int, Boolean)].collect().toSeq
    val dpStored = Similarity.densityPruneOf(nodes, stored)
      .as[(Long, Int, Boolean)].collect().toSeq
    assert(dpInline == dpStored, "prune from the stored graph must bit-match inline")
  }

  test("labelPropagateOf: cliques joined by one bridge split; singletons keep their label") {
    // two 3-cliques {0,1,2} and {3,4,5}, one undirected bridge 2–3, and
    // an isolated node 6 — LPA must NOT fuse across the sparse cut
    // (that is connectedComponents' job) and must leave 6 alone
    val cliqueA = Seq((0L, 1L), (0L, 2L), (1L, 2L))
    val cliqueB = Seq((3L, 4L), (3L, 5L), (4L, 5L))
    val und = (cliqueA ++ cliqueB ++ Seq((2L, 3L)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = (0L to 6L).toDF("vec_id")
    val res = Similarity.labelPropagateOf(nodes, und.toDF("src", "dst"))
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._1)
    assert(res.map(_._1) == (0L to 6L))
    val lbl = res.map(r => r._1 -> r._2).toMap
    assert(Set(lbl(0), lbl(1), lbl(2)).size == 1, "clique A not one community")
    assert(Set(lbl(3), lbl(4), lbl(5)).size == 1, "clique B not one community")
    assert(lbl(0) != lbl(3), "bridge fused the two cliques")
    assert(lbl(6) == 6L, "isolated node must keep its own label")
    // csize is consistent with the label partition
    res.foreach { case (v, l, sz) =>
      assert(sz == res.count(_._2 == l), s"vec $v csize $sz inconsistent") }
  }

  test("labelPropagateOf at 12 rounds == the unchecked reference loop (checkpoint cadence changes nothing)") {
    // VERDICT r11 #9: the per-round localCheckpoint is a lineage/AQE
    // tactic and must be INVISIBLE to values at any round count. The
    // reference loop below is the same synchronous majority-min update
    // written with NO checkpointing; 12 rounds on a crafted graph
    // (a 13-node path, slow to converge, plus a 4-clique) must agree
    // exactly. The wall-linearity half of the story is ScaleKnn's
    // 12-round case at 1 M nodes.
    val path = (0L until 12L).map(i => (i, i + 1))
    val clique = Seq((20L, 21L), (20L, 22L), (20L, 23L),
      (21L, 22L), (21L, 23L), (22L, 23L))
    val und = (path ++ clique).flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = ((0L to 12L) ++ (20L to 23L)).toDF("vec_id")
    val edges = und.toDF("src", "dst")
    val rounds = 12
    val got = Similarity.labelPropagateOf(nodes, edges, rounds)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._1)

    // reference: plain Scala synchronous LPA, no Spark, no checkpoints
    val nodeIds = ((0L to 12L) ++ (20L to 23L)).toSeq
    val inEdges = und.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
    var lbl = nodeIds.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      val next = nodeIds.map { v =>
        val nbrLbls = inEdges.getOrElse(v, Seq.empty).map(lbl)
        if (nbrLbls.isEmpty) v -> lbl(v)
        else {
          val byLbl = nbrLbls.groupBy(identity).map { case (l, o) => (l, o.size) }
          // majority, ties -> smallest label (the max(struct(c, -l)) rule)
          v -> byLbl.toSeq.maxBy { case (l, c) => (c, -l) }._1
        }
      }.toMap
      lbl = next
    }
    val sizes = lbl.values.groupBy(identity).map { case (l, o) => l -> o.size }
    val want = nodeIds.sorted.map(v => (v, lbl(v), sizes(lbl(v))))
    assert(got == want,
      s"12-round checkpointed LPA diverged from the reference loop:\n$got\nvs\n$want")
  }

  test("labelPropagateOf: a parquet-roundtripped graph serves identically to inline") {
    val dir = "/root/testdata/sf0.001"
    val out = "target/tmp/knn_graph_spec_lpa"
    Similarity.knnGraph(spark, dir).write.mode("overwrite").parquet(out)
    val de = spark.read.parquet(out)
      .select(col("vec_id").as("src"), col("nid").as("dst"))
    val sym = de.union(de.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val inline = Similarity.graphCommunities(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    val stored = Similarity.labelPropagateOf(
        Similarity.emb(spark, dir).select(col("vec_id")), sym)
      .as[(Long, Long, Int)].collect().toSeq
    assert(inline == stored, "communities from the stored graph must bit-match inline")
    // non-degenerate at sf0.001: more than one community, none corpus-sized
    assert(inline.map(_._2).distinct.size > 1, "LPA collapsed to one community")
    assert(inline.map(_._3).max < inline.size, "one community swallowed the corpus")
  }

  test("knnGraph: top-J rank plans as WindowGroupLimit (no full per-cell sort survives)") {
    val df = Similarity.knnGraph(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("knnGraph two-level path: forced cutover still yields a valid graph") {
    // flatMaxCells=1 pushes even k=10 onto the two-level assigner — the
    // path a billion-row corpus takes; the graph invariants must hold
    // there exactly as on the flat path
    spark.conf.set("spark.graft.knn.flatMaxCells", "1")
    try {
      val all = Similarity.emb(spark, "/root/testdata/sf0.001").cache()
      val cells = Similarity.knnCells(all).cache()
      val nVecs = all.count()
      assert(cells.count() == nVecs, "two-level assignment must be total")
      val cid = cells.select("cid").as[Int].collect()
      assert(cid.forall(c => c >= 1 && c <= 16), "composed cid out of range")
      assert(cid.distinct.size > 1, "two-level assignment collapsed to one cell")
      val g = Similarity.knnGraphOf(cells)
        .select("vec_id", "nid", "sim", "rn")
        .as[(Long, Long, Double, Int)].collect()
      assert(g.nonEmpty, "two-level graph is empty")
      assert(g.forall { case (v, n, _, _) => v != n }, "self-edge found")
      g.groupBy(_._1).foreach { case (v, rows) =>
        assert(rows.size <= 3, s"vec $v has ${rows.size} > J rows")
        assert(rows.map(_._4).sorted.toSeq == (1 to rows.size), s"vec $v ranks not dense")
      }
    } finally spark.conf.unset("spark.graft.knn.flatMaxCells")
  }

  test("knnCellsFor: k=10 at every gated SF (oracle boundary), then k grows with n") {
    // the SQL oracle hardcodes k=10 — these three MUST stay 10 or the
    // gate breaks silently on a formula tweak
    assert(Seq(500L, 2000L).map(Similarity.knnCellsFor).forall(_ == 10))
    // constant cell size past the floor: pair volume per vector pins at
    // ~cellSize, so k must scale linearly (k(10n) ≈ 10·k(n))
    assert(Similarity.knnCellsFor(20000L) == 100)
    assert(Similarity.knnCellsFor(200000L) == 1000)
    val ratio = Similarity.knnCellsFor(1000000L).toDouble /
      Similarity.knnCellsFor(100000L)
    assert(ratio > 9.0 && ratio < 11.0, s"cells not linear in n: $ratio")
  }
}
