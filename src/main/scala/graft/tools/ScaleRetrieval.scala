package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFns
import graft.operators.Retrieval

/** Stress BM25 retrieval on the 1M-doc replicated corpus (ScaleDedup's
  * 200×5000; 54M tokens).
  *
  * The synthetic generator draws from a SMALL shared vocabulary, so the
  * five probe docs' term sets cover ~99.9% of all token occurrences —
  * the gated plan's broadcast vocab semi-filter prunes nothing and
  * every query scores essentially every document. That makes the first
  * measurement the ADVERSARIAL upper bound (5 queries × ~1M scored
  * candidates each, exact tf/idf/dl scoring end to end), not the
  * typical case. The second measurement is the typical case: a
  * 30-term query vocabulary (a real query's worth against a Zipf
  * corpus) — postings volume and wall time drop proportionally, which
  * is the design claim: cost follows QUERY-term postings, not corpus
  * vocabulary. */
object ScaleRetrieval {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "target/tmp/bigsf"
    Corpora.linkBigDocuments(spark, dir)

    // warm codegen at the tiny SF
    Retrieval.bm25Ranked(spark, "/root/testdata/sf0.001", 5).count()
    spark.catalog.clearCache()

    val toks = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("ts"), size(col("ts")).as("dl"))

    // adversarial upper bound: query vocab ≡ corpus vocab
    val t0 = System.nanoTime()
    val top = Retrieval.bm25Ranked(spark, dir, 5)
    val n = top.agg(count(lit(1)), sum(col("score"))).first()
    println(f"[scale] bm25_topk 1M docs, query vocab ~= corpus vocab (worst case): " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s  rows=${n.getLong(0)} score_sum=${n.get(1)}")
    spark.catalog.clearCache()

    // typical case: a query over RARE terms. The 31-term synthetic
    // vocabulary means any natural query covers ~all 54M occurrences, so
    // rarity is injected: 1000 docs get a marker term appended, and the
    // query asks for it. The broadcast semi-filter prunes the explode
    // BEFORE any aggregate, so everything downstream of the one
    // irreducible corpus scan is postings-sized (1000 rows), the
    // proportionality the gated plan is built on.
    val t1 = System.nanoTime()
    val marked = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 1000 === 7, concat(col("text"), lit(" nicheterm")))
          .otherwise(col("text")).as("text"))
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("ts"), size(col("ts")).as("dl"))
    val st = marked.agg(count(lit(1)), sum(col("dl"))).first()
    val (nDocs, tToks) = (st.getLong(0), st.getLong(1))
    import spark.implicits._
    val qsmall = Seq("nicheterm").toDF("term")
    val posts = marked.select(col("doc_id"), col("dl"), explode(col("ts")).as("term"))
      .join(broadcast(qsmall), "term")
      .groupBy(col("doc_id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
      .cache()
    val idf = posts.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .select(col("term"),
        round(log2(lit(2L * nDocs + 2L)) - log2(col("df") * 2L + lit(1L)), 8).as("idf"))
    val contrib = posts.join(broadcast(idf), "term").filter(col("doc_id") =!= 0L)
      .select(col("doc_id"),
        round(col("idf") * round((col("tf") * lit(22L * tToks)).cast("double") /
          (col("tf") * lit(10L * tToks) + lit(3L * tToks) +
            col("dl") * lit(9L * nDocs)).cast("double"), 8), 6).as("c"))
    val scored = contrib.groupBy(col("doc_id"))
      .agg(round(sum(col("c").cast("decimal(28,12)")).cast("double"), 4).as("score"))
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    val npost = posts.agg(count(lit(1)), sum(col("tf"))).first()
    val top30 = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .agg(count(lit(1)), sum(col("score"))).first()
    println(f"[scale] bm25 rare-term query (typical): ${(System.nanoTime() - t1) / 1e9}%.2f s  " +
      s"postings=${npost.getLong(0)} occ=${npost.getLong(1)} top5_sum=${top30.get(1)}")
    posts.unpersist()

    // materialized index (round 10; round 13 layout): pay the tokenize
    // scan ONCE at build, then serve query batches from stored postings
    // — batch 2+ never re-reads `text`. The store is the PRODUCTION
    // term-BUCKETED catalog table (bm25OpenIndex), so a query batch's
    // literal vocabulary IN filter prunes buckets at the file level. A
    // flat parquet copy of the same postings measures what the layout
    // buys at 54 M token occurrences.
    val t2 = System.nanoTime()
    // the PRODUCTION store key (dir+mtime+tokenizer+bucket layout) so
    // every serve arm below — including the adaptive bm25ServeStored,
    // which derives the key itself — shares this one build. Round 14:
    // the bucket count is DERIVED from the corpus document count
    // (Layout.buckets) — gate that the formula moves with size before
    // building under it.
    val nb = Retrieval.postingsBuckets(spark, dir)
    val nbGated = Retrieval.postingsBuckets(spark, "/root/testdata/sf0.001")
    println(s"[scale] derived postings buckets: 1M corpus -> $nb, sf0.001 -> $nbGated")
    require(nb == 128 && nbGated == 16 && nb != nbGated,
      s"derived postings-bucket counts must move with corpus size: 1M -> $nb (want 128), " +
        s"gated -> $nbGated (want the 16 floor)")
    val key = Retrieval.bm25StoreKey(spark, dir)
    val gen = Retrieval.bm25StoreGen(spark, dir, key)
    val postings = Retrieval.bm25OpenIndex(spark, dir, key, gen)
    postings.count() // force the build inside the timer
    val stats = spark.read.parquet(s"$gen/stats")
    println(f"[scale] bm25 bucketed index build+persist 1M docs: ${(System.nanoTime() - t2) / 1e9}%.2f s (paid once)")
    val idxBase = "target/tmp/bm25_index_1m"
    val tFlat0 = System.nanoTime()
    postings.write.mode("overwrite").parquet(s"$idxBase/postings_flat")
    val postingsFlat = spark.read.parquet(s"$idxBase/postings_flat")
    println(f"[scale] flat-layout postings copy (baseline): ${(System.nanoTime() - tFlat0) / 1e9}%.2f s")
    for (b <- 1 to 2) {
      val tb = System.nanoTime()
      val qb = postings.filter(col("doc_id") >= lit((b - 1) * 5L) && col("doc_id") < lit(b * 5L))
        .select(col("doc_id").as("qid"), col("term"))
      val r = Retrieval.bm25Of(postings, stats, qb, 5)
        .agg(count(lit(1)), sum(col("score"))).first()
      println(f"[scale] bm25 batch $b from bucketed store: ${(System.nanoTime() - tb) / 1e9}%.2f s  " +
        s"rows=${r.getLong(0)} score_sum=${r.get(1)} (no tokenize scan)")
      spark.catalog.clearCache()
      // flat twin of the same batch: these probe docs' vocabulary ≈ the
      // corpus vocabulary, so bucket pruning prunes NOTHING here and the
      // flat store's finer file split can win on scan parallelism — the
      // measured trade behind sizing the derived bucket count to the cluster
      val tf = System.nanoTime()
      val qf = postingsFlat.filter(col("doc_id") >= lit((b - 1) * 5L) && col("doc_id") < lit(b * 5L))
        .select(col("doc_id").as("qid"), col("term"))
      val rF = Retrieval.bm25Of(postingsFlat, stats, qf, 5).collect()
      require(rF.length == r.getLong(0), "flat-store batch != bucketed-store batch size")
      println(f"[scale] bm25 batch $b from flat store (same queries): ${(System.nanoTime() - tf) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }

    // single-term query batch: bucketed store reads 1 of nb buckets
    // (plan-asserted), the flat copy filters every posting file
    val term1 = postings.select(col("term")).head.getString(0)
    val q1 = Seq((9999999L, term1)).toDF("qid", "term")
    val servedB = Retrieval.bm25Of(postings, stats, q1, 5)
    val tb1 = System.nanoTime()
    val rb = servedB.collect().toSet
    val wallB = (System.nanoTime() - tb1) / 1e9
    val planStr = servedB.queryExecution.executedPlan.toString
    require(planStr.contains(s"SelectedBucketsCount: 1 out of $nb"),
      "single-term serve did not prune to 1 bucket")
    spark.catalog.clearCache()
    val tb2 = System.nanoTime()
    val rf = Retrieval.bm25Of(postingsFlat, stats, q1, 5).collect().toSet
    val wallF = (System.nanoTime() - tb2) / 1e9
    require(rb == rf, "bucketed-store serve != flat-store serve (layout must not change answers)")
    println(f"[scale] bm25 single-term serve: bucketed (1 of $nb buckets) $wallB%.2f s " +
      f"vs flat $wallF%.2f s")

    // ADAPTIVE serve (late r13; re-aimed r14): the whole-vocab batch
    // routed through bm25ServeStored. Under the round-13 fixed 16
    // buckets this vocabulary covered "most buckets" and the serve
    // correctly took the flat view; under the DERIVED 128-bucket 1M
    // layout the same ~32-term synthetic vocabulary covers ≤ a quarter
    // of the buckets, so the correct adaptive decision flips to the
    // PRUNED bucketed scan — gate the new decision and that it reads
    // ≤ cov of nb buckets. (The flat-view decision branch stays gated
    // at the natural-vocab sf0.001 corpus in RetrievalSpec.)
    // vocabulary derived from the flat copy so the require below sees
    // only the SERVE's own postings scan in the plan
    val qa = postingsFlat.filter(col("doc_id") < 5L)
      .select(col("doc_id").as("qid"), col("term"))
    val cov = Retrieval.vocabBucketCoverage(qa, nb)
    require(cov * 2 <= nb,
      s"synthetic vocab should cover a minority of the derived layout: $cov of $nb buckets")
    require(Retrieval.vocabBucketCoverage(q1, nb) == 1L, "1-term vocab must cover 1 bucket")
    val tA = System.nanoTime()
    val servedA = Retrieval.bm25ServeStored(spark, dir, qa, 5)
    val rA = servedA.agg(count(lit(1)), sum(col("score"))).first()
    val wallA = (System.nanoTime() - tA) / 1e9
    val selA = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(servedA.queryExecution.executedPlan.toString)
    require(selA.nonEmpty,
      "minority-coverage adaptive serve should have taken the pruned bucketed scan")
    require(selA.get.group(1).toLong <= cov && selA.get.group(2).toInt == nb,
      s"adaptive serve should read <= $cov of $nb buckets, plan said ${selA.get.matched}")
    println(f"[scale] bm25 whole-vocab batch via ADAPTIVE serve " +
      f"(pruned: ${selA.get.matched}): $wallA%.2f s  rows=${rA.getLong(0)} " +
      s"score_sum=${rA.get(1)}")
    spark.catalog.clearCache()

    spark.stop()
  }
}
