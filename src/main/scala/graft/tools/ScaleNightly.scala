package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, ShardExport}

/** Round-17 stress (VERDICT r16 #5): the NIGHTLY LOOP end-to-end, at a
  * corpus size where O(corpus) work per night would be visible on the
  * clock. The piecewise specs prove each stage (catalog merge, cluster
  * extension, releaseShardsRefresh) correct and O(batch) in isolation;
  * this composes them the way a production deployment runs them —
  * bootstrap release, then three sequential 1 000-doc nights against
  * PERSISTED state (parquet catalog + cluster table, warm probe index,
  * warm release frame) — and gates the composition:
  *
  *  - released shards BYTE-STABLE: across all three nights, no full
  *    pre-existing shard file of any split is ever rewritten (mtime
  *    check over every split tree; only each touched split's tail +
  *    its new shards may change) — a dataloader's resume bookmarks
  *    survive every night;
  *  - manifest/tree CONSISTENCY after the last night: per split, the
  *    stored `_shard_manifest` doc and token totals equal a recount of
  *    the actual tree, and the union tree holds exactly
  *    bootstrap-kept ∪ every night's batch (each batch doc exactly
  *    once — the crash-retry guard's steady-state invariant);
  *  - wall O(BATCH) per night: each 1 000-doc night completes in a
  *    small fraction of the 250 000-doc bootstrap (hard gate 1/3; the
  *    measured ratio prints — nights re-read state, classify the batch
  *    against the catalog, extend clusters, and extend the shard
  *    trees, never re-running corpus-sized work).
  *
  * Corpus construction: ~60-token docs, 1/3 everyday stopwords (clears
  * the quality gate's stop-ratio and token-length bands), 2/3
  * hash-derived unique words (no cross-doc 8-token passage → the
  * winnow decontamination is exercised but never fires; pairwise
  * shingle overlap ~0 → the LSH cluster table stays singleton-dense,
  * the common crawl shape).
  *
  * Run: sbt "runMain graft.tools.ScaleNightly"
  */
object ScaleNightly {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $label%-52s $s%8.2f s")
      (r, s)
    }

    // ---- synthetic 250k-doc corpus, written as a corpus dir ----------
    val stops = typedLit(Seq("the", "and", "of", "to", "in", "is", "that"))
    def mkDocs(ids: org.apache.spark.sql.Dataset[java.lang.Long]): DataFrame =
      ids.select(col("id").as("doc_id"),
          lit("en").as("lang"),
          when(col("id") % 2 === 0, "web").otherwise("wiki").as("source"),
          concat_ws(" ", flatten(transform(sequence(lit(0), lit(19)), k =>
            array(
              element_at(stops, pmod(k, lit(7)) + 1),
              concat(lit("w"), pmod(hash(col("id") * 40 + k * 2), lit(99991))),
              concat(lit("w"), pmod(hash(col("id") * 40 + k * 2 + 1), lit(99991)))))))
            .as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    val nDocs = 250000L
    val root = java.nio.file.Files.createTempDirectory("scale_nightly").toString
    val dir = s"$root/corpus"
    mkDocs(spark.range(nDocs)).write.parquet(s"$dir/documents.parquet")
    val corpus = spark.read.parquet(s"$dir/documents.parquet")

    // ---- bootstrap: catalog + cluster table + full v2 release --------
    val (fpPath, shPath, cluPath) = (s"$root/fp", s"$root/sh", s"$root/clusters")
    val out = s"$root/release"
    val (_, tBoot) = time(s"bootstrap: catalog + clusters + v2 release of $nDocs docs") {
      val (fp0, sh0) = Dedup.buildCatalog(corpus.select(col("doc_id"), col("text")))
      fp0.write.parquet(s"$fpPath/batch-0"); sh0.write.parquet(s"$shPath/batch-0")
      // the SAME cluster table the release chain materializes — persist
      // it as the nightly loop's extension base
      Dedup.clustersCached(spark, dir).write.parquet(cluPath)
      Curation.releaseShards(spark, dir, out, blocksPerShard = 1L)
    }

    def treeState(): Map[String, Map[String, Seq[(String, Long)]]] =
      new java.io.File(out).listFiles().filter(_.getName.startsWith("split="))
        .map(sp => sp.getName -> sp.listFiles()
          .filter(_.getName.startsWith("shard_id="))
          .map(d => d.getName ->
            d.listFiles().map(f => f.getName -> f.lastModified).toSeq.sorted)
          .toMap).toMap
    def treeDocs(): Set[Long] =
      new java.io.File(out).listFiles().filter(_.getName.startsWith("split="))
        .flatMap(sp => spark.read.parquet(sp.getPath)
          .select(col("doc_id")).as[Long].collect()).toSet

    val bootState = treeState()
    val bootDocs = treeDocs()
    val nShards0 = bootState.values.map(_.size).sum
    println(s"[scale] bootstrap: ${bootState.size} splits, $nShards0 shards, " +
      s"${bootDocs.size} released docs")
    require(nShards0 >= 2500, s"want a real multi-shard release, got $nShards0")

    // ---- three sequential nights over persisted state -----------------
    var prevState = bootState
    var expectDocs = bootDocs
    var worstNight = 0.0
    (1 to 3).foreach { n =>
      val batch = mkDocs(spark.range(20000000L + n * 1000L, 20000000L + (n + 1) * 1000L))
        .select(col("doc_id"), col("source"), col("text"))
      val (_, tNight) = time(s"night $n: classify + extend + refresh (1000 docs)") {
        val catFp = Dedup.readCatalog(spark, fpPath, excludeBatch = Some(n.toLong))
        val catSh = Dedup.readCatalog(spark, shPath, excludeBatch = Some(n.toLong))
        val (verdicts, _) = time(s"  night $n: classify vs catalog") {
          val v = Dedup.incrementalOf(catFp, catSh,
            batch.select(col("doc_id"), col("text"))).cache()
          v.count(); v
        }
        val (clusters2, _) = time(s"  night $n: extend clusters") {
          val c = Curation.extendClusters(spark.read.parquet(cluPath), verdicts)
            .cache()
          c.count(); c
        }
        time(s"  night $n: append catalog") {
          Dedup.appendToCatalog(fpPath, shPath,
            batch.select(col("doc_id"), col("text")), verdicts, batchId = Some(n.toLong))
        }
        time(s"  night $n: releaseShardsRefresh") {
          Curation.releaseShardsRefresh(batch, clusters2, dir, out, blocksPerShard = 1L)
        }
        time(s"  night $n: persist clusters") {
          clusters2.write.mode("overwrite").parquet(s"$root/clusters_next")
          spark.read.parquet(s"$root/clusters_next").write
            .mode("overwrite").parquet(cluPath)
        }
        verdicts.unpersist(); clusters2.unpersist()
      }
      worstNight = math.max(worstNight, tNight)
      // byte-stability: within each split, every shard dir that existed
      // before the night and is NOT its tail kept its exact files
      val nowState = treeState()
      prevState.foreach { case (split, shards) =>
        if (shards.nonEmpty) {
          val tail = shards.keys.map(_.stripPrefix("shard_id=").toLong).max
          val rewritten = shards.keys.filter { k =>
            k.stripPrefix("shard_id=").toLong < tail &&
              nowState(split).get(k) != Some(shards(k))
          }
          require(rewritten.isEmpty,
            s"night $n rewrote full shards of $split: ${rewritten.toSeq.sorted}")
        }
      }
      prevState = nowState
      expectDocs = expectDocs ++ (20000000L + n * 1000L until 20000000L + (n + 1) * 1000L)
    }

    // ---- final consistency: manifest == tree, tree == expected union --
    val finalDocs = treeDocs()
    require(finalDocs == expectDocs,
      s"released union drifted: ${finalDocs.size} docs vs expected ${expectDocs.size} " +
        s"(missing ${(expectDocs -- finalDocs).take(5)}, extra ${(finalDocs -- expectDocs).take(5)})")
    new java.io.File(out).listFiles().filter(_.getName.startsWith("split=")).foreach { sp =>
      val tree = spark.read.parquet(sp.getPath).cache()
      val man = spark.read.parquet(s"${sp.getPath}/_shard_manifest")
      val wantDocs = tree.count()
      val wantToks = tree
        .select(size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n"))
        .agg(sum(col("n"))).as[Long].head()
      val gotDocs = man.agg(sum(col("n_docs"))).as[Long].head()
      val gotToks = man.agg(sum(col("n_tokens"))).as[Long].head()
      require(gotDocs == wantDocs && gotToks == wantToks,
        s"${sp.getName}: manifest ($gotDocs docs/$gotToks toks) != tree ($wantDocs/$wantToks)")
      tree.unpersist()
    }
    require(worstNight < tBoot / 3.0,
      f"a night took $worstNight%.1f s vs bootstrap $tBoot%.1f s — not O(batch)")
    println(f"""[scale] {"metric":"nightly","bootstrap":$tBoot%.2f,"worst_night":$worstNight%.2f,"ratio":${tBoot / worstNight}%.1f,"shards":$nShards0,"docs":${finalDocs.size}}""")
    spark.stop()
  }
}
