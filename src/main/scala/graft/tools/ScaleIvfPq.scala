package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFns

/** Round-10 stress: the materialized IVFPQ index at the 100 TB design
  * point — build cost (codebook training + corpus encode, paid once)
  * vs served-batch cost at 1 M × 64-d vectors, with `require`-enforced
  * gates on the served path (the ScaleAnnK/ScaleSq8 gate pattern; see
  * the GATES bullet for exactly what is enforced).
  *
  *  - BUILD: `ivfPqIndexOf` + parquet persist. Wall ∝ rows (Lloyd
  *    rounds on subvectors + one narrow encode scan); the stored codes
  *    are PqM small ints + a label per vector — tens of times smaller
  *    than the float64 vectors.
  *  - SERVE: `ivfPqOf` per query batch against the stored tables. No
  *    training, no corpus encode, no full-vector scan — the corpus-
  *    sized input is the code table alone.
  *  - GATES (`require`): served-from-parquet == inline EXACTLY at 1 M,
  *    and cluster-mate precision@5 ≥ 0.9 in the SEPARABLE regime
  *    (16 cells / 64 codewords — cells resolve to distinct codes).
  *    The capacity-limited regime (256 cells / 64 codewords) is
  *    measured and printed as the provisioning finding, not gated:
  *    cells sharing codewords in all subspaces are indistinguishable
  *    to a code-only store by construction.
  *
  * Run: sbt "runMain graft.tools.ScaleIvfPq"
  */
object ScaleIvfPq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    // `phase` is the per-cluster phase step. The default 7.31 is fine
    // for the capacity-limited 256-cell corpus, but it is NOT separable
    // at 16 cells: 7.31·6 ≈ 7·2π, so cluster pairs six apart nearly
    // coincide (center cosine ~0.9965 — inside PQ resolution at 8-dim
    // subspaces). The separable-regime gate therefore places its 16
    // clusters at exact 2π/16 spacing: nearest wrong-cluster center
    // cosine ≈ cos(2π/16) ≈ 0.92, far below the ~0.98 in-cluster
    // cosine, in EVERY subspace (the phase offset is per-coordinate).
    def synth(n: Long, clusters: Int, phase: Double = 7.31): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        concat(lit("c"), (col("id") % clusters).cast("string")).as("label"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          sin((col("id") % clusters) * lit(phase) + j * lit(1.709)) +
            lit(0.15) * sin(col("id") * lit(13.17) + j * lit(0.37))).as("raw"))
        .withColumn("nrm", VectorFns.norm(col("raw")))
        .select(col("vec_id"), col("label"),
          VectorFns.normalize(col("raw"), col("nrm")).as("vec"))

    // 256 label cells over 1 M vectors — the IVF partitioning a real
    // deployment would train; labels here stand in for trained cells
    // exactly as in the gated entry
    val corpus = synth(1000000L, 256).repartition(64).cache()
    corpus.count()

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $label%-44s $s%8.2f s")
      (r, s)
    }

    // PqK=16 is the gated-SF constant; a 1 M corpus with 256 cells
    // needs a codebook provisioned for it (real IVFPQ uses 256/subspace)
    // — 64 codewords/subspace keeps every model object driver-sized
    // (4×64×16 = 4096 doubles) while giving 64^4 distinct code combos.
    val PqKStress = 64
    val base = "target/tmp/ivfpq_1m"
    // PRODUCTION layout (round 13): codes partitionBy(label) — the
    // store's directories ARE the coarse cells, so the serve tail's
    // probed-label IN filter is file-level partition pruning. One
    // repartition by label before the write keeps it to ~one file per
    // directory instead of shuffle-partitions × labels fragments. A
    // FLAT copy of the same codes is kept purely to measure what the
    // layout buys at 1 M.
    val (_, tBuild) = time("ivfpq index build+persist 1M x 64d (once)") {
      val (codes, books, cells) = Similarity.ivfPqIndexOf(corpus, k = PqKStress)
      codes.repartition(col("label")).write.mode("overwrite")
        .partitionBy("label").parquet(s"$base/codes")
      books.write.mode("overwrite").parquet(s"$base/books")
      cells.write.mode("overwrite").parquet(s"$base/cells")
    }
    val codes = Similarity.ivfPqReadCodes(spark, base)
    val books = spark.read.parquet(s"$base/books")
    val cells = spark.read.parquet(s"$base/cells")
    println(s"[scale] stored codes rows=${codes.count()} " +
      s"books=${books.count()} cells=${cells.count()}")
    val (_, tFlatten) = time("flat-layout copy of the same codes (baseline)") {
      codes.write.mode("overwrite").parquet(s"$base/codes_flat")
    }
    val codesFlat = spark.read.parquet(s"$base/codes_flat")

    // two disjoint query batches served from the SAME stored index
    var served: Array[(Long, Long)] = Array.empty
    for (b <- 1 to 2) {
      val qb = corpus.filter(col("vec_id") >= lit((b - 1) * 5L) && col("vec_id") < lit(b * 5L))
        .select(col("vec_id").as("qid"), col("vec").as("qvec"))
      // .as[] creates its own QueryExecution — keep ONE Dataset so the
      // collect and the plan-metric inspection see the same execution
      val df = Similarity.ivfPqOf(codes, books, cells, qb)
        .select(col("qid"), col("nid")).as[(Long, Long)]
      val (rows, _) = time(s"ivfpq serve batch $b (5 queries, partitioned store)") {
        df.collect()
      }
      if (b == 1) {
        served = rows
        // GATE — the layout prunes: the executed codes scan must touch
        // exactly schedule-many of the 256 label directories (walk
        // descends through AQE wrappers, the IndexLayoutSpec discipline).
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def allNodes(p: SparkPlan): Seq[SparkPlan] = {
          val kids = p match {
            case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case q: QueryStageExec        => Seq(q.plan)
            case other                    => other.children
          }
          p +: kids.flatMap(allNodes)
        }
        def codesDirsRead(d: org.apache.spark.sql.Dataset[_]): Long = {
          val reads = allNodes(d.queryExecution.executedPlan).collect {
            case s: FileSourceScanExec
                if s.relation.location.rootPaths.exists(_.toString.contains("codes")) =>
              s.metrics("numPartitions").value
          }
          require(reads.nonEmpty, "no codes scan found in the executed serve plan")
          reads.max
        }
        val sched = Similarity.probeScheduleFor(256)
        // the batch scan reads the UNION of the 5 queries' probe sets —
        // ≤ 5·schedule directories, never the whole store
        val readB = codesDirsRead(df)
        println(s"[scale] codes directories read (5-query batch): $readB of 256 " +
          s"(<= 5 x schedule $sched)")
        require(readB <= 5L * sched && readB < 256,
          s"5-query serve read $readB label dirs, bound is ${5 * sched}")
        // ONE query reads exactly schedule-many directories
        val df1 = Similarity.ivfPqOf(codes, books, cells,
            qb.filter(col("qid") === 0L))
          .select(col("qid"), col("nid")).as[(Long, Long)]
        df1.collect()
        val read1 = codesDirsRead(df1)
        println(s"[scale] codes directories read (1 query): $read1 of 256 (schedule $sched)")
        require(read1 == sched,
          s"single-query serve read $read1 label dirs, schedule is $sched")
      }
      // serve the same batch from the FLAT copy — identical plan shape,
      // but the IN filter is a row filter over every code file
      val (rowsFlat, _) = time(s"ivfpq serve batch $b (flat store, no pruning)") {
        Similarity.ivfPqOf(codesFlat, books, cells, qb)
          .select(col("qid"), col("nid")).as[(Long, Long)].collect()
      }
      require(rowsFlat.toSet == rows.toSet,
        "flat-store serve != partitioned-store serve (layout must not change answers)")
    }

    // Refine tail at scale (rounds 13/14): the exact re-rank over the
    // vec_id-BUCKETED vector store at a cluster-sized bucket count —
    // 5 queries × K·10 candidates ≤ 250 ids over 1024 buckets reads
    // ≤ 250 of the store's files where a flat frame scans all of them.
    // Round 14: the count is DERIVED from the corpus (Layout.buckets),
    // no conf pin — gate that the formula actually moves with size.
    val corpusDir = "target/tmp/ivfpq_1m_corpus"
    if (!new java.io.File(s"$corpusDir/embeddings.parquet/_SUCCESS").exists())
      corpus.select(col("vec_id"), col("label"),
          col("vec").cast("array<float>").as("embedding"))
        .write.mode("overwrite").parquet(s"$corpusDir/embeddings.parquet")
    val nbVec = Similarity.vecBuckets(spark, corpusDir)
    val nbVecGated = Similarity.vecBuckets(spark, "/root/testdata/sf0.001")
    println(s"[scale] derived vec buckets: 1M corpus -> $nbVec, sf0.001 -> $nbVecGated")
    require(nbVec == 1024 && nbVecGated == 16 && nbVec != nbVecGated,
      s"derived vec-bucket counts must move with corpus size: 1M -> $nbVec (want 1024), " +
        s"gated -> $nbVecGated (want the 16 floor)")
    val vstore = Similarity.vecStore(spark, corpusDir)
    val qbR = corpus.filter(col("vec_id") < 5L)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    val (dfR, _) = time("ivfpq serve + refine (bucketed vec store, 1024 buckets)") {
      Similarity.ivfPqOf(codes, books, cells, qbR, refine = Some(vstore))
    }
    val planR = dfR.queryExecution.executedPlan.toString
    val selR = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(planR)
    require(selR.nonEmpty, "refine scan shows no bucket pruning in the executed plan")
    println(s"[scale] refine vector reads: ${selR.get.matched}")
    require(selR.get.group(1).toInt <= 250 && selR.get.group(2).toInt == 1024,
      s"refine should read <= 250 of 1024 vec buckets, plan said ${selR.get.matched}")
    // flat twin reads the SAME roundtripped vectors the store was built
    // from (emb over the written corpus), so the require isolates LAYOUT
    val (rowsFlatRef, _) = time("ivfpq serve + refine (flat vector frame)") {
      Similarity.ivfPqOf(codes, books, cells, qbR, refine = Some(
          Similarity.emb(spark, corpusDir).select(col("vec_id"), col("vec"))))
        .select(col("qid"), col("nid")).as[(Long, Long)].collect()
    }
    require(dfR.select(col("qid"), col("nid")).as[(Long, Long)].collect().toSet
        == rowsFlatRef.toSet,
      "bucketed-store refine != flat-frame refine at 1M")
    // Round 14: the over-budget candidate path — past the id-literal
    // budget the pruning filter ships as a broadcast semi-join (the
    // production 10k-query batch shape). Force it at 1 M and require
    // value identity with the literal path above.
    spark.conf.set("spark.graft.ann.refineLiteralMaxIds", "1")
    val (rowsJoin, _) = time("ivfpq serve + refine (forced semi-join path)") {
      Similarity.ivfPqOf(codes, books, cells, qbR, refine = Some(vstore))
        .select(col("qid"), col("nid")).as[(Long, Long)].collect()
    }
    spark.conf.unset("spark.graft.ann.refineLiteralMaxIds")
    require(rowsJoin.toSet == rowsFlatRef.toSet,
      "over-budget semi-join refine != literal-IN refine at 1M")

    // Gate 1 — roundtrip determinism at 1 M: served-from-parquet must
    // equal inline (train+encode+serve) on the same corpus, exactly.
    val qb1 = corpus.filter(col("vec_id") < 5L)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    val (inline, _) = time("ivfpq inline (train+encode+serve) same corpus") {
      val (c2, b2, ce2) = Similarity.ivfPqIndexOf(corpus, k = PqKStress)
      Similarity.ivfPqOf(c2, b2, ce2, qb1)
        .select(col("qid"), col("nid")).as[(Long, Long)].collect()
    }
    require(inline.toSet == served.toSet,
      "served-from-parquet IVFPQ != inline IVFPQ at 1M vectors")

    // Through round 11 this regime was capacity-limited (~0.5 precision:
    // clusters sharing codewords in all PqM subspaces were
    // indistinguishable to the raw-vector code store). The round-12
    // residual encode dissolves that: codewords encode WITHIN-cell
    // offsets and the per-cell dot(q, centroid) term separates cells, so
    // 256 cells / 64 codewords now measures 1.000 — gate it like the
    // separable regime below.
    val precision256 = served.map { case (q, n) => if (n % 256 == q % 256) 1.0 else 0.0 }
    val meanP256 = precision256.sum / precision256.size
    println(f"[scale] cluster-mate precision@5 at 256 cells / k=$PqKStress%d " +
      f"(residual encode): $meanP256%.3f")
    require(meanP256 >= 0.9,
      f"residual IVFPQ lost the cluster at 256 cells: $meanP256%.3f < 0.9")

    // Gate 2 — separable regime: 16 cells, k=64 codewords/subspace →
    // every cell resolves to distinct codes, so served neighbors must
    // stay in-cluster. This isolates the probe/LUT/ADC machinery from
    // quantizer capacity.
    val corpus16 = synth(1000000L, 16, phase = 2.0 * math.Pi / 16).repartition(64).cache()
    corpus16.count()
    val (sep, _) = time("ivfpq separable regime (16 cells, 1M rows)") {
      val (c3, b3, ce3) = Similarity.ivfPqIndexOf(corpus16, k = PqKStress)
      Similarity.ivfPqOf(c3, b3, ce3,
        corpus16.filter(col("vec_id") < 5L)
          .select(col("vec_id").as("qid"), col("vec").as("qvec")))
        .select(col("qid"), col("nid")).as[(Long, Long)].collect()
    }
    val precision16 = sep.map { case (q, n) => if (n % 16 == q % 16) 1.0 else 0.0 }
    val meanP = precision16.sum / precision16.size
    println(f"[scale] cluster-mate precision@5 at 16 cells / k=$PqKStress%d (separable): $meanP%.3f")
    require(meanP >= 0.9, f"IVFPQ left the cluster in the separable regime: $meanP%.3f < 0.9")
    println(f"[scale] build once $tBuild%.1f s (+ flat baseline copy " +
      f"$tFlatten%.1f s); serve is training-free and encode-free; " +
      "served == inline at 1M; partitioned == flat answers")
    spark.stop()
  }
}
