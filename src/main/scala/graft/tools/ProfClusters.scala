package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** One-off profiling harness for dedup_clusters stage timing. */
object ProfClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bench-identical conditioning: codegen/JIT warmed at the smallest
    // SF (same plan shapes), then caches cleared so measured reps start
    // cache-cold — a same-SF warm rep would hit the first rep's caches
    // (cache is keyed on the logical plan) and measure post-cache work
    Dedup.dedupClusters(spark, "/root/testdata/sf0.001").count()
    Dedup.dedupPipeline(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      spark.catalog.clearCache()
      println(f"[prof] $label%-32s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("dedup_clusters rep1")(Dedup.dedupClusters(spark, sfDir).count())
    time("dedup_clusters rep2")(Dedup.dedupClusters(spark, sfDir).count())
    time("dedup_clusters rep3")(Dedup.dedupClusters(spark, sfDir).count())
    time("dedup_pipeline")(Dedup.dedupPipeline(spark, sfDir).count())

    // stage breakdown (mirrors dedupClusters's internal structure).
    // tS does NOT clear caches — stages build on each other exactly like
    // the operator's internals do; clearing between stages would silently
    // recompute every upstream stage inside each later timing
    def tS(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label%-32s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("__ts")).cache()
    tS("  stage: toks cache")(toks.count())
    val fp = toks.select(col("doc_id"),
      when(size(col("__ts")) >= 3, md5(concat_ws(" ", col("__ts"))))
        .otherwise(concat(lit("noshingle:"), col("doc_id").cast("string")))
        .as("content_fp")).cache()
    val withRep = fp.join(
      fp.groupBy(col("content_fp")).agg(min(col("doc_id")).as("rep")),
      Seq("content_fp")).select(col("doc_id"), col("rep")).cache()
    tS("  stage: withRep")(withRep.count())
    val repIds = withRep.filter(col("doc_id") === col("rep")).select(col("doc_id"))
    val repSh = toks.join(repIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shinglesFromTokens(col("__ts"), 3))).as("s"))
      .repartition(col("s"))
      .cache()
    tS("  stage: repSh cache")(repSh.count())
    tS("  stage: df-cap freq pass")(
      repSh.groupBy(col("s")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > 256).count())
    val sz = repSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = repSh.select(col("doc_id").as("da"), col("s"))
      .join(repSh.select(col("doc_id").as("db"), col("s")), Seq("s"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    val edges = inter
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    tS("  stage: edges run1 (codegen)")(edges.count())
    tS("  stage: edges run2 (steady)")(edges.count())
    tS("  stage: edges run3 (steady)")(edges.count())
    val comp = graft.operators.Graph.connectedComponents(
      repIds.select(col("doc_id").as("id")),
      edges.select(col("da").as("src"), col("db").as("dst")))
    tS("  stage: CC")(comp.count())
    tS("  stage: final join")(
      withRep.join(comp.select(col("id").as("rep"), col("component")), Seq("rep"))
        .select(col("doc_id"), col("component").as("cluster_id")).count())
    spark.stop()
  }
}
