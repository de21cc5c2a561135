package graft.tools

import org.apache.spark.sql.SparkSession

/** Decade check for the graph family in isolation: times the named
  * queries at sf0.1 and the synthesized sf1 (ScaleSf1.ensureCorpus),
  * bench protocol (codegen warm at sf0.001, cache cleared between
  * reps). Exists because the full BenchSf1 sweep costs ~5 min — this
  * answers "did the knnCellsFor change move the build" in ~1.
  *
  *   sbt "runMain graft.tools.ProfKnn"
  */
object ProfKnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleSf1.ensureCorpus(spark)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("sim_knn_graph", "sim_graph_communities", "sim_graph_pagerank",
        "curation_density_prune")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001").count()
      spark.catalog.clearCache()
      for (dir <- Seq(ScaleSf1.Src, ScaleSf1.Dir)) {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[profknn] $name%-26s $dir%-24s $sec%6.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}
