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
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warm
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label%-32s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("dedup_clusters cold")(Dedup.dedupClusters(spark, sfDir).count())
    time("dedup_clusters warm")(Dedup.dedupClusters(spark, sfDir).count())
    time("dedup_pipeline")(Dedup.dedupPipeline(spark, sfDir).count())
    spark.stop()
  }
}
