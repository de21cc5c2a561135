package graft.tools
import org.apache.spark.sql.SparkSession
import graft.api.Extractor

object Prof {
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
    val out1 = "target/tmp/graft_extract_100"
    val out2 = "target/tmp/graft_extract_all"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out1))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
    time("extractPapers n=100")(
      Extractor.extractPapers(spark, s"$sfDir/documents.parquet", out1, 100).count())
    time("extractPapers n=5000")(
      Extractor.extractPapers(spark, s"$sfDir/documents.parquet", out2, 5000).count())
    spark.stop()
  }
}
