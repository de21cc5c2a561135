package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    val sh = Dedup.shingleSets(docs).cache()
    time("shingles")(sh.count())
    val sig = Dedup.minhashSignatures(docs)
    time("signatures")(sig.count())
    time("full_lsh")(Dedup.minhashLsh(spark, sfDir).count())
    spark.stop()
  }
}
