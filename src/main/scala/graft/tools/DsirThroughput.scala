package graft.tools
// quick throughput probe: dsirScore as a batch transform over sf0.1
object DsirThroughput {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (lam, c) = graft.operators.Curation.dsirModel(spark, "/root/testdata/sf0.1")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.streaming.EventStream.dsirScore(docs, lam, c).count()
      println(f"[dsirscore] rep$r: ${(System.nanoTime()-t0)/1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
