package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Long-document stress: 10 MB single documents (~1.4 M tokens each)
  * through the tokenize / shingle / chunk paths. The sf corpora cap out
  * at a few KB per doc, so per-ROW costs (token array materialization,
  * distinct-shingle explosion, chunk fan-out) never show up there.
  *
  * Corpus: the sf0.01 documents plus 7 monsters — two exact-duplicate
  * pairs (collapse must hit the exact-first path, never the shingle
  * join), one near-duplicate pair (one mutated word per 1000 — MUST
  * survive the jaccard threshold), one unique. Each monster draws from
  * its own 5000-word vocabulary so unrelated monsters share no shingles.
  */
object ScaleLongDocs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = "target/tmp/longsf"
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      def longText(vocab: Int, seed: Int, mutateEvery: Int = 0): String = {
        val rnd = new scala.util.Random(seed)
        val sb = new StringBuilder(11 << 20)
        var i = 0
        while (sb.length < (10 << 20)) {
          val w = if (mutateEvery > 0 && i % mutateEvery == 0) s"mut${vocab}x$i"
                  else s"v${vocab}w${rnd.nextInt(5000)}"
          sb.append(w).append(' '); i += 1
        }
        sb.toString
      }
      val monsters = Seq(
        (100000L, longText(1, 1)), (100001L, longText(1, 1)),          // exact dup pair
        (100002L, longText(2, 2)), (100003L, longText(2, 2)),          // exact dup pair
        (100004L, longText(3, 3)), (100005L, longText(3, 3, 1000)),    // near-dup pair
        (100006L, longText(4, 4)))                                     // unique
        .toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("stress").as("source"), length(col("text")).cast("long").as("n_chars"))
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .unionByName(monsters)
        .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("text_quality 10MB docs")(TextAnalysis.quality(spark, dir).count())
    time("text_fingerprint 10MB docs")(TextAnalysis.fingerprint(spark, dir).count())
    time("token_histogram 10MB docs")(TextAnalysis.tokenHistogram(spark, dir).count())
    time("chunk_windows 10MB docs")(TextAnalysis.chunkWindows(spark, dir).count())
    time("dedup_exact 10MB docs")(Dedup.exact(spark, dir).count())
    time("dedup_pipeline 10MB docs")(Dedup.dedupPipeline(spark, dir).count())
    val t0 = System.nanoTime()
    val clusters = Dedup.dedupClusters(spark, dir)
      .filter(col("doc_id") >= 100000L).collect().map(r => r.getLong(0) -> r.getLong(1))
    println(f"[scale] dedup_clusters 10MB docs: ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
      s"monster clusters=${clusters.toSeq.sorted.mkString(",")}")
    val ok = clusters.toMap == Map(
      100000L -> 100000L, 100001L -> 100000L, 100002L -> 100002L,
      100003L -> 100002L, 100004L -> 100004L, 100005L -> 100004L, 100006L -> 100006L)
    println(s"[scale] monster cluster assignment correct=$ok")
    spark.stop()
  }
}
