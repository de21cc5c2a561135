package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Curation, TextAnalysis}

/** Two decades of scale for the cheapest headliners: synthesize sf10
  * (100× sf0.1 — 60 M lineitem rows, 500 k documents) with the same
  * FK-consistent recipe as [[ScaleSf1]] and time q1, token_histogram
  * and quality_gate at sf0.1 / sf1 / sf10, recording growth factors and
  * the AQE-decided join strategies at each decade.
  *
  * Only the tables these three queries scan are synthesized (lineitem,
  * documents) — the point is the scaling CURVE, not a full sf10 corpus.
  * Documents replicate with a per-rep token suffix exactly like ScaleSf1
  * (within one rep the corpus structure is preserved; across reps no
  * 3-shingle or gram is shared), so quality_gate's gram-frequency joins
  * grow linearly like a real 100× corpus rather than collapsing into a
  * 100×-duplicate regime.
  */
object ScaleSf10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = "/root/testdata/sf0.1"
    val sf1 = "target/tmp/sf1"   // built by ScaleSf1 if absent
    val dir = "target/tmp/sf10"
    def rep = explode(sequence(lit(0), lit(99)))
    def scaled(k: org.apache.spark.sql.Column) = k * 100 + col("__rep")

    // gate on BOTH tables: a run killed between the two writes used to
    // leave a dir that passed a lineitem-only check with missing/stale
    // documents — later decades then measured the wrong corpus. Writes
    // are mode(overwrite), so re-running after a partial build is safe.
    if (!(new java.io.File(s"$dir/lineitem.parquet").exists() &&
          new java.io.File(s"$dir/documents.parquet").exists())) {
      new java.io.File(dir).mkdirs()
      spark.read.parquet(s"$src/lineitem.parquet").withColumn("__rep", rep)
        .withColumn("l_orderkey", scaled(col("l_orderkey")))
        .withColumn("l_partkey", scaled(col("l_partkey")))
        .withColumn("l_suppkey", scaled(col("l_suppkey")))
        .drop("__rep")
        .repartition(64).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      spark.read.parquet(s"$src/documents.parquet").withColumn("__rep", rep)
        .withColumn("doc_id", scaled(col("doc_id")))
        .withColumn("text",
          concat_ws(" ", transform(graft.functions.TextFns.tokens(col("text")),
            t => concat(t, lit("_r"), col("__rep")))))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("__rep")
        .repartition(64).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    if (!new java.io.File(s"$sf1/lineitem.parquet").exists())
      System.err.println(s"[sf10] note: $sf1 missing — run ScaleSf1 first for the middle decade")

    val headliners: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q1_pricing_summary"    -> (Analytics.q1PricingSummary _),
      "text_token_histogram"  -> (TextAnalysis.tokenHistogram _),
      "curation_quality_gate" -> (Curation.qualityGate _))

    def joins(df: DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      s"bhj=${"BroadcastHashJoin".r.findAllIn(p).length} " +
        s"smj=${"SortMergeJoin".r.findAllIn(p).length}"
    }

    val decades = Seq(src -> "sf0.1") ++
      (if (new java.io.File(s"$sf1/lineitem.parquet").exists()) Seq(sf1 -> "sf1") else Nil) ++
      Seq(dir -> "sf10")
    decades.foreach { case (d, tag) =>
      headliners.foreach { case (_, fn) =>   // codegen warm pass
        try fn(spark, d).count() catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
      headliners.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val q = fn(spark, d)
        val n = q.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[sf10] $tag%-6s $name%-22s $sec%8.2f s  rows=$n  ${joins(q)}")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
