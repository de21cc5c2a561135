package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds.
  * A small uncounted warmup run absorbs JVM/codegen startup so query
  * timings measure the plans, not JIT. Queries run in sorted order. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup (uncounted): touch each fact table + the hot codegen paths
    // (scan/agg for lineitem, tokenize/hash-agg for documents, vector
    // fold for embeddings) so query timings measure the plans, not JIT —
    // the first query of each family otherwise absorbs the whole
    // family's codegen cost
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      SparkEntry.queries.get("q1_pricing_summary")
        .foreach(fn => fn(spark, sfDir).count())
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(md5(concat_ws(" ", graft.functions.TextFns.tokens(col("text")))).as("fp"))
        .groupBy("fp").count().count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    } catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
