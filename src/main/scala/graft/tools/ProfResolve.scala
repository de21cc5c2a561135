package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Layout

/** Round-19 micro-measure (the r18 verdict's #4): bound the cost of
  * the generation-resolve on the warm-serve path. Every warm serve of
  * a generational store pays `resolveGeneration` — one pointer GET +
  * one completeness HEAD on the store's FS. The r18 driver bench read
  * bm25_topk_indexed +0.8 s vs r17 and the judge asked whether the new
  * resolve path is in the timed serve. This tool times N back-to-back
  * resolves of a real committed generation on the local FS (the bench
  * host's regime) with the memo OFF and ON.
  *
  * Run: sbt "runMain graft.tools.ProfResolve"
  */
object ProfResolve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("profres").toString
    spark.conf.set("spark.graft.cache.root", root)
    val key = s"$root/bm25_index/profkey"
    Layout.generation(spark, key) { g =>
      Seq((1L, "a")).toDF("doc_id", "text").write.parquet(g)
    }
    def timeN(n: Int): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { Layout.resolveGeneration(spark, key); i += 1 }
      (System.nanoTime() - t0) / 1e6 / n
    }
    timeN(50) // warm FS caches
    val coldMemo = timeN(1000)
    spark.conf.set("spark.graft.layout.genResolveTtlMs", "60000")
    val withMemo = timeN(1000)
    println(f"""[prof] {"metric":"resolve_ms","no_memo":$coldMemo%.4f,"memo":$withMemo%.4f}""")
    println(f"[prof] resolveGeneration on local FS: $coldMemo%.4f ms/call without memo, " +
      f"$withMemo%.4f ms/call with the TTL memo — vs the >1000 ms bm25_topk_indexed serve")
    spark.stop()
  }
}
