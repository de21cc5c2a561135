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

    // warmup (uncounted): run EVERY query once at the smallest SF — same
    // plan shapes, trivial data — so each measured timing below pays for
    // the plan, not first-touch Janino/JIT compilation. (Per-family
    // spot-warmup proved insufficient: the first query of any untouched
    // family absorbed that family's whole codegen cost, misattributing
    // ~5 s to innocent plans.) Caches built during warmup are keyed on
    // the warmup dir's logical plans, so they can't leak into the
    // measured run; clearCache() drops their storage anyway.
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.getAbsolutePath else sfDir
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // outside the timed section: drop this query's internal caches so
      // later queries aren't squeezed by accumulated storage memory
      spark.catalog.clearCache()
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // file first (survives log truncation/interleaving), then stdout on
    // its own line with a blank line before it so the record stays intact
    // even if a logger write lands mid-buffer
    try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println()
    println(json)
    spark.stop()
  }
}
