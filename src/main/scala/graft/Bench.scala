package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds.
  *
  * Load-proofing (round 5 — two rounds of driver records were burned on
  * measurement artifacts, not regressions):
  *  - every query is timed `reps` times (default 3) and the MEDIAN is
  *    recorded, so one load spike on a busy machine can't poison a
  *    query's number;
  *  - timings are rounded to 3 decimals, halving the JSON so a log
  *    truncation is less likely to eat the head of the record;
  *  - the record is written to target/bench.json AND printed TWICE
  *    (immediately after measurement and again at exit) — two chances
  *    for the driver's log capture to catch an intact line;
  *  - the warmup directory actually used is recorded in the JSON: when
  *    the sf0.001 sibling is missing, warmup is SKIPPED (running the
  *    full suite at the measured SF would silently double wall time and
  *    turn "measured" numbers into warm-cache reruns) and the record
  *    says so instead of hiding it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
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
    val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    val warmup =
      if (sibling.isDirectory && sibling.getAbsolutePath != new java.io.File(sfDir).getAbsolutePath) {
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
          try fn(spark, sibling.getAbsolutePath).count() catch { case _: Throwable => () }
        }
        spark.catalog.clearCache()
        sibling.getAbsolutePath
      } else "skipped_no_small_sf"

    def f3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)

    // a failed rep is DROPPED before the median (round 6): -1 sentinels
    // sort first, so with reps=3 one intermittent failure used to hide
    // behind a clean positive median while two poisoned the total with
    // -1. Now the median is over successful reps only, per-query failed
    // rep counts are reported, and -1 survives only when every rep
    // failed (such queries are excluded from the total and listed).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val sec = (System.nanoTime() - t0) / 1e9
        // outside the timed section: drop this query's internal caches so
        // later queries (and the next rep) start cache-cold and aren't
        // squeezed by accumulated storage memory
        spark.catalog.clearCache()
        if (ok) sec else -1.0
      }
      val good = times.filter(_ >= 0).sorted
      val median = if (good.nonEmpty) good(good.length / 2) else -1.0
      (name, median, reps - good.length)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val failedQueries = results.collect { case (n, v, _) if v < 0 => "\"" + n + "\"" }
    val failedReps = results.map(_._3).sum
    val repFailures = results.collect { case (n, _, f) if f > 0 => "\"" + n + "\":" + f }
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","reps":$reps,"warmup":"$warmup",""" +
      s""""failed_queries":${failedQueries.mkString("[", ",", "]")},""" +
      s""""rep_failures":${repFailures.mkString("{", ",", "}")}}"""
    // a short self-contained total line: the driver's log capture has
    // twice truncated the HEAD of the long record — this one always fits
    // in any capture window, so the headline number survives regardless
    val totalLine = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""n_queries":${results.length},"n_failed":${failedQueries.length},""" +
      s""""failed_reps":$failedReps,"sf":"$sfDir"}"""
    // file first (survives log truncation/interleaving), then stdout
    // twice — once immediately, once after stop() — each on its own line
    // with a blank line before it so the record stays intact even if a
    // logger write lands mid-buffer
    try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (json + "\n" + totalLine + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println()
    println(json)
    println(totalLine)
    Console.flush()
    spark.stop()
    println()
    println(json)
    println(totalLine)
  }
}
