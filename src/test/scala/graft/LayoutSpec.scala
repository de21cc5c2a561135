package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.Extractor

class LayoutSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("stateTag freshness contract: default re-lists per call; TTL memoizes; invalidation hook re-lists") {
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("tag").toString
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(s"$dir/t.parquet")
    val path = s"$dir/t.parquet"
    def rewrite(): Unit = {
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
        .write.mode("append").parquet(path)
    }
    // default (no TTL conf): a regen is visible on the NEXT call
    val t0 = Layout.stateTag(spark, path)
    rewrite()
    val t1 = Layout.stateTag(spark, path)
    assert(t1 != t0, "default mode must re-list per call (round-15 behavior)")
    // with a TTL: the memo serves the stale tag inside the window …
    spark.conf.set("spark.graft.layout.stateTagTtlMs", "600000")
    try {
      val m0 = Layout.stateTag(spark, path)
      rewrite()
      assert(Layout.stateTag(spark, path) == m0,
        "TTL mode must serve the memoized tag inside the window")
      // … and the explicit invalidation hook forces a fresh LIST
      Layout.invalidateStateTag(path)
      assert(Layout.stateTag(spark, path) != m0,
        "invalidateStateTag must force the next call to re-list")
    } finally spark.conf.unset("spark.graft.layout.stateTagTtlMs")
  }

  test("invalidateStateTag hits the memo under spelling variants of the same path") {
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("tagnorm").toString
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(s"$dir/t.parquet")
    val path = s"$dir/t.parquet"
    spark.conf.set("spark.graft.layout.stateTagTtlMs", "600000")
    try {
      val m0 = Layout.stateTag(spark, path)
      Seq((2L, "b")).toDF("doc_id", "text").write.mode("append").parquet(path)
      // invalidate under a DIFFERENT spelling (double slash) of the
      // same path — round-16 advice: the memo key is the raw string,
      // so './x' / 'x//y' variants missed and kept serving stale tags
      Layout.invalidateStateTag(s"$dir//t.parquet")
      assert(Layout.stateTag(spark, path) != m0,
        "a normalized-variant invalidation must evict the memo entry")
    } finally spark.conf.unset("spark.graft.layout.stateTagTtlMs")
  }

  test("store caches honor spark.graft.cache.root (file: URI): cold build lands there, warm call serves without rebuild") {
    import graft.operators.{Curation, Layout}
    import org.apache.hadoop.fs.Path
    val root = "file:" + java.nio.file.Files.createTempDirectory("groot").toString
    spark.conf.set("spark.graft.cache.root", root)
    try {
      val dir = "/root/testdata/sf0.001"
      val cold = Curation.winnowProbeFpCached(spark, dir)
        .collect().map(_.get(0).toString).sorted.toSeq
      assert(cold.nonEmpty)
      // the artifact landed under the CONF'D root, probed through the
      // Hadoop FS of the root's own URI (round 17: the java.io.File
      // probe this replaces answered about the cwd-relative local disk
      // regardless of the configured root)
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stores = fs.listStatus(new Path(s"$root/winnow_probe_cache"))
      assert(stores.length == 1, "exactly one store under the conf'd root")
      val succ = new Path(stores.head.getPath, "_SUCCESS")
      assert(fs.exists(succ))
      val m0 = fs.getFileStatus(succ).getModificationTime
      val warm = Curation.winnowProbeFpCached(spark, dir)
        .collect().map(_.get(0).toString).sorted.toSeq
      assert(warm == cold, "warm serve must read back the stored artifact")
      assert(fs.getFileStatus(succ).getModificationTime == m0,
        "warm call must NOT rebuild the store (the _SUCCESS marker is untouched)")
      assert(Layout.storeReady(spark, stores.head.getPath.toString),
        "storeReady must see the completed store through the Hadoop path")
    } finally spark.conf.unset("spark.graft.cache.root")
  }

  test("partitioned corpus layout: directory pruning + content round-trip") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("corpus").toString
    Extractor.writeCorpusPartitioned(docs, out, "lang", "doc_id", filesPerPartition = 2)

    // hive-style lang=... directories exist
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")))

    // read back: full content round-trip
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "text", "lang").as[(Long, String, String)].collect().sorted.toSeq
    val b = back.select("doc_id", "text", "lang").as[(Long, String, String)].collect().sorted.toSeq
    assert(a == b)

    // partition pruning: a lang filter reads only that directory
    val plan = back.filter(col("lang") === "en").queryExecution.executedPlan.toString
    assert(!plan.contains("lang=zh") || plan.contains("PartitionFilters"))
  }
}
