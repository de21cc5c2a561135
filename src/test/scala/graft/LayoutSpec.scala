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
