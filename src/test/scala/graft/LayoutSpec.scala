package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.Extractor

class LayoutSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

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
