package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Jobs

class CliSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test

  test("CLI parquet mode extracts files and tracks the job") {
    val out = java.nio.file.Files.createTempDirectory("cli").toString
    Main.run(spark, Array("parquet", "/root/testdata/sf0.001/documents.parquet",
      "--output_dir", out, "--num_papers", "7", "--seed", "42"))
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".md")) == 7)
    val jobs = Jobs.list(spark).collect()
    assert(jobs.exists(r => r.getAs[String]("status") == "completed"
      && r.getAs[Long]("fileCount") == 7L))
  }

  test("CLI legacy mode (bare parquet path) still works") {
    val out = java.nio.file.Files.createTempDirectory("cli_legacy").toString
    Main.run(spark, Array("/root/testdata/sf0.001/documents.parquet",
      "--output_dir", out, "--num_papers", "3"))
    assert(new java.io.File(out).listFiles().length == 3)
  }

  test("failed job is tracked as failed, not thrown") {
    Main.run(spark, Array("parquet", "/nonexistent.parquet", "--output_dir", "/tmp/x"))
    assert(Jobs.list(spark).collect().exists(_.getAs[String]("status") == "failed"))
  }

  test("CLI gc-stores: dry-run reports without deleting; live run reclaims the stale generation") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("cligc").toString
    spark.conf.set("spark.graft.cache.root", root)
    try {
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val now = System.currentTimeMillis()
      def mk(key: String, ageMs: Long): Path = {
        val kd = new Path(s"$root/pq_index/$key")
        fs.mkdirs(kd)
        fs.create(new Path(kd, "_SUCCESS"), true).close()
        fs.setTimes(new Path(kd, "_SUCCESS"), now - ageMs, -1)
        fs.setTimes(kd, now - ageMs, -1)
        kd
      }
      val old = mk("corp_1700000000000haaaaaaaa_m8k16i3", 10 * 86400000L)
      val neu = mk("corp_1700000009999hbbbbbbbb_m8k16i3", 1000L)
      Main.run(spark, Array("gc-stores", "--max-age-hours", "24", "--dry-run"))
      assert(fs.exists(old), "dry-run must not delete")
      Main.run(spark, Array("gc-stores", "--max-age-hours", "24"))
      assert(!fs.exists(old) && fs.exists(neu))
    } finally spark.conf.unset("spark.graft.cache.root")
  }
}
