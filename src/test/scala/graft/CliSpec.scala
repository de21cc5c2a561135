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
}
