package graft

import org.apache.spark.sql.SparkSession
import graft.api.{Extractor, Jobs}

/** CLI mirroring the reference's main.py surface:
  *
  *   runMain graft.Main parquet <file.parquet> [--output_dir D] [--num_papers N] [--seed S]
  *   runMain graft.Main cisi <CISI.ALL> [--output_dir D]
  *   runMain graft.Main analyze <file.parquet>
  *
  * (legacy form: a bare parquet path, main.py:217-225)
  */
object Main {

  private def flag(args: Array[String], name: String, default: String): String =
    args.sliding(2).collectFirst { case Array(`name`, v) => v }.getOrElse(default)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_MASTER", "local[4]"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: Array[String]): Unit = args.headOption match {
    case Some("parquet") =>
      val id = Jobs.submit("parquet", flag(args, "--output_dir", "extracted_papers")) {
        Extractor.extractPapers(spark, args(1),
          flag(args, "--output_dir", "extracted_papers"),
          flag(args, "--num_papers", "1000").toInt,
          flag(args, "--seed", "42").toInt)
      }
      report(id)
    case Some("cisi") =>
      val id = Jobs.submit("cisi", flag(args, "--output_dir", "cisi_papers")) {
        Extractor.convertCisi(spark, args(1), flag(args, "--output_dir", "cisi_papers"))
      }
      report(id)
    case Some("analyze") =>
      val df = spark.read.parquet(args(1))
      val content = graft.operators.ColumnDetect.detect(df).content.getOrElse("text")
      Extractor.analyzeTokens(df, content).show(truncate = false)
    case Some(path) if path.endsWith(".parquet") => // legacy mode
      run(spark, Array("parquet", path) ++ args.drop(1))
    case _ =>
      println("usage: parquet <file> | cisi <file> | analyze <file> [--output_dir D] [--num_papers N] [--seed S]")
  }

  private def report(id: String): Unit = {
    val j = Jobs.status(id).get
    println(s"[job] id=${j.id} type=${j.jobType} status=${j.status} " +
      s"files=${j.fileCount} output_dir=${j.outputDir}" +
      (if (j.error.nonEmpty) s" error=${j.error}" else ""))
  }
}
