package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Distributed per-document file writer (replaces the reference's
  * driver-side row loop, main.py:75-103).
  *
  * Takes a DataFrame with `filename` and `content` string columns and
  * writes one file per row from within each partition — 1000 executors
  * write 1000 ways with zero driver involvement. Writes are idempotent
  * (task retries overwrite the same target file), which is exactly the
  * reference's `open(..., 'w')` semantics.
  *
  * Local-FS oriented (matches the reference); an object-store variant
  * would swap `Files.write` for the Hadoop FileSystem API — the Spark
  * side (partition-parallel foreachPartition) is unchanged.
  */
object MarkdownFileSink {

  def write(df: DataFrame, outputDir: String): Unit = {
    Files.createDirectories(Paths.get(outputDir))
    df.select("filename", "content").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val target = Paths.get(outputDir, r.getString(0))
          Files.write(target, r.getString(1).getBytes(StandardCharsets.UTF_8))
        }
    }
  }

  /** Manifest of an output directory as a DataFrame — the `/api/files`
    * surface (api.py:167-179). Driver-side FS listing, like the API. */
  def manifest(spark: SparkSession, outputDir: String): DataFrame = {
    import spark.implicits._
    val dir = new java.io.File(outputDir)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile)
      .map(f => (f.getName, f.length()))
      .toSeq.sortBy(_._1)
    files.toDF("filename", "n_bytes")
  }
}
