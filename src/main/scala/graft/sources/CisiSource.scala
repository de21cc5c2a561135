package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CISI corpus format source (main.py:107-192).
  *
  * Format: documents delimited by `.I <id>` lines; within a document,
  * section markers `.T` (title), `.A` (author), `.W` (content), `.X`
  * (cross-refs, dropped like the reference does).
  *
  * Spark-first reading: `wholetext` per file (CISI corpora are single
  * `.ALL` files; a directory of them parallelizes one file per task),
  * then a distributed explode/regexp parse — the per-document work is
  * all codegen'd string expressions, no driver loop (the reference
  * parses the whole corpus in one Python process).
  */
object CisiSource {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("wholetext", "true").text(path)
    // Split on document markers; first array element precedes the first
    // `.I` (empty in well-formed files) and is dropped like main.py:128.
    val docs = raw
      .select(explode(expr("slice(split(value, '(?m)^\\\\.I ')," +
        " 2, 2147483647)")).as("chunk"))
    docs.select(
      regexp_extract(col("chunk"), "(?s)^(\\d+)", 1).cast("long").as("cisi_id"),
      trim(regexp_extract(col("chunk"), "(?s)\\n\\.T\\n(.*?)\\n\\.[AWX]", 1)).as("title"),
      trim(regexp_extract(col("chunk"), "(?s)\\n\\.A\\n(.*?)\\n\\.[WX]", 1)).as("author"),
      trim(regexp_extract(col("chunk"), "(?s)\\n\\.W\\n(.*?)(\\n\\.X\\n.*)?$", 1)).as("content"))
  }

  /** Render a DataFrame(doc_id, title, author, content) back into CISI
    * text — test fixture writer for the round-trip proof. */
  def renderCisi(rows: Seq[(Long, String, String, String)]): String =
    rows.map { case (id, t, a, w) =>
      s".I $id\n.T\n$t\n.A\n$a\n.W\n$w"
    }.mkString("", "\n", "\n")
}
