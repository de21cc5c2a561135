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
      .select(
        regexp_extract(col("chunk"), "(?s)^(\\d+)", 1).cast("long").as("cisi_id"),
        col("chunk"))
    // Generic section parse, faithful to main.py:146-160: ANY line
    // starting with '.' opens a section; known keys are pivoted out,
    // the rest land in an `extra` map (main.py:181-183), `.X` dropped.
    val secs = docs
      .select(col("cisi_id"),
        posexplode(split(col("chunk"), "(?m)^\\.")).as(Seq("pos", "sec")))
      .withColumn("key", regexp_extract(col("sec"), "^([A-Z][A-Za-z]*)", 1))
      // Python .strip() strips ALL whitespace; Spark trim() only spaces —
      // use a regex trim so trailing newlines go too (main.py:150)
      .withColumn("v", regexp_replace(
        regexp_extract(col("sec"), "(?s)^[A-Z][A-Za-z]*\\n?(.*)$", 1),
        "(?s)^\\s+|\\s+$", ""))
      .filter(col("key") =!= "")
    def lastOf(k: String) = expr(
      s"coalesce(max_by(CASE WHEN key = '$k' THEN v END, CASE WHEN key = '$k' THEN pos END), '')")
    secs.groupBy(col("cisi_id"))
      .agg(
        lastOf("T").as("title"),
        lastOf("A").as("author"),
        lastOf("W").as("content"),
        map_from_entries(array_sort(collect_list(
          when(!col("key").isin("T", "A", "W", "X"), struct(col("key"), col("v")))
        ))).as("extra"))
  }

  /** Render a DataFrame(doc_id, title, author, content) back into CISI
    * text — test fixture writer for the round-trip proof. */
  def renderCisi(rows: Seq[(Long, String, String, String)]): String =
    rows.map { case (id, t, a, w) =>
      s".I $id\n.T\n$t\n.A\n$a\n.W\n$w"
    }.mkString("", "\n", "\n")
}
