package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}
import graft.operators.{ColumnDetect, Sampling}
import graft.sources.CisiSource
import graft.sinks.MarkdownFileSink
import graft.functions.TextFns

/** User-facing facade mirroring the reference's CLI/REST surface
  * (main.py `extract_papers`/`convert_cisi_to_markdown`,
  * api.py `analyze_wikir_dataset`, `/api/files`) — each job is a single
  * distributed Spark pipeline instead of a driver-side row loop.
  */
object Extractor {

  /** Extract N sampled documents from a parquet dataset to one markdown
    * file each (main.py:9-105). Returns the output-file manifest.
    *
    * Column auto-detection, seeded deterministic sampling, YAML
    * frontmatter of every non-content/non-null/non-binary column
    * (strings only when shorter than 1000 chars — main.py:92-97),
    * title-derived or sequential filenames.
    */
  def extractPapers(spark: SparkSession, parquetPath: String, outputDir: String,
                    numPapers: Int = 1000, seed: Int = 42): DataFrame = {
    val df = spark.read.parquet(parquetPath)
    val detected = ColumnDetect.detect(df)
    val contentCol = detected.content.getOrElse(throw new IllegalArgumentException(
      "Could not identify a column containing paper content. Please specify manually."))

    // Sampling key: an id-role column when present, else a row hash.
    val key = df.columns.find(c => detected.roleOf(c) == "id")
      .map(col)
      .getOrElse(md5(concat_ws("", df.columns.map(c => col(c).cast("string")): _*)))
    val sampled = Sampling.sampleN(df, key, numPapers, seed)

    val metaFields: Seq[Column] = df.schema.fields.toSeq
      .filter(f => f.name != contentCol && f.dataType != BinaryType)
      .map { f =>
        val v = col(f.name)
        val keep = f.dataType match {
          case StringType => v.isNotNull && length(v) < 1000
          case _          => v.isNotNull
        }
        when(keep, concat(lit("\n" + f.name + ": "), v.cast("string"))).otherwise(lit(""))
      }
    val markdown = concat(
      (lit("---") +: metaFields) :+ lit("\n---\n") :+ col(contentCol): _*)

    // format_string("%04d") is min-width (reference f"{i:04d}"); lpad
    // truncates >4-digit ranks into filename collisions
    val filename = detected.title match {
      case Some(t) => concat(
        format_string("%04d", col("sample_rank")), lit("_"),
        TextFns.sanitizeFilename(col(t).cast("string")), lit(".md"))
      case None => concat(
        lit("paper_"), format_string("%04d", col("sample_rank")), lit(".md"))
    }

    // the rank-ordered sample collapses to one partition after the
    // global top-n — spread it back out so the file sink writes in
    // parallel instead of single-threaded
    MarkdownFileSink.write(
      sampled.select(filename.as("filename"), markdown.as("content"))
        .repartition(math.max(spark.sparkContext.defaultParallelism, 4)),
      outputDir)
    MarkdownFileSink.manifest(spark, outputDir)
  }

  /** Convert a CISI corpus file to per-document markdown (main.py:107-192). */
  def convertCisi(spark: SparkSession, cisiPath: String, outputDir: String): DataFrame = {
    val docs = CisiSource.read(spark, cisiPath)
    val title  = when(length(col("title")) > 0, col("title"))
      .otherwise(concat(lit("Document "), col("cisi_id").cast("string")))
    val author = when(length(col("author")) > 0, col("author")).otherwise(lit("Unknown"))
    val filename = concat(
      lit("cisi_"), format_string("%04d", col("cisi_id")), lit("_"),
      TextFns.sanitizeFilename(title), lit(".md"))
    // extra sections land between author and the closing marker, like
    // main.py:181-183
    val extras = when(size(map_entries(col("extra"))) > 0,
      concat(lit("\n"), array_join(
        transform(map_entries(col("extra")),
          e => concat(e.getField("key"), lit(": "), e.getField("value"))), "\n")))
      .otherwise(lit(""))
    val markdown = concat(
      lit("---\ndoc_id: "), col("cisi_id").cast("string"),
      lit("\ntitle: "), title,
      lit("\nauthor: "), author,
      extras,
      lit("\n---\n"), col("content"))
    MarkdownFileSink.write(
      docs.select(filename.as("filename"), markdown.as("content")), outputDir)
    MarkdownFileSink.manifest(spark, outputDir)
  }

  /** Write a corpus with the 100 TB-ready layout: parquet partitioned by
    * a low-cardinality column (partition pruning turns `WHERE lang='en'`
    * into a directory skip), rows pre-shuffled on the dedup/join key so
    * downstream consumers read co-located data, files sized by
    * repartition rather than one-file-per-task dust. */
  def writeCorpusPartitioned(df: DataFrame, outputDir: String,
                             partitionCol: String, clusterCol: String,
                             filesPerPartition: Int = 4): Unit =
    df.repartition(filesPerPartition, col(partitionCol), col(clusterCol))
      .sortWithinPartitions(col(partitionCol), col(clusterCol))
      .write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(outputDir)

  /** Write a corpus Z-ORDERED on several numeric columns — the layout
    * for "we filter this table by time AND quality AND length, pick
    * one sort order": bit-interleaved keys keep every contiguous file's
    * min/max narrow in EVERY listed dimension, so parquet stats prune
    * scans on ANY of them (~n_files^(1/d) of the files touched for a
    * point-ish predicate, vs all files for every non-leading column of
    * a lexicographic sort). Bounds for bucketizing are ONE min/max agg
    * over the corpus, shipped as literals; the key build is narrow; the
    * write is `repartitionByRange(zkey)` (one range shuffle — contiguous
    * disjoint key ranges per file, which is what makes the per-file
    * stats tight) + an in-partition sort. Columns must be numeric;
    * map categoricals through a dictionary first. */
  def writeCorpusZOrdered(df: DataFrame, outputDir: String,
                          zCols: Seq[String], nFiles: Int = 16,
                          bits: Int = 16): Unit = {
    import graft.functions.ZOrder
    require(zCols.nonEmpty, "writeCorpusZOrdered needs at least one layout column")
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val bucketed = zCols.zipWithIndex.map { case (c, i) =>
      ZOrder.bucketize(col(c), bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1), bits)
    }
    df.withColumn("__zkey", ZOrder.zkey(bucketed, bits))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(outputDir)
  }

  final case class CleanupResult(deleted: Long, bytes: Long)

  /** Delete generated files in an output directory (cleanup_wikir.py:9),
    * optionally only those with the given suffix (the reference filters
    * to '.pdf'). Returns how many files and bytes were removed; the
    * confirm prompt lives with the caller (CLI/REST), not here. */
  def cleanup(outputDir: String, suffix: String = ""): CleanupResult = {
    val dir = new java.io.File(outputDir)
    if (!dir.isDirectory) CleanupResult(0, 0)
    else {
      // listFiles() returns null on IO/permission errors even for a
      // directory; count only files delete() actually removed
      val files = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && f.getName.endsWith(suffix))
      var deleted = 0L
      var bytes = 0L
      files.foreach { f =>
        val len = f.length()
        if (f.delete()) { deleted += 1; bytes += len }
      }
      CleanupResult(deleted, bytes)
    }
  }

  /** Corpus token analysis (api.py:491-567): one row of
    * document_count / total / average / min / max tokens. */
  def analyzeTokens(df: DataFrame, contentCol: String): DataFrame = {
    val n = TextFns.tokenCount(col(contentCol)).as("n")
    df.select(n).agg(
      count(lit(1)).as("document_count"),
      sum(col("n")).as("total_tokens"),
      round(sum(col("n")).cast("double") / count(lit(1)), 4).as("average_tokens_per_doc"),
      min(col("n")).as("min_tokens"),
      max(col("n")).as("max_tokens"))
  }
}
