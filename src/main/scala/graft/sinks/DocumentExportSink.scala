package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.SerializableConfiguration
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** Per-document export sink with pluggable renderers — the Spark-side
  * equivalent of the reference's wikir→PDF export (api.py:193-383):
  * title fallback, ASCII sanitization, 50 000-char truncation, one
  * output file per document, written partition-parallel.
  *
  * Like [[MarkdownFileSink]] (round 18), all I/O goes through the
  * Hadoop FileSystem of the output dir's URI — the export lands on the
  * shared FS the path names, not on each executor's local disk.
  */
object DocumentExportSink {

  trait Renderer extends Serializable {
    def extension: String
    def render(title: String, docId: Long, body: String): Array[Byte]
  }

  /** Plain markdown renderer (real). */
  object MarkdownRenderer extends Renderer {
    val extension = "md"
    def render(title: String, docId: Long, body: String): Array[Byte] =
      s"---\ndoc_id: $docId\ntitle: $title\n---\n$body"
        .getBytes(StandardCharsets.UTF_8)
  }

  /** Real PDF renderer — [[Pdf]] is a dependency-free PDF 1.4 writer
    * with the reference's title / doc-id / wrapped-body page layout
    * (api.py:256-342). */
  object PdfRenderer extends Renderer {
    val extension = "pdf"
    def render(title: String, docId: Long, body: String): Array[Byte] =
      Pdf.render(title, docId, body)
  }

  /** Export (doc_id, title, content) rows, one file per document
    * (`prefix_{doc_id}.{ext}`, api.py:248). Returns the manifest. */
  def export(df: DataFrame, outputDir: String, renderer: Renderer,
             prefix: String = "doc"): DataFrame = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val out = new Path(outputDir)
    val driverFs = MarkdownFileSink.rawFs(out, hconf)
    driverFs.mkdirs(out)
    val qualified = driverFs.makeQualified(out).toString
    val confBc = spark.sparkContext.broadcast(new SerializableConfiguration(hconf))
    df.select("doc_id", "title", "content").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val put = MarkdownFileSink.writerFor(qualified, confBc.value.value)
          rows.foreach { r =>
            val docId = r.getLong(0)
            val title = Option(r.getString(1)).filter(_.nonEmpty)
              .getOrElse(s"Document $docId") // api.py:263-268 fallback
            put(s"${prefix}_$docId.${renderer.extension}",
              renderer.render(title, docId, Option(r.getString(2)).getOrElse("")))
          }
        }
    }
    MarkdownFileSink.manifest(spark, outputDir)
  }
}
