package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared stress-corpus builders. One definition of the 1 M-doc
  * replicated corpus (200× the sf0.1 documents, doc_id stride 5000)
  * instead of the four copies that had grown across Scale/ScaleStream/
  * ScaleDsirPq/ScaleRetrieval — a stride change now happens in exactly
  * one place, so tools can never consume corpora with colliding ids. */
object Corpora {
  val BigDocs = "target/tmp/big_documents.parquet"

  /** Build (if absent) and return the 1 M-doc corpus path. Guarded on
    * _SUCCESS, not bare directory existence — a crash mid-write must
    * trigger a rebuild, never hand the tools a torn corpus. */
  def ensureBigDocuments(spark: SparkSession): String = {
    if (!new java.io.File(s"$BigDocs/_SUCCESS").exists()) {
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .withColumn("rep", explode(sequence(lit(0), lit(199))))
        .select((col("doc_id") + col("rep") * 5000L).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(BigDocs)
    }
    BigDocs
  }

  /** Symlink `dir`/documents.parquet at the big corpus (building it if
    * needed) so `Tables.documents(spark, dir)` serves 1 M docs. */
  def linkBigDocuments(spark: SparkSession, dir: String): Unit = {
    ensureBigDocuments(spark)
    val link = new java.io.File(s"$dir/documents.parquet")
    if (!link.exists()) {
      new java.io.File(dir).mkdirs()
      java.nio.file.Files.createSymbolicLink(link.toPath,
        new java.io.File(BigDocs).getAbsoluteFile.toPath)
    }
  }
}
