package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Stress the dedup pipeline on the 1M-doc replicated corpus: 200 exact
  * copies of each of 5000 docs — pathological for naive LSH (every band
  * bucket holds the whole duplicate cluster), routine for the composed
  * exact-first pipeline. */
object ScaleDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "target/tmp/bigsf"
    // Tables.documents expects <dir>/documents.parquet
    val link = new java.io.File(s"$dir/documents.parquet")
    if (!link.exists()) {
      new java.io.File(dir).mkdirs()
      java.nio.file.Files.createSymbolicLink(link.toPath,
        new java.io.File("target/tmp/big_documents.parquet").getAbsoluteFile.toPath)
    }
    val t0 = System.nanoTime()
    val out = Dedup.dedupPipeline(spark, dir)
    val byStatus = out.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(f"[scale] dedup_pipeline 1M docs: ${(System.nanoTime()-t0)/1e9}%.2f s  $byStatus")

    // substring-level dedup at 1 M docs (round 8): the window table is
    // ~n_tokens rows/doc of (doc_id, off, md5) — the heaviest shuffle
    // of the round's additions. On the 200×-replicated corpus every
    // window repeats ~200×, so coverage explodes 199 duplicate windows
    // per distinct one and all but the first copy empties out —
    // duplication-heavy is the WORST case for this operator, the right
    // stress. sum() over the outputs forces the full reassembly.
    import org.apache.spark.sql.functions._
    val t1 = System.nanoTime()
    val sub = graft.operators.Curation.substringDedup(spark, dir)
      .agg(count(lit(1)), sum(col("n_kept")), sum(col("n_tokens"))).first()
    println(f"[scale] substring_dedup 1M docs: ${(System.nanoTime()-t1)/1e9}%.2f s  " +
      s"docs=${sub.getLong(0)} kept_tokens=${sub.getLong(1)}/${sub.getLong(2)}")
    spark.stop()
  }
}
