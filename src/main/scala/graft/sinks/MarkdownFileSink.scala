package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFileSystem, FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Distributed per-document file writer (replaces the reference's
  * driver-side row loop, main.py:75-103).
  *
  * Takes a DataFrame with `filename` and `content` string columns and
  * writes one file per row from within each partition — 1000 executors
  * write 1000 ways with zero driver involvement. Writes are idempotent
  * (task retries overwrite the same target file), which is exactly the
  * reference's `open(..., 'w')` semantics.
  *
  * Round 18: writes and listings go through the HADOOP FILESYSTEM of
  * the output dir's own URI instead of `java.nio.file.Files` /
  * `java.io.File`. The java.nio form was correct only when every
  * executor's local disk IS the destination (local[*]); on a real
  * cluster the per-document export — the engine's core reference
  * deliverable — landed scattered across executors' local disks,
  * invisible to the driver's manifest and the `/api/files` surface
  * (the same bug class round 17 closed for the store caches, one
  * layer up). The path is QUALIFIED once on the driver, so executors
  * resolve the same absolute destination regardless of their working
  * directory or default FS; `file:` / bare-path behavior is unchanged
  * (same dirs, same bytes, no checksum sidecars — see [[rawFs]]).
  */
object MarkdownFileSink {

  /** The FS to WRITE through: unwrap Hadoop's client-side checksum
    * wrapper (local `file:` paths resolve to ChecksumFileSystem, whose
    * create() drops a `.name.crc` sidecar next to every file — the
    * export dir must hold exactly one file per document, byte-identical
    * to the old java.nio writer). Unwrapping only our own handle never
    * touches the JVM-cached instance other writers share. HDFS and
    * object-store FSs pass through untouched. */
  private[sinks] def rawFs(p: Path, conf: Configuration): FileSystem =
    p.getFileSystem(conf) match {
      case c: ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }

  /** Per-partition byte writer for a driver-QUALIFIED destination dir.
    * `file:` targets take the java.nio fast path — Hadoop local-FS
    * wrappers pay stream/permission scaffolding PER CREATE, which at
    * one-file-per-document scale is the workload itself (measured
    * 48-55 s vs 1-22 s for the same 50 k-doc extract in like I/O
    * states). Non-local URIs (hdfs:, s3a:, …) write through the Hadoop
    * FS of the destination — the cluster-correctness path this sink
    * exists for. Same bytes either way. */
  private[sinks] def writerFor(qualifiedDir: String,
                               conf: Configuration): (String, Array[Byte]) => Unit = {
    // Hadoop Path re-encodes characters a raw URI parse rejects:
    // makeQualified(...).toString returns the DECODED path, so an output
    // dir containing a space or '%' would throw in URI.create on every
    // task — a regression vs the old java.nio writer (advice r18)
    val uri = new Path(qualifiedDir).toUri
    if (uri.getScheme == "file" || uri.getScheme == null) {
      val dir = java.nio.file.Paths.get(uri.getPath)
      (name, bytes) => { java.nio.file.Files.write(dir.resolve(name), bytes); () }
    } else {
      val dir = new Path(qualifiedDir)
      val fs = rawFs(dir, conf)
      (name, bytes) => {
        val os = fs.create(new Path(dir, name), true)
        try os.write(bytes) finally os.close()
      }
    }
  }

  def write(df: DataFrame, outputDir: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val out = new Path(outputDir)
    val driverFs = rawFs(out, hconf)
    driverFs.mkdirs(out)
    // qualify on the DRIVER: executors must write the driver's
    // destination, not a path relative to their own CWD/default FS
    val qualified = driverFs.makeQualified(out).toString
    val confBc = spark.sparkContext.broadcast(new SerializableConfiguration(hconf))
    df.select("filename", "content").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val put = writerFor(qualified, confBc.value.value)
          rows.foreach { r =>
            put(r.getString(0), r.getString(1).getBytes(StandardCharsets.UTF_8))
          }
        }
    }
  }

  /** Manifest of an output directory as a DataFrame — the `/api/files`
    * surface (api.py:167-179). A missing directory answers an empty
    * manifest (the API's no-files-yet state, not an error).
    *
    * DRIVER-BOUNDED (round 19): the listing runs INSIDE a task via
    * `listStatusIterator` — the paged RemoteIterator streams directory
    * entries straight into Spark rows, so at a 100 TB one-file-per-
    * document export (tens of millions of entries) no array the size of
    * the listing ever exists on the driver or in any single heap; the
    * result is a distributed Dataset consumers sort/limit/aggregate
    * like any table. The directory itself is the unit of parallelism
    * (one FS listing is inherently sequential), which matches how
    * object stores page LIST results anyway. */
  def manifest(spark: SparkSession, outputDir: String): DataFrame = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val qualified = rawFs(new Path(outputDir), hconf)
      .makeQualified(new Path(outputDir)).toString
    val confBc = spark.sparkContext.broadcast(new SerializableConfiguration(hconf))
    val entries = spark.sparkContext.parallelize(Seq(qualified), 1)
      .mapPartitions { dirs =>
        dirs.flatMap { d =>
          val p = new Path(d)
          val fs = rawFs(p, confBc.value.value)
          val it =
            try Some(fs.listStatusIterator(p))
            catch { case _: java.io.FileNotFoundException => None }
          it match {
            case None => Iterator.empty
            case Some(ri) =>
              new Iterator[org.apache.hadoop.fs.FileStatus] {
                def hasNext: Boolean = ri.hasNext
                def next(): org.apache.hadoop.fs.FileStatus = ri.next()
              }.filter(_.isFile).map(s => (s.getPath.getName, s.getLen))
          }
        }
      }
    spark.createDataset(entries).toDF("filename", "n_bytes")
      .orderBy("filename")
  }
}
