package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Job tracking mirroring the reference REST surface (api.py:24-39,
  * /api/jobs): submit named extraction jobs, poll status, list results
  * as a DataFrame. The tracker records status/metrics exactly like the
  * reference's in-memory `jobs` dict. [[submit]] runs inline (CLI
  * shape); [[submitAsync]] runs the job on a background thread and
  * returns immediately with a "running" status, like the reference's
  * per-request `threading.Thread` (api.py:78-103) — Spark schedules
  * jobs from concurrent driver threads fairly, so an async extract
  * never blocks queries submitted meanwhile.
  */
object Jobs {

  /** `result` carries job-type-specific stats as a JSON string (the
    * reference stores analysis results inside the job dict,
    * api.py:611-625); empty for plain extract jobs. */
  final case class Job(id: String, jobType: String, status: String,
                       outputDir: String, fileCount: Long, error: String,
                       result: String = "")

  private val jobs = new ConcurrentHashMap[String, Job]()
  private val counter = new java.util.concurrent.atomic.AtomicLong(0)

  def submit(jobType: String, outputDir: String,
             result: DataFrame => String = _ => "")(run: => DataFrame): String = {
    val id = newId(jobType, outputDir)
    execute(id, jobType, outputDir, run, result)
    id
  }

  def submitAsync(jobType: String, outputDir: String,
                  result: DataFrame => String = _ => "")(run: => DataFrame): String = {
    val id = newId(jobType, outputDir)
    val t = new Thread(() => execute(id, jobType, outputDir, run, result), s"graft-$id")
    t.setDaemon(true)
    t.start()
    id
  }

  private def newId(jobType: String, outputDir: String): String = {
    val id = s"job-${counter.incrementAndGet()}"
    jobs.put(id, Job(id, jobType, "running", outputDir, 0, ""))
    id
  }

  private def execute(id: String, jobType: String, outputDir: String,
                      run: => DataFrame, result: DataFrame => String): Unit =
    try {
      val manifest = run
      jobs.put(id,
        Job(id, jobType, "completed", outputDir, manifest.count(), "", result(manifest)))
    } catch {
      case scala.util.control.NonFatal(e) =>
        jobs.put(id, Job(id, jobType, "failed", outputDir, 0, String.valueOf(e.getMessage)))
      case e: Throwable =>
        // fatal (OOM, linkage error) on the daemon thread: without this
        // the job would sit in "running" forever and pollers would time
        // out with nothing surfaced — record the failure, then rethrow
        jobs.put(id, Job(id, jobType, "failed", outputDir, 0, String.valueOf(e)))
        throw e
    }

  /** Block until a job leaves "running" (spec/test helper). */
  def await(id: String, timeoutMs: Long = 120000): Option[Job] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var j = status(id)
    while (j.exists(_.status == "running") && System.nanoTime() < deadline) {
      Thread.sleep(50); j = status(id)
    }
    j
  }

  def status(id: String): Option[Job] = Option(jobs.get(id))

  def all(): Seq[Job] = jobs.values.asScala.toSeq.sortBy(_.id)

  def list(spark: SparkSession): DataFrame = {
    import spark.implicits._
    jobs.values.asScala.toSeq.sortBy(_.id).toDF()
  }
}
