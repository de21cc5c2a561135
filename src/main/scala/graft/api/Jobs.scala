package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Job tracking mirroring the reference REST surface (api.py:24-39,
  * /api/jobs): submit named extraction jobs, poll status, list results
  * as a DataFrame. Execution is synchronous-per-job on Spark (the
  * cluster is the async machinery); the tracker records status/metrics
  * exactly like the reference's in-memory `jobs` dict.
  */
object Jobs {

  final case class Job(id: String, jobType: String, status: String,
                       outputDir: String, fileCount: Long, error: String)

  private val jobs = new ConcurrentHashMap[String, Job]()
  private val counter = new java.util.concurrent.atomic.AtomicLong(0)

  def submit(jobType: String, outputDir: String)(run: => DataFrame): String = {
    val id = s"job-${counter.incrementAndGet()}"
    jobs.put(id, Job(id, jobType, "running", outputDir, 0, ""))
    try {
      val manifest = run
      jobs.put(id, Job(id, jobType, "completed", outputDir, manifest.count(), ""))
    } catch {
      case e: Exception =>
        jobs.put(id, Job(id, jobType, "failed", outputDir, 0, String.valueOf(e.getMessage)))
    }
    id
  }

  def status(id: String): Option[Job] = Option(jobs.get(id))

  def list(spark: SparkSession): DataFrame = {
    import spark.implicits._
    jobs.values.asScala.toSeq.sortBy(_.id).toDF()
  }
}
