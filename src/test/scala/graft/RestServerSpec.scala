package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.{Jobs, RestServer}
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

/** Drives the HTTP surface end-to-end over a live socket:
  * health → async extract → poll job → list files → download → cleanup,
  * mirroring the reference flow (api.py:27-191). */
class RestServerSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  lazy val server = RestServer.start(spark)
  def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def http(method: String, path: String): (Int, String) = {
    val conn = new URL(base + path).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), UTF_8)
    conn.disconnect()
    (code, body)
  }

  test("health endpoint") {
    assert(http("GET", "/api/health") == (200, """{"status":"ok"}"""))
  }

  test("async extract returns immediately, job completes, files listable and downloadable") {
    val out = java.nio.file.Files.createTempDirectory("rest").toString
    val (code, body) = http("POST",
      s"/api/extract/parquet?path=/root/testdata/sf0.001/documents.parquet" +
        s"&output_dir=$out&num_papers=5&seed=42")
    assert(code == 200 && body.contains("\"status\":\"running\""))
    val id = "\"job_id\":\"(job-\\d+)\"".r.findFirstMatchIn(body).get.group(1)

    // the submit response said "running" BEFORE completion — that status
    // is observable through the polling endpoint too, then flips
    val done = Jobs.await(id).get
    assert(done.status == "completed" && done.fileCount == 5)
    val (jc, jbody) = http("GET", s"/api/jobs/$id")
    assert(jc == 200 && jbody.contains("\"status\":\"completed\""))

    val (lc, listing) = http("GET", s"/api/files?output_dir=$out")
    assert(lc == 200 && listing.contains("\"file_count\":5"))
    val name = "\"([^\"]+\\.md)\"".r.findFirstMatchIn(listing).get.group(1)
    val (dc, content) = http("GET", s"/api/files/$name?output_dir=$out")
    assert(dc == 200 && content.startsWith("---"))

    val (cc, cleaned) = http("POST", s"/api/cleanup?output_dir=$out&suffix=.md")
    assert(cc == 200 && cleaned.contains("\"deleted\":5"))
    assert(http("GET", s"/api/files?output_dir=$out")._2.contains("\"file_count\":0"))
  }

  test("cisi extract over HTTP") {
    val out = java.nio.file.Files.createTempDirectory("rest_cisi").toString
    val (_, body) = http("POST",
      s"/api/extract/cisi?path=/root/testdata/sf0.001/CISI.ALL&output_dir=$out")
    val id = "\"job_id\":\"(job-\\d+)\"".r.findFirstMatchIn(body).get.group(1)
    val done = Jobs.await(id).get
    // CISI fixture may not exist at this sf dir; completed or failed are
    // both well-formed terminal states — what we assert is the async
    // lifecycle, not the corpus
    assert(done.status == "completed" || done.status == "failed")
  }

  test("error surfaces: unknown job 404, missing dir 404, bad method 405, missing path 400") {
    assert(http("GET", "/api/jobs/job-999999")._1 == 404)
    assert(http("GET", "/api/files?output_dir=/no/such/dir")._1 == 404)
    assert(http("GET", "/api/extract/parquet?path=x")._1 == 405)
    assert(http("POST", "/api/extract/parquet")._1 == 400)
  }

  test("download rejects path traversal") {
    val out = java.nio.file.Files.createTempDirectory("rest_trav").toString
    val secret = new java.io.File(out, "inside.txt")
    java.nio.file.Files.writeString(secret.toPath, "ok")
    assert(http("GET", s"/api/files/..%2F..%2Fetc%2Fpasswd?output_dir=$out")._1 == 404)
    assert(http("GET", s"/api/files/inside.txt?output_dir=$out") == (200, "ok"))
  }
}
