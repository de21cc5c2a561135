package graft.tools

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Thin client for the graft REST surface — api_client.py:6-273 parity,
  * minus multipart upload (extracts take storage paths; see the
  * RestServer scaladoc for why bodies don't ship 100 TB). Library calls
  * return the raw JSON body string; [[main]] is the CLI wrapper with the
  * same subcommands (health / parquet / cisi / wikir / analyze / jobs /
  * files / download / cleanup) and the same `--wait` polling loop.
  */
object ApiClient {

  private lazy val client = HttpClient.newHttpClient()

  private def enc(s: String) = URLEncoder.encode(s, UTF_8)
  private def qs(params: Seq[(String, String)]): String =
    if (params.isEmpty) ""
    else params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("?", "&", "")

  private def request(method: String, base: String, path: String,
                      params: Seq[(String, String)]) =
    HttpRequest.newBuilder(URI.create(base + path + qs(params)))
      .method(method, HttpRequest.BodyPublishers.noBody()).build()

  def get(base: String, path: String, params: (String, String)*): String =
    client.send(request("GET", base, path, params),
      HttpResponse.BodyHandlers.ofString()).body()

  def post(base: String, path: String, params: (String, String)*): String =
    client.send(request("POST", base, path, params),
      HttpResponse.BodyHandlers.ofString()).body()

  // ---- one call per endpoint (api_client.py:6-92) ----------------------

  def health(base: String): String = get(base, "/api/health")

  def extractParquet(base: String, path: String,
                     outputDir: String = "extracted_papers",
                     numPapers: Int = 1000, seed: Int = 42): String =
    post(base, "/api/extract/parquet", "path" -> path, "output_dir" -> outputDir,
      "num_papers" -> numPapers.toString, "seed" -> seed.toString)

  def extractCisi(base: String, path: String,
                  outputDir: String = "cisi_papers"): String =
    post(base, "/api/extract/cisi", "path" -> path, "output_dir" -> outputDir)

  def extractWikir(base: String, path: String, outputDir: String = "wikir_pdfs",
                   limit: Int = 100): String =
    post(base, "/api/extract/wikir", "path" -> path, "output_dir" -> outputDir,
      "limit" -> limit.toString)

  def analyzeWikir(base: String, path: String, limit: Option[Int] = None): String =
    post(base, "/api/analyze/wikir",
      ("path" -> path) +: limit.map(n => "limit" -> n.toString).toSeq: _*)

  def jobStatus(base: String, id: String): String = get(base, s"/api/jobs/$id")

  def listFiles(base: String, outputDir: String): String =
    get(base, "/api/files", "output_dir" -> outputDir)

  def cleanup(base: String, outputDir: String, suffix: String = ".pdf"): String =
    post(base, "/api/cleanup", "output_dir" -> outputDir, "suffix" -> suffix)

  /** Download to `savePath` (api_client.py:38-56); returns a status JSON. */
  def downloadFile(base: String, filename: String, outputDir: String,
                   savePath: Option[String] = None): String = {
    val resp = client.send(
      request("GET", base, s"/api/files/${enc(filename)}",
        Seq("output_dir" -> outputDir)),
      HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() == 200) {
      val target = Paths.get(savePath.getOrElse(filename))
      Files.write(target, resp.body())
      s"""{"status":"success","file":"$target"}"""
    } else new String(resp.body(), UTF_8)
  }

  /** Extract the job id from a submit response. */
  def jobId(submitJson: String): Option[String] =
    "\"job_id\":\"([^\"]+)\"".r.findFirstMatchIn(submitJson).map(_.group(1))

  /** Poll /api/jobs/{id} until it leaves "running" (api_client.py --wait). */
  def waitForJob(base: String, id: String, timeoutMs: Long = 120000,
                 pollMs: Long = 200): String = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var body = jobStatus(base, id)
    while (body.contains("\"status\":\"running\"") && System.nanoTime() < deadline) {
      Thread.sleep(pollMs)
      body = jobStatus(base, id)
    }
    body
  }

  // ---- CLI (api_client.py:94-273) --------------------------------------

  private def flag(args: Array[String], name: String, default: String): String =
    args.sliding(2).collectFirst { case Array(`name`, v) => v }.getOrElse(default)

  def main(args: Array[String]): Unit = {
    val base = flag(args, "--api_base", "http://127.0.0.1:8080")
    val wait = args.contains("--wait")
    def submitAndMaybeWait(resp: String): Unit = {
      println(resp)
      if (wait) jobId(resp).foreach(id => println(waitForJob(base, id)))
    }
    args.headOption match {
      case Some("health")  => println(health(base))
      case Some("parquet") => submitAndMaybeWait(extractParquet(base, args(1),
        flag(args, "--output_dir", "extracted_papers"),
        flag(args, "--num_papers", "1000").toInt, flag(args, "--seed", "42").toInt))
      case Some("cisi")    => submitAndMaybeWait(extractCisi(base, args(1),
        flag(args, "--output_dir", "cisi_papers")))
      case Some("wikir")   => submitAndMaybeWait(extractWikir(base, args(1),
        flag(args, "--output_dir", "wikir_pdfs"), flag(args, "--limit", "100").toInt))
      case Some("analyze") => submitAndMaybeWait(analyzeWikir(base, args(1),
        args.sliding(2).collectFirst { case Array("--limit", v) => v.toInt }))
      case Some("jobs")    => println(
        if (args.length > 1 && !args(1).startsWith("--")) jobStatus(base, args(1))
        else get(base, "/api/jobs"))
      case Some("files")   => println(listFiles(base, flag(args, "--output_dir", ".")))
      case Some("download") => println(downloadFile(base, args(1),
        flag(args, "--output_dir", "."),
        Option(flag(args, "--save_path", "")).filter(_.nonEmpty)))
      case Some("cleanup") => println(cleanup(base,
        flag(args, "--output_dir", "."), flag(args, "--suffix", ".pdf")))
      case _ => println("usage: ApiClient [--api_base URL] " +
        "health | parquet <path> | cisi <path> | wikir <path> | analyze <path> " +
        "| jobs [id] | files | download <name> | cleanup [--wait]")
    }
  }
}
