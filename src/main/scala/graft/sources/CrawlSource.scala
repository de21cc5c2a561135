package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Wiki category-crawl source STUB (reference: api.py:647-714 fetch_ww2_articles,
  * api.py:849-980 /api/extract/ww2).
  *
  * The reference walks Wikipedia category members over live HTTP
  * (mwclient) — external ingestion, out of engine scope in a zero-egress
  * environment (SURVEY §1). What IS engine scope is the selection
  * semantics, reproduced here over a pluggable `provider`:
  *
  *  - categories are visited in the reference's order: the primary
  *    category first, then the related list, stopping once `limit`
  *    titles are collected;
  *  - only namespace-0 pages count (articles, not talk/category pages);
  *  - titles already collected are skipped (first occurrence wins);
  *  - the result caps at `limit` (the endpoint additionally clamps the
  *    requested limit to 1000, mirrored in [[clampLimit]]).
  *
  * In production `provider` wraps the wiki client; tests inject a
  * deterministic in-memory listing. The title list is bounded (≤1000 by
  * the reference's own clamp), so the walk is driver-side by design —
  * the downstream extract (render + PDF export) is the distributed part.
  */
object CrawlSource {

  /** Primary + related categories, in the reference's visit order
    * (api.py:664, 686-692). */
  val Ww2Categories: Seq[String] = Seq(
    "World_War_II",
    "World_War_II_by_country",
    "Military_equipment_of_World_War_II",
    "Battles_of_World_War_II",
    "Military_operations_of_World_War_II",
    "World_War_II_military_personnel")

  /** The endpoint's safety clamp (api.py:856). */
  def clampLimit(limit: Int): Int = math.min(limit, 1000)

  /** Collect up to `limit` distinct namespace-0 titles from `categories`
    * via `provider` (category name → (title, namespace) members). A
    * category whose listing fails is skipped, like the reference's
    * per-category try/except (api.py:695-706). */
  def articleTitles(provider: String => Seq[(String, Int)], limit: Int,
                    categories: Seq[String] = Ww2Categories): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    val it = categories.iterator
    while (out.size < limit && it.hasNext) {
      val cat = it.next()
      val members = try provider(cat) catch { case scala.util.control.NonFatal(_) => Seq.empty }
      val mit = members.iterator
      while (out.size < limit && mit.hasNext) {
        val (title, ns) = mit.next()
        if (ns == 0) out += title
      }
    }
    out.toSeq
  }

  /** Same selection as a one-column DataFrame (`title`), the shape the
    * extract pipeline consumes. */
  def articles(spark: SparkSession, provider: String => Seq[(String, Int)],
               limit: Int, categories: Seq[String] = Ww2Categories): DataFrame = {
    import spark.implicits._
    articleTitles(provider, clampLimit(limit), categories).toDF("title")
  }

  /** Provider backed by a LOCAL category-listing table — the snapshotted
    * category graph a production deployment materializes from a wiki
    * dump (live crawl stays out of engine scope). Columns: `category`,
    * `pos` (member order within the category), `title`, `namespace`.
    * Listings are bounded (the endpoint clamps at 1000 titles), so the
    * one driver-side collect is by design, like the reference's
    * in-memory member iteration. */
  def parquetProvider(spark: SparkSession, path: String): String => Seq[(String, Int)] = {
    import org.apache.spark.sql.functions.col
    val byCat = spark.read.parquet(path)
      .select(col("category"), col("pos").cast("long"),
        col("title"), col("namespace").cast("int"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (c, rs) =>
        c -> rs.sortBy(_.getLong(1)).map(r => (r.getString(2), r.getInt(3))).toSeq
      }
    (cat: String) => byCat.getOrElse(cat, Seq.empty)
  }

  // ---- article-body fetch (round 12) ----------------------------------
  // The reference's per-article download (api.py:716-849
  // download_wiki_article_to_pdf) as the SAME provider seam the
  // category walk already has: a live HTTP deployment injects a
  // wiki-client-backed function here — an injection point, not a
  // rewrite — while the sandbox uses in-memory stubs and the snapshot
  // path (`content_path`) stays the zero-egress production route.

  /** title → Some(article body), or None when the fetch fails / the
    * article is missing — the reference's per-article try/except
    * degrades to a placeholder, mirrored by [[fetchBodies]]. */
  type BodyProvider = String => Option[String]

  /** The no-network default: every title misses, so every doc keeps
    * the placeholder body (exactly the pre-round-12 behavior). */
  val noBodyProvider: BodyProvider = _ => None

  /** The documented placeholder body for a title whose fetch missed. */
  def placeholderBody(title: String): String =
    s"Wikipedia article: $title\n\n(Article body download requires " +
      "live wiki access - out of engine scope. Title selected " +
      "from the local category snapshot.)"

  // ---- live HTTP providers (round 13) ---------------------------------
  // The one reference behavior that had no runnable twin: api.py
  // downloads category members (mwclient, api.py:647-712) and each
  // article's text (wikipediaapi, api.py:716-849) at request time.
  // These adapters back the SAME provider seams with
  // java.net.http.HttpClient — per-request timeouts, and every failure
  // mode (non-200, timeout, connection refused, bad JSON) degrades the
  // way the reference's try/except does: a category that fails lists
  // nothing, a body that fails keeps the placeholder. Spec-tested
  // against an in-process stub server (zero egress); a deployment
  // points `urlFor` at the real wiki (or a mirror/extract service).

  private def newHttpClient(connectTimeout: java.time.Duration) =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(connectTimeout)
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

  private def httpGet(client: java.net.http.HttpClient, url: String,
                      requestTimeout: java.time.Duration): Option[String] =
    try {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .timeout(requestTimeout)
        .header("User-Agent",
          "graft-ww2-extractor/1.0 (engine library; see repository)")
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode == 200) Some(resp.body) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** Live-fetch [[BodyProvider]]: GET `urlFor(title)`, 200 → the
    * response body, anything else → None (placeholder downstream).
    * The default URL shape is MediaWiki's raw-wikitext endpoint; a
    * deployment substitutes its own mirror or plain-text extract
    * service — the provider is deliberately format-agnostic (the body
    * is whatever the endpoint serves, exactly as the snapshot
    * provider's `content` column is whatever the snapshot holds). */
  def httpBodyProvider(
      urlFor: String => String = t =>
        s"https://en.wikipedia.org/w/index.php?action=raw&title=${enc(t)}",
      connectTimeout: java.time.Duration = java.time.Duration.ofSeconds(5),
      requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(20))
      : BodyProvider = {
    val client = newHttpClient(connectTimeout)
    (title: String) => httpGet(client, urlFor(title), requestTimeout)
  }

  /** Live category-member provider for [[articleTitles]]: GET
    * `urlFor(category)` (default: the MediaWiki `list=categorymembers`
    * action API, the reference's mwclient call), parse the member
    * `{"ns":…,"title":…}` pairs out of the JSON in listing order. A
    * failed fetch or an unparseable response lists NOTHING for that
    * category — [[articleTitles]] then skips it, the reference's
    * per-category try/except. Single-page fetch by design: the
    * endpoint clamps at 1000 titles and `cmlimit=max` returns up to
    * 500 members per category, the same order-of-magnitude the
    * reference walks per category before moving on. */
  def httpCategoryProvider(
      urlFor: String => String = c =>
        "https://en.wikipedia.org/w/api.php?action=query&list=categorymembers" +
          s"&cmtitle=Category:${enc(c)}&cmlimit=max&format=json",
      connectTimeout: java.time.Duration = java.time.Duration.ofSeconds(5),
      requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(20))
      : String => Seq[(String, Int)] = {
    val client = newHttpClient(connectTimeout)
    (category: String) =>
      httpGet(client, urlFor(category), requestTimeout)
        .map(parseCategoryMembers).getOrElse(Seq.empty)
  }

  private val MemberRe =
    """"ns"\s*:\s*(\d+)\s*,\s*"title"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  /** Extract (title, ns) pairs from a `list=categorymembers` response,
    * in document order. Exposed for the spec; tolerant by contract —
    * anything that doesn't match the member shape contributes no
    * pairs. */
  private[graft] def parseCategoryMembers(json: String): Seq[(String, Int)] =
    MemberRe.findAllMatchIn(json)
      .map(m => (unescapeJson(m.group(2)), m.group(1).toInt)).toSeq

  /** Minimal JSON string unescape for the member titles (quotes,
    * backslashes, slashes, whitespace escapes, \uXXXX). */
  private def unescapeJson(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 'b' => b.append('\b'); i += 2
          case 'f' => b.append('\f'); i += 2
          case other => b.append(other); i += 2 // \" \\ \/ and unknowns
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** (doc_id, title, content) for the selected titles through a body
    * provider; misses keep [[placeholderBody]]. Driver-side by design —
    * the selection is ≤1000 titles (the endpoint clamp), matching the
    * reference's sequential download loop; the distributed part is the
    * downstream render + PDF export. A throwing provider counts as a
    * miss for that title (the reference's per-article try/except). */
  def fetchBodies(spark: SparkSession, titles: Seq[String],
                  provider: BodyProvider): DataFrame = {
    import spark.implicits._
    titles.zipWithIndex.map { case (t, i) =>
      val body = try provider(t) catch { case scala.util.control.NonFatal(_) => None }
      (i.toLong, t, body.getOrElse(placeholderBody(t)))
    }.toDF("doc_id", "title", "content")
  }
}
