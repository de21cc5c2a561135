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
