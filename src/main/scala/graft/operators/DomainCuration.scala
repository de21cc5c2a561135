package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** URL/domain-level curation (round 14) — the crawl-hygiene stage
  * every real pretraining pipeline runs BEFORE content-level curation
  * (RefinedWeb §3.1, Gopher/MassiveText filtering): extract the
  * domain, drop blocklisted domains (and their subdomains), cap the
  * number of documents any one domain may contribute.
  *
  * Scale shape: domain extraction is a NARROW per-row expression
  * (anchored RE2-safe regexes — the text_pii_redact discipline, no
  * backtracking constructs, portable to the DuckDB oracle verbatim);
  * the blocklist rides a BROADCAST anti-join (a blocklist is
  * human-curated, thousands of rows at most — never shuffle the
  * corpus against it); the per-domain cap is one shuffle on the
  * domain key with Spark's WindowGroupLimit keeping each partition's
  * local top-n before the exchange (the stratifiedMix pattern), in
  * portable md5-hash order so the kept set is deterministic and
  * engine-independent.
  */
object DomainCuration {

  /** Registered-host extraction as a composable Column: authority from
    * an RFC-3986 URL (scheme required; falls back to the leading
    * host-looking prefix for the scheme-less strings crawl data is
    * full of), then strip userinfo, port, and one leading `www.`,
    * lowercased. Anchored patterns only — identical semantics in
    * Spark (replace-all) and DuckDB (replace-first). IPv6 literals
    * and IDN punycode pass through verbatim (no normalization). */
  def domainOf(url: Column): Column = {
    val auth0 = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    val auth = when(auth0 === "", regexp_extract(url, "^([^/?#]+)", 1))
      .otherwise(auth0)
    val noUser = regexp_replace(auth, "^[^@/]*@", "")
    val noPort = regexp_replace(noUser, ":[0-9]+$", "")
    lower(regexp_replace(noPort, "^(?i)www\\.", ""))
  }

  /** Drop rows whose `domain` is a blocklisted domain OR any
    * subdomain of one. The blocklist is broadcast; the suffix match
    * makes this a BroadcastNestedLoopJoin — fine at blocklist scale
    * (it is the corpus side that must never shuffle, and it doesn't). */
  def blocklistAntiJoin(df: DataFrame, blocklist: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bl = blocklist.toDF("bdom")
    df.join(broadcast(bl),
      col("domain") === col("bdom") ||
        col("domain").endsWith(concat(lit("."), col("bdom"))),
      "left_anti")
  }

  /** Keep at most `cap` docs per domain, in portable md5 order
    * (deterministic, engine-independent — the stratifiedMix hash
    * discipline). Adds `rk`, the doc's 1-based rank within its
    * domain. */
  def capPerDomain(df: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("domain")).orderBy(col("hk"), col("doc_id"))
    df.withColumn("hk", md5(concat(lit("dg:"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .drop("hk")
  }

  /** Gate constants — shared by the query and its oracle. */
  private[graft] final val DomainCap = 10
  private[graft] val Blocklist = Seq("d3.example.com", "d7.example.com")

  /** Gated `curation_domain_gate`: synthesize a deterministic URL per
    * document (mixed schemes, WWW casing, userinfo, ports, paths,
    * subdomains — the extraction edge cases), then run the full
    * domain gate: extract → blocklist (d3/d7 + subdomains) → cap at
    * [[DomainCap]] per domain. */
  def domainGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val url = concat(
      when(col("doc_id") % 3 === 0, "https://").otherwise("http://"),
      when(col("doc_id") % 11 === 0, "user:pw@").otherwise(""),
      when(col("doc_id") % 5 === 0, "WWW.").otherwise(""),
      when(col("doc_id") % 6 === 0, "sub.").otherwise(""),
      concat(lit("d"), (col("doc_id") % 20).cast("string"), lit(".example.com")),
      when(col("doc_id") % 4 === 1, ":8080").otherwise(""),
      concat(lit("/p/"), col("doc_id").cast("string")),
      when(col("doc_id") % 2 === 0, "?a=b").otherwise(""))
    val withDom = docs.select(col("doc_id"), url.as("url"))
      .withColumn("domain", domainOf(col("url")))
    capPerDomain(blocklistAntiJoin(withDom, Blocklist), DomainCap)
      .select(col("doc_id"), col("domain"), col("rk"))
      .orderBy(col("domain"), col("rk"))
  }

  val domainGateOracle: String = s"""
    WITH u AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 3 = 0 THEN 'https://' ELSE 'http://' END)
        || (CASE WHEN doc_id % 11 = 0 THEN 'user:pw@' ELSE '' END)
        || (CASE WHEN doc_id % 5 = 0 THEN 'WWW.' ELSE '' END)
        || (CASE WHEN doc_id % 6 = 0 THEN 'sub.' ELSE '' END)
        || 'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
        || (CASE WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END)
        || '/p/' || CAST(doc_id AS VARCHAR)
        || (CASE WHEN doc_id % 2 = 0 THEN '?a=b' ELSE '' END) AS url
      FROM documents),
    d AS (
      SELECT doc_id, url,
        lower(regexp_replace(regexp_replace(regexp_replace(
          CASE WHEN regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1) = ''
               THEN regexp_extract(url, '^([^/?#]+)', 1)
               ELSE regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1) END,
          '^[^@/]*@', ''), ':[0-9]+$$', ''), '^(?i)www\\.', '')) AS domain
      FROM u),
    kept AS (
      SELECT doc_id, domain FROM d
      WHERE NOT EXISTS (
        SELECT 1 FROM (VALUES ('d3.example.com'), ('d7.example.com')) b(bdom)
        WHERE d.domain = b.bdom OR d.domain LIKE '%.' || b.bdom)),
    ranked AS (
      SELECT doc_id, domain,
        CAST(row_number() OVER (PARTITION BY domain
          ORDER BY md5('dg:' || CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
      FROM kept)
    SELECT doc_id, domain, rk FROM ranked WHERE rk <= $DomainCap
    ORDER BY domain, rk"""

  // ---- URL canonicalization + URL-level dedup (round 14) ---------------
  // The crawl-frontier hygiene BEFORE content even downloads: the same
  // page arrives as scheme-case/WWW/default-port/fragment/tracking-param
  // /trailing-slash variants, and URL-level exact dedup after
  // canonicalization is how a crawl avoids re-fetching (and a corpus
  // avoids re-keeping) the same capture. All narrow anchored-regex
  // arithmetic, portable to the oracle verbatim; dedup is one
  // canonical-keyed aggregate (min-doc_id survivorship, the exact-dedup
  // rule) — never an all-pairs comparison.

  /** Canonical form: lowercased scheme + host (userinfo and one
    * leading `www.` stripped, DEFAULT port only — :8080 is identity),
    * fragment dropped, trailing path slashes dropped, tracking params
    * (`utm_*`, `gclid`, `fbclid`) filtered from the query preserving
    * the order of the rest. Scheme-less input (common in crawl seed
    * lists, and explicitly supported by [[domainOf]]) assumes `http`
    * — so `www.x.com/p` and `http://x.com/p` collapse to the SAME
    * canonical instead of a malformed `://…` never matching anything. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme0 = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val scheme = when(scheme0 === "", lit("http")).otherwise(scheme0)
    val rest = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val auth = regexp_extract(rest, "^([^/?]+)", 1)
    val noUser = regexp_replace(auth, "^[^@/]*@", "")
    val noDefPort = when(scheme === "https", regexp_replace(noUser, ":443$", ""))
      .when(scheme === "http", regexp_replace(noUser, ":80$", ""))
      .otherwise(noUser)
    val host = lower(regexp_replace(noDefPort, "^(?i)www\\.", ""))
    val pathq = regexp_replace(rest, "^[^/?]+", "")
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val fq = array_join(
      filter(split(query, "&"),
        p => !p.rlike("^(utm_[^=]*|gclid|fbclid)=")), "&")
    concat(scheme, lit("://"), host, path,
      when(fq === "", "").otherwise(concat(lit("?"), fq)))
  }

  /** URL-level exact dedup over a (doc_id, url) frame: canonicalize,
    * keep the min doc_id per canonical URL, count the collapsed
    * variants. One shuffle on the canonical key. */
  def urlDedupOf(df: DataFrame): DataFrame =
    df.select(col("doc_id"), canonicalUrl(col("url")).as("url_canonical"))
      .groupBy(col("url_canonical"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("url_canonical"), col("n_copies"))

  /** Gated `curation_url_dedup`: groups of 4 synthetic variants of one
    * page (tracking params / WWW + :443 + scheme case / userinfo +
    * trailing slash + fragment / reordered tracking param) must
    * collapse to one canonical survivor each. */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    val g = expr("doc_id div 4")
    val host = concat(lit("d"), (g % 50).cast("string"), lit(".example.com"))
    val path = concat(lit("/Path/"), g.cast("string"))
    val url = when(col("doc_id") % 4 === 0,
        concat(lit("https://"), host, path, lit("?keep=1&utm_source=feed")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("HTTPS://WWW."), host, lit(":443"), path, lit("?keep=1")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("https://user@"), host, path, lit("/?keep=1#section")))
      .otherwise(concat(lit("https://"), host, path, lit("?utm_campaign=x&keep=1")))
    urlDedupOf(Tables.documents(spark, dir).select(col("doc_id"), url.as("url")))
      .orderBy(col("doc_id"))
  }

  val urlDedupOracle: String = """
    WITH grp AS (
      SELECT doc_id // 4 AS g, min(doc_id) AS doc_id, count(*) AS n_copies
      FROM documents GROUP BY doc_id // 4)
    SELECT doc_id,
      'https://d' || CAST(g % 50 AS VARCHAR) || '.example.com/Path/'
        || CAST(g AS VARCHAR) || '?keep=1' AS url_canonical,
      n_copies
    FROM grp
    ORDER BY doc_id"""
}
