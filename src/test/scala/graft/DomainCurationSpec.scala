package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DomainCuration

/** URL/domain curation (round 14): extraction edge cases, subdomain
  * blocking, deterministic per-domain caps, and the scale shape
  * (broadcast anti-join, no corpus shuffle against the blocklist). */
class DomainCurationSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("domainOf: schemes, userinfo, ports, www, case, scheme-less fallback") {
    val cases = Seq(
      "https://www.Example.COM/path?q=1"     -> "example.com",
      "http://EXAMPLE.com:8080/x"            -> "example.com",
      "https://user:pw@sub.Example.com/x"    -> "sub.example.com",
      "ftp://files.example.org"              -> "files.example.org",
      "custom+v1.2://a.b.c/path"             -> "a.b.c",
      "example.com/bare/path"                -> "example.com", // scheme-less crawl junk
      "WWW.example.com"                      -> "example.com",
      "https://wwwx.example.com"             -> "wwwx.example.com", // www. only as a LABEL
      "https://example.com#frag"             -> "example.com",
      "https://example.com?only=query"       -> "example.com")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), DomainCuration.domainOf(col("url")).as("d"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, want) =>
      assert(got(u) == want, s"domainOf($u) = ${got(u)}, want $want")
    }
  }

  test("blocklist drops exact domains AND subdomains, keeps lookalikes") {
    val df = Seq(
      (1L, "bad.com"), (2L, "sub.bad.com"), (3L, "deep.sub.bad.com"),
      (4L, "notbad.com"), (5L, "bad.com.evil.org"), (6L, "good.com"))
      .toDF("doc_id", "domain")
    val kept = DomainCuration.blocklistAntiJoin(df, Seq("bad.com"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(4L, 5L, 6L),
      "exact + suffix-dot matches must drop; lookalike prefixes must survive")
  }

  test("capPerDomain: deterministic md5-order keep, rank is within-domain") {
    val df = (1L to 50L).map(i => (i, s"d${i % 3}.com")).toDF("doc_id", "domain")
    val kept = DomainCuration.capPerDomain(df, 5)
    val byDom = kept.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(byDom.values.forall(_ == 5), s"every domain capped at 5: $byDom")
    // determinism: same input → same kept set
    val again = DomainCuration.capPerDomain(df, 5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
  }

  test("scale shape: blocklist join broadcasts, corpus side never shuffles for it") {
    val df = (1L to 100L).map(i => (i, s"d$i.com")).toDF("doc_id", "domain")
    val out = DomainCuration.blocklistAntiJoin(df, Seq("d1.com", "d2.com"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"blocklist must broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"anti-join must not shuffle the corpus:\n$plan")
  }

  test("canonicalUrl: fragments, default ports, tracking params, www, slash, case") {
    val cases = Seq(
      "https://www.Ex.COM/A/b?x=1#frag"            -> "https://ex.com/A/b?x=1",
      "HTTPS://ex.com:443/a"                       -> "https://ex.com/a",
      "http://ex.com:80/a"                         -> "http://ex.com/a",
      "https://ex.com:8443/a"                      -> "https://ex.com:8443/a", // non-default KEPT
      "http://ex.com:8080/a"                       -> "http://ex.com:8080/a",
      "https://user:pw@ex.com/a/"                  -> "https://ex.com/a",
      "https://ex.com/a?utm_source=x&keep=1&gclid=z" -> "https://ex.com/a?keep=1",
      "https://ex.com/a?utm_campaign=only"         -> "https://ex.com/a",
      "https://ex.com///"                          -> "https://ex.com",
      "https://ex.com/p?b=2&a=1"                   -> "https://ex.com/p?b=2&a=1", // order KEPT
      // scheme-less (crawl seed lists): assume http, collapse with the scheme-ful twin
      "www.Ex.com/p?keep=1"                        -> "http://ex.com/p?keep=1",
      "ex.com:80/p"                                -> "http://ex.com/p")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), DomainCuration.canonicalUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, want) =>
      assert(got(u) == want, s"canonicalUrl($u) = ${got(u)}, want $want")
    }
  }

  test("gated query: blocklisted domains absent, caps respected, urls parse") {
    val out = DomainCuration.domainGate(spark, "/root/testdata/sf0.001")
    val rows = out.as[(Long, String, Int)].collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(r => r._2 == "d3.example.com" || r._2 == "d7.example.com" ||
      r._2.endsWith(".d3.example.com") || r._2.endsWith(".d7.example.com")),
      "blocklisted domains and subdomains must be gone")
    assert(rows.groupBy(_._2).forall(_._2.length <= DomainCuration.DomainCap))
    assert(rows.forall(_._2.matches("(sub\\.)?d\\d+\\.example\\.com")),
      s"unexpected domain shape: ${rows.map(_._2).distinct.take(5).mkString(",")}")
  }
}
