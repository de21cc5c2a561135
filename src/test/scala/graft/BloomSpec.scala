package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.Bloom

/** Bloom-prefiltered catalog probe: the DuckDB gate (dedup_bloom_probe)
  * proves end-to-end value exactness; this spec pins the properties the
  * gate can't see — that the result is exact EVEN when the filter is
  * degenerate (false positives everywhere), that a sanely-sized filter
  * actually prunes (the point of the operator), and the no-false-
  * negative contract of the underlying expression pair. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  private def keys(ids: Range, tag: String) =
    ids.map(i => (i.toLong, s"$tag-$i")).toDF("doc_id", "fp")

  test("bloomAntiJoin == plain anti-join even with a degenerate 64-bit filter") {
    val catalog = keys(0 until 500, "key").select(col("fp"))
    // incoming: 100 members (key-0..99) + 400 non-members
    val inc = keys(0 until 100, "key").union(keys(0 until 400, "other"))
    val expected = inc.join(catalog, Seq("fp"), "left_anti")
      .select("doc_id", "fp").as[(Long, String)].collect().toSet
    // 64 bits for 500 keys — saturated, nearly every probe is a maybe
    val got = Dedup.bloomAntiJoin(inc, catalog, "fp", 500, 64)
      .select("doc_id", "fp").as[(Long, String)].collect().toSet
    assert(got == expected, "saturated filter changed the result")
    assert(got.size == 400)
  }

  test("a sanely-sized filter prunes: maybe-set is a sliver of the non-members") {
    val catalog = keys(0 until 1000, "key").select(col("fp"))
    val nonMembers = keys(0 until 10000, "other")
    val bytes = catalog
      .agg(Bloom.bloomAgg(col("fp"), 1000, 16384).as("bf"))
      .head().getAs[Array[Byte]](0)
    val maybes = nonMembers.filter(Bloom.mightContain(bytes, col("fp"))).count()
    // 16 bits/key → fpp well under 1%; allow 2% before failing loudly
    assert(maybes <= 200, s"$maybes/10000 false positives — filter not pruning")
    // no false negatives: every true member must hit
    val hits = keys(0 until 1000, "key")
      .filter(Bloom.mightContain(bytes, col("fp"))).count()
    assert(hits == 1000, "false negative — Bloom contract broken")
  }

  test("literal and broadcast probes agree bit-for-bit") {
    val catalog = keys(0 until 300, "key").select(col("fp"))
    val probeSet = keys(0 until 150, "key").union(keys(0 until 150, "other"))
    val bytes = catalog
      .agg(Bloom.bloomAgg(col("fp"), 300, 4096).as("bf"))
      .head().getAs[Array[Byte]](0)
    val bc = Bloom.broadcastFilter(spark, bytes)
    val lit = probeSet.withColumn("m", Bloom.mightContain(bytes, col("fp")))
      .select("doc_id", "fp", "m").as[(Long, String, Boolean)].collect().toSet
    val viaBc = probeSet.withColumn("m", Bloom.mightContainBc(bc, col("fp")))
      .select("doc_id", "fp", "m").as[(Long, String, Boolean)].collect().toSet
    assert(lit == viaBc, "probe forms diverge — xxhash64 contract broken")
    assert(lit.exists(_._3) && lit.exists(!_._3))
  }

  test("empty catalog degrades gracefully: everything is novel") {
    val catalog = keys(0 until 0, "key").select(col("fp"))
    val inc = keys(0 until 10, "x")
    val got = Dedup.bloomAntiJoin(inc, catalog, "fp", 100, 1024).count()
    assert(got == 10)
  }

  test("gated seeds are non-vacuous: collisions drop, the novel seed survives") {
    val dir = "/root/testdata/sf0.001"
    val ids = Dedup.bloomProbe(spark, dir).select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(9000001L) && !ids.contains(9000002L),
      "seeded exact dups must be dropped")
    assert(ids.contains(9000003L), "the novel seed must survive")
  }
}
