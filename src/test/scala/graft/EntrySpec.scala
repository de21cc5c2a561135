package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's first gate: SparkEntry.entry must return rows on
  * sf0.001, and every query key must have a runnable function; every
  * oracle key must reference an existing query. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = GraftSession.test

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; keys are unique across modules") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(os.keySet.subsetOf(qs.keySet),
      s"orphan oracles: ${os.keySet -- qs.keySet}")
    // merged maps silently drop duplicate keys — assert the module maps
    // were disjoint by construction
    val moduleCounts = Seq(
      graft.operators.Analytics.queries.size, graft.operators.RefCore.queries.size,
      graft.operators.Dedup.queries.size, graft.operators.Similarity.queries.size,
      graft.operators.TextAnalysis.queries.size, graft.operators.Multimodal.queries.size,
      graft.operators.AsOfJoin.queries.size, graft.operators.RangeJoin.queries.size,
      graft.operators.Curation.queries.size, graft.operators.Retrieval.queries.size).sum
    assert(moduleCounts == qs.size, s"duplicate query keys across modules: $moduleCounts vs ${qs.size}")
  }

  test("all queries run on sf0.001 and return a readable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }
}
