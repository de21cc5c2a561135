package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("binned interval join == naive inequality join, without a nested-loop plan") {
    // deterministic pseudo-random points and intervals (span ~0-5k over
    // a 100k domain, binWidth 1k → ≤6 bins per interval)
    val points = spark.range(0, 2000)
      .select(pmod(xxhash64(col("id")), lit(100000L)).as("p"))
    val ivals = spark.range(0, 300)
      .select(pmod(xxhash64(col("id") + 7), lit(100000L)).as("s"))
      .withColumn("e", col("s") + pmod(xxhash64(col("s")), lit(5000L)))

    val got = RangeJoin.pointInInterval(points, "p", ivals, "s", "e", binWidth = 1000L)
      .select("p", "s", "e")
    val want = points.join(ivals, col("p") >= col("s") && col("p") <= col("e"))
      .select("p", "s", "e")

    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val gotRows = multiset(got)
    assert(gotRows == multiset(want))
    assert(gotRows.nonEmpty)
    // the whole point: the binned form plans as an equi-join on the bin,
    // never the quadratic BroadcastNestedLoopJoin the naive form uses
    assert(!got.queryExecution.executedPlan.toString.contains("BroadcastNestedLoop"))
    assert(want.queryExecution.executedPlan.toString.contains("BroadcastNestedLoop"))
  }

  test("q_range_join gated query returns per-owner window counts") {
    val out = RangeJoin.purchasesInClickWindows(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) > 0))
  }
}
