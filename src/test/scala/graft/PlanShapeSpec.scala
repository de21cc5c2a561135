package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Pins the physical-plan properties PLANS.md claims, so an operator
  * edit (or Spark upgrade) that silently drops a pushdown or flips a
  * broadcast fails a test instead of only regressing the bench.
  * Executed plans are inspected AFTER an action so AQE has finalized. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test

  val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    // execute THIS dataframe (df.count() would spawn a separate
    // QueryExecution and leave this one's AQE plan unfinalized)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q6: date/discount/quantity filters are pushed to the lineitem scan") {
    val plan = finalPlan(Analytics.q6Forecast(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    // at least one real predicate reached the scan (not an empty list)
    assert("PushedFilters: \\[[^\\]]*(GreaterThan|LessThan|IsNotNull)".r
      .findFirstIn(plan).isDefined, plan.take(2000))
  }

  test("q1: scan reads only the columns the aggregate needs") {
    val plan = finalPlan(Analytics.q1PricingSummary(spark, sf))
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    // pruned: the projection must NOT drag unused lineitem columns
    assert(readSchema.nonEmpty, plan.take(2000))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      readSchema)
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"),
      readSchema)
  }

  test("q5: bounded dims join by broadcast, never by shuffle") {
    val plan = finalPlan(Analytics.q5LocalSupplier(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q3: whole-stage codegen covers the aggregate pipeline") {
    val plan = finalPlan(Analytics.q3ShippingPriority(spark, sf))
    // codegen stages print as "*(n) Operator" in executed-plan strings
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(plan).isDefined, plan.take(2000))
  }

  test("prioritySample: global top-K never full-sorts the corpus") {
    // Catalyst plants TakeOrderedAndProject(limit=K) BELOW the rank
    // window (LimitPushDownThroughWindow) — per-partition heaps, one
    // K-row reducer; WindowGroupLimit is the acceptable fallback shape
    val plan = finalPlan(graft.operators.Curation.prioritySample(spark, sf))
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("WindowGroupLimit"),
      plan.take(2000))
  }

  test("kmv: rank filter plans as WindowGroupLimit (bounded per-group state below the exchange)") {
    val plan = finalPlan(Analytics.eventsKmv(spark, sf))
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("temperatureMix: quota join is broadcast, selection keeps WindowGroupLimit") {
    val plan = finalPlan(graft.operators.Curation.temperatureMix(spark, sf))
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000)) // quota table (|sources| rows) + 1-row scalar total
  }

  test("piiRedact: no exchange anywhere before the output sort") {
    val plan = finalPlan(graft.operators.TextAnalysis.piiRedact(spark, sf))
    // per-row narrow codegen — the ONLY exchange allowed is the final
    // rangepartitioning for orderBy
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(plan).toList
    assert(exchanges.forall(_.contains("rangepartitioning")), plan.take(2000))
  }

  test("incremental dedup: best-match rank plans as WindowGroupLimit") {
    val plan = finalPlan(graft.operators.Dedup.incremental(spark, sf))
    // the rank-1 literal filter must cap per-partition window state
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("chunkDedup: shuffle is keyed on the md5 hash, not the span text") {
    val plan = finalPlan(graft.operators.Curation.chunkDedup(spark, sf))
    // the window exchange must hashpartition on ch (the 32-char md5),
    // never on chunk_text
    val winExchange = "Exchange hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toList
    assert(winExchange.exists(_.contains("ch#")), plan.take(3000))
    assert(!winExchange.exists(_.contains("chunk_text#")), winExchange.mkString("\n"))
  }
}
