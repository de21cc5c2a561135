package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinPlan
import graft.operators.AsOfJoin
import graft.sources.Tables

class AsOfPlanSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("custom AsOfJoinExec == composable union-window as-of on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("us", expr("ts div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("us"), col("event_id"))

    val custom = AsOfJoinPlan.asOf(purchases, signups, "user_id", "us")
      .select(col("event_id"), col("r_event_id"))
      .as[(Long, Option[Long])].collect().toMap

    val composed = AsOfJoin.asOf(purchases, signups
        .withColumnRenamed("event_id", "signup_event_id"),
        "user_id", "us", Seq("signup_event_id"))
      .select(col("event_id"), col("asof_signup_event_id"))
      .as[(Long, Option[Long])].collect().toMap

    assert(custom.nonEmpty)
    assert(custom == composed)
    assert(custom.values.exists(_.isEmpty))   // some purchases precede any signup
    assert(custom.values.exists(_.nonEmpty))
  }

  test("physical plan contains AsOfJoinExec with planner-inserted exchange+sort") {
    val l = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, "x")).toDF("k", "t", "rv")
    val df = AsOfJoinPlan.asOf(l, r, "k", "t")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(plan.contains("Exchange") || plan.contains("Sort"))
    val rows = df.select("k", "t", "lv", "r_rv")
      .as[(Long, Long, String, Option[String])].collect().toSet
    assert(rows == Set((1L, 10L, "a", Some("x")), (2L, 20L, "b", None)))
  }

  test("inclusive boundary and multiple right rows: latest wins") {
    val l = Seq((1L, 100L, "p")).toDF("k", "t", "lv")
    val r = Seq((1L, 50L, "old"), (1L, 100L, "same"), (1L, 101L, "future"))
      .toDF("k", "t", "rv")
    val got = AsOfJoinPlan.asOf(l, r, "k", "t")
      .select("r_rv").as[Option[String]].collect().toSeq
    assert(got == Seq(Some("same")))
  }
}
