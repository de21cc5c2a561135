package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Unkeyed interval-containment join via binning — an operator Spark's
  * API lacks (a point-in-interval join with no equi-key plans as a
  * BroadcastNestedLoopJoin: every point × every interval, quadratic and
  * AQE can't save it).
  *
  * The classic fix: explode each interval to the fixed-width bins it
  * covers, map each point to its single bin, equi-join on bin, filter
  * exact containment. Each (point, interval) candidate pair is produced
  * exactly once — the point lives in one bin and an interval covers a
  * bin at most once — so no post-join dedup is needed. Shuffled volume
  * is O(points + intervals × span/binWidth): pick binWidth near the
  * median interval span so intervals explode to a handful of bins.
  */
object RangeJoin {

  /** Rows of `points` joined to rows of `intervals` where
    * `points.pCol ∈ [intervals.sCol, intervals.eCol]`. All three
    * columns must be non-negative integral (`div` truncation == floor
    * there); column names must not collide. */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, sCol: String, eCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integer `div`, not double floor — at nanosecond epochs a double
    // bin index would lose integer precision past 2^53
    val bins = intervals.withColumn("__bin",
      explode(sequence(expr(s"$sCol div $binWidth"), expr(s"$eCol div $binWidth"))))
    points.withColumn("__bin", expr(s"$pCol div $binWidth"))
      .join(bins, Seq("__bin"))
      .filter(col(pCol) >= col(sCol) && col(pCol) <= col(eCol))
      .drop("__bin")
  }

  /** Gated query: per-user 90-minute windows opening at the user's
    * first click, counting ALL purchase events (any user) that land in
    * each window — a genuinely unkeyed interval join (the purchases
    * carry no owner key), binned at 30 minutes so each window spans ≤4
    * bins. The oracle is DuckDB's native inequality join. */
  def purchasesInClickWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
    val windows = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("us")).as("w_start"))
      .select(col("user_id").as("owner_id"), col("w_start"),
        (col("w_start") + 5400000000L).as("w_end"))
    val purchases = ev.filter(col("event_type") === "purchase").select(col("us"))
    pointInInterval(purchases, "us", windows, "w_start", "w_end",
        binWidth = 1800000000L)
      .groupBy(col("owner_id"))
      .agg(count(lit(1)).as("n_purchases"))
      .orderBy(col("owner_id"))
  }

  val purchasesInClickWindowsOracle: String = """
    WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
    w AS (SELECT user_id AS owner_id, min(us) AS w_start, min(us) + 5400000000 AS w_end
          FROM e WHERE event_type = 'click' GROUP BY 1),
    p AS (SELECT us FROM e WHERE event_type = 'purchase')
    SELECT owner_id, count(*) AS n_purchases
    FROM w JOIN p ON p.us >= w.w_start AND p.us <= w.w_end
    GROUP BY owner_id ORDER BY owner_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> (purchasesInClickWindows _))

  val oracle: Map[String, String] = Map(
    "q_range_join" -> purchasesInClickWindowsOracle)
}
