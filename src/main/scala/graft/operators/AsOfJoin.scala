package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** As-of join — for each left row, the latest right row with
  * `rightTs <= leftTs` in the same key group. Spark has no built-in
  * as-of join in the Scala API; the classic sort-merge formulation
  * composes from built-ins with ONE shuffle on the key and no range
  * explosion:
  *
  *   union(left tagged 1, right tagged 0)
  *     → window per key ordered by (ts, tag): last right payload so far
  *     → keep left rows.
  *
  * Right-at-equal-ts sorts before left (tag 0 < 1), giving inclusive
  * `rightTs <= leftTs` semantics — the same as DuckDB's `ASOF JOIN ...
  * ON l.ts >= r.ts`, which is this operator's oracle.
  *
  * At 100 TB both sides shuffle once on the key; the window is a single
  * per-partition sorted pass. Skewed keys fall under AQE skew handling.
  */
object AsOfJoin {

  /** Generic form: left/right must share `key` and `ts` column names;
    * right's `payload` columns are carried to the matched left rows
    * (null when no right row precedes). */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__tag", lit(1))
      .select(Seq(col(key), col(ts), col("__tag")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__r_$p")): _*)
    val r = right
      .withColumn("__tag", lit(0))
      .select(Seq(col(key), col(ts), col("__tag")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"__r_$p")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(s"__m_$p", last(col(s"__r_$p"), ignoreNulls = true).over(w))
    }
    matched.filter(col("__tag") === 1)
      .select(Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        payload.map(p => col(s"__m_$p").as(s"asof_$p")): _*)
  }

  /** Query #q_asof_join: each purchase event joined to the user's most
    * recent signup event at or before it. */
  def purchaseSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("us", expr("ts div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("us"), col("event_id").as("signup_event_id"))
    asOf(purchases, signups, "user_id", "us", Seq("signup_event_id", "us"))
      .select(col("event_id"), col("user_id"),
        col("asof_signup_event_id").as("signup_event_id"),
        expr("(us - asof_us) div 1000000").cast("long").as("gap_s"))
      .orderBy(col("event_id"))
  }

  val purchaseSignupOracle: String = """
    WITH ev AS (SELECT event_id, user_id, event_type,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
    p AS (SELECT event_id, user_id, us FROM ev WHERE event_type = 'purchase'),
    s AS (SELECT event_id AS signup_event_id, user_id, us FROM ev WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id, s.signup_event_id,
           CAST((p.us - s.us) // 1000000 AS BIGINT) AS gap_s
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.us >= s.us
    ORDER BY p.event_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (purchaseSignup _))

  val oracle: Map[String, String] = Map(
    "q_asof_join" -> purchaseSignupOracle)
}
