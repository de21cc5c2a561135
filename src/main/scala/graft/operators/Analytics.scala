package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** General relational analytics (SURVEY §2b).
  *
  * Oracle-stability rule: double sums are order-dependent, so every money
  * aggregate casts to decimal FIRST (double→decimal rounding is exact and
  * identical in Spark and DuckDB; decimal arithmetic is exact), aggregates
  * exactly, rounds, and only then casts back to double. Averages divide the
  * exact decimal sum as a double — bit-reproducible in both engines.
  *
  * Scale notes: q1 is a pure map-side-combine hash aggregate; q3/q5
  * broadcast every dimension small enough and shuffle facts on join keys
  * with AQE skew-splitting on; top-k uses TakeOrderedAndProject (per
  * partition top-k, no global sort shuffle).
  */
object Analytics {

  /** Exact-decimal cast for oracle-reproducible money math. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  private def avg4(sumDec: Column, cnt: Column): Column =
    round(sumDec.cast("double") / cnt, 4)

  // --- q1: TPC-H Q1 shape: grouped aggregation with map-side combine ----
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val sumQty   = sum(dec(col("l_quantity")))
    val sumBase  = sum(dec(col("l_extendedprice")))
    val sumDisc  = sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
    val sumChrg  = sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) * (lit(1) + dec(col("l_tax"))))
    val sumDsct  = sum(dec(col("l_discount")))
    val cnt      = count(lit(1))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sumQty, 2).cast("double").as("sum_qty"),
        round(sumBase, 2).cast("double").as("sum_base_price"),
        round(sumDisc, 2).cast("double").as("sum_disc_price"),
        round(sumChrg, 2).cast("double").as("sum_charge"),
        avg4(sumQty, cnt).as("avg_qty"),
        avg4(sumBase, cnt).as("avg_price"),
        avg4(sumDsct, cnt).as("avg_disc"),
        cnt.as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Oracle: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) * (1 + CAST(l_tax AS DECIMAL(18,6)))), 2) AS DOUBLE) AS sum_charge,
      round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_qty,
      round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_price,
      round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  // --- q3: join + filter + agg + top-k --------------------------------
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li   = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    // customer grows with SF: no broadcast hint — AQE broadcasts the
    // segment-filtered side at runtime when it's small enough.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Oracle: String = """
    SELECT l_orderkey,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      o_orderpriority
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  // --- q5: star join, broadcast dims ----------------------------------
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val supp   = Tables.supplier(spark, dir)
    val cust   = Tables.customer(spark, dir)
    val ord    = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li     = Tables.lineitem(spark, dir)
    // li⋈ord is fact-fact: planned as a shuffle join for scale, and AQE
    // converts it to broadcast at runtime when the filtered orders side
    // turns out small (it does at bench SFs). Only the truly bounded dims
    // (nation: 25 rows, region: 5 rows at any SF) are hinted; customer and
    // supplier grow with SF, so AQE decides those at runtime.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Oracle: String = """
    SELECT n_name,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name"""

  // --- window: rank-per-group top-n ------------------------------------
  def windowTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_brand"), col("rn"))
  }

  val windowTopNOracle: String = """
    SELECT p_brand, rn, p_partkey, p_retailprice
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part) t
    WHERE rn <= 3
    ORDER BY p_brand, rn"""

  // --- sessionization: gap-based sessions over the events stream -------
  // Gap rule: a new session starts when >1800s passed since the user's
  // previous event. Computed on exact epoch-microseconds so both engines
  // agree bit-for-bit. At scale this is one shuffle on user_id (the two
  // windows share partitioning, Spark evaluates them in one exchange).
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    // Order by truncated microseconds + event_id (not raw ns) so the tie-break
    // is identical to the oracle's: two events in the same microsecond must
    // order the same way in both engines or session boundaries can shift.
    val byUser  = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val ev = Tables.events(spark, dir)
      .withColumn("us", expr("ts div 1000"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ev.groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        round(sum(dec(col("value"))), 2).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        ((col("end_us") - col("start_us")) / lit(1000000L)).cast("long").as("duration_s"),
        col("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val eventsSessionizeOracle: String = """
    WITH base AS (
      SELECT user_id, event_id, value,
        epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events),
    flagged AS (
      SELECT user_id, event_id, value, us,
        lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
      FROM base),
    sess AS (
      SELECT user_id, value, us,
        CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, count(*) AS n_events,
      CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_s,
      CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id"""

  // --- tumbling-window aggregation (batch twin of streaming §2g) -------
  def eventsWindowedAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("hour_us", expr("(ts div 1000) div 3600000000 * 3600000000"))
      .groupBy(col("hour_us"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(dec(col("value"))), 2).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(date_format(timestamp_micros(col("hour_us")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"), col("n_users"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val eventsWindowedAggOracle: String = """
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
      event_type, count(*) AS n,
      CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
      count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2"""

  // --- q6: pure pushdown filter + single agg (TPC-H Q6 shape) ----------
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07)
      .filter(col("l_quantity") < 24)
      .agg(round(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))), 2)
        .cast("double").as("revenue"),
        count(lit(1)).as("n"))

  val q6Oracle: String = """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24"""

  // --- q12: join + conditional aggregation (TPC-H Q12 shape) -----------
  def q12ShipMode(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val q12Oracle: String = """
    SELECT l_returnflag,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  // --- q14: ratio aggregate over a join (TPC-H Q14 shape) --------------
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
    val rev = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    // part grows with SF: no broadcast hint — AQE decides at runtime.
    li.join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .agg(
        round(sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0).cast(DecimalType(18, 6)))), 2)
          .cast("double").as("promo_revenue"),
        round(sum(rev), 2).cast("double").as("total_revenue"))
  }

  val q14Oracle: String = """
    SELECT
      CAST(round(sum(CASE WHEN p_type LIKE 'PROMO%'
        THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
        ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS promo_revenue,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'"""

  // --- semi/anti joins: EXISTS / NOT EXISTS ----------------------------
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord  = Tables.orders(spark, dir).select(col("o_custkey"))
    val withO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
    val without = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_orders"))
    withO.join(without, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy(col("c_mktsegment"))
  }

  val semiAntiOracle: String = """
    SELECT c_mktsegment,
      count(*) FILTER (EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
      count(*) FILTER (NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

  // --- rollup: hierarchical subtotals ----------------------------------
  def rollupSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val rollupOracle: String = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
      CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""

  // --- pivot: event-type counts per day --------------------------------
  private val pivotTypes = Seq("click", "error", "purchase", "signup", "view")

  def eventsPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", date_format(timestamp_micros(
        expr("(ts div 1000) div 86400000000 * 86400000000")), "yyyy-MM-dd"))
      .groupBy(col("day"))
      .pivot("event_type", pivotTypes)
      .agg(count(lit(1)))
      .na.fill(0L, pivotTypes)
      .orderBy(col("day"))

  val eventsPivotOracle: String = {
    val cases = pivotTypes.map(t =>
      s"count(*) FILTER (event_type = '$t') AS \"$t\"").mkString(", ")
    s"""
    SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day, $cases
    FROM events
    GROUP BY 1
    ORDER BY 1"""
  }

  // --- q7: bi-nation volume (TPC-H Q7 shape) ---------------------------
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val custNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    // Only nation (bounded, 25 rows at any SF) gets a broadcast hint;
    // customer/supplier grow linearly with SF — at the 100 TB design point
    // a forced broadcast OOMs executors. Left unhinted, AQE still picks
    // broadcast when the runtime size allows (it does at bench SFs).
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cnk"))
      .join(broadcast(suppNation), col("s_nationkey") === col("snk"))
      .filter(col("cust_nation").isin("NATION_1", "NATION_2")
        && col("supp_nation").isin("NATION_1", "NATION_2")
        && col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Oracle: String = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      CAST(year(l_shipdate) AS INT) AS l_year,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name <> sn.n_name
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3"""

  // --- q10: returned-item revenue by customer (TPC-H Q10 shape) --------
  def q10Returns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  val q10Oracle: String = """
    SELECT c_custkey, c_name, c_mktsegment,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20"""

  // --- q18: large-volume orders (TPC-H Q18 shape) ----------------------
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(dec(col("l_quantity"))), 2).cast("double").as("total_qty"))
      .filter(col("total_qty") > 150)
    bigOrders
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18Oracle: String = """
    SELECT c_custkey, c_name, o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate, total_qty
    FROM (
      SELECT l_orderkey,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey) t
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE total_qty > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20"""

  // --- JSON column extraction ------------------------------------------
  // events.props is a JSON string column; extraction stays in codegen
  // (get_json_object) and aggregates on the extracted value are exact
  // integer math.
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("sum_k"),
        countDistinct(col("k")).as("distinct_k"),
        round(sum(col("k")).cast("double") / count(lit(1)), 4).as("avg_k"))
      .orderBy(col("event_type"))

  val eventsJsonOracle: String = """
    SELECT event_type,
      CAST(sum(k) AS BIGINT) AS sum_k,
      count(DISTINCT k) AS distinct_k,
      round(CAST(sum(k) AS DOUBLE) / count(*), 4) AS avg_k
    FROM (SELECT event_type,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
    GROUP BY event_type
    ORDER BY event_type"""

  // --- exact percentiles (linear interpolation, both engines type-7) ---
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("p"))
      .select(col("o_orderpriority"),
        round(col("p")(0), 2).as("p25"),
        round(col("p")(1), 2).as("p50"),
        round(col("p")(2), 2).as("p75"))
      .orderBy(col("o_orderpriority"))

  val percentilesOracle: String = """
    SELECT o_orderpriority,
      round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
      round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
      round(quantile_cont(o_totalprice, 0.75), 2) AS p75
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  // --- sketch aggregates: the 100 TB shapes of COUNT DISTINCT ----------
  // HLL++ and quantile sketches trade exactness for one-pass mergeable
  // state — the only viable form at cluster scale. Raw sketch VALUES are
  // engine-specific (HLL register merges have no DuckDB twin), so the
  // raw variant below is spec-bounded, not oracle-gated. The GATED entry
  // instead emits what IS cross-engine checkable: each engine runs its
  // own sketch AND its own exact aggregate in one pass and reports
  // whether the sketch lands inside its error contract (HLL within 5%
  // of exact; approx percentiles inside a rank bracket on the exact
  // quantile curve — p50 between the exact 40th and 60th percentiles,
  // p99 between the exact 97th and max). Both engines' sketches honor their contracts →
  // identical boolean rows → full rows+schema+hash gate, with the
  // sketch machinery still on the measured path.
  def eventsSketchRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        round(expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)")(0), 2).as("p50"),
        round(expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)")(2), 2).as("p99"))
      .orderBy(col("event_type"))

  def eventsSketch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("exact_users"),
        (abs(approx_count_distinct(col("user_id"), rsd = 0.02) - countDistinct(col("user_id")))
          <= countDistinct(col("user_id")).cast("double") * 0.05).as("hll_within_5pct"),
        // percentile contracts are RANK brackets, not value tolerances:
        // approx quantiles are rank-accurate (GK ε = 1/accuracy here,
        // t-digest tail-tight in DuckDB) but return data values, while
        // exact percentile interpolates — on a sparse tail the value gap
        // between adjacent order statistics dwarfs any % tolerance. The
        // brackets on the EXACT quantile curve are deliberately lax so
        // both engines' different sketches always agree: p50 sits in
        // percentile 0.4–0.6 (±10 points); p99 in percentile 0.97–max
        // (2 points of slack below, the max above).
        expr("approx_percentile(value, 0.5, 10000)")
          .between(expr("percentile(value, 0.4)"), expr("percentile(value, 0.6)"))
          .as("p50_in_bracket"),
        expr("approx_percentile(value, 0.99, 10000)")
          .between(expr("percentile(value, 0.97)"), max(col("value")))
          .as("p99_in_bracket"))
      .orderBy(col("event_type"))

  val eventsSketchOracle: String = """
    SELECT event_type, count(*) AS n,
      count(DISTINCT user_id) AS exact_users,
      abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        <= CAST(count(DISTINCT user_id) AS DOUBLE) * 0.05 AS hll_within_5pct,
      approx_quantile(CAST(value AS DOUBLE), 0.5)
        BETWEEN quantile_cont(CAST(value AS DOUBLE), 0.4)
            AND quantile_cont(CAST(value AS DOUBLE), 0.6) AS p50_in_bracket,
      approx_quantile(CAST(value AS DOUBLE), 0.99)
        BETWEEN quantile_cont(CAST(value AS DOUBLE), 0.97)
            AND max(CAST(value AS DOUBLE)) AS p99_in_bracket
    FROM events
    GROUP BY event_type
    ORDER BY event_type"""

  // --- KMV distinct sketch: the PORTABLE cousin of q_events_sketch -----
  // K-minimum-values (Bar-Yossef et al. 2002): per group keep the k
  // smallest values of a uniform hash of the key; if fewer than k
  // distinct hashes exist the count is exact, else est = (k-1)/u_k with
  // u_k the k-th smallest hash normalized to [0,1). Same mergeable-
  // bounded-state story as HLL (k longs per group), but every step is
  // deterministic arithmetic on an md5-derived hash — so unlike HLL++
  // internals it cross-checks bit-for-bit against DuckDB. At scale:
  // distinct(type,h) is one shuffle with map-side partial; the rank
  // filter plans as WindowGroupLimit, so each map partition forwards at
  // most k rows per group to the window exchange. The true_users column
  // is verification-only (a production sketch run would drop it — it is
  // the exact COUNT DISTINCT the sketch exists to avoid).
  private[graft] val KmvK = 32 // shared with EventStream.kmvDistinct — one k, no drift
  private val TwoPow60 = 1.152921504606846976e18 // 16^15, exact in double

  def eventsKmv(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val hashed = Tables.events(spark, dir)
      .select(col("event_type"),
        conv(substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("true_users"))
    hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        max(when(col("rn") === KmvK, col("h"))).as("hk"))
      .withColumn("est_users", round(
        when(col("cnt") < KmvK, col("cnt").cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) / (col("hk").cast("double") / lit(TwoPow60))), 4))
      .join(exact, Seq("event_type"))
      .select(col("event_type"), col("true_users"), col("est_users"))
      .orderBy(col("event_type"))
  }

  val eventsKmvOracle: String = s"""
    WITH h AS (SELECT DISTINCT event_type,
                 CAST(concat('0x', substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
               FROM events),
    r AS (SELECT event_type, h,
            row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
    k AS (SELECT event_type, count(*) AS cnt,
            max(CASE WHEN rn = $KmvK THEN h END) AS hk
          FROM r WHERE rn <= $KmvK GROUP BY event_type),
    ex AS (SELECT event_type, count(DISTINCT user_id) AS true_users
           FROM events GROUP BY event_type)
    SELECT k.event_type, ex.true_users,
      round(CASE WHEN cnt < $KmvK THEN CAST(cnt AS DOUBLE)
                 ELSE ${KmvK - 1}.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0) END, 4) AS est_users
    FROM k JOIN ex USING (event_type)
    ORDER BY event_type"""

  // --- q2 shape: min-cost supplier via correlated scalar subquery ------
  // TPC-H q2 without a partsupp table: lineitem is the observed
  // (part, supplier) relation, offered cost = min unit price that
  // supplier ever charged for that part (per-row double division +
  // round — deterministic in both engines; no sum-order dependence).
  // The oracle keeps the reference's correlated scalar subquery shape;
  // the Spark plan decorrelates it the way Catalyst would — aggregate
  // once per part, join back, filter equality. Scale notes: the size
  // filter semi-prunes ~98% of (part,supplier) rows BEFORE any wide
  // shuffle; only the bounded dims (nation 25 / region 5 rows at any
  // SF) are broadcast-hinted, part/supplier are AQE's call.
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val part15 = Tables.part(spark, dir).filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_type"))
    val ps = Tables.lineitem(spark, dir)
      .join(part15.select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(round(col("l_extendedprice") / col("l_quantity"), 6)).as("ps_cost"))
    val suppR = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val regionPs = ps.join(suppR, col("l_suppkey") === col("s_suppkey"))
    val minCost = regionPs.groupBy(col("l_partkey")).agg(min(col("ps_cost")).as("min_cost"))
    regionPs.join(minCost, Seq("l_partkey"))
      .filter(col("ps_cost") === col("min_cost"))
      .join(part15, col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_type"), col("ps_cost").as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2Oracle: String = """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(round(l_extendedprice / l_quantity, 6)) AS ps_cost
      FROM lineitem GROUP BY 1, 2)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           ps.ps_cost AS cost
    FROM part p, ps, supplier s, nation n, region r
    WHERE p.p_partkey = ps.l_partkey AND s.s_suppkey = ps.l_suppkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA' AND p.p_size = 15
      AND ps.ps_cost = (
        SELECT min(ps2.ps_cost)
        FROM ps ps2, supplier s2, nation n2, region r2
        WHERE ps2.l_partkey = p.p_partkey AND s2.s_suppkey = ps2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'ASIA')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100"""

  // --- q20 shape: nested semi-join over aggregated lineitem ------------
  // TPC-H q20 adapted: suppliers in one nation who shipped > 45 units of
  // any 'red%' part in 1996 — nested IN subqueries in the oracle, two
  // left-semi joins in the Spark plan (part prune before the aggregate,
  // HAVING on an exact-decimal sum so the threshold can't flip on
  // double ordering). Both semi-joins keep the fact table un-widened.
  def q20PartQtySuppliers(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").like("red%")).select(col("p_partkey"))
    val hotSupp = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 45)
      .select(col("l_suppkey"))
    Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(hotSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val q20Oracle: String = """
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 45)
    ORDER BY s_name"""

  // --- q13 shape: outer-join distribution ------------------------------
  // How many customers placed k orders (excluding one priority class):
  // LEFT OUTER join so zero-order customers survive with c_count 0,
  // then a second aggregation over the counts. Both aggs are two-phase
  // hash aggs; the outer join shuffles on custkey with AQE deciding
  // broadcast. Counts are BIGINT in both engines — no decimal needed.
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q13Oracle: String = """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  // --- q15 shape: aggregate view + scalar max subquery -----------------
  // Top-revenue supplier(s) in a quarter. The revenue sums are exact
  // decimal, rounded identically in both engines, so the max-equality
  // selection can't split on representation. The max is a one-row
  // broadcast; ties all survive (ORDER BY s_suppkey).
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2)
        .cast("double").as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    Tables.supplier(spark, dir)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Oracle: String = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  // --- q17 shape: correlated per-part average threshold ----------------
  // Revenue from lineitems under 20% of their part's average quantity.
  // The correlated avg decorrelates to a per-part aggregate joined back
  // (what Catalyst does to the subquery form); the threshold is derived
  // from an EXACT decimal sum so the `<` comparison is identical in
  // both engines — a raw double avg would be partition-order dependent.
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val thresh = li.groupBy(col("l_partkey").as("pa_partkey"))
      .agg((lit(0.2) * (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))))
        .as("thresh"))
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))
    li.join(brandParts, col("l_partkey") === col("p_partkey"))
      .join(thresh, col("l_partkey") === col("pa_partkey"))
      .filter(col("l_quantity") < col("thresh"))
      .agg(round(sum(dec(col("l_extendedprice"))) / 7.0, 2)
        .cast("double").as("avg_yearly"))
  }

  val q17Oracle: String = """
    WITH pa AS (
      SELECT l_partkey,
        0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*)) AS thresh
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.l_partkey = p_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < thresh"""

  // --- q19 shape: disjunctive multi-attribute predicates ---------------
  // Revenue where (brand, size, quantity) satisfy one of two bundles —
  // the OR spans both tables, so only the partkey equi-join can be
  // pushed; the disjunction evaluates post-join in codegen.
  def q19DiscountedRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 1 && col("l_quantity") <= 30) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity") >= 10 && col("l_quantity") <= 40))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2)
        .cast("double").as("revenue"))

  val q19Oracle: String = """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 40)"""

  // --- q21 shape: EXISTS + NOT EXISTS over the same fact ---------------
  // Suppliers who shipped the strictly-last line of a finished
  // multi-supplier order (the reference q21 nested-exists shape; this
  // data has no commit/receipt dates, so "kept waiting" becomes "shipped
  // after every other supplier"). EXISTS → left-semi on (orderkey,
  // suppkey≠), NOT EXISTS → left-anti with the shipdate inequality in
  // the join condition; both stay equi-joins on orderkey with the extra
  // predicates evaluated in the join, never a cartesian.
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val lf = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val l1 = lf.join(
      Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"))
    val l2 = lf.select(col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
    val l3 = lf.select(col("l_orderkey").as("l3_orderkey"),
      col("l_suppkey").as("l3_suppkey"), col("l_shipdate").as("l3_shipdate"))
    val lastShipper = l1
      .join(l2, col("l_orderkey") === col("l2_orderkey") &&
        col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
      .join(l3, col("l_orderkey") === col("l3_orderkey") &&
        col("l_suppkey") =!= col("l3_suppkey") &&
        col("l3_shipdate") > col("l_shipdate"), "left_anti")
    Tables.supplier(spark, dir)
      .join(lastShipper, col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21Oracle: String = """
    SELECT s_name, count(*) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""

  // --- q22 shape: anti join + scalar avg subquery ----------------------
  // Above-average-balance customers with no urgent orders, per nation.
  // The average is an exact-decimal sum divided as double (a raw double
  // avg is partition-order dependent); the NOT EXISTS is a left-anti
  // join; nation is a bounded broadcast.
  def q22IdleBalances(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("ab"))
    cust.join(broadcast(avgBal), col("c_acctbal") > col("ab"))
      .join(Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(dec(col("c_acctbal"))), 2).cast("double").as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val q22Oracle: String = """
    SELECT n_name, count(*) AS numcust,
      CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY n_name ORDER BY n_name"""

  // --- funnel: sequential A-then-B conversion (round 3) ----------------
  // Users whose first 'click' is later followed by a 'purchase', and how
  // many converted within 1 h — the behavioral-analytics shape (entry
  // event → min later event per user → windowed conversion). Exact
  // integer microsecond math; two hash aggregates on user_id, the entry
  // table joined back once (AQE broadcasts it at small SFs).
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
    val entered = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("us")).as("a_us"))
    // The purchases⋈entered equi-join carries the corpus's user skew: a
    // hot user (bot traffic) puts its whole event history in ONE reducer.
    // `spark.graft.skew.funnelSalts` > 1 routes it through
    // Skew.saltedEquiJoin — identical row multiset, hot key spread over
    // `salts` reducers — for skew AQE can't fix (it splits sort-merge
    // partitions, but not when the join feeds a same-key aggregate that
    // reuses the exchange, and not under broadcast-hash plans).
    //
    // `spark.graft.skew.autoSalt=true` decides instead of guessing: ONE
    // extra aggregate pass over the already-scanned events sketches the
    // purchase-side key frequencies (Misra-Gries, bounded state) and
    // estimates the entered-side size, then Skew.autoSaltDecision salts
    // only in the measured winning regime — SMJ plan AND top key share ≥
    // `spark.graft.skew.hotKeyShare` (default 0.5; the study's winning
    // case was 95%-hot, the losing modest-skew case well below). The
    // decision is logged either way. An explicit funnelSalts wins.
    val purchases = ev.filter(col("event_type") === "purchase")
    val explicitSalts = spark.conf.getOption("spark.graft.skew.funnelSalts")
      .map(_.toInt).getOrElse(0)
    val salts =
      if (explicitSalts > 0 ||
          !spark.conf.getOption("spark.graft.skew.autoSalt").exists(_.toBoolean)) explicitSalts
      else funnelSaltDecision(spark, ev, entered).getOrElse(0)
    val joined =
      if (salts > 1) Skew.saltedEquiJoin(purchases, entered, "user_id", salts)
      else purchases.join(entered, Seq("user_id"))
    val converted = joined
      .filter(col("us") > col("a_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("b_us"))
    val within = count(when(col("b_us") - col("a_us") <= 3600000000L, 1))
    entered.join(converted, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_entered"),
        count(col("b_us")).as("n_converted"),
        within.as("n_within_1h"),
        round(within.cast("double") / count(lit(1)), 6).as("conversion_rate"))
  }

  /** One sampling pass + regime decision for the funnel's
    * purchases⋈entered join, factored out so specs can assert the
    * decision itself (regime (a) must come back None on real sf data
    * with broadcast enabled, not just in the pure decision table).
    *
    * Round-6 hardening of two silent constants:
    *  - row bytes come from the PROJECTED entered schema (Catalyst's
    *    per-type defaultSize), not a hardcoded 32 — a wider projection
    *    now widens the broadcast estimate with it;
    *  - the salt count is capped at `spark.graft.skew.maxSalts`
    *    (default 16, the measured winning regime ×16 in SURVEY §6)
    *    rather than numShufflePartitions: saltedEquiJoin replicates the
    *    entered side ×salts, so on a real cluster with 2000 shuffle
    *    partitions a just-over-threshold table would have been
    *    replicated 2000× — exactly the regression the heuristic exists
    *    to avoid. */
  private[graft] def funnelSaltDecision(spark: SparkSession, ev: DataFrame,
                                        entered: DataFrame): Option[Int] = {
    val st = ev.agg(
      graft.functions.MisraGriesTopK.of(
        when(col("event_type") === "purchase", col("user_id").cast("string")), 64).as("hh"),
      count(when(col("event_type") === "purchase", 1)).as("np"),
      approx_count_distinct(when(col("event_type") === "click", col("user_id"))).as("nclick"))
      .head()
    val hh = st.getSeq[org.apache.spark.sql.Row](0)
    val np = st.getLong(1)
    val topShare = if (np > 0 && hh.nonEmpty) hh.head.getLong(1).toDouble / np else 0.0
    val hotShare = spark.conf.getOption("spark.graft.skew.hotKeyShare")
      .map(_.toDouble).getOrElse(0.5)
    val rowBytes = entered.schema.fields.map(_.dataType.defaultSize.toLong).sum.max(1L)
    val maxSalts = spark.conf.getOption("spark.graft.skew.maxSalts")
      .map(_.toInt).getOrElse(16)
    val salts = math.max(2, math.min(spark.sessionState.conf.numShufflePartitions, maxSalts))
    val decided = Skew.autoSaltDecision(
      topShare, st.getLong(2), smallSideRowBytes = rowBytes,
      broadcastThreshold = spark.sessionState.conf.autoBroadcastJoinThreshold,
      hotShare = hotShare, salts = salts)
    System.err.println(f"[graft] funnel autoSalt: topShare=$topShare%.3f " +
      s"enteredEst=${st.getLong(2)} rowBytes=$rowBytes → " +
      decided.fold("no salt")(s => s"salts=$s"))
    decided
  }

  val eventsFunnelOracle: String = """
    WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
    a AS (SELECT user_id, min(us) AS a_us FROM e WHERE event_type = 'click' GROUP BY 1),
    b AS (SELECT e.user_id, min(e.us) AS b_us FROM e JOIN a USING (user_id)
          WHERE e.event_type = 'purchase' AND e.us > a.a_us GROUP BY 1)
    SELECT count(*) AS n_entered, count(b_us) AS n_converted,
      count(CASE WHEN b_us - a_us <= 3600000000 THEN 1 END) AS n_within_1h,
      round(CAST(count(CASE WHEN b_us - a_us <= 3600000000 THEN 1 END) AS DOUBLE) / count(*), 6) AS conversion_rate
    FROM a LEFT JOIN b USING (user_id)"""

  // --- q8 shape: market share via conditional share-of-total agg -------
  // One nation's share of its region's customer revenue per year: the
  // numerator is a conditional sum inside the same aggregate as the
  // denominator (one pass, no self-join), both exact decimal before the
  // final double division. Bounded dims broadcast-hinted; the fact
  // joins shuffle on their keys with AQE deciding.
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val vol = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(round(
        sum(when(col("n_name") === "NATION_7", vol).otherwise(lit(0))).cast("double") /
          sum(vol).cast("double"), 6).as("mkt_share"))
      .orderBy(col("yr"))
  }

  val q8Oracle: String = """
    WITH rev AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr, n_name,
        CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) AS vol
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
    SELECT CAST(yr AS BIGINT) AS yr,
      round(CAST(sum(CASE WHEN n_name = 'NATION_7' THEN vol ELSE 0 END) AS DOUBLE) /
            CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
    FROM rev GROUP BY yr ORDER BY yr"""

  // --- q16 shape: NOT-IN exclusion + count-distinct breakdown ----------
  // Distinct suppliers per (brand, size bucket), excluding a blocklist
  // (negative-balance suppliers — the complaint-supplier analog). NOT IN
  // plans as a left-anti join on the small blocklist; countDistinct is
  // the only wide aggregate.
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val blocked = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .join(blocked, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), expr("p_size div 10").cast("long").as("size_bucket"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("size_bucket"))
      .limit(30)
  }

  val q16Oracle: String = """
    SELECT p_brand, CAST(p_size // 10 AS BIGINT) AS size_bucket,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, p_brand, size_bucket
    LIMIT 30"""

  // --- q4 shape: correlated EXISTS with date arithmetic ----------------
  // Orders having at least one lineitem shipped >60 days after the
  // order date (this data has no commit/receipt dates, so "late" means
  // long ship lag), counted by priority. EXISTS → left-semi with the
  // interval comparison inside the join condition; exact timestamp +
  // interval math in both engines.
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  val q4Oracle: String = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1 ORDER BY 1"""

  // --- q11 shape: HAVING against a scalar aggregate of the aggregate --
  // Parts whose total traded value exceeds 1.5× the mean per-part value
  // (the important-stock filter; the threshold is scale-invariant where
  // TPC-H's fixed fraction would empty out as parts grow). Exact decimal
  // per-part sums; the one-row threshold broadcasts.
  def q11ValueShares(spark: SparkSession, dir: String): DataFrame = {
    val value = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("v"))
      .cache() // feeds the threshold aggregate AND the filter join
    val thresh = value
      .agg(((sum(col("v")).cast("double") / count(lit(1))) * 1.5).as("t"))
    value.join(broadcast(thresh), col("v").cast("double") > col("t"))
      .select(col("l_partkey"), round(col("v"), 2).cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val q11Oracle: String = """
    WITH val AS (SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS v
                 FROM lineitem GROUP BY 1)
    SELECT l_partkey, CAST(round(v, 2) AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) / count(*) FROM val) * 1.5
    ORDER BY part_value DESC, l_partkey"""

  // --- q9 shape: profit decomposition across the full star -------------
  // Profit per supplier nation per year on parts matching a name
  // pattern, with the supply cost synthesized from lineitem exactly
  // like q2 (min unit price per (part,supplier) — no partsupp table in
  // this schema). Revenue and cost both go through exact decimal before
  // the sum, so the profit aggregate is partition-order independent.
  def q9ProfitByNation(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(round(col("l_extendedprice") / col("l_quantity"), 6)).as("ps_cost"))
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").like("%red%")).select(col("p_partkey"))
    val profit = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) -
      dec(col("ps_cost")) * dec(col("l_quantity"))
    Tables.lineitem(spark, dir)
      .join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(ps, col("l_partkey") === col("pk") && col("l_suppkey") === col("sk"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(round(sum(profit), 2).cast("double").as("profit"))
      .orderBy(col("n_name"), col("yr").desc)
  }

  val q9Oracle: String = """
    WITH ps AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                  min(round(l_extendedprice / l_quantity, 6)) AS ps_cost
                FROM lineitem GROUP BY 1, 2)
    SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
            - CAST(ps_cost AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN ps ON ps.pk = l_partkey AND ps.sk = l_suppkey
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2 ORDER BY n_name, yr DESC"""

  // --- cohort retention (round 3) --------------------------------------
  // Weekly signup cohorts × weeks-since-signup active-user counts — the
  // standard retention-matrix shape. Exact integer week math (µs div
  // one week); two hash aggregates (cohort week per user, distinct
  // active weeks) joined on user_id, then the matrix aggregate.
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val WeekUs = 604800000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr(s"(ts div 1000) div $WeekUs").as("w"))
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("w")).as("cw"))
    val active = ev.select(col("user_id"), col("w")).distinct()
    cohorts.join(active, Seq("user_id"))
      .filter(col("w") >= col("cw"))
      .groupBy(col("cw"), (col("w") - col("cw")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .select(col("cw").as("cohort_week"), col("week_offset"), col("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val eventsRetentionOracle: String = """
    WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
    su AS (SELECT user_id, min(us) // 604800000000 AS cw FROM e
           WHERE event_type = 'signup' GROUP BY 1),
    act AS (SELECT DISTINCT e.user_id, e.us // 604800000000 AS w FROM e),
    r AS (SELECT su.cw, act.w - su.cw AS week_offset,
            count(DISTINCT act.user_id) AS n_active
          FROM su JOIN act ON su.user_id = act.user_id AND act.w >= su.cw
          GROUP BY 1, 2)
    SELECT cw AS cohort_week, week_offset, n_active FROM r
    ORDER BY cohort_week, week_offset"""

  // --- anomaly flagging: z-score outliers per event type ----------------
  // The data-cleaning shape of "find broken values before training on
  // them": one exact aggregation pass for per-type moments (map-side
  // combined to 5 rows), then a broadcast join back and a narrow per-row
  // z — no window, no second shuffle, linear at any scale. Exactness
  // rules from the kmeans trainer: values pre-rounded to 6 dp so the
  // DECIMAL(28,12) casts are exact and the mean/second-moment sums are
  // aggregation-order-independent; z rounds to 6 dp; zero-variance
  // groups emit no rows via the guarded CASE (also keeps ANSI division
  // happy) — all mirrored verbatim in the oracle.
  /** The shared z rule over a frame carrying (event_id, event_type,
    * v6, mean, m2) — ONE definition for the batch entry and the
    * streaming ingest scorer ([[graft.streaming.EventStream.anomalyScore]])
    * so flags can never drift between the two. */
  private[graft] def anomalyFlag(scored: DataFrame): DataFrame = {
    val vr = col("m2") - col("mean") * col("mean")
    scored
      .withColumn("z",
        when(vr > 0, round((col("v6") - col("mean")) / sqrt(vr), 6)))
      .filter(abs(col("z")) >= 3.0)
      .select(col("event_id"), col("event_type"), col("v6"), col("z"))
  }

  /** Per-type exact moments (mean, second moment) — the bounded
    * "model" the streaming scorer ships as literals (|event types|
    * rows by construction). */
  def anomalyStats(spark: SparkSession, dir: String): Map[String, (Double, Double)] = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), round(col("value"), 6).as("v6"))
    e.groupBy(col("event_type")).agg(
      (sum(col("v6").cast("decimal(28,12)")) / count(lit(1)))
        .cast("double").as("mean"),
      (sum((col("v6") * col("v6")).cast("decimal(28,12)")) / count(lit(1)))
        .cast("double").as("m2"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
  }

  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 6).as("v6"))
    val stats = e.groupBy(col("event_type")).agg(
      (sum(col("v6").cast("decimal(28,12)")) / count(lit(1)))
        .cast("double").as("mean"),
      (sum((col("v6") * col("v6")).cast("decimal(28,12)")) / count(lit(1)))
        .cast("double").as("m2"))
    anomalyFlag(e.join(broadcast(stats), Seq("event_type")))
      .orderBy(col("event_id"))
  }

  /** Exact twin of [[eventsAnomaly]]. */
  val eventsAnomalyOracle: String = """
    WITH e AS (
      SELECT event_id, event_type, round(value, 6) AS v6 FROM events),
    st AS (
      SELECT event_type,
        CAST(sum(CAST(v6 AS DECIMAL(28,12))) / count(*) AS DOUBLE) AS mean,
        CAST(sum(CAST(v6 * v6 AS DECIMAL(28,12))) / count(*) AS DOUBLE) AS m2
      FROM e GROUP BY event_type),
    z AS (
      SELECT e.event_id, e.event_type, e.v6,
        CASE WHEN st.m2 - st.mean * st.mean > 0
          THEN round((e.v6 - st.mean) / sqrt(st.m2 - st.mean * st.mean), 6)
        END AS z
      FROM e JOIN st USING (event_type))
    SELECT event_id, event_type, v6, z FROM z
    WHERE abs(z) >= 3.0
    ORDER BY event_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_anomaly"     -> (eventsAnomaly _),
    "q4_order_priority"    -> (q4OrderPriority _),
    "q9_profit_by_nation"  -> (q9ProfitByNation _),
    "q11_value_shares"     -> (q11ValueShares _),
    "q8_market_share"      -> (q8MarketShare _),
    "q16_supplier_counts"  -> (q16SupplierCounts _),
    "q_events_retention"   -> (eventsRetention _),
    "q_events_funnel"      -> (eventsFunnel _),
    "q13_cust_distribution" -> (q13CustomerDistribution _),
    "q15_top_supplier"     -> (q15TopSupplier _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q19_disjunctive_rev"  -> (q19DiscountedRevenue _),
    "q21_waiting_suppliers" -> (q21WaitingSuppliers _),
    "q22_idle_balances"    -> (q22IdleBalances _),
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q20_part_qty_suppliers" -> (q20PartQtySuppliers _),
    "q_events_sketch"      -> (eventsSketch _),
    "q_events_kmv"         -> (eventsKmv _),
    "q_semi_anti"          -> (semiAnti _),
    "q_rollup"             -> (rollupSummary _),
    "q_events_pivot"       -> (eventsPivot _),
    "q_events_json"        -> (eventsJson _),
    "q_percentiles"        -> (percentiles _),
    "q6_forecast"          -> (q6Forecast _),
    "q7_volume"            -> (q7Volume _),
    "q10_returns"          -> (q10Returns _),
    "q12_shipmode"         -> (q12ShipMode _),
    "q14_promo"            -> (q14Promo _),
    "q18_large_orders"     -> (q18LargeOrders _),
    "q1_pricing_summary"   -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier"    -> (q5LocalSupplier _),
    "q_window_topn"        -> (windowTopN _),
    "q_events_sessionize"  -> (eventsSessionize _),
    "q_events_windowed_agg" -> (eventsWindowedAgg _))

  val oracle: Map[String, String] = Map(
    "q_events_anomaly"     -> eventsAnomalyOracle,
    "q4_order_priority"    -> q4Oracle,
    "q9_profit_by_nation"  -> q9Oracle,
    "q11_value_shares"     -> q11Oracle,
    "q8_market_share"      -> q8Oracle,
    "q16_supplier_counts"  -> q16Oracle,
    "q_events_retention"   -> eventsRetentionOracle,
    "q_events_funnel"      -> eventsFunnelOracle,
    "q13_cust_distribution" -> q13Oracle,
    "q15_top_supplier"     -> q15Oracle,
    "q17_small_qty_revenue" -> q17Oracle,
    "q19_disjunctive_rev"  -> q19Oracle,
    "q21_waiting_suppliers" -> q21Oracle,
    "q22_idle_balances"    -> q22Oracle,
    "q2_min_cost_supplier" -> q2Oracle,
    "q20_part_qty_suppliers" -> q20Oracle,
    "q_events_sketch"      -> eventsSketchOracle,
    "q_events_kmv"         -> eventsKmvOracle,
    "q_semi_anti"          -> semiAntiOracle,
    "q_rollup"             -> rollupOracle,
    "q_events_pivot"       -> eventsPivotOracle,
    "q_events_json"        -> eventsJsonOracle,
    "q_percentiles"        -> percentilesOracle,
    "q6_forecast"          -> q6Oracle,
    "q7_volume"            -> q7Oracle,
    "q10_returns"          -> q10Oracle,
    "q12_shipmode"         -> q12Oracle,
    "q14_promo"            -> q14Oracle,
    "q18_large_orders"     -> q18Oracle,
    "q1_pricing_summary"   -> q1Oracle,
    "q3_shipping_priority" -> q3Oracle,
    "q5_local_supplier"    -> q5Oracle,
    "q_window_topn"        -> windowTopNOracle,
    "q_events_sessionize"  -> eventsSessionizeOracle,
    "q_events_windowed_agg" -> eventsWindowedAggOracle)
}
