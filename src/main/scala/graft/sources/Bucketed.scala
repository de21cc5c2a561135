package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout (SURVEY §4 / §7): persist both sides of a
  * recurring fact-fact join bucketed AND sorted by the join key. Spark
  * then plans the join with ZERO exchanges — each bucket pair joins
  * sort-merge style in place. This is the 100 TB answer to "lineitem ⋈
  * orders shuffles 100 TB every query": shuffle once at write time,
  * never again at read time.
  */
object Bucketed {

  /** Persist lineitem + orders bucketed by orderkey into `database`
    * (a warehouse-backed saveAsTable — bucket metadata lives in the
    * catalog). Idempotent. */
  def writeFactTables(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    def ensure(name: String)(write: => Unit): Unit =
      if (!spark.catalog.tableExists(name)) {
        // the default catalog is in-memory per JVM but warehouse files
        // persist — clear an orphaned location before recreating
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
        if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
        write
      }
    ensure("g_lineitem") {
      Tables.lineitem(spark, dir)
        .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("g_lineitem")
    }
    ensure("g_orders") {
      Tables.orders(spark, dir)
        .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("g_orders")
    }
  }

  /** The q12-shaped join over the bucketed tables — planner emits no
    * Exchange on either join side (asserted by spec). */
  def bucketedJoin(spark: SparkSession): DataFrame = {
    val li = spark.table("g_lineitem")
    val ord = spark.table("g_orders")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_priority_lines"))
      .orderBy(col("l_returnflag"))
  }
}
