package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, AsOfJoin}

/** Skew stress: user 0 owns ~50% of 1M events. Sessionize/as-of window
  * on user_id then has one partition with 500k rows — the straggler
  * shape AQE cannot split (windows need whole key groups). */
object ScaleSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "target/tmp/skewsf"
    if (!new java.io.File(s"$dir/events.parquet").exists()) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val base = spark.read.parquet("target/tmp/bigsf/events.parquet")
      base.select(col("event_id"), col("ts"),
        when(pmod(col("event_id"), lit(2)) === 0, 0L).otherwise(col("user_id")).as("user_id"),
        col("event_type"), col("value"), col("props"))
        .repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scale] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("sessionize skewed 1M")(Analytics.eventsSessionize(spark, dir).count())
    time("windowed_agg skewed 1M")(Analytics.eventsWindowedAgg(spark, dir).count())
    time("asof skewed 1M")(AsOfJoin.purchaseSignup(spark, dir).count())
    spark.stop()
  }
}
