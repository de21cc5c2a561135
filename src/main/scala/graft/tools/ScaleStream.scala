package graft.tools
import org.apache.spark.sql.SparkSession
import graft.streaming.EventStream
import graft.operators.Analytics

object ScaleStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "target/tmp/bigsf"
    val t0 = System.nanoTime()
    val q = EventStream.windowedAgg(EventStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("big_win")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    val got = spark.table("big_win").count()
    val t1 = (System.nanoTime() - t0) / 1e9
    val want = Analytics.eventsWindowedAgg(spark, dir).count()
    println(f"[scale] streaming windowed agg 1M events: $t1%.2f s rows=$got (batch rows=$want, equal=${got == want})")
    spark.stop()
  }
}
