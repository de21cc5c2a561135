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
    require(q.awaitTermination(300000), "windowed-agg stream timed out; comparison would be mid-flight")
    val got = spark.table("big_win").count()
    val t1 = (System.nanoTime() - t0) / 1e9
    val want = Analytics.eventsWindowedAgg(spark, dir).count()
    println(f"[scale] streaming windowed agg 1M events: $t1%.2f s rows=$got (batch rows=$want, equal=${got == want})")

    // KMV sketch over the same 1 M events in ONE AvailableNow pass — the
    // whole group arrives in a single batch, exercising the O(k)-memory
    // per-batch fold (a collect-then-sort merge would materialize ~200k
    // rows per group here)
    val t2 = System.nanoTime()
    val kq = EventStream.kmvDistinct(EventStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("big_kmv")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    require(kq.awaitTermination(300000), "KMV stream timed out; comparison would be mid-flight")
    val t3 = (System.nanoTime() - t2) / 1e9
    val est = spark.table("big_kmv").collect()
      .map(r => (r.getString(0), r.getDouble(2))).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).max }
    val batchEst = Analytics.eventsKmv(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    println(f"[scale] streaming KMV 1M events: $t3%.2f s groups=${est.size} (== batch: ${est == batchEst})")
    spark.stop()
  }
}
