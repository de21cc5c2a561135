package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream
import graft.operators.Analytics

class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("streaming windowed agg == batch twin (file source, AvailableNow)") {
    val stream = EventStream.windowedAgg(EventStream.readEvents(spark, sf))
    val q = stream.writeStream
      .format("memory").queryName("win_agg")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("win_agg")
      .select("window_start", "event_type", "n", "sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    val want = Analytics.eventsWindowedAgg(spark, sf)
      .select("window_start", "event_type", "n", "sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming exact dedup == batch distinct fingerprints") {
    val q = EventStream.dedupDocuments(spark, sf)
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_docs").select("content_fp").distinct().count()
    val want = graft.operators.Dedup.exact(spark, sf).count()
    assert(got == want && got > 0)
  }

  test("stateful gap-sessionization across batches == batch twin") {
    import EventStream.{Ev, Session}
    implicit val sqlCtx = spark.sqlContext

    val events = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), expr("ts div 1000").as("us"), col("value"))
      .as[(Long, Long, Double)].collect()
      .map { case (u, us, v) => Ev(u, us, v) }
      .sortBy(_.us)

    // two mid-stream batches + a sentinel batch that closes every tail
    val (b1, b2) = events.splitAt(events.length / 2)
    val sentinels = events.map(_.user_id).distinct.map(u => Ev(u, Long.MaxValue / 2, 0.0))

    val input = MemoryStream[Ev]
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    input.addData(b1.toSeq); q.processAllAvailable()
    input.addData(b2.toSeq); q.processAllAvailable()
    input.addData(sentinels.toSeq); q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions").as[Session]
      .collect().map(s => (s.user_id, s.session_id, s.n_events, s.duration_s)).toSet
    val want = Analytics.eventsSessionize(spark, sf)
      .select("user_id", "session_id", "n_events", "duration_s")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
