package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift guard for the events table (round-9 regression: the
  * generator switched `ts` from parquet TIMESTAMP(NANOS) to
  * timestamp[us], and every event-time operator broke on raw-long
  * math). Two tiny fixture parquets carry the SAME logical rows in both
  * encodings; `Tables.events` must normalize them to the identical
  * ns-long `ts`, and a representative event-time operator (sessionize)
  * must produce identical output on both.
  */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test

  private def fixture(enc: String): String =
    getClass.getResource(s"/events_enc/$enc").getPath

  test("Tables.events normalizes TIMESTAMP(NANOS) and timestamp[us] to the same ns longs") {
    val ns = graft.sources.Tables.events(spark, fixture("ns"))
    val us = graft.sources.Tables.events(spark, fixture("us"))
    assert(ns.schema("ts").dataType == LongType)
    assert(us.schema("ts").dataType == LongType)
    val a = ns.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = us.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.nonEmpty)
    assert(a.sameElements(b))
    // and they really are nanoseconds: 2025-01-01T00:00:00Z in ns
    assert(a.head._2 == 1735689600L * 1000000000L)
  }

  test("sessionize is encoding-invariant (would have caught the r9 break)") {
    val outNs = graft.operators.Analytics.eventsSessionize(spark, fixture("ns")).collect().toSeq
    val outUs = graft.operators.Analytics.eventsSessionize(spark, fixture("us")).collect().toSeq
    assert(outNs.nonEmpty)
    assert(outNs == outUs)
  }

  test("streaming readEvents is encoding-invariant") {
    for (enc <- Seq("ns", "us")) {
      val ev = graft.streaming.EventStream.readEvents(spark, fixture(enc))
      assert(ev.schema("ts").dataType == LongType)
      val q = ev.writeStream.format("memory").queryName(s"enc_$enc")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    val a = spark.table("enc_ns").select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = spark.table("enc_us").select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.nonEmpty)
    assert(a.sameElements(b))
  }
}
