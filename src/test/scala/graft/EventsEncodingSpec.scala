package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift guard for the events table (round-9 regression: the
  * generator switched `ts` from parquet TIMESTAMP(NANOS) to
  * timestamp[us], and every event-time operator broke on raw-long
  * math). Four tiny fixture parquets carry the SAME logical rows in
  * every plausible ts encoding; `Tables.events` must normalize them to
  * the identical ns-long `ts`, and a representative event-time operator
  * (sessionize) plus the streaming reader must produce identical
  * output on all of them.
  */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test

  private def fixture(enc: String): String =
    getClass.getResource(s"/events_enc/$enc").getPath

  // the four encodings a parquet events table plausibly arrives in:
  // TIMESTAMP(NANOS) (read as raw long via nanosAsLong), timestamp[us]
  // and timestamp[ms] (both read as TIMESTAMP_NTZ), and legacy INT96
  // (read as TimestampType ltz). All must normalize to the same ns longs.
  private val encodings = Seq("ns", "us", "ms", "int96")

  test("Tables.events normalizes all four parquet ts encodings to the same ns longs") {
    val per = encodings.map { enc =>
      val df = graft.sources.Tables.events(spark, fixture(enc))
      assert(df.schema("ts").dataType == LongType, s"$enc not normalized to long")
      enc -> df.select("event_id", "ts").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    }.toMap
    val ref = per("ns")
    assert(ref.nonEmpty)
    // and they really are nanoseconds: 2025-01-01T00:00:00Z in ns
    assert(ref.head._2 == 1735689600L * 1000000000L)
    for (enc <- encodings.tail)
      assert(per(enc).sameElements(ref), s"$enc ts longs diverge from ns fixture")
  }

  test("sessionize is encoding-invariant (would have caught the r9 break)") {
    val outs = encodings.map(enc =>
      enc -> graft.operators.Analytics.eventsSessionize(spark, fixture(enc)).collect().toSeq).toMap
    assert(outs("ns").nonEmpty)
    for (enc <- encodings.tail)
      assert(outs(enc) == outs("ns"), s"sessionize($enc) != sessionize(ns)")
  }

  test("streaming readEvents is encoding-invariant") {
    for (enc <- encodings) {
      val ev = graft.streaming.EventStream.readEvents(spark, fixture(enc))
      assert(ev.schema("ts").dataType == LongType)
      val q = ev.writeStream.format("memory").queryName(s"enc_$enc")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    def rows(enc: String) = spark.table(s"enc_$enc").select("event_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val ref = rows("ns")
    assert(ref.nonEmpty)
    for (enc <- encodings.tail)
      assert(rows(enc).sameElements(ref), s"streamed $enc ts diverges from ns")
  }
}
