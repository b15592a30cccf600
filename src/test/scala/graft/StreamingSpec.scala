package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** Structured Streaming smoke: the events parquet drives a watermarked
  * windowed aggregation through a memory sink (SURVEY.md §2 A4 / §7.2.8).
  */
class StreamingSpec extends AnyFunSuite with SparkSpec {

  test("windowed event counts drain through a memory sink") {
    val stream = EventsStream.readEvents(spark, sf0)
    val agg = EventsStream.windowedAgg(stream, "1 hour", "30 minutes")
    val q = EventsStream.startMemorySink(agg, "ev_window")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ev_window")
    assert(out.columns.toSeq ==
      Seq("w_start", "w_end", "event_type", "n", "total_value"))
    val total = out.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    // watermark in AvailableNow drains everything ≤ max(ts) − lateness;
    // with append mode the final (open) windows are withheld, so the count
    // is positive but ≤ 1000
    assert(total > 0 && total <= 1000)
  }

  test("per-user activity stream produces rows for active users") {
    val stream = EventsStream.readEvents(spark, sf0)
    val q = EventsStream.startMemorySink(
      EventsStream.perUserActivity(stream), "ev_user")
    q.processAllAvailable()
    q.stop()
    assert(spark.table("ev_user").count() > 0)
  }
}
