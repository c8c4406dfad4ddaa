package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("structured-streaming windowed agg equals the batch rendering") {
    val q = EventStream.runAvailableNow(spark, sf, "stream_agg_out")
    q.awaitTermination(120000)
    val streamed = spark.table("stream_agg_out")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventStream.hourlyAgg(Tables.events(spark, sf))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stateful flatMapGroupsWithState sessionization equals the window-function rendering") {
    val stateful = EventStream.sessionizeStateful(spark, Tables.events(spark, sf))
      .toDF.orderBy("user_id", "session_id").collect().toSeq
    val windowed = EventStream.sessionize(Tables.events(spark, sf))
      .select("user_id", "session_id", "n_events", "start_us", "end_us")
      .orderBy("user_id", "session_id").collect().toSeq
    assert(stateful.nonEmpty)
    assert(stateful == windowed)
  }

  test("sessionization: sessions partition each user's events, gaps respected") {
    val sess = EventStream.sessionize(Tables.events(spark, sf))
    val total = sess.agg(sum("n_events")).head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
    // no session spans a gap: end-start of a k-event session < k * gap
    val bad = sess.filter(
      col("end_us") - col("start_us") >= col("n_events") * EventStream.SESSION_GAP_US)
    assert(bad.count() == 0)
  }
}
