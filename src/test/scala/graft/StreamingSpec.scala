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

  test("streaming restart with a checkpoint does not reprocess committed input") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    def start(name: String) =
      graft.streaming.EventStream.windowedStream(spark, sf).writeStream
        .outputMode(OutputMode.Complete())
        .format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val q1 = start("ckpt_run1"); q1.awaitTermination(120000)
    val rows1 = spark.table("ckpt_run1").count()
    assert(rows1 > 0)
    // restart from the same checkpoint: source offsets are committed,
    // so the run terminates having read nothing new
    val q2 = start("ckpt_run2"); q2.awaitTermination(120000)
    val progress = q2.lastProgress
    assert(q2.exception.isEmpty)
    assert(progress == null || progress.numInputRows == 0,
      s"restart reprocessed input: ${Option(progress).map(_.numInputRows)}")
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
