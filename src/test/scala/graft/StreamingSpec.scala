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

  test("change-feed source: live stream consumes commits exactly once across a restart") {
    import graft.olist.Warehouse
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh_cdcstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wh_cdcstream_ckpt").toString
    val wh = new Warehouse(spark, dir)
    wh.save("src", Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))    // v1
    wh.save("snk", Seq.empty[(Long, String)].toDF("k", "v"))
    def start(trigger: Trigger) = wh.readChangeStream("src").writeStream
      .option("checkpointLocation", ckpt)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        wh.appendStreamBatch("snk", batch, id, "cdc"); ()
      }
      .start()
    def sinkKeys() = wh.table("snk").select("k").as[Long].collect().sorted.toSeq
    def await(expect: Seq[Long], q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val deadline = System.currentTimeMillis + 120000
      while (sinkKeys() != expect && System.currentTimeMillis < deadline) {
        assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
        Thread.sleep(100)
      }
      assert(sinkKeys() == expect, s"sink=${sinkKeys()} expected=$expect")
    }
    // phase 1: LIVE stream — the bootstrap batch, then commits landing
    // while the query runs are each delivered as their own micro-batch
    val q1 = start(Trigger.ProcessingTime(100))
    await(Seq(1L, 2L), q1)
    wh.append("src", Seq((3L, "c")).toDF("k", "v").coalesce(1))             // v2
    await(Seq(1L, 2L, 3L), q1)
    wh.append("src", Seq((4L, "d"), (5L, "e")).toDF("k", "v").coalesce(1))  // v3
    await(Seq(1L, 2L, 3L, 4L, 5L), q1)
    q1.stop()
    // phase 2: commits land while the stream is DOWN; the restarted
    // query picks up from the checkpointed version — nothing replayed,
    // nothing missed (appendStreamBatch's mark would dedupe an engine
    // replay of the last batch; exact row multiset proves exactly-once)
    wh.append("src", Seq((6L, "f")).toDF("k", "v").coalesce(1))             // v4
    val q2 = start(Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty, q2.exception.map(_.toString).getOrElse(""))
    assert(sinkKeys() == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // and the feed refuses to stream across a rewrite, loudly
    wh.compact("src")                                                       // v5
    wh.append("src", Seq((7L, "g")).toDF("k", "v").coalesce(1))             // v6
    val q3 = start(Trigger.AvailableNow())
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.awaitTermination(120000)
    }
    assert(ex.getMessage.contains("rewrite"),
      s"stream crossed a compact commit without refusing: ${ex.getMessage}")
  }

  test("change-feed backfill rate limit: maxVersionsPerTrigger bounds each micro-batch") {
    import graft.olist.Warehouse
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh_cdcrate").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wh_cdcrate_ckpt").toString
    val wh = new Warehouse(spark, dir)
    // a 6-commit history BEFORE the subscriber exists (the backfill case)
    wh.save("src", Seq((1L, "a")).toDF("k", "v").coalesce(1))          // v1
    (2L to 6L).foreach(i =>
      wh.append("src", Seq((i, "x")).toDF("k", "v").coalesce(1)))      // v2..v6
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    // a RUNNING trigger drains the backlog in capped slices
    // (AvailableNow takes its end target from the FIRST offer, so a
    // rate-limited backfill uses a live trigger — see the option doc)
    val q = wh.readChangeStream("src", maxVersionsPerTrigger = Some(2L))
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ks = batch.select("k").as[Long].collect()
        batchSizes.synchronized { batchSizes += ks.length.toLong; seen ++= ks }
        ()
      }
      .start()
    val deadline = System.currentTimeMillis + 120000
    while (batchSizes.synchronized(seen.size) < 6 &&
        System.currentTimeMillis < deadline) {
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
      Thread.sleep(100)
    }
    q.stop()
    // nothing lost, nothing duplicated — just drained in bounded slices
    assert(seen.sorted.toSeq == (1L to 6L), seen.toSeq.toString)
    // 6 versions at 2 per trigger = 3 batches, and no batch carried
    // more than 2 commits' worth of rows (1 row per commit here)
    assert(batchSizes.size == 3, batchSizes.toString)
    assert(batchSizes.forall(_ <= 2), batchSizes.toString)
  }

  test("change-feed rate-limit cursor survives restart: never re-offers below a committed offset") {
    import graft.olist.Warehouse
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh_cdccursor").toString
    val meta = java.nio.file.Files.createTempDirectory("wh_cdccursor_meta").toString
    val wh = new Warehouse(spark, dir)
    wh.save("src", Seq((1L, "a")).toDF("k", "v").coalesce(1))          // v1
    (2L to 6L).foreach(i =>
      wh.append("src", Seq((i, "x")).toDF("k", "v").coalesce(1)))      // v2..v6
    val schema = wh.table("src").schema
    def mkSource() = new graft.streaming.ChangeFeedSource(wh, "src", 0L,
      schema, maxVersionsPerTrigger = Some(2L), metadataPath = Some(meta))
    def offer(s: graft.streaming.ChangeFeedSource): Long =
      s.getOffset.get.json.trim.toLong
    // first incarnation drains two capped offers: 2, then 4
    val a = mkSource()
    assert(offer(a) == 2L)
    assert(offer(a) == 4L)
    // the engine commits offset 4 and the process restarts WITHOUT an
    // uncommitted batch to replay: getOffset is the first call on the
    // new incarnation. An in-memory-only cursor would re-base the cap
    // on startingVersion and offer 2 — below the committed 4 — so
    // versions 3..4 would be delivered twice. The durable cursor must
    // resume the cap from 4 and offer 6.
    val b = mkSource()
    val first = offer(b)
    assert(first == 6L, s"offer regressed to $first after restart (committed 4)")
  }

  test("streaming sessionization carries state across micro-batches and flushes by timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000000L // µs
    val min = 60L * 1000 * 1000
    val source = MemoryStream[(Long, Long, Long)] // (user_id, event_id, us)
    val events = source.toDF().toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = EventStream.sessionizeStream(spark, events).toDF.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("sess_stream_out")
      .start()
    try {
      // batch 1: user 1 opens a session (2 events, 5 min apart)
      source.addData((1L, 1L, t0), (1L, 2L, t0 + 5 * min))
      q.processAllAvailable()
      assert(spark.table("sess_stream_out").count() == 0, "nothing closed yet")
      // batch 2: t0+10min EXTENDS the session opened in batch 1 (state
      // carried); t0+3h closes it by gap and opens session 2
      source.addData((1L, 3L, t0 + 10 * min), (1L, 4L, t0 + 180 * min))
      q.processAllAvailable()
      val closed = spark.table("sess_stream_out").as[EventStream.SessOut].collect()
      assert(closed.toSeq == Seq(
        EventStream.SessOut(1L, 1L, 3L, t0, t0 + 10 * min)),
        s"cross-batch merge failed: ${closed.toSeq}")
      // batch 3: another user far in the future pushes the watermark past
      // session 2's last+gap → EventTimeTimeout flushes it with no
      // further events from user 1
      source.addData((2L, 5L, t0 + 300 * min))
      q.processAllAvailable()
      val all = spark.table("sess_stream_out").as[EventStream.SessOut]
        .collect().sortBy(s => (s.user_id, s.session_id))
      assert(all.contains(
        EventStream.SessOut(1L, 2L, 1L, t0 + 180 * min, t0 + 180 * min)),
        s"timeout flush missing: ${all.toSeq}")
    } finally q.stop()
  }

  test("stream-stream interval join matches across micro-batches with bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000000L
    val min = 60L * 1000 * 1000
    def src() = MemoryStream[(Long, Long, Long)] // (user_id, event_id, us)
    val clicks = src(); val errors = src()
    def frame(m: MemoryStream[(Long, Long, Long)]) =
      m.toDF().toDF("user_id", "event_id", "us")
        .withColumn("ts", timestamp_micros(col("us")))
    val q = EventStream.intervalJoinStream(frame(clicks), frame(errors), "user_id", 5)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ivj_out").start()
    try {
      // batch 1: a click; its matching error arrives in a LATER batch
      clicks.addData((1L, 10L, t0))
      q.processAllAvailable()
      // batch 2: error 2 min after the click (in range) + one 10 min
      // after (out of range) + a different user's error (no key match)
      errors.addData((1L, 20L, t0 + 2 * min), (1L, 21L, t0 + 10 * min),
        (2L, 22L, t0 + 1 * min))
      q.processAllAvailable()
      val got = spark.table("ivj_out")
        .select("l_event_id", "r_event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((10L, 20L)), s"wrong matches: $got")
    } finally q.stop()
  }

  test("st4: the batch rendering equals a streaming run over the same events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // the whole sf0.001 events table through a MemoryStream — the Q
    // entry runs intervalJoinStream on batch frames, so this pins that
    // the SAME operator produces the SAME pairs when actually streamed
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val source = MemoryStream[(Long, Long, String, Long)]
    val f = source.toDF().toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = EventStream.intervalJoinStream(
      f.filter(col("event_type") === "view"),
      f.filter(col("event_type") === "click"), "user_id", 720)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("st4_stream_out").start()
    try {
      source.addData(rows.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("st4_stream_out")
        .select("user_id", "l_event_id", "r_event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = SparkEntry.queries("st4_interval_join")(spark, sf)
        .select("user_id", "view_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"stream ${got.size} pairs vs batch ${want.size}")
      assert(want.nonEmpty, "sf0.001 should produce at least one pair")
    } finally q.stop()
  }

  test("st5: stream-static enrichment joins each micro-batch against the broadcast dim, orphans pass through") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val source = MemoryStream[(Long, Long, Long)]
    val f = source.toDF().toDF("event_id", "user_id", "us")
    val q = EventStream.enrichStream(f, dim, "user_id", "c_custkey")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("st5_stream_out").start()
    try {
      // two micro-batches: the real events, then a planted orphan key
      // no customer row matches — the left join must emit it with null
      val (a, b) = rows.splitAt(rows.length / 2)
      source.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      source.addData(b.toIndexedSeq: _*)
      source.addData((999999L, 888888L, 0L)); q.processAllAvailable()
      val got = spark.table("st5_stream_out")
        .select("event_id", "c_mktsegment").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      val want = EventStream.enrichStream(
        Tables.events(spark, sf)
          .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("us")),
        dim, "user_id", "c_custkey")
        .select("event_id", "c_mktsegment").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got - 999999L == want, "streamed enrichment diverges from batch")
      assert(got(999999L).isEmpty, "orphan event lost or matched")
      assert(want.values.forall(_.nonEmpty), "every real event should match a customer")
    } finally q.stop()
  }

  test("streaming dedup: first occurrence kept, duplicates dropped, state evicted by watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000000L
    val min = 60L * 1000 * 1000
    val source = MemoryStream[(Long, Long)] // (event_id, us)
    val events = source.toDF().toDF("event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = EventStream.dedupStream(events).writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    def ids() = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    try {
      // batch 1: ids 1, 2 (2 arrives twice IN the same batch)
      source.addData((1L, t0), (2L, t0 + min), (2L, t0 + 2 * min))
      q.processAllAvailable()
      assert(ids() == Seq(1L, 2L), s"in-batch dedup failed: ${ids()}")
      // batch 2: a replay of id 1 within the lateness window + a new id
      source.addData((1L, t0 + 3 * min), (3L, t0 + 4 * min))
      q.processAllAvailable()
      assert(ids() == Seq(1L, 2L, 3L), s"cross-batch dedup failed: ${ids()}")
      // batch 3: far-future event advances the watermark hours past
      // ids 1-3, evicting their fingerprints (bounded state)...
      source.addData((4L, t0 + 600 * min))
      q.processAllAvailable()
      // ...so a duplicate arriving after eviction is re-emitted — the
      // documented trade of watermark-bounded dedup state
      source.addData((1L, t0 + 601 * min))
      q.processAllAvailable()
      assert(ids() == Seq(1L, 1L, 2L, 3L, 4L),
        s"post-eviction duplicate should re-emit: ${ids()}")
    } finally q.stop()
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

  test("row-level change stream crosses deletes, updates, and compactions") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh_rowstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wh_rowstream_ckpt").toString
    val wh = new graft.olist.Warehouse(spark, dir)
    wh.save("src", Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v").coalesce(1))                                        // v1
    wh.save("log", Seq.empty[(Long, String, String)]
      .toDF("k", "v", "_change_type"))
    def start(t: Trigger) = wh.readRowChangeStream("src").writeStream
      .option("checkpointLocation", ckpt)
      .trigger(t)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        wh.appendStreamBatch("log", b, id, "cdc"); ()
      }
      .start()
    def logCount() = wh.table("log").count()
    def await(expect: Long, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val deadline = System.currentTimeMillis + 120000
      while (logCount() != expect && System.currentTimeMillis < deadline) {
        assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
        Thread.sleep(100)
      }
      assert(logCount() == expect, s"log=${logCount()} expected=$expect")
    }
    val q = start(Trigger.ProcessingTime(100))
    await(3, q)                                   // bootstrap: 3 inserts
    wh.delete("src", col("k") === 2L)             // v2 → 1 delete row
    await(4, q)
    wh.update("src", col("k") === 3L, Map("v" -> lit("C2")))
    await(6, q)                                   // v3 → pre delete + post insert
    wh.compact("src")                             // v4 → row-neutral: nothing
    wh.append("src", Seq((4L, "d")).toDF("k", "v").coalesce(1))
    await(7, q)                                   // v5 → 1 insert
    q.stop()
    // the streamed log REPLAYS to exactly the live snapshot
    val log = wh.table("log")
    val applied = log.filter(col("_change_type") === "insert").select("k", "v")
      .exceptAll(log.filter(col("_change_type") === "delete").select("k", "v"))
    val snap = wh.table("src").select("k", "v")
    assert(applied.exceptAll(snap).count() == 0 &&
      snap.exceptAll(applied).count() == 0,
      s"replay=${applied.collect().toSeq} snapshot=${snap.collect().toSeq}")
    // the update's images streamed with the right tags
    val upd = log.filter(col("k") === 3L)
      .select("v", "_change_type").as[(String, String)].collect().toSet
    assert(upd == Set(("c", "insert"), ("c", "delete"), ("C2", "insert")))
  }

  test("row-level change stream replays across rename, widen, and partition evolution") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh_evostream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wh_evostream_ckpt").toString
    val wh = new graft.olist.Warehouse(spark, dir)
    // k starts INT and widens to LONG; v renames to label; the year
    // partitioning evolves away — the feed must replay the whole
    // history under the FINAL names and types
    wh.save("e", Seq((1, "a", 2020), (2, "b", 2020), (3, "c", 2021))
      .toDF("k", "v", "year").repartition(col("year")),
      partitionBy = Seq("year"))                                        // v1
    wh.delete("e", col("k") === 2)                                      // v2: change files carry (k int, v)
    wh.renameColumn("e", "v", "label")                                  // v3: metadata-only
    wh.append("e", Seq((4, "d", 2021)).toDF("k", "label", "year")
      .coalesce(1))                                                     // v4
    wh.update("e", col("k") === 3, Map("label" -> lit("C2")))           // v5: change files carry (k int, label)
    wh.widenColumn("e", "k", org.apache.spark.sql.types.LongType)       // v6: metadata-only
    wh.repartitionTable("e", Nil)                                       // v7: metadata-only
    wh.append("e", Seq((5L, "x", 2022)).toDF("k", "label", "year")
      .coalesce(1))                                                     // v8
    // stream the full history AFTER the evolution — the source speaks
    // the final schema (k long, label), batches replay old versions
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Int, String)]
    val q = wh.readRowChangeStream("e").writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select(col("k"), col("label"), col("year"),
          col("_change_type")).collect()
        got.synchronized { got ++= rows.map(r =>
          (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))) }
        ()
      }
      .start()
    q.awaitTermination(120000)
    val inserts = got.filter(_._4 == "insert").map(t => (t._1, t._2, t._3))
    val deletes = got.filter(_._4 == "delete").map(t => (t._1, t._2, t._3))
    // pre-rename delete surfaces under the new name with the new type
    assert(deletes.contains((2L, "b", 2020)), s"deletes: $deletes")
    assert(deletes.contains((3L, "c", 2021)), s"deletes: $deletes")
    assert(inserts.contains((3L, "C2", 2021)), s"inserts: $inserts")
    // multiset replay onto empty reconstructs the final snapshot
    val replayed = deletes.foldLeft(inserts.toBuffer) { (acc, d) =>
      acc -= d; acc }.sorted.toSeq
    val snap = wh.table("e").select("k", "label", "year")
      .as[(Long, String, Int)].collect().sorted.toSeq
    assert(replayed == snap, s"replay=$replayed snapshot=$snap")
    assert(snap == Seq((1L, "a", 2020), (3L, "C2", 2021),
      (4L, "d", 2021), (5L, "x", 2022)))
    // the batch replay API agrees end-to-end
    val batch = wh.tableChangesRows("e", 0, wh.tableVersions("e").last)
    assert(batch.filter(col("_change_type") === "insert").count() == 6)
    assert(batch.filter(col("_change_type") === "delete").count() == 2)
  }

  test("left-outer interval join: matches emit promptly, the null row only after both watermarks close its window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000000L
    val min = 60L * 1000 * 1000
    def src() = MemoryStream[(Long, Long, Long)] // (user_id, event_id, us)
    val views = src(); val clicks = src()
    def frame(m: MemoryStream[(Long, Long, Long)]) =
      m.toDF().toDF("user_id", "event_id", "us")
        .withColumn("ts", timestamp_micros(col("us")))
    val q = EventStream.leftOuterIntervalJoinStream(
      frame(views), frame(clicks), "user_id", 5)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("loj_out").start()
    try {
      // two views; only user 1's will ever see a click
      views.addData((1L, 10L, t0), (2L, 11L, t0))
      q.processAllAvailable()
      clicks.addData((1L, 20L, t0 + 2 * min))
      q.processAllAvailable()
      def got(): Set[(Long, Option[Long])] = spark.table("loj_out")
        .select("l_event_id", "r_event_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      // the match emits promptly; the unmatched view is STILL HELD —
      // a click for it could arrive until the watermark passes t0+5min
      assert(got() == Set((10L, Some(20L))), s"early emit: ${got()}")
      // advance BOTH watermarks past the window end: the held view
      // emits its null row exactly once
      views.addData((9L, 90L, t0 + 100 * min))
      clicks.addData((9L, 91L, t0 + 100 * min))
      q.processAllAvailable()
      assert(got() == Set((10L, Some(20L)), (11L, None)), got().toString)
    } finally q.stop()
  }

  test("st7: streaming near-dedup converges to the batch rendering, with cross-batch convictions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.DocStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val source = MemoryStream[(Long, String)]
    val f = source.toDF().toDF("doc_id", "text")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Option[Long], Int)]
    val q = DocStream.nearDupBandPriors(f).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val a = DocStream.nearDupAssignments(b).collect().map(r =>
          (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2)))
        out.synchronized { out ++= a }
        ()
      }.start()
    try {
      // id-ordered delivery in three micro-batches: the stream must
      // converge to EXACTLY the batch assignment — cross-batch dups
      // convicted by state, not by re-scanning history
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        source.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
      val want = operators.Dedup.lshDedupAssign(Tables.documents(spark, sf))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toSet
      assert(out.toSet == want,
        s"stream ${out.size} rows vs batch ${want.size}")
      // at least one doc from a later batch was convicted by a
      // batch-1 prior (the state actually crossed micro-batches)
      val b1max = b1.last._1
      assert(out.exists { case (id, p, _) =>
        id > b1max && p.exists(_ <= b1max) },
        "no cross-batch conviction observed")
      // every doc emitted exactly once
      assert(out.map(_._1).distinct.size == out.size)
    } finally q.stop()
  }

  test("st7: out-of-order arrival is first-arrival-wins — a late smaller id is kept, never retroactively dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.DocStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val txt = "kappa lambda mu nu xi omicron pi rho"
    val source = MemoryStream[(Long, String)]
    val f = source.toDF().toDF("doc_id", "text")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Option[Long], Int)]
    val q = DocStream.nearDupBandPriors(f).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val a = DocStream.nearDupAssignments(b).collect().map(r =>
          (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2)))
        out.synchronized { out ++= a }
        ()
      }.start()
    try {
      source.addData((5L, txt)); q.processAllAvailable()
      source.addData((1L, txt)); q.processAllAvailable()
      source.addData((7L, txt)); q.processAllAvailable()
      val byId = out.map(t => t._1 -> t).toMap
      // 5 arrived first into fresh buckets: kept
      assert(byId(5L) == ((5L, None, 1)))
      // 1 arrives later but is SMALLER than everything in state — no
      // prior qualifies (prior must be < id), so it is kept too: the
      // already-admitted 5 is never retracted, and 1 is not its dup
      assert(byId(1L) == ((1L, None, 1)))
      // 7 is convicted by the now-minimal state entry 1
      assert(byId(7L) == ((7L, Some(1L), 0)))
    } finally q.stop()
  }

  test("st7 retention: an idle bucket expires after its TTL and the neighborhood re-admits; a live bucket never forgets") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.DocStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val txt = "sigma tau upsilon phi chi psi omega aleph"
    val hotTxt = "bet gimel dalet he vav zayin het tet"
    val source = MemoryStream[(Long, String)]
    val f = source.toDF().toDF("doc_id", "text")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Option[Long], Int)]
    // ProcessingTimeTimeout makes the engine run micro-batches
    // CONTINUOUSLY (shouldRunAnotherBatch is always true — how pending
    // timeouts get a chance to fire), so processAllAvailable never
    // settles on this query: the test POLLS the sink instead. TTL and
    // cadences are 10×-margined: hot re-arrivals every ~0.5 s against
    // a 5 s TTL; the idle lane goes quiet for ~7 s.
    val q = DocStream.nearDupBandPriorsWithTTL(f, ttlMs = 5000L).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val a = DocStream.nearDupAssignments(b).collect().map(r =>
          (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2)))
        out.synchronized { out ++= a }
        ()
      }.start()
    def seen(ids: Long*): Boolean =
      out.synchronized(ids.forall(i => out.exists(_._1 == i)))
    def waitFor(ids: Long*): Unit = {
      val deadline = System.currentTimeMillis() + 120000L
      while (!seen(ids: _*) && System.currentTimeMillis() < deadline)
        Thread.sleep(100L)
      assert(seen(ids: _*), s"rows for ${ids.toSeq} never arrived")
    }
    try {
      source.addData((10L, txt), (100L, hotTxt)); waitFor(10L, 100L)
      // within the window a near-dup is convicted as usual
      source.addData((20L, txt), (101L, hotTxt)); waitFor(20L, 101L)
      // the txt lane now goes IDLE past its TTL while the hot lane
      // keeps arriving well inside it (clock resets on every arrival)
      (0 until 14).foreach { i =>
        Thread.sleep(500L)
        source.addData((110L + i, hotTxt))
      }
      waitFor(110L to 123L: _*)
      // the idle neighborhood expired: 30 is admitted as FRESH even
      // though 10/20 entered the same buckets earlier
      source.addData((30L, txt), (130L, hotTxt)); waitFor(30L, 130L)
      val byId = out.synchronized(out.map(t => t._1 -> t).toMap)
      assert(byId(10L) == ((10L, None, 1)))
      assert(byId(20L) == ((20L, Some(10L), 0)),
        "within-TTL near-dup must still convict")
      assert(byId(30L) == ((30L, None, 1)),
        s"an expired neighborhood must re-admit: ${byId(30L)}")
      // the continuously-hot bucket never forgot its winner: every
      // arrival across the whole run is still convicted by 100
      ((101L +: (110L to 123L)) :+ 130L).foreach { id =>
        assert(byId(id) == ((id, Some(100L), 0)),
          s"a live bucket's clock must reset on arrival: ${byId(id)}")
      }
    } finally q.stop()
  }
}
