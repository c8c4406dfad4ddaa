package graft.streaming

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming / incremental processing over the `events` table.
  *
  * The reference's incremental ETL is micro-batch by nature (SURVEY
  * §2.9); here both renderings exist:
  *  - `st1`/`st2` run the SAME aggregation logic in batch mode with a
  *    DuckDB oracle (windowed aggregation == groupBy on the tumbling
  *    window; sessionization == gap-detection via window functions);
  *  - `windowedStream` / `runAvailableNow` run it as a real Structured
  *    Streaming query (watermark + windowed agg, Trigger.AvailableNow,
  *    memory sink) — exercised in StreamingSpec, asserted equal to the
  *    batch result. At scale the same code runs continuously with
  *    `maxFilesPerTrigger` pacing and checkpointed state.
  */
object EventStream {

  val SESSION_GAP_US: Long = 30L * 60 * 1000 * 1000 // 30 min in µs

  /** Tumbling 1-hour aggregation as a batch plan (window() function —
    * identical semantics to the streaming query). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Gap-based sessionization in batch form: a session breaks after
    * ≥ 30 min of user inactivity. Output in epoch-µs longs (ns inputs
    * truncate identically on both engines). */
  def sessionize(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapped = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag("us", 1).over(
        Window.partitionBy("user_id").orderBy("us", "event_id")))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > SESSION_GAP_US, 1L).otherwise(0L))
      .withColumn("session_id",
        sum("is_new").over(Window.partitionBy("user_id")
          .orderBy("us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    gapped.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("start_us"), max("us").as("end_us"))
      .orderBy("user_id", "session_id")
  }

  case class Ev(user_id: Long, event_id: Long, us: Long)
  /** Streaming variant of Ev: keeps the watermarked `ts` column so the
    * event-time watermark flows into flatMapGroupsWithState (Spark
    * rejects EventTimeTimeout if the watermark attribute was projected
    * away before the stateful operator). */
  case class EvT(user_id: Long, event_id: Long, us: Long, ts: java.sql.Timestamp)
  case class OpenSess(session_id: Long, start_us: Long, last_us: Long, n: Long)
  case class SessState(nextSessionId: Long, open: Option[OpenSess])
  case class SessOut(user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** The incremental session-state transition shared by the batch and
    * streaming renderings: fold one chunk of (sorted) events into the
    * carried state, emitting every session CLOSED by a gap; the
    * still-open session stays in the state. O(1) state per user —
    * nothing about the past is retained beyond the open session. */
  private def advance(uid: Long, events: Array[Ev], st: SessState,
      out: scala.collection.mutable.ArrayBuffer[SessOut]): SessState = {
    var nextId = st.nextSessionId
    var open = st.open
    events.foreach { e =>
      open match {
        case Some(o) if e.us - o.last_us <= SESSION_GAP_US =>
          // min() on start: a late-but-in-watermark event from a later
          // micro-batch may precede the open session's first event
          open = Some(o.copy(start_us = math.min(o.start_us, e.us),
            last_us = math.max(o.last_us, e.us), n = o.n + 1))
        case Some(o) =>
          out += SessOut(uid, o.session_id, o.n, o.start_us, o.last_us)
          open = Some(OpenSess(nextId, e.us, e.us, 1)); nextId += 1
        case None =>
          open = Some(OpenSess(nextId, e.us, e.us, 1)); nextId += 1
      }
    }
    SessState(nextId, open)
  }

  /** Gap sessionization through the typed stateful-processing API — the
    * BOUNDED-GROUP rendering: on a batch run each user's events arrive
    * in one group invocation, which is sorted in memory (bounded by the
    * largest single user's event count; the window-function `sessionize`
    * is the spill-safe batch path for skewed users). The open session is
    * flushed at end-of-input since a bounded run has no more data.
    * Produces exactly the rows of `sessionize` (StreamingSpec). For an
    * unbounded stream use [[sessionizeStream]]. */
  def sessionizeStateful(spark: SparkSession, events: DataFrame)
      : org.apache.spark.sql.Dataset[SessOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = it.toArray
          scala.util.Sorting.stableSort(sorted,
            (a: Ev, b: Ev) => a.us < b.us || (a.us == b.us && a.event_id < b.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
          val st = advance(uid, sorted,
            state.getOption.getOrElse(SessState(1L, None)), out)
          st.open.foreach(o =>
            out += SessOut(uid, o.session_id, o.n, o.start_us, o.last_us))
          state.update(SessState(st.nextSessionId, None))
          out.iterator
      }
  }

  /** The CONTINUOUS-STREAM rendering: micro-batches fold into O(1)
    * per-user state via [[advance]]; a session that spans micro-batch
    * boundaries is merged, and an idle open session is flushed by an
    * EventTimeTimeout once the watermark passes its last event + gap
    * (no later event can extend it, by watermark contract). Per batch
    * only that batch's events for the user are buffered/sorted — a hot
    * user costs per-batch memory, never whole-history memory.
    * Covered by a two-micro-batch run in StreamingSpec.
    *
    * State-retention trade-off: after a timeout flush the per-user
    * entry keeps its session-id counter (a few bytes) so session ids
    * stay monotone per user across idle periods — state grows with
    * DISTINCT USERS, like any per-user counter. A deployment that
    * can't afford that replaces the counter with a content-derived
    * session identity (e.g. the session's start_us, unique per user)
    * and calls state.remove() on flush — O(open sessions) state. */
  def sessionizeStream(spark: SparkSession,
      events: DataFrame): org.apache.spark.sql.Dataset[SessOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("ts"))
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[EvT], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed last_us + gap — the open session can
            // never be extended; flush it, keep the id counter
            val st = state.get
            val out = st.open.map(o =>
              SessOut(uid, o.session_id, o.n, o.start_us, o.last_us))
            state.update(SessState(st.nextSessionId, None))
            out.iterator
          } else {
            val batch = it.map(e => Ev(e.user_id, e.event_id, e.us)).toArray
            scala.util.Sorting.stableSort(batch,
              (a: Ev, b: Ev) => a.us < b.us || (a.us == b.us && a.event_id < b.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
            val st = advance(uid, batch,
              state.getOption.getOrElse(SessState(1L, None)), out)
            state.update(st)
            st.open.foreach { o =>
              val flushAtMs = (o.last_us + SESSION_GAP_US) / 1000
              // EventTimeTimeout must be beyond the current watermark
              state.setTimeoutTimestamp(
                math.max(flushAtMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Stream-stream interval join — the continuous rendering of the
    * batch bounded range join (`Temporal.boundedRangeJoin` / j15):
    * right-stream rows within (left.ts, left.ts + window] on the same
    * key. Both sides carry watermarks so Spark bounds the join state:
    * a buffered left row is dropped once the right watermark passes its
    * ts + window (no future match possible), and vice versa — state is
    * O(in-flight window), not O(stream). Inner semantics, like the
    * batch pair form. */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      key: String, windowMinutes: Int,
      ts: String = "ts", payload: String = "event_id"): DataFrame = {
    val l = left.withWatermark(ts, s"$windowMinutes minutes")
      .select(col(key).as("l_key"), col(ts).as("l_ts"),
        col(payload).as(s"l_$payload"))
    val r = right.withWatermark(ts, s"$windowMinutes minutes")
      .select(col(key).as("r_key"), col(ts).as("r_ts"),
        col(payload).as(s"r_$payload"))
    l.join(r, expr(
      s"""l_key = r_key AND
         |r_ts > l_ts AND
         |r_ts <= l_ts + interval $windowMinutes minutes""".stripMargin))
      .select(col("l_key").as(key), col(s"l_$payload"),
        col(s"r_$payload"), col("l_ts"), col("r_ts"))
  }

  /** Stream-stream LEFT OUTER interval join — [[intervalJoinStream]]
    * plus the unmatched-left lane: a left event with no right match
    * inside the window still emits (with nulls) once BOTH watermarks
    * pass the point where a match could still arrive — the
    * "views that never converted" stream an attribution pipeline
    * needs, which the inner join silently drops. State is the same
    * watermark-bounded two-sided buffer as the inner join (Spark holds
    * left rows only until their join window closes); batch-rendered,
    * the identical operator is a plain left join, which is what the
    * oracle checks and what the final streaming result converges to
    * (StreamingSpec drives the null-emission timing through two
    * MemoryStreams). */
  def leftOuterIntervalJoinStream(left: DataFrame, right: DataFrame,
      key: String, windowMinutes: Int,
      ts: String = "ts", payload: String = "event_id"): DataFrame = {
    val l = left.withWatermark(ts, s"$windowMinutes minutes")
      .select(col(key).as("l_key"), col(ts).as("l_ts"),
        col(payload).as(s"l_$payload"))
    val r = right.withWatermark(ts, s"$windowMinutes minutes")
      .select(col(key).as("r_key"), col(ts).as("r_ts"),
        col(payload).as(s"r_$payload"))
    l.join(r, expr(
      s"""l_key = r_key AND
         |r_ts > l_ts AND
         |r_ts <= l_ts + interval $windowMinutes minutes""".stripMargin),
      "left_outer")
      .select(col("l_key").as(key), col(s"l_$payload"),
        col(s"r_$payload"), col("l_ts"), col("r_ts"))
  }

  /** Stream-static enrichment join — the lookup every event pipeline
    * runs on ingest: each streaming event picks up its dimension
    * attributes from a STATIC (batch) table. Spark plans the static
    * side as a broadcast hash join probed per micro-batch — stateless
    * (no watermark, no state store, append-mode-safe), so the join
    * adds no streaming state at any throughput; the dimension refreshes
    * by restarting the query (or routing through a `dw_` view the
    * warehouse re-points on commit). Left join: an event with no
    * dimension row passes through with nulls rather than vanishing —
    * at ingest, dropping unmatched facts silently is the bug. */
  def enrichStream(events: DataFrame, dim: DataFrame,
      evKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(evKey) === col(dimKey), "left")
      .drop(dimKey)

  /** Streaming exact dedup — the continuous rendering of d1: emit the
    * FIRST occurrence of each id, drop subsequent duplicates. The
    * watermark bounds the dedup state: an id's fingerprint is retained
    * only while a duplicate could still arrive inside the lateness
    * window, then evicted — state is O(ids per window), not O(stream),
    * which is what lets a dedup stream run forever at ingest scale.
    * (Consequence, by design: a duplicate arriving AFTER its id's
    * state was evicted is re-emitted — bounded state is the trade.) */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
      ts: String = "ts", lateness: String = "1 hour"): DataFrame =
    events.withWatermark(ts, lateness)
      .dropDuplicatesWithinWatermark(idCol)

  /** The streaming rendering of hourlyAgg: file source + watermark +
    * tumbling window. */
  def windowedStream(spark: SparkSession, sfDir: String): DataFrame = {
    // declare the FILE schema (ts = long raw nanos under the legacy
    // conf, or TIMESTAMP_NTZ µs in newer testdata) and normalize to a
    // µs timestamp in-plan, exactly as the batch loader does
    import org.apache.spark.sql.types._
    // self-sufficient on TIMESTAMP(NANOS)-generation testdata — but
    // without flipping the shared session's parquet semantics when the
    // data doesn't need it: probe the footer under the CURRENT conf
    // first, and only when that read refuses (the NANOS generation,
    // which Spark rejects outright) enable the legacy nanos-as-long
    // conf. There is no per-read option for it, and the stream's later
    // microbatches read under the same session conf, so when it IS
    // needed the session-wide setting is the only correct scope.
    val eventsPath = s"$sfDir/events.parquet"
    val schema =
      try spark.read.parquet(eventsPath).schema
      catch {
        // only the NANOS rejection flips the conf — any other failure
        // (missing file, FS error) must surface as itself, not mutate
        // the shared session's parquet semantics first
        case scala.util.control.NonFatal(e)
            if graft.Tables.isNanosRejection(e) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(eventsPath).schema
      }
    T.normalizeTs(spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/{events}.parquet")) // glob — file source needs a dir/glob
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Drain the stream with Trigger.AvailableNow into a memory sink and
    * return the result table name. */
  def runAvailableNow(spark: SparkSession, sfDir: String, name: String): StreamingQuery = {
    // windowedStream handles the TIMESTAMP(NANOS)-generation conf itself
    val q = windowedStream(spark, sfDir).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }

  val all: Seq[Q] = Seq(
    // F9 — semi-structured JSON property extraction from the event
    // payload column (get_json_object is codegen'd; no UDF)
    Q("f9_json_extract",
      Some("""SELECT event_type,
             |  -- outer cast: DuckDB sum(BIGINT) widens to HUGEINT, which the
             |  -- driver's pandas bridge renders as float64 and hash-mismatches
             |  -- Spark's int64
             |  cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) AS sum_k,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => T.events(s, d)
        .groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // ST1 — tumbling-window aggregation (streaming semantics, batch run)
    Q("st1_window_agg",
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |  count(*) AS n_events,
             |  cast(sum(cast(value as decimal(18,6))) as double) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin),
      (s, d) => hourlyAgg(T.events(s, d)).orderBy("window_start", "event_type")),

    // ST2 — sessionization by inactivity gap (stateful-streaming
    // semantics; batch rendering via window functions)
    Q("st2_sessionize",
      Some(s"""WITH g AS (
              |  SELECT user_id, event_id, epoch_us(ts) AS us,
              |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
              |  FROM events),
              |marked AS (
              |  SELECT user_id, event_id, us,
              |         CASE WHEN prev_us IS NULL OR us - prev_us > $SESSION_GAP_US
              |              THEN 1 ELSE 0 END AS is_new
              |  FROM g),
              |sess AS (
              |  SELECT user_id, us,
              |         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
              |                           ROWS UNBOUNDED PRECEDING) AS session_id
              |  FROM marked)
              |SELECT user_id, cast(session_id as bigint) AS session_id,
              |       count(*) AS n_events, min(us) AS start_us, max(us) AS end_us
              |FROM sess GROUP BY user_id, session_id
              |ORDER BY user_id, session_id""".stripMargin),
      (s, d) => sessionize(T.events(s, d))),

    // ST3 — conversion funnel: per-user ORDERED stage progression
    // (first view → a later click → a later purchase), the product
    // question every event pipeline answers. One grouped conditional-
    // min pass per user (no joins, no window), then one global rollup
    // of stage counts — two shuffles total, both on slim columns.
    Q("st3_funnel",
      Some("""WITH f AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
             |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
             |  FROM events GROUP BY user_id)
             |SELECT count(*) AS n_users,
             |  count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS stage_view,
             |  count(CASE WHEN t_click > t_view THEN 1 END) AS stage_click,
             |  count(CASE WHEN t_click > t_view AND t_purchase > t_click
             |             THEN 1 END) AS stage_purchase
             |FROM f""".stripMargin),
      (s, d) => {
        def firstOf(t: String) =
          min(when(col("event_type") === t,
            expr("unix_micros(ts)"))).as(s"t_$t")
        T.events(s, d)
          .groupBy("user_id")
          .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
          .agg(count(lit(1)).as("n_users"),
            count(when(col("t_view").isNotNull, lit(1))).as("stage_view"),
            count(when(col("t_click") > col("t_view"), lit(1)))
              .as("stage_click"),
            count(when(col("t_click") > col("t_view") &&
              col("t_purchase") > col("t_click"), lit(1)))
              .as("stage_purchase"))
      }),

    // ST4 — stream-stream interval join, batch-rendered: clicks
    // attributed to a SAME-USER view they followed within 12 hours —
    // the attribution join every event pipeline runs. The runner is
    // [[intervalJoinStream]] itself (withWatermark is a no-op on batch
    // frames, the join condition is identical), so the EXACT plan the
    // continuous query runs is what the oracle hash-checks here;
    // StreamingSpec drives the same operator through two watermarked
    // MemoryStreams and asserts batch ≡ streaming. Timestamps compare
    // at µs granularity (the engines' shared precision).
    Q("st4_interval_join",
      Some("""SELECT l.user_id, l.event_id AS view_id, r.event_id AS click_id,
             |  epoch_us(l.ts) AS view_us, epoch_us(r.ts) AS click_us
             |FROM events l JOIN events r
             |  ON l.user_id = r.user_id
             | AND l.event_type = 'view' AND r.event_type = 'click'
             | AND epoch_us(r.ts) > epoch_us(l.ts)
             | AND epoch_us(r.ts) <= epoch_us(l.ts) + 43200000000
             |ORDER BY 1, 4, 5, 2, 3""".stripMargin),
      (s, d) => {
        val ev = T.events(s, d)
        intervalJoinStream(ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "click"),
          "user_id", windowMinutes = 720)
          .select(col("user_id"), col("l_event_id").as("view_id"),
            col("r_event_id").as("click_id"),
            expr("unix_micros(l_ts)").as("view_us"),
            expr("unix_micros(r_ts)").as("click_us"))
          .orderBy("user_id", "view_us", "click_us", "view_id", "click_id")
      }),

    // ST5 — stream-static enrichment join: events pick up customer
    // dimension attributes on ingest (broadcast probe, stateless),
    // then roll up per market segment. The Q runs `enrichStream`
    // itself batch-rendered — the same plan the continuous query
    // executes per micro-batch; StreamingSpec drives it through a real
    // MemoryStream and asserts row-for-row equality with this batch
    // rendering. The unmatched-events lane (left join) is exercised by
    // the spec's planted orphan key; on this data every event matches.
    Q("st5_stream_static_enrich",
      Some("""SELECT c.c_mktsegment AS segment,
             |  count(*) AS n_events,
             |  cast(sum(cast(e.value as decimal(18,6))) as double) AS total_value
             |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY 1 ORDER BY segment""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val enriched = enrichStream(T.events(s, d),
          T.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
          "user_id", "c_custkey")
        enriched.select(col("c_mktsegment").as("segment"), col("value"))
          .groupBy("segment")
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 6))).cast("double")
              .as("total_value"))
          .orderBy("segment")
      }),

    // ST6 — stream-stream LEFT OUTER interval join: every view, with
    // its within-12h same-user clicks OR nulls — st4 plus the
    // views-that-never-converted lane (the rows an inner attribution
    // join silently drops, and the side a funnel's drop-off analysis
    // actually needs). The runner is [[leftOuterIntervalJoinStream]]
    // batch-rendered — identical plan modulo streaming state, and the
    // final converged streaming result IS the batch left join;
    // StreamingSpec pins the subtle half: the null row for an
    // unmatched view emits only after BOTH watermarks pass its join
    // window. Oracle note: the right side's type filter lives in the
    // ON clause and the left's in WHERE — on a left join those are
    // semantically different positions, matching the stream shape.
    Q("st6_outer_interval_join",
      Some("""SELECT l.user_id, l.event_id AS view_id, r.event_id AS click_id,
             |  epoch_us(l.ts) AS view_us, epoch_us(r.ts) AS click_us
             |FROM events l LEFT JOIN events r
             |  ON l.user_id = r.user_id
             | AND r.event_type = 'click'
             | AND epoch_us(r.ts) > epoch_us(l.ts)
             | AND epoch_us(r.ts) <= epoch_us(l.ts) + 43200000000
             |WHERE l.event_type = 'view'
             |ORDER BY 1, 4, 5, 2, 3""".stripMargin),
      (s, d) => {
        val ev = T.events(s, d)
        leftOuterIntervalJoinStream(ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "click"),
          "user_id", windowMinutes = 720)
          .select(col("user_id"), col("l_event_id").as("view_id"),
            col("r_event_id").as("click_id"),
            expr("unix_micros(l_ts)").as("view_us"),
            expr("unix_micros(r_ts)").as("click_us"))
          .orderBy("user_id", "view_us", "click_us", "view_id", "click_id")
      }),

    // ST7 — continuous LSH near-dedup of a DOCUMENT stream
    // ([[DocStream]]): each arriving doc is admitted exactly once with
    // dup_of = the smallest doc id sharing ≥1 MinHash band bucket with
    // anything seen so far — state is 8 bytes per live bucket, text
    // never enters state. Batch-rendered THROUGH nearDupBandPriors +
    // nearDupAssignments themselves (the st4 pattern — Spark runs
    // flatMapGroupsWithState on batch frames with empty state, so the
    // oracle hash-checks the exact stateful operator the continuous
    // query runs); StreamingSpec drives the same operator across real
    // MemoryStream micro-batches and asserts convergence to this
    // rendering plus first-arrival-wins under out-of-order delivery.
    Q("st7_stream_neardup",
      Some(graft.operators.Dedup.lshAssignOracleSql()),
      (s, d) => DocStream.nearDupAssignments(
        DocStream.nearDupBandPriors(T.documents(s, d)))
        .orderBy("doc_id"))
  )
}
