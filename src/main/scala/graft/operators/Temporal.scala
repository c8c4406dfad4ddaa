package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over time-keyed tables.
  *
  * As-of join: for every left row, the single most recent right row
  * with right.ts <= left.ts on the same key — the time-series /
  * feature-backfill primitive ("the user's last purchase at or before
  * this click"). Spark has no native ASOF JOIN, and the naive
  * renderings die at scale: a correlated per-row lookup doesn't
  * distribute, and an inequality join explodes to O(n·m) per key
  * (BroadcastNestedLoopJoin). This is the scalable composition:
  *
  *   1. collapse the right side to one row per (key, ts) — caller does
  *      this with an ordinary aggregate;
  *   2. UNION both sides with a side tag (right sorts BEFORE left at
  *      equal ts → inclusive as-of);
  *   3. ONE hash partition on the key + per-partition sort on
  *      (ts, tag); a running `last_value(..., ignoreNulls)` carries the
  *      latest right payload forward past each left row;
  *   4. keep the left rows.
  *
  * Exactly one shuffle on the join key — the same exchange a plain
  * equi-join pays; no range explosion; skew bounded by per-key row
  * count exactly like any windowed aggregation. DuckDB's native
  * `ASOF LEFT JOIN` is the oracle.
  */
object Temporal {

  /** Left columns are preserved; every right column except (key, ts)
    * rides along as the as-of payload (null when no right row is at or
    * before the left row's ts). Right must be unique per (key, ts) and
    * payload names must not collide with left columns. */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(c => c == key || c == ts)
    require(lCols.intersect(rPayload).isEmpty,
      s"as-of payload collides with left columns: ${lCols.intersect(rPayload)}")
    val lType = left.select(struct(lCols.map(col): _*).as("s")).schema("s").dataType
    val rType = right.select(struct(rPayload.map(col): _*).as("s")).schema("s").dataType
    val l2 = left.select(col(key), col(ts).as("__ts"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"), lit(1).as("__tag"))
    val r2 = right.select(col(key), col(ts).as("__ts"),
      lit(null).cast(lType).as("__l"),
      struct(rPayload.map(col): _*).as("__r"), lit(0).as("__tag"))
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(lCols.map(c => col(s"__l.$c").as(c)) ++
        rPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Bounded range join: all (left, right) pairs on the same key with
    * right.ts in (left.ts, left.ts + windowUs]. A naive inequality join
    * plans as BroadcastNestedLoopJoin — O(n·m) per key. Because the
    * range is BOUNDED, binning makes it an equi-join: timestamps are
    * floored into windowUs-wide bins, each right row is replicated to
    * its own bin and the previous one (the only two bins whose left
    * rows can reach it), and the exact range predicate filters after
    * the (key, bin) hash join. Cost: 2× replication of the right side
    * and one hash shuffle — the standard interval-join rendering, and
    * the same shape Structured Streaming uses for stream-stream range
    * joins. Returns the MATCHED PAIRS (inner semantics): left columns
    * + `r_ts`, one row per (left row, in-range right row). Callers
    * needing left semantics join back against the left side (j15). */
  def boundedRangeJoin(left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, windowUs: Long): DataFrame = {
    val lBin = left.withColumn("__bin", floor(col(lts) / windowUs))
    val rRep = right.select(col(key), col(rts).as("__rts"))
      .withColumn("__bin0", floor(col("__rts") / windowUs))
      .select(col(key), col("__rts"),
        explode(array(col("__bin0"), col("__bin0") - 1)).as("__bin"))
    lBin.join(rRep, Seq(key, "__bin"))
      .filter(col("__rts") > col(lts) && col("__rts") <= col(lts) + windowUs)
      .withColumn("r_ts", col("__rts"))
      .drop("__bin", "__rts")
  }

  /** Interval-overlap join: all (left, right) pairs on the same key
    * whose intervals intersect — `l.s <= r.e AND r.s <= l.e`. The
    * third temporal-join primitive after as-of (j14) and bounded range
    * (j15): meeting/session/outage overlap queries. A naive inequality
    * join is a nested loop; here each interval is replicated to every
    * `binUs`-wide bin it touches and the join is a (key, bin)
    * equi-join. A pair can share several bins, so it is emitted ONLY
    * in the first bin both intervals occupy (`greatest(floor(l.s),
    * floor(r.s))`) — exactly-once without a distinct shuffle.
    * Replication factor = interval length / binUs + 1, so size binUs
    * near the typical interval length. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, key: String,
      ls: String, le: String, rs: String, re: String,
      binUs: Long): DataFrame = {
    require(binUs > 0, "intervalOverlapJoin: binUs must be positive")
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("__bin",
        explode(sequence(floor(col(s) / binUs), floor(col(e) / binUs))))
    binned(left, ls, le)
      .join(binned(right, rs, re), Seq(key, "__bin"))
      .filter(col(ls) <= col(re) && col(rs) <= col(le))
      .filter(col("__bin") ===
        greatest(floor(col(ls) / binUs), floor(col(rs) / binUs)))
      .drop("__bin")
  }

  val all: Seq[Q] = Seq(
    // J14 — as-of join: each click joined to the user's most recent
    // purchase at or before it (inclusive). Purchases are collapsed to
    // one row per (user, instant) first — max() is order-independent,
    // so no decimal detour is needed for parity.
    Q("j14_asof_join",
      Some("""WITH l AS (SELECT user_id, epoch_us(ts) AS us, event_id
             |           FROM events WHERE event_type = 'click'),
             |r AS (SELECT user_id, epoch_us(ts) AS us,
             |             max(event_id) AS p_event_id, max(value) AS p_value
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT l.event_id, l.user_id, l.us,
             |       coalesce(r.p_event_id, -1) AS p_event_id,
             |       coalesce(r.p_value, -1.0) AS p_value
             |FROM l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND l.us >= r.us
             |ORDER BY l.event_id""".stripMargin),
      (s, d) => {
        val ev = T.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), col("value"))
          .groupBy("user_id", "us")
          .agg(max("event_id").as("p_event_id"), max("value").as("p_value"))
        asofJoin(clicks, purchases, "user_id", "us")
          .select(col("event_id"), col("user_id"), col("us"),
            coalesce(col("p_event_id"), lit(-1L)).as("p_event_id"),
            coalesce(col("p_value"), lit(-1.0)).as("p_value"))
          .orderBy("event_id")
      }),

    // J15 — bounded range join: errors within 5 minutes AFTER each
    // click by the same user, counted per click (0 kept — left
    // semantics). The oracle states the inequality join directly;
    // the engine runs the binned equi-join rendering.
    Q("j15_range_join",
      Some("""WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us
             |           FROM events WHERE event_type = 'click'),
             |r AS (SELECT user_id, epoch_us(ts) AS us
             |      FROM events WHERE event_type = 'error')
             |SELECT l.event_id, l.user_id, l.us, count(r.us) AS n_errors
             |FROM l LEFT JOIN r ON r.user_id = l.user_id
             |  AND r.us > l.us AND r.us <= l.us + 300000000
             |GROUP BY 1, 2, 3 ORDER BY l.event_id""".stripMargin),
      (s, d) => {
        val windowUs = 300000000L // 5 min
        val ev = T.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        // matched pairs → per-click counts, then LEFT join back so
        // zero-error clicks stay in the result (the broadcast is the
        // aggregated count frame, never the raw pairs)
        val counts = boundedRangeJoin(clicks, errors, "user_id", "us", "us", windowUs)
          .groupBy("event_id").agg(count(lit(1)).as("n_matched"))
        clicks.join(counts, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"), col("us"),
            coalesce(col("n_matched"), lit(0L)).as("n_errors"))
          .orderBy("event_id")
      }),

    // J17 — interval-overlap join: click activity windows [ts, ts+5m]
    // overlapping error windows [ts, ts+1m] for the same user, one
    // output row per click with ≥1 overlap (count + first error id).
    // The oracle states the overlap inequality directly; the engine
    // runs the binned equi-join with first-shared-bin dedup.
    Q("j17_interval_overlap",
      Some("""WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS s,
             |                  epoch_us(ts) + 300000000 AS e
             |           FROM events WHERE event_type = 'click'),
             |r AS (SELECT event_id AS r_id, user_id, epoch_us(ts) AS rs,
             |             epoch_us(ts) + 60000000 AS re
             |      FROM events WHERE event_type = 'error')
             |SELECT l.event_id, cast(count(*) AS BIGINT) AS n_overlap,
             |       min(r.r_id) AS first_error
             |FROM l JOIN r ON l.user_id = r.user_id
             |  AND l.s <= r.re AND r.rs <= l.e
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val ev = T.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("s"),
            (unix_micros(col("ts")) + 300000000L).as("e"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("r_id"), col("user_id"),
            unix_micros(col("ts")).as("rs"),
            (unix_micros(col("ts")) + 60000000L).as("re"))
        intervalOverlapJoin(clicks, errors, "user_id",
          "s", "e", "rs", "re", binUs = 300000000L)
          .groupBy("event_id")
          .agg(count(lit(1)).as("n_overlap"), min("r_id").as("first_error"))
          .orderBy("event_id")
      }),

    // I4 — SCD Type-2 dimension build (Kimball expire-and-insert): a
    // change batch against the current dimension closes the matched
    // rows' validity window and appends the new versions. The change
    // batch here is derived deterministically from the data itself
    // (high-balance customers move to a PREMIUM segment at t1) so the
    // whole history is a pure function both engines can state. Set
    // algebra only: ONE equi-join (change batch broadcast — change
    // batches are always small next to the dimension) + a union; no
    // window, no per-row lookups, nothing driver-side — the expire
    // step at 100 TB is exactly this join. Open-ended validity is the
    // standard 2200-01-01 sentinel (never NULL: point-in-time joins
    // stay sargable and is_current derives from valid_to alone).
    Q("i4_scd2_build",
      Some("""WITH upd AS (
             |  SELECT c_custkey, 'PREMIUM' AS seg FROM customer
             |  WHERE c_acctbal > 9000),
             |hist AS (
             |  SELECT c.c_custkey, c.c_mktsegment AS seg,
             |         TIMESTAMP '1995-01-01' AS valid_from,
             |         CASE WHEN u.c_custkey IS NULL
             |              THEN TIMESTAMP '2200-01-01'
             |              ELSE TIMESTAMP '1998-01-01' END AS valid_to
             |  FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
             |  UNION ALL
             |  SELECT c_custkey, seg, TIMESTAMP '1998-01-01',
             |         TIMESTAMP '2200-01-01' FROM upd)
             |SELECT c_custkey, seg, valid_from, valid_to,
             |       CASE WHEN valid_to = TIMESTAMP '2200-01-01' THEN 1 ELSE 0 END
             |         AS is_current
             |FROM hist ORDER BY c_custkey, valid_from""".stripMargin),
      (s, d) => scd2Hist(T.customer(s, d))
        .withColumn("is_current",
          when(col("valid_to") === to_timestamp(lit("2200-01-01")), lit(1))
            .otherwise(lit(0)))
        .orderBy("c_custkey", "valid_from")),

    // J19 — point-in-time dimension lookup: each fact row joined to the
    // SCD2 version effective at its event time — key equality PLUS a
    // half-open validity-range residual. This is an ordinary equi-join
    // on the dimension key (broadcast here; shuffle hash at scale) with
    // the range check as a post-join filter — per-key fan-out is the
    // version count (small by construction), so no bin replication is
    // needed, unlike the keyless range join in j15.
    Q("j19_pit_lookup",
      Some("""WITH upd AS (
             |  SELECT c_custkey, 'PREMIUM' AS seg FROM customer
             |  WHERE c_acctbal > 9000),
             |hist AS (
             |  SELECT c.c_custkey, c.c_mktsegment AS seg,
             |         TIMESTAMP '1995-01-01' AS valid_from,
             |         CASE WHEN u.c_custkey IS NULL
             |              THEN TIMESTAMP '2200-01-01'
             |              ELSE TIMESTAMP '1998-01-01' END AS valid_to
             |  FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
             |  UNION ALL
             |  SELECT c_custkey, seg, TIMESTAMP '1998-01-01',
             |         TIMESTAMP '2200-01-01' FROM upd)
             |SELECT o.o_orderkey, o.o_custkey, h.seg AS seg_at_order
             |FROM orders o JOIN hist h ON o.o_custkey = h.c_custkey
             |  AND o.o_orderdate >= h.valid_from AND o.o_orderdate < h.valid_to
             |ORDER BY o.o_orderkey""".stripMargin),
      (s, d) => {
        val hist = scd2Hist(T.customer(s, d))
        T.orders(s, d).join(broadcast(hist),
            col("o_custkey") === col("c_custkey") &&
              col("o_orderdate") >= col("valid_from") &&
              col("o_orderdate") < col("valid_to"))
          .select(col("o_orderkey"), col("o_custkey"),
            col("seg").as("seg_at_order"))
          .orderBy("o_orderkey")
      })
  )

  /** SCD2 history of the customer dimension: the deterministic change
    * batch (acctbal > 9000 → PREMIUM at t1) expires its matched rows
    * and appends the new versions. Columns: c_custkey, seg,
    * valid_from, valid_to (2200-01-01 = open). */
  private def scd2Hist(cust: DataFrame): DataFrame = {
    val t0   = to_timestamp(lit("1995-01-01"))
    val t1   = to_timestamp(lit("1998-01-01"))
    val open = to_timestamp(lit("2200-01-01"))
    val upd = cust.filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), lit("PREMIUM").as("seg"))
    val expired = cust
      .join(broadcast(upd.select(col("c_custkey"), lit(1).as("__u"))),
        Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        t0.as("valid_from"),
        when(col("__u").isNotNull, t1).otherwise(open).as("valid_to"))
    val opened = upd.select(col("c_custkey"), col("seg"),
      t1.as("valid_from"), open.as("valid_to"))
    expired.unionByName(opened)
  }
}
