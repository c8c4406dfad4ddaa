package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous LSH near-deduplication of a DOCUMENT stream — the
  * streaming form of [[Dedup.lshDedupAssign]] and the near-dup
  * counterpart of `EventStream.dedupStream`'s exact
  * dropDuplicatesWithinWatermark: an ingest pipeline that must admit
  * each arriving document exactly once, flagged against EVERYTHING
  * seen so far, without re-scanning history.
  *
  * Shape: the map-side MinHash banding ([[Dedup.bandedIds]] — fused
  * per-row signatures, no shuffle) fans each doc into `bands` slim
  * (id, band_hash) rows; ONE stateful operator keyed by band hash
  * keeps the minimum doc id ever seen in that bucket — 8 bytes of
  * state per live bucket, independent of document text size and of
  * how many docs the bucket absorbed. A doc's verdict is then a
  * BATCH-LOCAL fold (all of a doc's band rows ride the micro-batch it
  * arrived in), so [[nearDupAssignments]] runs inside the sink's
  * foreachBatch with no second stateful stage.
  *
  * Semantics (same as the batch form): dup_of = smallest earlier doc
  * id sharing ≥1 band bucket; dropped docs still count as priors
  * (the transitive-neighborhood keep-first policy — and the ONLY
  * per-bucket policy an 8-byte state can answer). "Earlier" is
  * arrival order, ties within a micro-batch broken by ascending id;
  * a stream delivered in id order therefore converges to exactly
  * [[Dedup.lshDedupAssign]] (asserted in StreamingSpec), while
  * out-of-order delivery degrades gracefully to first-arrival-wins —
  * a late-arriving smaller id is kept alongside the earlier winner,
  * never retroactively dropped (also asserted).
  *
  * State never expires (NoTimeout): dedup-against-all-history is the
  * contract, and the state table is one long per DISTINCT band hash —
  * at 100 TB that is the corpus's band-bucket count (≪ doc count ×
  * bands after collisions), stored in the state backend, not the
  * executors' heap. The retention-windowed variant
  * ([[nearDupBandPriorsWithTTL]]) swaps in ProcessingTimeTimeout and
  * re-admits after expiry.
  */
object DocStream {

  /** Stage 1 (the stateful pass): streaming (doc_id, text) →
    * (id, prior) per band row, `prior` = smallest doc id this band
    * bucket has seen before this row (null for a fresh bucket).
    * Runs identically on a BATCH frame (state starts empty, one
    * "micro-batch" — Spark executes flatMapGroupsWithState in batch
    * queries too), which is how st7's oracle row renders the exact
    * operator the continuous query runs. */
  def nearDupBandPriors(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 16, bands: Int = 4): DataFrame =
    bandPriorsStateful(docs, idCol, textCol, k, bands,
      GroupStateTimeout.NoTimeout(), afterUpdate = _ => ())

  /** The ONE stateful min-id body both retention policies run —
    * NoTimeout and TTL differ only in the timeout configuration and
    * what happens to a freshly-updated state's clock, so the prior
    * semantics provably cannot diverge between them. */
  private def bandPriorsStateful(docs: DataFrame, idCol: String,
      textCol: String, k: Int, bands: Int,
      timeoutConf: GroupStateTimeout,
      afterUpdate: GroupState[Long] => Unit): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Dedup.bandedIds(docs, idCol, textCol, k, bands)
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, Option[Long])](
        OutputMode.Append(), timeoutConf) {
        (_: String, it: Iterator[(Long, String)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // (TTL mode only) the bucket went idle past its TTL:
            // forget the winner; the next arrival starts fresh
            state.remove()
            Iterator.empty
          } else {
            // ascending-id order inside the batch = the batch form's
            // window order; the array is ONE bucket's ids in ONE
            // micro-batch — the hot-bucket bound is batch-sized, and
            // the state written back stays 8 bytes regardless
            val ids = it.map(_._1).toArray.sorted
            var mn = if (state.exists) state.get else Long.MaxValue
            val out = ids.map { id =>
              val p = if (mn < id) Some(mn) else None
              if (id < mn) mn = id
              (id, p)
            }
            if (mn != Long.MaxValue) {
              state.update(mn)
              afterUpdate(state)
            }
            out.iterator
          }
      }
      .toDF("id", "prior")
  }

  /** [[nearDupBandPriors]] with RETENTION: a band bucket's memory
    * expires `ttlMs` after its last arrival (ProcessingTimeTimeout),
    * so a document delivered after everything in its neighborhood
    * aged out is admitted as fresh — the policy for streams where
    * being a near-dup of LAST MONTH's content is fine (news crawl
    * re-ingestion, rolling-window feeds), and the state-size story
    * changes from corpus-lifetime buckets to live-window buckets.
    * Every arrival in a bucket RESETS its clock (the min id carries
    * forward), so a continuously-hot neighborhood never forgets its
    * winner; only genuinely idle buckets expire. Semantics otherwise
    * identical to the NoTimeout form — the timed-out invocation emits
    * nothing and just drops the 8-byte state.
    *
    * Execution note: with ProcessingTimeTimeout the engine considers
    * another micro-batch ALWAYS warranted (pending timeouts must get a
    * chance to fire), so under the default trigger the query cycles
    * continuously and `processAllAvailable` never settles — deploy
    * with a ProcessingTime interval trigger sized well under the TTL,
    * and poll the sink in tests (StreamingSpec does). */
  def nearDupBandPriorsWithTTL(docs: DataFrame, ttlMs: Long,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 16, bands: Int = 4): DataFrame = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    bandPriorsStateful(docs, idCol, textCol, k, bands,
      GroupStateTimeout.ProcessingTimeTimeout(),
      afterUpdate = _.setTimeoutDuration(ttlMs))
  }

  /** Stage 2 (batch-local, runs inside foreachBatch): fold a doc's
    * band priors into its verdict — dup_of = min prior across its
    * bands (null-skipping min: any collided band convicts), keep=1
    * iff no band had a prior. */
  def nearDupAssignments(bandPriors: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    bandPriors.groupBy(col("id"))
      .agg(min(col("prior")).as("dup_of"))
      .select(col("id").as(idCol), col("dup_of"),
        when(col("dup_of").isNull, 1).otherwise(0).as("keep"))
}
