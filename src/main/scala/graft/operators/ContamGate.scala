package graft.operators

import graft.olist.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse-stored BENCHMARK-DECONTAMINATION gate — the fourth stored
  * index ([[TextIndex]] = sparse terms, [[AnnIndex]] = dense vectors,
  * [[DedupIndex]] = near-dup identity, this = eval-suite membership):
  * the ingest firewall that keeps benchmark text out of the training
  * corpus. The batch sweep (`d10_contamination` /
  * [[Dedup.fuzzyContamination]]) re-shingles and re-hashes the
  * benchmark suite on every question; a production pipeline holds the
  * suite fixed for months, so its word-8-gram digests are computed
  * ONCE and stored:
  *
  *   `<idx>_grams`  (suite, h)  the suite's distinct md5 word-8-gram
  *                  digests, TAGGED with the suite that contributed
  *                  them and range-clustered on `h` — 16 bytes per
  *                  gram, no benchmark text ever stored (the gate can
  *                  be shared with partners who must not see the suite
  *                  itself). The suite tag is the RETIREMENT handle: a
  *                  deprecated benchmark's digests can be dropped
  *                  ([[retire]]) without holding the suite text or
  *                  rebuilding the gate, and a gram two suites share
  *                  survives the retirement of one because each
  *                  LIVE suite carries its own row for it.
  *
  * Serving shape ([[verdicts]]): the BATCH's distinct digests build
  * the broadcast side and the stored gram table streams past them —
  * per-question cost is O(|suite grams| + |batch|), independent of
  * corpus size, and nothing corpus- or suite-sized shuffles. Compare
  * d10's raw lane, which re-reads and re-shingles EVERY document per
  * sweep. The gate is read-only at serving, so it needs no membership
  * in the ingest transaction; [[refresh]] (suite grew a new benchmark
  * version) is anti-join idempotent like the other indexes' advances.
  *
  * Gram semantics are exactly d10's: whitespace word 8-grams of the
  * raw text, md5-digested, per-doc distinct; a document under 8 tokens
  * has no grams and is clean by construction — the safe direction for
  * a firewall is debatable (it admits everything too short to check),
  * but it matches the sweep the oracle checks, and eval answers
  * shorter than 8 words are not exact-match protectable anyway.
  */
object ContamGate {

  /** The gate's one table (build/refresh swap it atomically through
    * the ordinary commit path) — the family-consistent composition
    * surface ([[TextIndex.tables]]/[[AnnIndex.tables]]/
    * [[DedupIndex.tables]]): a maintenance job that vacuums or
    * snapshots "everything behind index X" enumerates through here. */
  def tables(idx: String): Seq[String] = Seq(gramsTable(idx))

  private def gramsTable(idx: String): String = s"${idx}_grams"

  /** The default suite tag — single-suite deployments never need to
    * name one. */
  val DefaultSuite = "suite0"

  /** One-time in-place migration of a gate written BEFORE suite
    * tagging (schema: `h` only): rewrite the gram table with every
    * digest under [[DefaultSuite]]. The digests carry over verbatim —
    * no benchmark text needed, which matters because the gate's owner
    * may not hold any. No-op on an already-tagged gate. */
  private def migrateIfLegacy(wh: Warehouse, idx: String): Unit = {
    val t = wh.table(gramsTable(idx))
    if (!t.columns.contains("suite"))
      wh.save(gramsTable(idx),
        t.select(lit(DefaultSuite).as("suite"), col("h")),
        clusterBy = Seq("h"))
  }

  /** The stored grams through the suite lens: a legacy (untagged)
    * gate reads as [[DefaultSuite]] rows, so read-only surfaces keep
    * working without the write-path migration. */
  private def storedGrams(wh: Warehouse, idx: String): DataFrame = {
    val t = wh.table(gramsTable(idx))
    if (t.columns.contains("suite")) t
    else t.select(lit(DefaultSuite).as("suite"), col("h"))
  }

  /** (doc_id, h): each doc's distinct word-8-gram digests — shared by
    * the build (suite side), verdicts (batch side), and
    * [[Curate.curate]]'s sweep, so none of them can disagree on
    * tokenization. */
  private[graft] def grams(docs: DataFrame): DataFrame =
    // per-doc dedup is ROW-LOCAL (Dedup.sortedGramDigests /
    // adjacentDistinct): the old explode-then-distinct() paid a full
    // digest-volume Exchange to dedup grams that never left their own
    // row (r17, guide §2.4). The digest set per doc is identical.
    docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 8)
      .select(col("doc_id"), explode(graft.functions.VectorFunctions
        .gramDigests(col("ts"), 8)).as("h"))

  /** Build the gate from the benchmark suite, tagged `suite`. Returns
    * distinct grams stored.
    *
    * REFUSES when `<idx>_grams` already exists (unless `overwrite`):
    * under the multi-suite model a re-build would silently destroy
    * every OTHER live suite's digests — a silent disarm of the
    * decontamination firewall. Suite management is additive
    * ([[refresh]]) and subtractive ([[retire]]); a whole-gate rebuild
    * is the explicit-flag exception, not a default. */
  def build(wh: Warehouse, idx: String, bench: DataFrame,
      suite: String = DefaultSuite, nFiles: Int = 4,
      overwrite: Boolean = false): Long = {
    require(overwrite || !wh.hasTable(gramsTable(idx)),
      s"ContamGate.build($idx): gate already exists — build would drop " +
        "every live suite's digests. Use refresh to add a suite, retire " +
        "to drop one, or pass overwrite = true to rebuild deliberately")
    val g = grams(bench).select(lit(suite).as("suite"), col("h"))
      .distinct().localCheckpoint()
    wh.save(gramsTable(idx), g.repartitionByRange(nFiles, col("h")),
      clusterBy = Seq("h"))
    g.count()
  }

  /** Admit a benchmark (a new version, or a whole new suite) into the
    * gate under `suite`: only (suite, h) rows the stored table does
    * not already hold are appended — replaying the same suite is a
    * no-op, and a gram ANOTHER suite already contributed still gains
    * this suite's own row (each live suite must carry its full digest
    * set, or retiring one suite could silently disarm another — see
    * [[retire]]). Returns gram rows added. */
  def refresh(wh: Warehouse, idx: String, bench: DataFrame,
      suite: String = DefaultSuite): Long = {
    migrateIfLegacy(wh, idx) // pre-tagging gates gain the suite column
    val fresh = grams(bench).select(lit(suite).as("suite"), col("h"))
      .distinct()
      .join(wh.table(gramsTable(idx)), Seq("suite", "h"), "left_anti")
      .localCheckpoint()
    val n = fresh.count()
    if (n > 0) wh.append(gramsTable(idx), fresh)
    n
  }

  /** Drop a deprecated suite from the gate: every gram row tagged
    * `suite` DV-deletes; digests a still-live suite shares keep
    * convicting through that suite's own rows, so retirement can never
    * disarm a live benchmark. Needs neither the suite text nor a
    * rebuild — the tag on the stored rows is the whole handle.
    * Returns gram rows dropped. */
  def retire(wh: Warehouse, idx: String, suite: String): Long = {
    migrateIfLegacy(wh, idx) // a legacy gate's grams retire as DefaultSuite
    wh.delete(gramsTable(idx), col("suite") === suite).rowsDeleted
  }

  /** The suites currently arming the gate, with their gram counts —
    * the inventory a retirement decision reads (a legacy gate reads
    * as one [[DefaultSuite]] entry). */
  def suites(wh: Warehouse, idx: String): DataFrame =
    storedGrams(wh, idx).groupBy("suite")
      .agg(count(lit(1)).as("grams")).orderBy("suite")

  /** Gate inventory — gram-row cardinality from the manifest
    * (DV-aware, so retirements subtract) plus the live-suite count
    * (one bounded pass over the 16-byte digest table — suite-sized by
    * construction). The ops surface behind `DESCRIBE CONTAM INDEX`;
    * per-suite detail is [[suites]]. */
  def describe(wh: Warehouse, idx: String): Seq[(String, String)] = {
    val gramRows = wh.countRows(gramsTable(idx))
      .map(_.toString).getOrElse("unknown")
    Seq(
      "gram_rows" -> gramRows,
      "gram_files" -> wh.describeDetail(gramsTable(idx)).toMap
        .getOrElse("numFiles", "unknown"),
      "suites" -> suites(wh, idx).count().toString)
  }

  /** Read-only gate consistency audit — the contamination firewall's
    * member of the `AUDIT … INDEX` family. The gate is ONE table of
    * (suite, h) digests, so its invariants are few but load-bearing:
    *
    *  - `digests`: no null suite tag or digest (a null digest row is
    *    dead weight that can never match; a null suite cannot be
    *    retired);
    *  - `distinct`: (suite, h) rows are unique — [[refresh]] is
    *    anti-join idempotent, so duplicates mean a broken advance;
    *    verdicts survive them (countDistinct) but every duplicate
    *    row streams past every future batch forever.
    *
    * Returns (check, status ok|error, subject, detail), errors first.
    * SQL: `AUDIT CONTAM INDEX idx`. */
  def audit(wh: Warehouse, idx: String): DataFrame = {
    val g = storedGrams(wh, idx)
    val spark = g.sparkSession
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, String)]
    val agg = g.agg(
      coalesce(sum(when(col("suite").isNull || col("h").isNull, 1L)
        .otherwise(0L)), lit(0L)),
      count(lit(1))).first()
    if (agg.getLong(0) > 0)
      out += (("digests", "error", "grams",
        s"${agg.getLong(0)} rows carry a null suite or digest"))
    else out += (("digests", "ok", "",
      s"${agg.getLong(1)} digest rows, none null"))
    val dups = g.groupBy("suite", "h").count()
      .filter(col("count") > 1).count()
    if (dups > 0)
      out += (("distinct", "error", "grams",
        s"$dups (suite, digest) pairs appear more than once — the " +
          "refresh anti-join is not holding"))
    else out += (("distinct", "ok", "", "every (suite, digest) is unique"))
    val sev = Map("error" -> 0, "ok" -> 1)
    out.sortBy(r => (sev(r._2), r._1, r._3)).toSeq
      .toDF("check", "status", "subject", "detail")
  }

  /** MAINTENANCE — the gate's OPTIMIZE: every [[refresh]] (a new
    * suite, or a new version of one) appends its delta digests as new
    * small files, and a [[retire]]d suite's DV-hollowed files linger;
    * [[Warehouse.compactSmall]] bin-packs only files under
    * `minFileRows` LIVE rows (so retirement debris folds too) and
    * re-establishes the digest clustering inside each rewritten file
    * — O(debris), sealed files byte-identical, verdicts unchanged.
    * Trigger signal: [[describe]]'s `gram_files`. */
  def optimize(wh: Warehouse, idx: String,
      targetRows: Long = 1L << 20,
      minFileRows: Long = 1L << 16): Seq[(String, Long)] = {
    val r = wh.compactSmall(gramsTable(idx), targetRows, minFileRows)
    Seq("gram_files_compacted" -> r.filesCompacted.toLong)
  }

  /** Judge a delivery batch against the stored suites: one row per
    * distinct batch doc_id — (doc_id, shared_grams, keep), keep = 1
    * iff NO row carrying that id shares an 8-gram with ANY live suite
    * (a batch with two texts under one id is judged on the UNION of
    * their grams — the conservative reading; a firewall must not let
    * a contaminated variant ride in behind a clean one).
    * `shared_grams` counts DISTINCT shared digests, so a gram that
    * two suites both carry convicts once — identical to the
    * pre-versioned gate and to d10's sweep. The batch's digests
    * broadcast onto the stored gram scan (the suites are bounded by
    * construction; the batch is delivery-sized), so the only exchange
    * is the batch-sized hit counts. The broadcast guard counts GRAM
    * rows, not docs — a batch of long documents fans out to tokens−7
    * grams each; past `maxBroadcastGrams` (default 1M ≈ tens of MB of
    * 16-byte digests) the plain hash join takes over, both sides
    * shuffling on the digest; verdicts identical either way. */
  def verdicts(wh: Warehouse, idx: String, batch: DataFrame,
      maxBroadcastGrams: Long = DefaultMaxBroadcastGrams,
      materialize: Boolean = false): DataFrame =
    if (materialize) {
      // MONITOR shape (opt-in): pin the batch's digests once, settle
      // the verdict frame EAGERLY into its own bounded pin (one row
      // per batch doc), release the gram pin before returning. A
      // long-lived monitor that holds verdict frames across triggers,
      // or a caller that consumes the frame repeatedly
      // ([[Curate.curateStored]]'s corpus sweep — its verdict pin is
      // still strictly smaller than the gram-sized tokens×16B pin it
      // replaced), accumulates only verdict-row-sized blocks
      // (ContextCleaner-collected once the frame drops), never
      // gram-sized ones. Callers inside a pinned pipeline
      // ([[Ingest.ingestBatch]]) use [[verdictsOn]] with their own
      // gram pin instead — one gram derivation per trigger.
      val bg = grams(batch.select("doc_id", "text")).localCheckpoint()
      try verdictsOn(wh, idx, batch, bg, bg.count(), maxBroadcastGrams)
        .localCheckpoint()
      finally { bg.unpersist(); () }
    } else {
      // SERVING shape (default): fully lazy, ZERO pins, ONE gram
      // derivation — a one-shot consumer ("is this delivery clean?")
      // evaluates the frame exactly once and must not pay an up-front
      // materialization + checkpoint write it never amortizes (the
      // r15 eager form put the gate lane ABOVE its
      // recompute-everything raw twin at sf0.1), nor a SECOND gram
      // pass just to size the first for the broadcast guard. The
      // join side is AQE's runtime decision instead: a
      // delivery-sized digest set converts to broadcast from its
      // MEASURED size, and an unexpectedly gram-heavy batch degrades
      // to a shuffle join rather than an executor OOM — the same
      // protection the count guard bought, for free.
      verdictTail(batch,
        wh.table(gramsTable(idx)).select("h")
          .join(grams(batch.select("doc_id", "text")), Seq("h")))
    }

  /** The broadcast-side row guard [[verdicts]]/[[verdictsBySuite]]
    * apply by default (~tens of MB of 16-byte digests). */
  val DefaultMaxBroadcastGrams = 1000000L

  /** [[verdicts]] from an EXTERNALLY-pinned batch-gram frame `bg`
    * (= [[grams]] of the batch, `nGrams` its count): the shared-pass
    * seam — a caller that also runs the [[blameOn]] lens derives the
    * grams ONCE per trigger and manages the pin itself. */
  private[graft] def verdictsOn(wh: Warehouse, idx: String,
      batch: DataFrame, bg: DataFrame, nGrams: Long,
      maxBroadcastGrams: Long = DefaultMaxBroadcastGrams): DataFrame = {
    val stored = wh.table(gramsTable(idx)).select("h")
    verdictTail(batch,
      if (nGrams <= maxBroadcastGrams)
        stored.join(broadcast(bg), Seq("h")) // stored streams, batch builds
      else stored.join(bg, Seq("h")))
  }

  /** The verdict shape over an already-joined (doc_id, h) hit frame —
    * shared by every join-side strategy (explicit broadcast off a
    * pinned count, AQE-decided on the lazy path) so they cannot
    * diverge on semantics. DISTINCT digests: a multi-suite gram must
    * convict once, not once per suite carrying it. */
  private def verdictTail(batch: DataFrame, joined: DataFrame)
      : DataFrame = {
    val hits = joined
      .groupBy("doc_id").agg(countDistinct(col("h")).as("shared_grams"))
    batch.select("doc_id").distinct()
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("shared_grams"), lit(0L)).as("shared_grams"),
        when(col("shared_grams").isNull, 1).otherwise(0).as("keep"))
  }

  /** The per-suite BLAME lens over the same probe: (doc_id, suite,
    * shared_grams) — one row per (convicted doc, convicting suite),
    * counting that suite's own shared digests. [[verdicts]] answers
    * keep/drop; this answers the production triage question a
    * multi-suite gate creates ("WHICH benchmark leaked into this
    * crawl?") — a contamination spike in the ingest ledger traces to
    * its suite here, and a [[retire]] decision can check what a
    * suite's rows are still convicting. Clean docs have no row (join
    * [[verdicts]] for the keep set). A doc two suites convict shows
    * BOTH rows — per-suite counts deliberately do NOT dedup a shared
    * gram across suites (each suite's count is its own evidence),
    * while [[verdicts]] keeps counting distinct digests so the
    * keep/drop boundary is unchanged. Same scale shape as verdicts:
    * batch digests broadcast (same gram-volume guard), stored grams
    * stream, only (doc, suite) counts exchange. */
  def verdictsBySuite(wh: Warehouse, idx: String, batch: DataFrame,
      maxBroadcastGrams: Long = DefaultMaxBroadcastGrams,
      materialize: Boolean = false): DataFrame =
    if (materialize) {
      // same opt-in pin discipline as [[verdicts]]: gram pin
      // released, bounded blame frame pinned in its place
      val bg = grams(batch.select("doc_id", "text")).localCheckpoint()
      try blameOn(wh, idx, bg, bg.count(), maxBroadcastGrams)
        .localCheckpoint()
      finally { bg.unpersist(); () }
    } else {
      // serving default: lazy, zero pins, one gram derivation,
      // AQE-decided join side ([[verdicts]]'s rationale)
      blameTail(storedGrams(wh, idx)
        .join(grams(batch.select("doc_id", "text")), Seq("h")))
    }

  /** [[verdictsBySuite]] from an externally-pinned gram frame — the
    * shared-pass twin of [[verdictsOn]]: [[Ingest.ingestBatch]]'s
    * blame-enabled trigger runs verdicts AND blame off ONE gram
    * derivation. */
  private[graft] def blameOn(wh: Warehouse, idx: String, bg: DataFrame,
      nGrams: Long,
      maxBroadcastGrams: Long = DefaultMaxBroadcastGrams): DataFrame = {
    val stored = storedGrams(wh, idx)
    blameTail(
      if (nGrams <= maxBroadcastGrams)
        stored.join(broadcast(bg), Seq("h"))
      else stored.join(bg, Seq("h")))
  }

  /** The blame shape over an already-joined hit frame — [[verdictTail]]'s
    * per-suite twin, shared by both join-side strategies. */
  private def blameTail(joined: DataFrame): DataFrame =
    joined
      .groupBy("doc_id", "suite")
      .agg(countDistinct(col("h")).as("shared_grams"))
      .orderBy("doc_id", "suite")
}
