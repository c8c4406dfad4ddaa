package graft.operators

import graft.olist.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintained NEAR-DUP index — the identity-retrieval third
  * of the stored-index family ([[TextIndex]] = sparse terms,
  * [[AnnIndex]] = dense vectors, this = near-duplicate identity): the
  * ingest dedup GATE. `Dedup.lshDedupAssign` is the right shape for a
  * one-shot batch sweep and the wrong one for admission control — a
  * 100 TB corpus cannot re-MinHash itself every time a delivery batch
  * asks "which of these have we already got?". This stores the LSH
  * neighborhood structure as ordinary warehouse tables and keeps it
  * current in O(delta):
  *
  *   `<idx>_bands`    (doc_id, bh)   ground-truth band membership —
  *                    drives admit's anti-join and the remove lane's
  *                    bucket recomputation; bh-range-clustered + bloom
  *   `<idx>_buckets`  (bh, min_id)   the serving cache as LSM-style
  *                    SEGMENTS (the [[TextIndex]] df precedent):
  *                    admit APPENDS one min row per delta bucket —
  *                    nothing rewritten — and a reader folds segments
  *                    with a null-skipping min; [[optimize]] collapses
  *                    accumulated segments. bh-clustered + bloomed so
  *                    a small batch's `bh IN (…)` probe file-skips.
  *   `<idx>_gone`     (doc_id)       removal tombstones — a remove()d
  *                    doc cannot be resurrected by a later admit whose
  *                    source still carries it
  *   `<idx>_meta`     (k, bands)     the FROZEN banding parameters
  *                    (the codebook analogue): every later batch must
  *                    band exactly like the build or verdicts are
  *                    meaningless, so they are read from the index,
  *                    never passed by callers.
  *
  * Verdict semantics are exactly [[Dedup.lshDedupAssign]]'s: dup_of =
  * the smallest doc id sharing ≥1 band bucket (strictly smaller —
  * stored state naturally includes the doc itself once admitted), and
  * dropped docs keep counting as priors (the transitive keep-first
  * policy, and the only one an 8-byte bucket min can answer). Like
  * BM25 — and unlike the ANN index's frozen-codebook drift — there is
  * no trained state beyond the banding params, so an incrementally
  * admitted index folds to EXACTLY the buckets of a from-scratch
  * build (asserted bit-for-bit in DedupIndexSpec).
  *
  * Serving reads never shuffle the index: the query batch's bands
  * BROADCAST onto the (possibly `bh IN`-pruned) segment scan, partial
  * mins fold map-side, and the only exchange is delta-sized (doc_id,
  * partial-min) rows. Single-maintainer contract as
  * [[TextIndex.refresh]].
  */
object DedupIndex {

  /** The index's moving tables — the unit every maintenance op swaps
    * atomically (`_meta` is write-once at build and excluded). */
  def tables(idx: String): Seq[String] =
    Seq(s"${idx}_bands", s"${idx}_buckets", s"${idx}_gone")

  private def banded(docs: DataFrame, k: Int, bands: Int): DataFrame =
    Dedup.bandedIds(docs, "doc_id", "text", k, bands)
      .select(col("id").as("doc_id"), col("bh"))

  private def params(wh: Warehouse, idx: String): (Int, Int) = {
    val r = wh.table(s"${idx}_meta").first()
    (r.getInt(0), r.getInt(1))
  }

  /** Build the index over `docs`. Returns docs indexed. */
  def build(wh: Warehouse, idx: String, docs: DataFrame,
      k: Int = 16, bands: Int = 4, nFiles: Int = 8): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    val b = banded(docs.dropDuplicates("doc_id"), k, bands)
      .localCheckpoint() // feeds bands, buckets, and the count
    wh.save(s"${idx}_bands", b.repartitionByRange(nFiles, col("bh")),
      clusterBy = Seq("bh"), bloomBy = Seq("bh"))
    wh.save(s"${idx}_buckets",
      b.groupBy("bh").agg(min("doc_id").as("min_id"))
        .repartitionByRange(nFiles, col("bh")),
      clusterBy = Seq("bh"), bloomBy = Seq("bh"))
    wh.save(s"${idx}_gone", b.select("doc_id").limit(0))
    wh.save(s"${idx}_meta", Seq((k, bands)).toDF("k", "bands"))
    b.select("doc_id").distinct().count()
  }

  /** The (possibly pruned) bucket-min segment scan for a query batch:
    * when the batch touches ≤ `maxInList` distinct buckets, an
    * explicit `bh IN (…)` lets the manifest's range+bloom stats skip
    * to the handful of files holding them (the [[TextIndex]] term-
    * probe shape); a big batch reads the segments flat — still only
    * (bh, min_id) pairs, never the corpus text. */
  private def prunedSegments(wh: Warehouse, idx: String, qb: DataFrame,
      maxInList: Int): DataFrame = {
    val segs = wh.table(s"${idx}_buckets")
    val bhs = qb.select("bh").distinct().limit(maxInList + 1)
      .collect().map(_.getString(0))
    if (bhs.length <= maxInList) segs.filter(col("bh").isin(bhs.toSeq: _*))
    else segs
  }

  /** Read-only dup check of a candidate batch against the INDEXED
    * corpus (the serving lane — "which of these do we already have?"):
    * one row per distinct query doc, (doc_id, dup_of, keep), judged
    * against stored state only (no intra-batch comparison — use
    * [[admit]] to also commit the batch). On docs that are themselves
    * indexed this reproduces [[Dedup.lshDedupAssign]] exactly (the
    * stored bucket min ≤ own id, and strictness excludes self). */
  def verdicts(wh: Warehouse, idx: String, docs: DataFrame,
      maxInList: Int = 1024): DataFrame = {
    val (k, nb) = params(wh, idx)
    // the band pin is RELEASED before returning (the bounded verdict
    // frame — one row per batch doc — is pinned in its place), so a
    // long-lived monitor calling this per trigger accumulates
    // verdict-row blocks, never MinHash-band-sized ones
    val qb = banded(docs.dropDuplicates("doc_id"), k, nb).localCheckpoint()
    try {
      val hits = prunedSegments(wh, idx, qb, maxInList)
        .join(broadcast(qb), Seq("bh")) // index side streams, batch builds
        .groupBy("doc_id")
        .agg(min(when(col("min_id") < col("doc_id"), col("min_id")))
          .as("dup_of"))
      qb.select("doc_id").distinct()
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("dup_of"),
          when(col("dup_of").isNull, 1).otherwise(0).as("keep"))
        .localCheckpoint()
    } finally { qb.unpersist(); () }
  }

  /** ALL convicting (bucket min, doc) pairs for the batch — the
    * pre-collapse edge set behind [[verdicts]] (which folds to the
    * single smallest `dup_of`). Per shared bucket the stored minimum
    * connects every member (a star over the bucket, which has exactly
    * the clique's connectivity), so connected components over these
    * edges reproduce the SWEEP's transitive-closure dup structure —
    * the ingredient [[Curate.curateStored]]'s component policy needs.
    * Returns distinct (d1 = convicting min, d2 = doc, d1 < d2); same
    * bh-pruned digests-only read path as verdicts. */
  def convictingPairs(wh: Warehouse, idx: String, docs: DataFrame,
      maxInList: Int = 1024): DataFrame = {
    val (k, nb) = params(wh, idx)
    // same pin discipline as [[verdicts]]: band pin released, the
    // bounded pair set pinned in its place
    val qb = banded(docs.dropDuplicates("doc_id"), k, nb).localCheckpoint()
    try prunedSegments(wh, idx, qb, maxInList)
      .join(broadcast(qb), Seq("bh"))
      .filter(col("min_id") < col("doc_id"))
      .select(col("min_id").as("d1"), col("doc_id").as("d2"))
      .distinct()
      .localCheckpoint()
    finally { qb.unpersist(); () }
  }

  /** The ingest GATE: judge every not-yet-seen doc of `docs` against
    * the stored corpus AND its own batch (intra-batch priors via the
    * st7 window — ties broken by ascending id), then commit the
    * batch's bands + one bucket-min segment atomically. Returns the
    * fresh docs' verdicts (already-admitted and tombstoned docs are
    * skipped — a replayed batch returns empty and commits NOTHING, so
    * at-least-once delivery composes to exactly-once admission, the
    * [[AnnIndex.streamRefresh]] argument). */
  def admit(wh: Warehouse, idx: String, docs: DataFrame,
      maxInList: Int = 1024): DataFrame = {
    val (qb, verdict) = gateVerdict(wh, idx, docs, maxInList)
    if (!qb.isEmpty) wh.transaction(tables(idx))(commitBatch(wh, idx, qb))
    verdict
  }

  /** [[admit]] without the transaction wrapper — for callers composing
    * the gate into a WIDER atomic unit ([[Ingest.ingestBatch]]); the
    * caller's transaction must declare [[tables]]. */
  private[operators] def admitBody(wh: Warehouse, idx: String,
      docs: DataFrame, maxInList: Int = 1024): DataFrame = {
    val (qb, verdict) = gateVerdict(wh, idx, docs, maxInList)
    if (!qb.isEmpty) commitBatch(wh, idx, qb)
    verdict
  }

  private def commitBatch(wh: Warehouse, idx: String,
      qb: DataFrame): Unit = {
    wh.append(s"${idx}_bands", qb)
    wh.append(s"${idx}_buckets",
      qb.groupBy("bh").agg(min("doc_id").as("min_id")))
  }

  /** The gate computation shared by [[admit]]/[[admitBody]]: fresh
    * docs' bands (pinned) and their verdicts (pinned BEFORE the state
    * advances under them). */
  private def gateVerdict(wh: Warehouse, idx: String, docs: DataFrame,
      maxInList: Int): (DataFrame, DataFrame) = {
    val (k, nb) = params(wh, idx)
    val fresh = docs.dropDuplicates("doc_id")
      .join(wh.table(s"${idx}_bands").select("doc_id"),
        Seq("doc_id"), "left_anti")
      .join(wh.table(s"${idx}_gone"), Seq("doc_id"), "left_anti")
    val qb = banded(fresh, k, nb).localCheckpoint() // delta-sized
    val w = Window.partitionBy("bh").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = qb.select(col("doc_id"),
      min("doc_id").over(w).as("prior"))
    val stored = prunedSegments(wh, idx, qb, maxInList)
      .join(broadcast(qb), Seq("bh"))
      .select(col("doc_id"),
        when(col("min_id") < col("doc_id"), col("min_id")).as("prior"))
    val verdict = intra.unionByName(stored)
      .groupBy("doc_id").agg(min("prior").as("dup_of"))
      .select(col("doc_id"), col("dup_of"),
        when(col("dup_of").isNull, 1).otherwise(0).as("keep"))
      .localCheckpoint()
    (qb, verdict)
  }

  /** Gate inventory from the manifest + frozen banding params — the
    * ops surface behind `DESCRIBE DEDUP INDEX`; no band file opened. */
  def describe(wh: Warehouse, idx: String): Seq[(String, String)] = {
    def rows(t: String) =
      wh.countRows(t).map(_.toString).getOrElse("unknown")
    def files(t: String) = wh.describeDetail(t).toMap
      .getOrElse("numFiles", "unknown")
    val (k, bands) = params(wh, idx)
    Seq(
      "minhash_k" -> k.toString,
      "bands" -> bands.toString,
      "band_rows" -> rows(s"${idx}_bands"),
      "band_files" -> files(s"${idx}_bands"),
      "bucket_segment_rows" -> rows(s"${idx}_buckets"),
      "bucket_segment_files" -> files(s"${idx}_buckets"),
      "tombstones" -> rows(s"${idx}_gone"))
  }

  /** Read-only index consistency audit — [[AnnIndex.audit]]'s
    * identity-retrieval sibling. Like BM25 (and unlike the ANN
    * index's frozen-codebook drift) there is no trained state beyond
    * the banding params, so every check is a hard equality over one
    * consistent snapshot cut; each is a skinny aggregate (ids, band
    * hashes — never text):
    *
    *  - `tombstones`: bands ∩ gone = ∅ ([[removeBody]] deletes the
    *    rows and [[admit]] anti-joins the guard — an id on both sides
    *    means a REMOVED doc still counts as a dedup prior);
    *  - `buckets_fold`: the segment table's null-skipping per-bucket
    *    min folds to EXACTLY the ground-truth min over the bands
    *    table, bucket-for-bucket in both directions (a stale segment
    *    surviving a remove's recompute, or a bucket the fold lost,
    *    silently flips admit verdicts);
    *  - `params`: the frozen (k, bands) are positive — every later
    *    batch must band exactly like the build.
    *
    * Returns (check, status ok|error, subject, detail), errors first.
    * SQL: `AUDIT DEDUP INDEX idx`. */
  def audit(wh: Warehouse, idx: String): DataFrame = {
    val names = tables(idx) ++
      (if (wh.hasTable(s"${idx}_meta")) Seq(s"${idx}_meta") else Nil)
    val snap = wh.snapshotTables(names)
    val read: String => DataFrame = snap(_)
    val spark = read(s"${idx}_bands").sparkSession
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, String)]
    def ok(check: String, detail: String): Unit =
      out += ((check, "ok", "", detail))
    def errF(check: String, subject: String, detail: String): Unit =
      out += ((check, "error", subject, detail))
    // 1. the tombstone invariant
    val served = read(s"${idx}_bands").select("doc_id").distinct()
      .join(read(s"${idx}_gone"), Seq("doc_id"), "left_semi").count()
    if (served > 0)
      errF("tombstones", "bands",
        s"$served removed docs still hold band rows — removed docs " +
          "would count as dedup priors")
    else ok("tombstones", "no removed doc holds a band row")
    // 2. segment fold ≡ ground truth, both directions, one aggregate
    val truth = read(s"${idx}_bands").groupBy("bh")
      .agg(min(col("doc_id")).as("t_min"))
    val folded = read(s"${idx}_buckets").groupBy("bh")
      .agg(min(col("min_id")).as("f_min"))
    val agg = truth.join(folded, Seq("bh"), "full_outer").agg(
      coalesce(sum(when(col("f_min").isNull, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("t_min").isNull, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("t_min").isNotNull && col("f_min").isNotNull &&
        col("t_min") =!= col("f_min"), 1L).otherwise(0L)), lit(0L)),
      count(lit(1))).first()
    var foldBad = 0
    if (agg.getLong(0) > 0) {
      foldBad += 1
      errF("buckets_fold", "missing",
        s"${agg.getLong(0)} buckets hold band rows but fold to no " +
          "segment min — admits there would miss their prior")
    }
    if (agg.getLong(1) > 0) {
      foldBad += 1
      errF("buckets_fold", "stale",
        s"${agg.getLong(1)} segment buckets have no band rows — a " +
          "remove's recompute left stale mins that convict against " +
          "ghosts")
    }
    if (agg.getLong(2) > 0) {
      foldBad += 1
      errF("buckets_fold", "wrong_min",
        s"${agg.getLong(2)} buckets fold to a different min than the " +
          "band ground truth")
    }
    if (foldBad == 0)
      ok("buckets_fold", s"${agg.getLong(3)} buckets fold to their " +
        "ground-truth mins exactly")
    // 3. frozen banding params
    val (k, bands) = params(wh, idx)
    if (k >= 1 && bands >= 1)
      ok("params", s"(k = $k, bands = $bands)")
    else errF("params", "meta", s"non-positive banding params " +
      s"(k = $k, bands = $bands)")
    val sev = Map("error" -> 0, "ok" -> 1)
    out.sortBy(r => (sev(r._2), r._1, r._3)).toSeq
      .toDF("check", "status", "subject", "detail")
  }

  /** MAINTENANCE: fold removal tombstones whose doc the CURRENT base
    * `source` no longer carries — the [[TextIndex.foldTombstones]]
    * twin (same dead-guard argument: once the base dropped the doc, no
    * admit/refresh source can resurrect it, and the tombstone only
    * bloats the gate's freshness anti-join). Returns tombstones
    * dropped. */
  def foldTombstones(wh: Warehouse, idx: String,
      source: DataFrame): Long =
    IndexMaintenance.foldGone(wh, s"${idx}_gone", "doc_id", source)

  /** Un-index documents (the right-to-be-forgotten lane): DV-deletes
    * their band rows, tombstones the ids, and RECOMPUTES the affected
    * buckets' mins from the surviving membership — a removed doc may
    * BE a bucket's min, and without recomputation it would keep
    * convicting future arrivals from beyond the grave. O(|ids| ×
    * bands) buckets touched; everything moves in one cross-table
    * transaction. Returns docs removed. */
  def remove(wh: Warehouse, idx: String, ids: Seq[Long]): Long = {
    require(ids.nonEmpty, "remove: empty id list")
    wh.transaction(tables(idx))(removeBody(wh, idx, ids))
  }

  /** [[remove]]'s body without the transaction wrapper — for callers
    * composing the un-index into a WIDER atomic unit
    * ([[Forget.forgetDocs]]); the caller's transaction must declare
    * [[tables]]. */
  private[operators] def removeBody(wh: Warehouse, idx: String,
      ids: Seq[Long]): Long = {
    {
      val doomed = wh.table(s"${idx}_bands")
        .filter(col("doc_id").isin(ids: _*)).localCheckpoint()
      val spark0 = doomed.sparkSession
      import spark0.implicits._
      wh.append(s"${idx}_gone", ids.distinct.toDF("doc_id")
        .join(wh.table(s"${idx}_gone"), Seq("doc_id"), "left_anti"))
      val bhs = doomed.select("bh").distinct().as[String].collect().toSeq
      val n = doomed.select("doc_id").distinct().count()
      if (bhs.nonEmpty) {
        // survivors computed from the PRE-delete snapshot (minus the
        // doomed ids) so nothing depends on in-transaction read order
        val survivors = wh.table(s"${idx}_bands")
          .filter(col("bh").isin(bhs: _*) && !col("doc_id").isin(ids: _*))
          .groupBy("bh").agg(min("doc_id").as("min_id"))
          .localCheckpoint()
        wh.delete(s"${idx}_bands", col("doc_id").isin(ids: _*))
        wh.delete(s"${idx}_buckets", col("bh").isin(bhs: _*))
        wh.append(s"${idx}_buckets", survivors)
      }
      n
    }
  }

  /** MAINTENANCE — this index's OPTIMIZE, three independent atomic
    * steps none of which changes any verdict (cf.
    * [[TextIndex.optimize]]):
    *
    *   1. BUCKET SEGMENT FOLD: accumulated bucket-min segments back
    *      to one row per bucket, range clustering restored — a reader
    *      folds segments with min either way, so the fold's output
    *      answers identically. Idempotent.
    *   2. BAND DEBRIS PACK: every [[admit]] appends its batch's bands
    *      as new small files; [[Warehouse.compactSmall]] bin-packs
    *      only files under `minFileRows` live rows and re-establishes
    *      the bh clustering + bloom inside each — O(debris), sealed
    *      files byte-identical.
    *   3. TOMBSTONE FOLD (when `source` is given):
    *      [[foldTombstones]].
    *
    * Trigger signals: [[describe]]'s `*_files`,
    * `bucket_segment_rows`, and `tombstones`. Returns per-step
    * counters. */
  def optimize(wh: Warehouse, idx: String, nFiles: Int = 8,
      targetRows: Long = 1L << 20, minFileRows: Long = 1L << 16,
      source: Option[DataFrame] = None): Seq[(String, Long)] = {
    val bkT = s"${idx}_buckets"
    def bkFiles(): Int = wh.describeDetail(bkT).toMap
      .get("numFiles").flatMap(_.toIntOption).getOrElse(0)
    // the WHOLE read-fold-overwrite inside one transaction over the
    // bucket table (the [[TextIndex.optimize]] df discipline): the
    // table lock serializes against a concurrent admit/remove — a
    // bucket-min segment committed between the fold's read and its
    // overwrite erased would let that batch's duplicates re-admit
    // later, and a remove()'s recomputed survivor min clobbered from
    // a stale pin would resurrect a forgotten doc's id as a bucket
    // min. Rewrite fires on foldable segments OR debris files beyond
    // the fold layout (all-new-bucket admits add files without
    // duplicate segments); output is always the build's range-split
    // layout; an already-folded, already-packed table is rewritten by
    // neither trigger (idempotent re-runs).
    val (segsBefore, segsAfter, bkPacked) = wh.transaction(Seq(bkT)) {
      val before = wh.countRows(bkT).getOrElse(wh.table(bkT).count())
      val filesBefore = bkFiles()
      val folded = wh.table(bkT)
        .groupBy("bh").agg(min("min_id").as("min_id"))
        .localCheckpoint() // pinned: the save replaces its own input
      try {
        val n = folded.count()
        if (n < before || filesBefore > nFiles)
          wh.save(bkT, folded.repartitionByRange(nFiles, col("bh")),
            clusterBy = Seq("bh"), bloomBy = Seq("bh"))
        (before, n, math.max(0, filesBefore - bkFiles()))
      } finally { folded.unpersist(); () }
    }
    val bands = wh.compactSmall(s"${idx}_bands", targetRows, minFileRows)
    val gone = source.map(foldTombstones(wh, idx, _)).getOrElse(0L)
    Seq(
      "bucket_segments_folded" -> (segsBefore - segsAfter),
      "bucket_files_compacted" -> bkPacked.toLong,
      "band_files_compacted" -> bands.filesCompacted.toLong,
      "tombstones_dropped" -> gone)
  }
}
