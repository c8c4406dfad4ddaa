package graft.operators

import graft.olist.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared maintenance for the stored indexes' removal-tombstone
  * tables (`<idx>_gone` in [[TextIndex]], [[AnnIndex]],
  * [[DedupIndex]]).
  *
  * A tombstone's ONLY job is the resurrection guard: after a
  * right-to-be-forgotten [[TextIndex.remove]] (et al.), the next
  * refresh's source may still carry the removed doc — the anti-join
  * against `_gone` is what keeps it out. But once the BASE data
  * itself no longer carries the id, the guard protects nothing, and
  * without a fold the tombstone list grows monotonically: a year of
  * deletion traffic makes every refresh's anti-join (and every gate's
  * freshness probe) scan a year of dead ids forever. [[foldGone]] is
  * the bounded-state answer: drop exactly the tombstones whose id is
  * absent from the current source — the ones that can no longer be
  * resurrected — and keep the rest.
  *
  * Scale shape: one anti-join of the tombstone list against the
  * source's id column (ids only — the source's payload columns are
  * never read), one rewrite of the tombstone table, O(live
  * tombstones) rows written. The rewrite commits atomically through
  * the ordinary manifest swap; a crash leaves the previous complete
  * tombstone list, never a partial one (the safe direction — an
  * unfolded tombstone is wasted bytes, a LOST one is a resurrection).
  *
  * CALLER CONTRACT — `source` must be the index's REFRESH SOURCE:
  * the frame (or a superset of every frame) future refresh/admit
  * calls will be driven from. The dead-guard judgment is only sound
  * against what can actually arrive later. In a STREAMING ingest
  * composition the refresh source is future deliveries — NOT the
  * base table (after a [[Forget.forgetDocs]] the base no longer
  * carries the forgotten doc, so a base-sourced fold would drop its
  * guard and the next replayed delivery would silently resurrect
  * it); fold a stream's tombstones only against an upstream
  * retention boundary the caller can assert, which is why
  * [[Ingest.optimize]] deliberately folds none.
  */
private[operators] object IndexMaintenance {

  /** Drop tombstones in `goneTable` whose `idCol` no longer appears in
    * `source`; keep (verbatim) those the source still carries. The
    * surviving list is pinned before the overwrite so the rewrite
    * never reads the table it is replacing.
    *
    * The whole read-modify-write runs inside ONE transaction over the
    * tombstone table: its table lock serializes against a concurrent
    * `remove()` (whose own transaction declares the same table), so a
    * tombstone appended between the survivor pin and the overwrite can
    * never be clobbered — a lost tombstone would be a silent
    * resurrection path, the one direction this maintenance must never
    * fail in. Returns tombstones dropped. */
  def foldGone(wh: Warehouse, goneTable: String, idCol: String,
      source: DataFrame): Long =
    wh.transaction(Seq(goneTable)) {
      val gone = wh.table(goneTable)
      val before = gone.count()
      if (before == 0) 0L
      else {
        val keep = gone
          .join(source.select(idCol).distinct(), Seq(idCol), "left_semi")
          .localCheckpoint() // bounded by live tombstones; pinned so the
                             // save below never reads its own target
        try {
          val after = keep.count()
          if (after < before) wh.save(goneTable, keep)
          before - after
        } finally { keep.unpersist(); () }
      }
    }
}
