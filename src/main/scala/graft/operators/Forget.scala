package graft.operators

import graft.olist.Warehouse
import org.apache.spark.sql.functions._

/** Whole-corpus right-to-be-forgotten: one erasure request must leave
  * the document UNREACHABLE everywhere it is materialized — the base
  * table AND every derived retrieval structure — or nowhere. The
  * per-index `remove` ops each guarantee their own atomicity; a
  * deletion pipeline that chains them leaves a crash window where the
  * base row is gone but a BM25/ANN probe still surfaces the id (or
  * vice versa). [[forgetDocs]] closes that window with the cross-table
  * transaction machinery: the base delete, the inverted-index
  * un-index (postings/doclen/df/stats/tombstone — five tables), and
  * the ANN un-index (codes DV-delete + tombstone) all land under ONE
  * parent commit marker. Readers see the pre-erasure world or the
  * post-erasure world, never a half.
  *
  * Scale shape: everything here is point-surgery — IN-list pruned
  * probes, DV sidecars for the deleted positions, additive df
  * decrement segments. Cost is O(requested ids × their files), not
  * O(corpus). Idempotent: re-running a forget (crash-retry, duplicate
  * requests) is a no-op — tombstones dedup, deletes match nothing.
  */
object Forget {

  /** Per-structure erasure counts of one [[forgetDocs]] run. */
  final case class ForgetResult(baseRows: Long,
      textIndexDocs: Map[String, Long], annIndexVecs: Map[String, Long],
      dedupIndexDocs: Map[String, Long] = Map.empty)

  /** Erase `ids` from `table` (matched on `idCol`) and un-index them
    * from the named [[TextIndex]]es and [[AnnIndex]]es, atomically.
    * ANN indexes match on `vec_id` = the same ids (the corpus
    * convention: embeddings carry their document's id). */
  def forgetDocs(wh: Warehouse, table: String, ids: Seq[Long],
      textIdx: Seq[String] = Nil, annIdx: Seq[String] = Nil,
      dedupIdx: Seq[String] = Nil,
      idCol: String = "doc_id"): ForgetResult = {
    require(ids.nonEmpty, "forgetDocs: empty id list")
    val names = (Seq(table) ++ textIdx.flatMap(TextIndex.tables)
      ++ annIdx.flatMap(AnnIndex.tables)
      ++ dedupIdx.flatMap(DedupIndex.tables)).distinct
    wh.transaction(names) {
      // derived structures first, base last — the order is invisible
      // (one commit point) but keeps partial-failure debris harmless
      // if the body ever dies mid-flight: staged versions roll back,
      // and a retry re-runs against the untouched snapshot
      val ti = textIdx.map(i =>
        i -> TextIndex.removeBody(wh, i, ids)).toMap
      val ai = annIdx.map(i =>
        i -> AnnIndex.removeBody(wh, i, ids)).toMap
      // the dedup GATE's memory is derived from the doc's text too —
      // an erasure that leaves its band membership behind would keep
      // convicting lookalikes on the forgotten doc's behalf
      val di = dedupIdx.map(i =>
        i -> DedupIndex.removeBody(wh, i, ids)).toMap
      val base = wh.delete(table, col(idCol).isin(ids: _*)).rowsDeleted
      ForgetResult(base, ti, ai, di)
    }
  }
}
