package graft

import graft.olist.Warehouse
import graft.operators.{AnnIndex, Forget, TextAnalysis, TextIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-corpus right-to-be-forgotten: base table + inverted index +
  * ANN index erased in ONE atomic transaction; failure rolls all of
  * them back; re-runs are no-ops.
  */
class ForgetSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fixture(): (Warehouse, Long) = {
    val wh = new Warehouse(spark, tmp("forget"))
    val docs = Tables.documents(spark, sf)
    wh.save("docs", docs, clusterBy = Seq("doc_id"))
    TextIndex.build(wh, "ti", docs)
    // embeddings carry vec_id = the document's id (corpus convention)
    AnnIndex.build(wh, "ann", Tables.embeddings(spark, sf))
    (wh, docs.count())
  }

  test("one forget erases the doc from base, BM25, and ANN — atomically") {
    val (wh, n) = fixture()
    // pick victims that BOTH retrieval paths can surface: the top BM25
    // hit and a vector near the ANN probe's query
    val topDoc = TextIndex.query(wh, "ti", TextAnalysis.bm25Query, 1)
      .collect()(0).getLong(0)
    val nearVec = AnnIndex.query(wh, "ann",
        Tables.embeddings(spark, sf), queryId = 0L, topK = 5)
      .collect().map(_.getLong(0)).filter(_ != 0L).head
    val ids = Seq(topDoc, nearVec).distinct
    val r = Forget.forgetDocs(wh, "docs", ids,
      textIdx = Seq("ti"), annIdx = Seq("ann"))
    assert(r.baseRows == ids.size)
    assert(r.textIndexDocs("ti") == ids.size)
    assert(r.annIndexVecs("ann") >= 1L)
    // unreachable everywhere
    assert(wh.table("docs").filter(col("doc_id").isin(ids: _*)).count() == 0)
    assert(wh.countRows("docs").contains(n - ids.size))
    val bm25 = TextIndex.query(wh, "ti", TextAnalysis.bm25Query, 50)
      .collect().map(_.getLong(0)).toSet
    assert(ids.forall(!bm25.contains(_)))
    val ann = AnnIndex.query(wh, "ann", Tables.embeddings(spark, sf),
        queryId = 0L, topK = 10).collect().map(_.getLong(0)).toSet
    assert(ids.forall(!ann.contains(_)))
    // shrunken inverted index still EXACT: equals a from-scratch build
    // over the surviving docs (BM25 has no trained state)
    val whRef = new Warehouse(spark, tmp("forget_ref"))
    TextIndex.build(whRef, "ti",
      Tables.documents(spark, sf).filter(!col("doc_id").isin(ids: _*)))
    val a = TextIndex.query(wh, "ti", TextAnalysis.bm25Query, 20)
      .collect().map(r0 => (r0.getLong(0), r0.getDouble(2))).toSeq
    val b = TextIndex.query(whRef, "ti", TextAnalysis.bm25Query, 20)
      .collect().map(r0 => (r0.getLong(0), r0.getDouble(2))).toSeq
    assert(a == b)
    // idempotent: the retry path (crash recovery, duplicate requests)
    val r2 = Forget.forgetDocs(wh, "docs", ids,
      textIdx = Seq("ti"), annIdx = Seq("ann"))
    assert(r2.baseRows == 0L && r2.textIndexDocs("ti") == 0L &&
      r2.annIndexVecs("ann") == 0L)
  }

  test("a failing forget rolls back EVERY structure — no half-erasure") {
    val (wh, n) = fixture()
    val ids = Seq(1L, 2L)
    val preVersions = (Seq("docs") ++ Seq("ti_postings", "ti_doclen",
      "ti_df", "ti_stats", "ti_gone", "ann_codes", "ann_gone"))
      .map(t => t -> wh.tableVersions(t).last).toMap
    // undeclared table inside the body → the transaction machinery
    // itself throws after the tombstone append already staged a write
    // (the forget shape: index writes first, base delete second)
    import spark.implicits._
    intercept[Exception] {
      wh.transaction(Seq("ti_gone")) {
        wh.append("ti_gone", ids.toDF("doc_id"))
        wh.delete("docs", col("doc_id").isin(ids: _*)) // undeclared!
      }
    }
    // every structure back at its pre-transaction version, content intact
    preVersions.foreach { case (t, v) =>
      assert(wh.tableVersions(t).last == v, s"$t moved")
    }
    assert(wh.table("docs").filter(col("doc_id").isin(ids: _*)).count()
      == ids.size)
    assert(wh.countRows("docs").contains(n))
    assert(wh.table("ti_gone").count() == 0)
    val doclen = wh.table("ti_doclen")
      .filter(col("doc_id").isin(ids: _*)).count()
    assert(doclen == ids.size, "ti membership must be untouched")
  }

  test("forget erases the dedup gate's memory too — a forgotten doc stops convicting lookalikes") {
    import graft.operators.DedupIndex
    val (wh, _) = fixture()
    val docs = Tables.documents(spark, sf)
    DedupIndex.build(wh, "di", docs)
    // victim: the corpus min-id doc — a bucket min everywhere it
    // lands, so its ghost would convict every future lookalike
    val victim = docs.agg(min("doc_id")).first().getLong(0)
    val vtext = docs.filter(col("doc_id") === victim)
      .select("text").first().getString(0)
    val spark0 = spark; import spark0.implicits._
    val lookalike = Seq((900000L, vtext)).toDF("doc_id", "text")
    val r = Forget.forgetDocs(wh, "docs", Seq(victim),
      textIdx = Seq("ti"), annIdx = Seq("ann"), dedupIdx = Seq("di"))
    assert(r.baseRows == 1L && r.dedupIndexDocs("di") == 1L)
    assert(wh.table("di_bands")
      .filter(col("doc_id") === victim).isEmpty)
    // the lookalike's verdict must come from the SURVIVORS only —
    // identical to an index that never held the victim
    val whRef = new Warehouse(spark, tmp("forget_di_ref"))
    DedupIndex.build(whRef, "di",
      docs.filter(col("doc_id") =!= victim))
    val got = DedupIndex.verdicts(wh, "di", lookalike).collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)), x.getInt(2)))
    val want = DedupIndex.verdicts(whRef, "di", lookalike).collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)), x.getInt(2)))
    assert(got.sameElements(want),
      s"ghost conviction: ${got.toSeq} vs ${want.toSeq}")
    assert(got.forall(_._2 != Some(victim)),
      "forgotten doc still named as dup_of")
  }
}
