package graft

import graft.olist.Warehouse
import graft.olist.Warehouse.ColRange
import graft.operators.{Dedup, DedupIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Warehouse-maintained near-dup index: stored verdicts ≡ the batch
  * LSH sweep, exact incremental admission, exactly-once replay,
  * bucket-min recomputation on removal, bh-pruned segment reads. */
class DedupIndexSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def triples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toSet

  private def bucketState(wh: Warehouse, idx: String) =
    wh.table(s"${idx}_buckets").groupBy("bh")
      .agg(min("min_id").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("stored verdicts over the indexed corpus reproduce the batch LSH sweep exactly") {
    val wh = new Warehouse(spark, tmp("di1"))
    val docs = Tables.documents(spark, sf)
    assert(DedupIndex.build(wh, "di", docs) == docs.count())
    val stored = triples(DedupIndex.verdicts(wh, "di", docs))
    val batch = triples(Dedup.lshDedupAssign(docs))
    assert(stored == batch,
      s"stored ${stored.size} rows vs batch ${batch.size}")
  }

  test("admit is exact and exactly-once: two incremental batches ≡ the full-batch assignment; replay commits nothing; segments fold to the from-scratch build") {
    val wh = new Warehouse(spark, tmp("di2"))
    val whFull = new Warehouse(spark, tmp("di2f"))
    val docs = Tables.documents(spark, sf)
    val mx = docs.agg(max("doc_id")).first().getLong(0)
    val (s1, s2) = (mx / 3, 2 * mx / 3)
    DedupIndex.build(wh, "di", docs.filter(col("doc_id") <= s1))
    DedupIndex.build(whFull, "di", docs)
    val want = triples(Dedup.lshDedupAssign(docs))
    // id-ordered batches: each admit's verdicts must equal the full
    // sweep restricted to the batch — stored priors from earlier
    // batches, window priors within the batch
    val b2 = docs.filter(col("doc_id") > s1 && col("doc_id") <= s2)
    val b3 = docs.filter(col("doc_id") > s2)
    val v2 = triples(DedupIndex.admit(wh, "di", b2))
    assert(v2 == want.filter(t => t._1 > s1 && t._1 <= s2))
    val v3 = triples(DedupIndex.admit(wh, "di", b3))
    assert(v3 == want.filter(_._1 > s2))
    // no trained state: incrementally-admitted segments fold to
    // EXACTLY the from-scratch build's buckets
    assert(bucketState(wh, "di") == bucketState(whFull, "di"))
    // replayed batch: empty verdicts, zero commits on every table
    val pre = DedupIndex.tables("di").map(t => t -> wh.tableVersions(t))
    assert(DedupIndex.admit(wh, "di", b2).isEmpty)
    pre.foreach { case (t, v) =>
      assert(wh.tableVersions(t) == v, s"replay advanced $t")
    }
    // optimize folds segments + packs band debris without changing
    // answers; its counters account for both exactly
    val segsBefore = wh.table("di_buckets").count()
    val distinctBh = wh.table("di_buckets").select("bh").distinct().count()
    val bandFiles0 = DedupIndex.describe(wh, "di").toMap.apply("band_files").toInt
    val opt = DedupIndex.optimize(wh, "di", source = Some(docs)).toMap
    assert(opt("bucket_segments_folded") == segsBefore - distinctBh)
    assert(opt("tombstones_dropped") == 0L)
    assert(DedupIndex.describe(wh, "di").toMap.apply("band_files").toInt
      < bandFiles0, "band debris pack bought nothing")
    assert(wh.table("di_buckets").groupBy("bh")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).isEmpty)
    assert(triples(DedupIndex.verdicts(wh, "di", docs)) == want)
  }

  test("remove recomputes bucket mins: a removed bucket-min doc stops convicting, tombstones block re-admission, result ≡ a build without those docs") {
    val wh = new Warehouse(spark, tmp("di3"))
    val whRef = new Warehouse(spark, tmp("di3f"))
    val docs = Tables.documents(spark, sf)
    DedupIndex.build(wh, "di", docs)
    // remove the global min-id doc — it is by construction the min of
    // every bucket it sits in, the adversarial case for min recompute
    val victim = docs.agg(min("doc_id")).first().getLong(0)
    assert(DedupIndex.remove(wh, "di", Seq(victim)) == 1L)
    assert(wh.table("di_bands")
      .filter(col("doc_id") === victim).isEmpty)
    DedupIndex.build(whRef, "di", docs.filter(col("doc_id") =!= victim))
    val probe = docs.filter(col("doc_id") =!= victim)
    assert(triples(DedupIndex.verdicts(wh, "di", probe)) ==
      triples(DedupIndex.verdicts(whRef, "di", probe)),
      "shrunken index diverges from a build without the removed doc")
    // the tombstone blocks a later admit whose source still carries it
    assert(DedupIndex.admit(wh, "di", docs).isEmpty)
    assert(wh.table("di_bands").filter(col("doc_id") === victim).isEmpty,
      "removed doc resurrected by admit")
  }

  test("a small batch's segment read is bh-pruned to a few files") {
    val wh = new Warehouse(spark, tmp("di4"))
    val docs = Tables.documents(spark, sf)
    DedupIndex.build(wh, "di", docs, nFiles = 8)
    val (all, total) = wh.scanFileCounts("di_buckets", Nil)
    assert(total >= 4, s"expected several bucket files, got $total")
    // range-clustered by bh: a single bucket probe survives min/max +
    // bloom admission in only a couple of files
    val bh = wh.table("di_buckets").select("bh").first().getString(0)
    val (few, _) = wh.scanFileCounts("di_buckets",
      Seq(ColRange("bh", Some(bh), Some(bh))))
    assert(few <= math.max(2, total / 2),
      s"bucket probe read $few of $total files")
    assert(all == total)
  }

  test("foldTombstones: dead guards fold, admit still cannot resurrect") {
    val wh = new Warehouse(spark, tmp("di_fold"))
    val docs = Tables.documents(spark, sf)
    DedupIndex.build(wh, "di", docs)
    DedupIndex.remove(wh, "di", Seq(7L, 8L))
    assert(wh.table("di_gone").count() == 2)
    // both still in the source: live guards, nothing folds
    assert(DedupIndex.foldTombstones(wh, "di", docs) == 0)
    // the base forgets doc 7 -> its guard folds; 8's survives
    val shrunk = docs.filter(col("doc_id") =!= 7L)
    assert(DedupIndex.foldTombstones(wh, "di", shrunk) == 1)
    assert(wh.table("di_gone").collect().map(_.getLong(0)).toSeq
      == Seq(8L))
    // an admit over the shrunk source re-judges neither: 7 is absent,
    // 8 is tombstoned — the gate's membership stays shrunk
    assert(DedupIndex.admit(wh, "di", shrunk).isEmpty)
    assert(wh.table("di_bands")
      .filter(col("doc_id").isin(7L, 8L)).isEmpty)
  }

  test("audit: a maintained index is invariant-clean; a resurrected band row and a stale segment each surface as a named error") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmp("di_audit")).enableSql()
    val docs = Tables.documents(spark, sf)
    DedupIndex.build(wh, "di", docs.filter(col("doc_id") < 100))
    DedupIndex.admit(wh, "di", docs.filter(col("doc_id") < 300))
    DedupIndex.remove(wh, "di", Seq(5L, 6L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).toSeq
    val clean = rows(DedupIndex.audit(wh, "di"))
    assert(clean.nonEmpty && clean.forall(_._2 == "ok"), clean.toString)
    assert(clean.map(_._1).toSet ==
      Set("tombstones", "buckets_fold", "params"), clean.toString)
    val sql = spark.sql("AUDIT DEDUP INDEX di").collect()
    assert(sql.nonEmpty && sql.forall(_.getString(1) == "ok"),
      sql.mkString(", "))

    // a maintenance bug resurrects a removed doc's band row (its
    // bucket min ALSO now disagrees with the fold — two findings)
    val donorBh = wh.table("di_bands").select("bh").first().getString(0)
    wh.append("di_bands", Seq((5L, donorBh)).toDF("doc_id", "bh"))
    // and a stale segment survives for a bucket nobody banded
    wh.append("di_buckets",
      Seq(("zzzz_ghost_bucket", 17L)).toDF("bh", "min_id"))
    val res = rows(DedupIndex.audit(wh, "di"))
    assert(res.exists(r => r._1 == "tombstones" && r._2 == "error" &&
      r._4.contains("1 removed docs")), res.toString)
    assert(res.exists(r => r._1 == "buckets_fold" && r._2 == "error" &&
      r._3 == "stale"), res.toString)
    assert(res.head._2 == "error", res.toString)
  }
}
