package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("hash split is a pure function of the id: re-evaluation never moves a document") {
    val docs = Tables.documents(spark, sf)
    val a = docs.select(col("doc_id"), Sampling.splitLabel(col("doc_id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs.orderBy(desc("doc_id")) // different physical order
      .select(col("doc_id"), Sampling.splitLabel(col("doc_id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.values.toSet == Set("train", "val", "test"))
  }

  test("split proportions are near 90/5/5 and partition the corpus") {
    val counts = SparkEntry.queries("sp1_hash_split")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == Tables.documents(spark, sf).count())
    // md5 buckets are uniform; at n=500 allow generous slack
    assert(counts("train").toDouble / total > 0.8, s"train share off: $counts")
    assert(counts("val") > 0 && counts("test") > 0, s"empty stratum: $counts")
  }

  test("stratified sample keeps every language at ~the same rate") {
    val docs = Tables.documents(spark, sf)
    val sampled = SparkEntry.queries("sp2_stratified_sample")(spark, sf)
    val byLang = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every language present in the corpus large enough to sample
    totals.filter(_._2 >= 30).keys.foreach { l =>
      val rate = byLang.getOrElse(l, 0L).toDouble / totals(l)
      assert(rate > 0.0 && rate < 0.35, s"lang $l rate $rate far from 10%")
    }
  }

  test("token shards: contiguous per stratum, token mass conserved, non-final shards filled") {
    val shards = SparkEntry.queries("sp4_token_shards")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byLang = shards.groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val ids = rows.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.size).toSeq, s"$lang shards not contiguous: $ids")
      // every shard except the stratum's last must have crossed the
      // 10k-token boundary (else the next doc would have joined it)
      rows.filter(_._2 < ids.last).foreach { case (_, sid, _, toks) =>
        assert(toks >= 1, s"$lang shard $sid empty")
      }
    }
    val totalShardTokens = shards.map(_._4).sum
    val totalDocTokens = Tables.documents(spark, sf)
      .select(sum(size(split(trim(col("text")), "\\s+")).cast("long")))
      .head.getLong(0)
    assert(totalShardTokens == totalDocTokens, "token mass not conserved")
  }

  test("bucketing runs inside the scan stage — no shuffle, no UDF") {
    val df = Tables.documents(spark, sf)
      .filter(Sampling.hashBucket(col("doc_id")) < 10)
      .select("doc_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling shuffled:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLAppliedFunction"),
      s"udf in plan:\n$plan")
  }
}
