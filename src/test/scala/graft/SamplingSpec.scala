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

  test("epochShuffle: per-epoch permutations reproduce exactly and decorrelate across epochs") {
    val orders = Tables.orders(spark, sf)
    def prefix(epoch: Int): Seq[Long] =
      Sampling.epochShuffle(orders, "o_orderkey", epoch, 200)
        .collect().map(_.getLong(0)).toSeq
    val e1 = prefix(1)
    // reproducible: same epoch, different physical order → same sequence
    val e1b = Sampling.epochShuffle(orders.orderBy(desc("o_orderkey")),
      "o_orderkey", 1, 200).collect().map(_.getLong(0)).toSeq
    assert(e1 == e1b, "epoch order must be layout-independent")
    // decorrelated: a different epoch is a genuinely different
    // permutation (md5 avalanche) — tiny prefix overlap, never equal
    val e2 = prefix(2)
    assert(e1 != e2)
    assert((e1.toSet intersect e2.toSet).size < e1.size / 2,
      "epochs must decorrelate, not just rotate")
    // the order-by-hash prefix plans bounded (TakeOrderedAndProject),
    // never a global sort — sp5's scale shape
    val plan = Sampling.epochShuffle(orders, "o_orderkey", 3, 200)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("epochShards: concatenating shards replays the global permutation; membership is layout-stable; no global sort") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val es = Sampling.epochShards(orders, "o_orderkey",
      epoch = 2, nShards = 8)
    val rows = es.collect()
      .map(r => (r.getLong(3), r.getInt(4), r.getString(2), r.getLong(0)))
    // shard ids live in [0, 8); within-shard positions are 1..|shard|
    assert(rows.map(_._1).toSet.subsetOf((0L until 8L).toSet))
    rows.groupBy(_._1).foreach { case (s, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.size),
        s"shard $s positions not contiguous")
    }
    // (shard, pos) lexicographic order IS the global (h, id) order —
    // the dataloader reads shard files in sequence and replays the
    // exact epoch permutation sp12 defines
    val byShardPos = rows.sortBy(t => (t._1, t._2)).map(t => (t._3, t._4))
    val global = rows.sortBy(t => (t._3, t._4)).map(t => (t._3, t._4))
    assert(byShardPos.toSeq == global.toSeq,
      "shard concatenation must equal the global permutation")
    // membership is a pure function of (epoch, id): a different
    // physical layout assigns identical (shard, pos)
    val re = Sampling.epochShards(orders.orderBy(desc("o_orderkey")),
      "o_orderkey", epoch = 2, nShards = 8)
      .select("o_orderkey", "shard", "pos").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val first = rows.map(t => t._4 -> ((t._1, t._2))).toMap
    assert(re == first, "shard/pos must be layout-independent")
    // scale shape: one hash exchange on the shard key, per-shard local
    // sorts — NO global Sort anywhere in the executed plan (sampled
    // range boundaries would also un-reproduce membership)
    es.write.format("noop").mode("overwrite").save()
    val sorts = es.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(sorts.isEmpty, s"global sort in epochShards plan:\n$sorts")
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

  test("temporal split: every user's holdout events are strictly after their train events") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // the leakage-free property sp6 exists for: per user, no train
    // event may be later (by the (us, event_id) order) than any
    // holdout event
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("us"))
    val byUser = Window.partitionBy("user_id")
    val split = e
      .withColumn("rn",
        row_number().over(byUser.orderBy(col("us"), col("event_id"))))
      .withColumn("cnt", count(lit(1)).over(byUser))
      .withColumn("split", when(col("rn") * 5 <= col("cnt") * 4, "train")
        .otherwise("holdout"))
    val bounds = split.groupBy("user_id").agg(
      max(when(col("split") === "train", struct(col("us"), col("event_id"))))
        .as("last_train"),
      min(when(col("split") === "holdout", struct(col("us"), col("event_id"))))
        .as("first_holdout"))
    val leaks = bounds.filter(col("last_train").isNotNull &&
      col("first_holdout").isNotNull &&
      !(col("last_train") < col("first_holdout"))).count()
    assert(leaks == 0, s"$leaks users have train events after holdout")
    // ~80/20 overall, and every multi-event user contributes to train
    val frac = split.filter(col("split") === "train").count().toDouble /
      split.count()
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    assert(split.filter(col("cnt") >= 1 && col("split") === "train")
      .select("user_id").distinct().count() ==
      split.select("user_id").distinct().count(),
      "a user has no train events at all")
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

  test("dsir: target-vocabulary docs outweigh off-target docs and exactly ⌈frac·N⌉ are selected") {
    import spark.implicits._
    // target slice speaks {alpha beta gamma}; the raw rest speaks
    // {xray yankee zulu}; two UNLABELED probes speak one vocabulary
    // each — DSIR must rank the target-sounding probe far higher
    val docs = (
      (0 until 20).map(i => (i.toLong, "alpha beta gamma alpha beta", "en")) ++
      (20 until 80).map(i => (i.toLong, "xray yankee zulu xray yankee", "xx")) ++
      Seq((100L, "alpha beta gamma beta alpha", "xx"),
          (101L, "xray yankee zulu yankee zulu", "xx"))
    ).toDF("doc_id", "text", "lang")
    val got = Sampling.dsirSelect(docs, col("lang") === "en", 0.25)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getInt(4)))).toMap
    assert(got(100L)._1 > got(101L)._1 + 1.0,
      s"target-vocab probe not favored: ${got(100L)._1} vs ${got(101L)._1}")
    val nSel = got.values.count(_._2 == 1)
    assert(nSel == math.ceil(0.25 * 82).toInt, s"selected $nSel")
    // determinism: a repartitioned rerun selects the same set
    val again = Sampling.dsirSelect(docs.repartition(7), col("lang") === "en", 0.25)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(got.view.mapValues(_._2).toMap == again)
  }

  test("source cap: at most N kept per group, under-cap groups untouched, membership is layout-stable and monotone under growth") {
    import spark.implicits._
    val docs = ((0 until 40).map(i => (i.toLong, s"d$i", "big")) ++
      (100 until 103).map(i => (i.toLong, s"d$i", "small")))
      .toDF("doc_id", "text", "source")
    val got = Sampling.sourceCap(docs, col("source"), 15)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3))))
    val kept = got.filter(_._2._3 == 1)
    assert(kept.count(_._2._1 == "big") == 15)
    assert(kept.count(_._2._1 == "small") == 3) // under cap: all kept
    // ranks are a permutation of 1..groupSize
    assert(got.filter(_._2._1 == "big").map(_._2._2).sorted.toSeq == (1 to 40))
    // layout independence
    val again = Sampling.sourceCap(docs.repartition(5), col("source"), 15)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got.map(kv => kv._1 -> kv._2._3).toMap == again)
    // monotone under growth: adding docs to a group never evicts more
    // than the overflow — keys already in the top-N stay unless a new
    // doc hashes below them; with the SAME first 40 ids plus 10 more,
    // the kept set is the 15 smallest keys of the union
    val grown = ((0 until 50).map(i => (i.toLong, s"d$i", "big")))
      .toDF("doc_id", "text", "source")
    val keptBefore = kept.filter(_._2._1 == "big").map(_._1).toSet
    val keptAfter = Sampling.sourceCap(grown, col("source"), 15)
      .collect().filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
    assert((keptBefore intersect keptAfter).size >= 5)
    assert(keptAfter.size == 15)
  }

  test("sequence packing: contiguous per-group token stream, spans counted exactly, layout-independent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "en"), (2L, ("w " * 100).trim, "en"),
      (3L, "x y", "en"), (4L, "p q r s", "pt"), (5L, ("z " * 70).trim, "pt"))
      .toDF("doc_id", "text", "lang")
    val got = Sampling.packSequences(docs, col("lang"), 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // per group: starts are a contiguous prefix-sum chain (no gaps, no
    // overlap) and the chain covers exactly the group's token total
    for (lang <- Seq("en", "pt")) {
      val g = got.values.filter(_._1 == lang).toSeq.sortBy(_._3)
      assert(g.head._3 == 0L)
      g.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._2 == b._3, s"$lang gap: $a -> $b")
        case _ =>
      }
    }
    // window arithmetic: doc 2 has 100 tokens in ctx=64 — wherever its
    // start lands it spans ceil arithmetic exactly
    got.values.foreach { case (_, n, start, first, last, nseq) =>
      assert(first == start / 64 && last == (start + n - 1) / 64 &&
        nseq == last - first + 1)
    }
    assert(got(2L)._6 >= 2) // 100 tokens never fit one 64-token window
    // layout independence: same placement after repartition
    val again = Sampling.packSequences(docs.repartition(7), col("lang"), 64)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.view.mapValues(_._3).toMap == again)
  }

  test("writeEpochShards: one file per shard, pos-ordered within files; concatenated shards replay the permutation; pack-then-shard composes") {
    import graft.olist.Warehouse
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("ep_shards").toString)
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val nShards = 8
    val n = Sampling.writeEpochShards(wh, "ep2", orders, "o_orderkey",
      epoch = 2, nShards = nShards)
    assert(n == orders.count())
    // every shard directory holds EXACTLY one file — the dataloader
    // reads shard k as one sequential stream
    val byShard = wh.table("ep2")
      .select(col("shard"), input_file_name().as("f")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byShard.keySet == (0L until nShards.toLong).toSet,
      s"expected $nShards shards, got ${byShard.keySet}")
    byShard.foreach { case (sh, fs) =>
      assert(fs.size == 1, s"shard $sh split across ${fs.size} files")
    }
    // within-file ROW ORDER is pos: read each file raw (no sort) and
    // assert ascending — the read-time no-sort contract
    byShard.foreach { case (sh, fs) =>
      val pos = spark.read.parquet(fs.head).select("pos")
        .collect().map(_.getInt(0)).toSeq
      assert(pos == pos.sorted,
        s"shard $sh file rows not in pos order: ${pos.take(20)}")
      assert(pos.head == 1, s"shard $sh does not start at pos 1")
    }
    // concatenating shards 0..n-1 (each in pos order) replays the
    // global (h, id) permutation exactly
    val replay = wh.table("ep2").orderBy("shard", "pos")
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val global = orders
      .select(col("o_orderkey"),
        md5(concat(lit("2:"), col("o_orderkey").cast("string"))).as("h"))
      .orderBy("h", "o_orderkey")
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(replay == global, "shard concatenation is not the permutation")
    // pack-then-shard: sp10's packed frame shards with its placement
    // columns intact — the composed training-data layout
    val packed = Sampling.packSequences(
      Tables.documents(spark, sf), col("lang"), 2048)
    val np = Sampling.writeEpochShards(wh, "ep_packed", packed, "doc_id",
      epoch = 1, nShards = 4)
    assert(np == packed.count())
    val back = wh.table("ep_packed")
      .select("doc_id", "start_tok", "first_seq", "n_seqs")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = packed.select("doc_id", "start_tok", "first_seq", "n_seqs")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(back == want, "packing columns did not survive the shard write")
  }
}
