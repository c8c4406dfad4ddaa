package graft

import graft.operators.Curate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation pipeline: every stage's effect verified on a
  * corpus constructed to exercise it (low-quality rows, exact copies,
  * near copies, one benchmark-contaminated document).
  */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // per-seed disjoint vocabulary (only the stopword filler is shared),
  // so distinct seeds have near-zero token-set Jaccard
  private def sentence(seed: Int, words: Int): String =
    (0 until words).map(i => s"s${seed}word$i")
      .mkString("the ", " of the ", " and to in a end")

  test("curate: quality, exact, near, decontamination, sharding compose") {
    import spark.implicits._
    val base = (1L to 40L).map(i => (i, sentence(i.toInt, 60)))
    val exactCopies = Seq((101L, sentence(5, 60)), (102L, sentence(5, 60)))
    // near copy of doc 7: same 60 words plus a small tail
    val nearCopy = Seq((201L, sentence(7, 60) + " tiny extra tail"))
    val junk = Seq((301L, "short"), (302L, "xxxxx yyyyy"))
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val contaminated = Seq((401L,
      sentence(9, 30) + " " + benchText + " " + sentence(10, 30)))
    val docs = (base ++ exactCopies ++ nearCopy ++ junk ++ contaminated)
      .toDF("doc_id", "text")
    val bench = Seq((9001L, benchText)).toDF("doc_id", "text")

    val (out, rep) = Curate.curate(docs, bench, minQuality = 0.3,
      jaccard = 0.5, tokensPerShard = 500L)

    assert(rep.input == 46)
    // junk rows fail the quality gate, everything else passes
    assert(rep.afterQuality == 44, rep.toString)
    // 101/102 are byte-copies of doc 5: the smallest id survives
    assert(rep.afterExact == 42, rep.toString)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(5L) && !ids.contains(101L) && !ids.contains(102L))
    // 201 is a near-copy of 7: the component canonical (7) survives
    assert(rep.afterNear == 41, rep.toString)
    assert(ids.contains(7L) && !ids.contains(201L))
    // 401 shares the benchmark 8-grams: decontaminated
    assert(rep.afterDecontam == 40, rep.toString)
    assert(!ids.contains(401L))
    // split + shard assigned everywhere, deterministically
    assert(out.filter(col("split").isNull || col("shard").isNull).count() == 0)
    assert(rep.shards >= 1)
    val (out2, rep2) = Curate.curate(docs, bench, minQuality = 0.3,
      jaccard = 0.5, tokensPerShard = 500L)
    assert(rep2 == rep)
    assert(out2.select("doc_id", "split", "shard").exceptAll(
      out.select("doc_id", "split", "shard")).count() == 0)
  }

  test("curate: blocklist gate drops unsafe docs, skipped stages report pass-through") {
    import spark.implicits._
    val ok = (1L to 10L).map(i => (i, sentence(i.toInt, 60)))
    // > 5% blocked tokens (the t14 threshold): 12 hits in ~196 tokens = 6%
    val unsafe = Seq((501L, sentence(11, 60) + (" badword" * 12)))
    val docs = (ok ++ unsafe).toDF("doc_id", "text")
    val bench = Seq((9001L, "unrelated bench words only")).toDF("doc_id", "text")
    val (out, rep) = Curate.curate(docs, bench, minQuality = 0.3,
      blocklist = Seq("badword"))
    assert(rep.afterQuality == 11 && rep.afterBlocklist == 10, rep.toString)
    assert(!out.select("doc_id").as[Long].collect().contains(501L))
    // without a blocklist the stage reports the incoming count unchanged
    val (_, rep2) = Curate.curate(docs, bench, minQuality = 0.3)
    assert(rep2.afterBlocklist == rep2.afterQuality)
    assert(rep2.afterRebalance == rep2.afterDecontam)
  }

  test("curate: span-dedup gate drops boilerplate-heavy docs near-dedup cannot see") {
    import spark.implicits._
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val bpA = words("bpa", 30) // two 30-token boilerplate spans,
    val bpB = words("bpb", 30) // each shared by exactly two docs
    // X is mostly boilerplate (bpA + bpB + 5 unique): ~48% of its
    // 20-token windows are verbatim-duplicated, but its Jaccard with Y
    // or Z is ~0.25 — far below the near-dup threshold, invisible to
    // MinHash. Y and Z carry one span each amid 55 unique words (~17%).
    val docs = (
      (1L to 8L).map(i => (i, sentence(i.toInt, 60))) ++ Seq(
        (21L, words("xu", 5) + " " + bpA + " " + bpB),
        (22L, words("yu", 55) + " " + bpA),
        (23L, words("zu", 55) + " " + bpB),
        // too short to window (10 stopword tokens): no span row, kept
        (24L, "the of and to in a the of and to"))
      ).toDF("doc_id", "text")
    val bench = Seq((9001L, "unrelated bench words only")).toDF("doc_id", "text")
    val (out, rep) = Curate.curate(docs, bench, minQuality = 0.1,
      maxDupSpanFraction = Some(0.3))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(21L), s"boilerplate-heavy doc must drop: $rep")
    assert(ids.contains(22L) && ids.contains(23L),
      s"small-span docs stay: $rep")
    assert(ids.contains(24L), "unwindowable short doc stays")
    assert(rep.afterSpanDedup == rep.afterNear - 1, rep.toString)
    // opt-out: the stage reports pass-through and X survives
    val (out2, rep2) = Curate.curate(docs, bench, minQuality = 0.1)
    assert(rep2.afterSpanDedup == rep2.afterNear)
    assert(out2.select("doc_id").as[Long].collect().toSet.contains(21L))
  }

  test("curateStored: the gate-backed form equals the sweep form — survivors, report, and output") {
    import spark.implicits._
    import graft.operators.{ContamGate, DedupIndex}
    import graft.olist.Warehouse
    // the CurateSpec corpus shape: clean docs, an exact copy, a
    // PAIRWISE near copy (on pairwise dup structure the component
    // canonical and the bucket-min keep-first policies agree — the
    // chain case where they diverge is documented in the scaladoc),
    // junk, and one contaminated doc
    val base = (1L to 30L).map(i => (i, sentence(i.toInt, 60)))
    val exactCopies = Seq((101L, sentence(5, 60)))
    val nearCopy = Seq((201L, sentence(7, 60) + " tiny extra tail"))
    val junk = Seq((301L, "short"))
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val contaminated = Seq((401L,
      sentence(9, 30) + " " + benchText + " " + sentence(10, 30)))
    val docs = (base ++ exactCopies ++ nearCopy ++ junk ++ contaminated)
      .toDF("doc_id", "text")
    val bench = Seq((9001L, benchText)).toDF("doc_id", "text")
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("curate_stored").toString)
    // the state a gated ingest would hold: the suite's digests and the
    // admitted corpus's band structure
    ContamGate.build(wh, "cg", bench)
    DedupIndex.build(wh, "di", docs)
    val (outS, repS) = Curate.curateStored(wh, docs, "cg", "di",
      minQuality = 0.3, tokensPerShard = 500L)
    val (outW, repW) = Curate.curate(docs, bench, minQuality = 0.3,
      tokensPerShard = 500L)
    assert(repS == repW, s"stored $repS ≠ sweep $repW")
    val idsS = outS.select("doc_id").as[Long].collect().toSet
    val idsW = outW.select("doc_id").as[Long].collect().toSet
    assert(idsS == idsW, s"survivor sets diverge: ${idsS diff idsW} / ${idsW diff idsS}")
    // identical split/shard assignments too — the stages downstream of
    // the gates are the same body by construction
    assert(outS.select("doc_id", "split", "shard").exceptAll(
      outW.select("doc_id", "split", "shard")).count() == 0)
    // and the expected verdicts hold: copy, near-copy, junk, and the
    // contaminated doc are all out; their canonicals are in
    assert(idsS.contains(5L) && !idsS.contains(101L))
    assert(idsS.contains(7L) && !idsS.contains(201L))
    assert(!idsS.contains(301L) && !idsS.contains(401L))
  }

  test("curateStored chain policy: bucket-min keeps a chain end the component rule drops; resolveComponents reproduces the sweep's closure") {
    import spark.implicits._
    import graft.operators.{ContamGate, DedupIndex}
    import graft.olist.Warehouse
    // a genuine MinHash band chain X ~ Y ~ Z with X !~ Z (verified
    // fixture: Y holds the union of X's and Z's content words, so each
    // end shares a band with the middle but the ends share none).
    // Ids make the policies diverge: Y = 10 is convicted by both ends;
    // Z = 5's only shared bucket has min 5 (itself), so the DIRECT
    // bucket-min rule keeps it — while the transitive component
    // {1, 5, 10} resolves to canonical 1 and drops it.
    def sent(words: Seq[String]): String =
      words.mkString("the ", " of the ", " and to in a end")
    val xw = (0 until 40).map(i => s"c0x$i")
    val zw = (0 until 40).map(i => s"c0z$i")
    val chain = Seq(
      (1L, sent(xw)), (10L, sent(xw ++ zw)), (5L, sent(zw)))
    val fillers = Seq(
      (20L, sent((0 until 40).map(i => s"f20w$i"))),
      (21L, sent((0 until 40).map(i => s"f21w$i"))))
    val docs = (chain ++ fillers).toDF("doc_id", "text")
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("curate_chain").toString)
    ContamGate.build(wh, "cg",
      Seq((9001L, "alpha beta gamma delta epsilon zeta eta theta iota"))
        .toDF("doc_id", "text"))
    DedupIndex.build(wh, "di", docs)
    def survivors(resolve: Boolean): Set[Long] =
      Curate.curateStored(wh, docs, "cg", "di", minQuality = 0.3,
          resolveComponents = resolve)
        ._1.select("doc_id").as[Long].collect().toSet
    val gate = survivors(resolve = false)
    val comp = survivors(resolve = true)
    assert(gate == Set(1L, 5L, 20L, 21L),
      s"bucket-min policy must keep the un-convicted chain end: $gate")
    assert(comp == Set(1L, 20L, 21L),
      s"component policy must drop the whole chain to its canonical: $comp")
  }

  test("dataCard: docs/tokens/mean/weight per source fold from the manifest — zero file scans") {
    import graft.olist.Warehouse
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("curate_card").toString)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    wh.save("docs_p", docs, partitionBy = Seq("source"),
      clusterBy = Seq("doc_id"))
    wh.statsBy("docs_p", Seq("n_chars"))
    val card = Curate.dataCard(wh, "docs_p", "source", "n_chars").get
    assert(card.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.isEmpty, "the data card must not open a data file:\n" +
      card.queryExecution.sparkPlan)
    val got = card.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val agg = docs.groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("tokens"),
        avg("n_chars").as("mean")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val total = agg.values.map(_._2).sum
    assert(got.keySet == agg.keySet)
    got.foreach { case (s, (d, t, m, w)) =>
      val (wd, wt, wm) = agg(s)
      assert((d, t, m) == ((wd, wt, wm)), s"card row for $s diverged")
      assert(w == t.toDouble / total, s"weight for $s diverged")
    }
    assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-12)
    // an un-stat'd token column cannot answer exactly → None, not a
    // stale card
    val wh2 = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("curate_card2").toString)
    wh2.save("plain", docs.limit(50), partitionBy = Seq("source"))
    assert(Curate.dataCard(wh2, "plain", "source", "n_chars").isEmpty)
  }

  test("curate runs over the real documents table, rebalanced by language") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // held-out bench = one source, train = the rest (the d10 framing)
    val (out, rep) = Curate.curate(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"),
      rebalanceBy = Some("lang"))
    assert(rep.input > 0 && rep.afterDecontam > 0)
    assert(rep.input >= rep.afterQuality)
    assert(rep.afterQuality >= rep.afterBlocklist)
    assert(rep.afterBlocklist >= rep.afterExact)
    assert(rep.afterExact >= rep.afterNear)
    assert(rep.afterNear >= rep.afterDecontam)
    assert(rep.afterDecontam >= rep.afterRebalance && rep.afterRebalance > 0)
    // the dominant language was thinned toward the flattened mix: no
    // language may exceed its pre-rebalance share by construction
    assert(out.columns.toSet.contains("shard"))
  }

  test("curate: per-source cap keeps at most N survivors per source, under-cap sources untouched") {
    import spark.implicits._
    // 30 clean docs from "big", 4 from "small" — all pass every gate
    val docs = ((1L to 30L).map(i => (i, sentence(i.toInt, 60), "big")) ++
      (101L to 104L).map(i => (i, sentence(i.toInt, 60), "small")))
      .toDF("doc_id", "text", "source")
    val bench = Seq((9001L, "quux1 quux2 quux3 quux4 quux5 quux6 quux7 quux8"))
      .toDF("doc_id", "text")
    val (out, rep) = Curate.curate(docs, bench,
      maxPerSource = Some(("source", 10)))
    assert(rep.afterDecontam == 34, rep.toString)
    assert(rep.afterSourceCap == 14, rep.toString)
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("big") == 10 && bySrc("small") == 4, bySrc.toString)
    // determinism: same corpus, same cap -> same survivor ids
    val (out2, _) = Curate.curate(docs.repartition(5), bench,
      maxPerSource = Some(("source", 10)))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      out2.select("doc_id").collect().map(_.getLong(0)).toSet)
    // cap off: nothing capped, report passes counts through
    val (_, rep2) = Curate.curate(docs, bench)
    assert(rep2.afterSourceCap == rep2.afterDecontam)
  }
}
