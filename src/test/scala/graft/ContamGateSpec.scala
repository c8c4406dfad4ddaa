package graft

import graft.olist.Warehouse
import graft.operators.{ContamGate, Dedup, DedupIndex, Ingest}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stored benchmark-decontamination gate
  * ([[graft.operators.ContamGate]]): suite grams digested once,
  * delivery batches judged against the 16-byte digests alone — and the
  * firewall position in [[Ingest.ingestBatch]]: contaminated docs drop
  * BEFORE the dedup gate ever sees them. */
class ContamGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private val gram8 = "alpha bravo charlie delta echo foxtrot golf hotel"
  private val filler =
    (1 to 40).map(i => s"w$i").mkString(" ")
  // the suite gets its OWN padding — a batch doc sharing `filler` with
  // a bench doc would be genuinely contaminated through the padding
  private val benchPad =
    (1 to 40).map(i => s"b$i").mkString(" ")

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("verdicts: shared-gram counts and keep flags match a from-scratch sweep") {
    val wh = new Warehouse(spark, tmp("cg_verdicts"))
    val bench = df(Seq(
      (900L, s"$gram8 $benchPad"),
      (901L, "india juliet kilo lima mike november oscar papa quebec")))
    assert(ContamGate.build(wh, "cg", bench) > 0)
    val batch = df(Seq(
      (1L, s"leading tokens $gram8 trailing tokens here now"), // hits
      (2L, s"totally clean $filler"),                          // clean
      (3L, "too short to gram"),                               // <8 tokens
      (4L, s"$gram8 $gram8 x")))                               // dup grams count once
    val got = ContamGate.verdicts(wh, "cg", batch)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // doc 1 embeds the 8-gram once → exactly 1 shared (its other
    // windows straddle the seam and match nothing); doc 4 repeats the
    // gram but per-doc digests are DISTINCT → still 1
    assert(got == Seq((1L, 1L, 0), (2L, 0L, 1), (3L, 0L, 1), (4L, 1L, 0)),
      s"got $got")
    // the build landed exactly the gate's declared tables
    assert(ContamGate.tables("cg").forall(wh.hasTable))
    // a duplicated doc_id is judged on the UNION of its variants'
    // grams: a contaminated variant must convict the id even when a
    // clean variant rides in the same batch (a firewall cannot let
    // row order decide)
    val dup = df(Seq(
      (7L, s"totally clean variant $filler"),
      (7L, s"stolen span $gram8 in the other variant of the same doc")))
    val v7 = ContamGate.verdicts(wh, "cg", dup).collect()
    assert(v7.length == 1 && v7.head.getInt(2) == 0,
      s"union-of-variants must convict: ${v7.toSeq}")
  }

  test("refresh: replay adds nothing; a new benchmark version arms the gate") {
    val wh = new Warehouse(spark, tmp("cg_refresh"))
    val v1 = df(Seq((900L, s"$gram8 $benchPad")))
    ContamGate.build(wh, "cg", v1)
    assert(ContamGate.refresh(wh, "cg", v1) == 0L,
      "replaying the same suite must add zero grams")
    val newGram = "romeo sierra tango uniform victor whiskey xray yankee"
    val doc = df(Seq((5L, s"prefix $newGram suffix words go here too")))
    assert(ContamGate.verdicts(wh, "cg", doc).first().getInt(2) == 1,
      "not yet armed")
    assert(ContamGate.refresh(wh, "cg",
      df(Seq((902L, s"$newGram and some more benchmark words")))) > 0L)
    assert(ContamGate.verdicts(wh, "cg", doc).first().getInt(2) == 0,
      "the new version's grams must convict")
    // the suite's own docs judge as contaminated against themselves
    assert(ContamGate.verdicts(wh, "cg", v1).first().getInt(2) == 0)
  }

  test("verdictsBySuite: per-(doc, suite) blame — a doc two suites convict shows both rows; verdicts unchanged") {
    val wh = new Warehouse(spark, tmp("cg_blame"))
    val sharedGram =
      "sierra tango uniform victor whiskey xray yankee zulu"
    ContamGate.build(wh, "cg",
      df(Seq((900L, s"$gram8 $benchPad"),
        (901L, s"$sharedGram $benchPad"))), suite = "mmlu_v1")
    ContamGate.refresh(wh, "cg",
      df(Seq((950L, s"$sharedGram and some extra benchmark words"))),
      suite = "gsm_v2")
    val batch = df(Seq(
      (1L, s"x $gram8 y"),            // mmlu_v1 only
      (2L, s"x $sharedGram y"),       // BOTH suites (one shared digest)
      (3L, s"totally clean $filler"), // no row in the blame lens
      (4L, s"$gram8 $sharedGram")))   // mmlu twice-ish, gsm once
    val blame = ContamGate.verdictsBySuite(wh, "cg", batch).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(blame.keySet == Set((1L, "mmlu_v1"), (2L, "mmlu_v1"),
      (2L, "gsm_v2"), (4L, "mmlu_v1"), (4L, "gsm_v2")),
      s"blame rows: $blame")
    assert(blame((1L, "mmlu_v1")) == 1L)
    // doc 2's one contaminated gram blames BOTH carrying suites…
    assert(blame((2L, "mmlu_v1")) == 1L && blame((2L, "gsm_v2")) == 1L)
    // …while the keep/drop lens still counts it ONCE (distinct digests)
    val v = ContamGate.verdicts(wh, "cg", batch).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(v(2L) == ((1L, 0)) && v(3L) == ((0L, 1)), s"verdicts: $v")
    // doc 4 straddles the suites: per-suite counts are each suite's own
    // evidence and may sum past the distinct total
    assert(blame((4L, "mmlu_v1")) >= 1L && blame((4L, "gsm_v2")) >= 1L)
    assert(v(4L)._2 == 0)
    // retiring a suite removes its blame rows; the shared gram still
    // blames (and convicts through) the live suite
    ContamGate.retire(wh, "cg", "mmlu_v1")
    val after = ContamGate.verdictsBySuite(wh, "cg", batch).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == Set((2L, "gsm_v2"), (4L, "gsm_v2")), s"$after")
  }

  test("build: refuses over an existing gate unless overwrite — a rebuild must not silently disarm live suites") {
    val wh = new Warehouse(spark, tmp("cg_rebuild"))
    ContamGate.build(wh, "cg", df(Seq((900L, s"$gram8 $benchPad"))),
      suite = "mmlu_v1")
    val other = df(Seq(
      (950L, "sierra tango uniform victor whiskey xray yankee zulu")))
    val e = intercept[IllegalArgumentException] {
      ContamGate.build(wh, "cg", other, suite = "gsm_v2")
    }
    assert(e.getMessage.contains("refresh"),
      s"refusal must direct callers to refresh/retire: ${e.getMessage}")
    // the refused build touched nothing: suite A still arms the gate
    val hit = df(Seq((1L, s"x $gram8 y")))
    assert(ContamGate.verdicts(wh, "cg", hit).first().getInt(2) == 0,
      "suite must survive a refused rebuild")
    // the explicit flag is the deliberate path — and it really rebuilds
    assert(ContamGate.build(wh, "cg", other, suite = "gsm_v2",
      overwrite = true) > 0L)
    assert(ContamGate.verdicts(wh, "cg", hit).first().getInt(2) == 1,
      "an overwrite rebuild replaces the suites")
  }

  test("retire: a deprecated suite stops convicting; grams shared with a live suite keep convicting") {
    val wh = new Warehouse(spark, tmp("cg_retire"))
    val sharedGram =
      "sierra tango uniform victor whiskey xray yankee zulu"
    // suite A: its exclusive gram + the shared gram (two bench docs)
    ContamGate.build(wh, "cg", df(Seq(
      (900L, s"$gram8 $benchPad"),
      (901L, s"$sharedGram $benchPad"))), suite = "mmlu_v1")
    // suite B contributes the shared gram too — its own row, even
    // though A already stored that digest
    val addedB = ContamGate.refresh(wh, "cg",
      df(Seq((950L, s"$sharedGram and some extra benchmark words"))),
      suite = "gsm_v2")
    assert(addedB > 0L,
      "a live suite must carry its own rows for shared grams")
    val inv = ContamGate.suites(wh, "cg").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(inv.keySet == Set("mmlu_v1", "gsm_v2"), inv.toString)
    val viaA = df(Seq((1L, s"stolen span $gram8 in training text here")))
    val viaShared = df(Seq((2L, s"stolen span $sharedGram in text here")))
    assert(ContamGate.verdicts(wh, "cg", viaA).first().getInt(2) == 0)
    assert(ContamGate.verdicts(wh, "cg", viaShared).first().getInt(2) == 0)
    // retire A: its exclusive gram disarms, the shared one survives
    // through B's row — no suite text needed, no rebuild
    assert(ContamGate.retire(wh, "cg", "mmlu_v1") > 0L)
    assert(ContamGate.verdicts(wh, "cg", viaA).first().getInt(2) == 1,
      "a retired suite must stop convicting")
    assert(ContamGate.verdicts(wh, "cg", viaShared).first().getInt(2) == 0,
      "a gram shared with a live suite must keep convicting")
    assert(ContamGate.suites(wh, "cg").collect()
      .map(_.getString(0)).toSeq == Seq("gsm_v2"))
    // a multi-suite gram convicts ONCE: shared_grams counts distinct
    // digests (re-arm A and check the count stays 1)
    ContamGate.refresh(wh, "cg",
      df(Seq((901L, s"$sharedGram $benchPad"))), suite = "mmlu_v2")
    val v = ContamGate.verdicts(wh, "cg", viaShared).first()
    assert(v.getLong(1) == 1L && v.getInt(2) == 0,
      s"a two-suite gram must count once: ${v.toSeq}")
  }

  test("legacy untagged gate: verdicts/suites read it; refresh/retire migrate it in place — no suite text needed") {
    val wh = new Warehouse(spark, tmp("cg_legacy"))
    // forge the PRE-suite-tagging layout: build a tagged gate, then
    // rewrite its gram table with the h column only (what a round-12
    // deployment holds on disk)
    ContamGate.build(wh, "cg", df(Seq((900L, s"$gram8 $benchPad"))))
    wh.save("cg_grams", wh.table("cg_grams").select("h")
      .localCheckpoint(), clusterBy = Seq("h"))
    assert(!wh.table("cg_grams").columns.contains("suite"))
    val hit = df(Seq((1L, s"stolen $gram8 inside training text here")))
    // read-only surfaces work on the legacy schema as-is
    assert(ContamGate.verdicts(wh, "cg", hit).first().getInt(2) == 0)
    assert(ContamGate.suites(wh, "cg").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
      .map(_._1) == Seq(ContamGate.DefaultSuite))
    // refresh migrates in place (digests carry over — the gate owner
    // may hold no benchmark text) and the new suite arms
    val newGram = "romeo sierra tango uniform victor whiskey xray yankee"
    assert(ContamGate.refresh(wh, "cg",
      df(Seq((950L, s"$newGram plus other benchmark words here"))),
      suite = "v2") > 0L)
    assert(wh.table("cg_grams").columns.contains("suite"))
    assert(ContamGate.verdicts(wh, "cg", hit).first().getInt(2) == 0,
      "migration must not drop the legacy digests")
    val hit2 = df(Seq((2L, s"stolen $newGram inside training text too")))
    assert(ContamGate.verdicts(wh, "cg", hit2).first().getInt(2) == 0)
    // the legacy digests retire under DefaultSuite; v2 stays armed
    assert(ContamGate.retire(wh, "cg", ContamGate.DefaultSuite) > 0L)
    assert(ContamGate.verdicts(wh, "cg", hit).first().getInt(2) == 1)
    assert(ContamGate.verdicts(wh, "cg", hit2).first().getInt(2) == 0)
  }

  test("ingest firewall: contaminated docs never reach base, indexes, or the dedup gate's memory") {
    val wh = new Warehouse(spark, tmp("cg_ingest"))
    ContamGate.build(wh, "cg", df(Seq((900L, s"$gram8 $benchPad"))))
    wh.save("docs", df(Seq((0L, s"seed document $filler"))))
    DedupIndex.build(wh, "di", wh.table("docs"))
    // batch 1: one clean doc + one contaminated doc
    val contaminated = 11L
    val b1 = df(Seq(
      (10L, "a perfectly clean document with plenty of original words"),
      (contaminated, s"stolen benchmark span $gram8 hidden in plain text")))
    assert(Ingest.ingestBatch(wh, "docs", b1, batchId = 1L,
      dedupIdx = Some("di"), contamIdx = Some("cg")))
    val ids = wh.table("docs").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(0L, 10L), s"contaminated doc must not land: $ids")
    // the firewall runs FIRST: the reject is absent from the dedup
    // gate's band memory, so it can never convict a future clean doc
    val banded = wh.table("di_bands").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(!banded.contains(contaminated),
      "a contaminated doc must not become a near-dup prior")
    // replay of the same batch: no-op everywhere (batchId fence)
    assert(!Ingest.ingestBatch(wh, "docs", b1, batchId = 1L,
      dedupIdx = Some("di"), contamIdx = Some("cg")))
    assert(wh.countRows("docs").contains(2L))
  }

  test("ingest funnel order: the stateless quality gate sheds junk before any stored gate") {
    val wh = new Warehouse(spark, tmp("cg_quality"))
    ContamGate.build(wh, "cg", df(Seq((900L, s"$gram8 $benchPad"))))
    wh.save("docs", df(Seq((0L,
      "the quality of a document and the density of its stopwords " +
        "decide whether a gate keeps it in the corpus or not"))))
    DedupIndex.build(wh, "di", wh.table("docs"))
    val junk = 21L
    val b = df(Seq(
      (20L, "the curated corpus keeps a document when the text is " +
        "long enough and the stopword share of a normal sentence"),
      (junk, "zzz qqq xxx")))
    assert(Ingest.ingestBatch(wh, "docs", b, batchId = 1L,
      dedupIdx = Some("di"), contamIdx = Some("cg"),
      minQuality = Some(0.3)))
    val ids = wh.table("docs").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(0L, 20L), s"junk must not land: $ids")
    // quality runs FIRST: the reject never reached the dedup gate
    val banded = wh.table("di_bands").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(!banded.contains(junk),
      "a quality reject must not become a near-dup prior")
    // the gate agrees with the t2 signal by construction: re-scoring
    // the survivor clears the same threshold the gate applied
    val q = wh.table("docs").filter(col("doc_id") === 20L)
      .select(graft.operators.TextAnalysis.qualityExpr(col("text")))
      .first().getDouble(0)
    assert(q >= 0.3)
  }

  test("streaming funnel: quality + contamination + dedup gates under a live MemoryStream, exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = new Warehouse(spark, tmp("cg_stream"))
    ContamGate.build(wh, "cg", df(Seq((900L, s"$gram8 $benchPad"))))
    val seedText = s"seed document that reads like a normal sentence $filler"
    wh.save("docs", df(Seq((0L, seedText))))
    DedupIndex.build(wh, "di", wh.table("docs"))
    val src = MemoryStream[(Long, String)]
    val q = Ingest.streamIndexed(wh, "docs",
      src.toDF().toDF("doc_id", "text"), tmp("cg_ckpt"),
      dedupIdx = Some("di"), contamIdx = Some("cg"),
      minQuality = Some(0.2))
    try {
      // batch 1: a clean keeper (its OWN padding — sharing `filler`
      // with the seed would make it a genuine near-dup), a quality
      // reject, a contaminated doc
      val keeperPad = (1 to 40).map(i => s"c$i").mkString(" ")
      src.addData(
        (30L, "a clean document with the usual amount of original " +
          s"words and ordinary structure $keeperPad more"),
        (31L, "zz"),
        (32L, s"stolen $gram8 wrapped in otherwise the normal text"))
      q.processAllAvailable()
      // batch 2: a verbatim copy of the batch-1 keeper — the dedup
      // gate convicts it from stored state laid down by batch 1
      src.addData((40L, "a clean document with the usual amount of " +
        s"original words and ordinary structure $keeperPad more"))
      q.processAllAvailable()
      val ids = wh.table("docs").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(ids == Set(0L, 30L),
        s"only the seed and the batch-1 keeper may land: $ids")
      // the rejects never entered the gate's memory (quality and
      // contamination run before it), the keeper did
      val banded = wh.table("di_bands").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(banded.contains(30L) && !banded.contains(31L) &&
        !banded.contains(32L))
    } finally q.stop()
  }

  test("scale shape: verdicts broadcast the batch, never the stored grams") {
    val wh = new Warehouse(spark, tmp("cg_plan"))
    ContamGate.build(wh, "cg", df(Seq((900L, s"$gram8 $benchPad"))))
    // the public verdicts() returns its bounded frame PINNED (pin
    // hygiene), which hides the join plan — assert on the internal
    // core the pin wraps (the exact plan the ingest path runs)
    val batch = df(Seq((1L, s"x $gram8 y z and some more filler words here")))
    val bg = ContamGate.grams(batch.select("doc_id", "text"))
      .localCheckpoint()
    val exec = ContamGate.verdictsOn(wh, "cg", batch, bg, bg.count())
      .queryExecution.sparkPlan
    // the stored gram table (the suite-sized side) must stream through
    // the probe: no file scan may sit under a broadcast exchange
    val broadcastScans = exec.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        b.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
    }.flatten
    assert(broadcastScans.isEmpty,
      s"stored digests must never broadcast:\n$exec")
    // …and the digests ARE read from files (the gate serves from disk,
    // not a recompute)
    val scans = exec.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, s"the stored digests are read from files:\n$exec")
  }

  test("audit: a maintained gate is invariant-clean; a duplicated digest and a null row each surface as a named error") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmp("cg_audit")).enableSql()
    val bench = df(Seq((900L, s"$gram8 $benchPad")))
    ContamGate.build(wh, "cg", bench, suite = "s1")
    ContamGate.refresh(wh, "cg",
      df(Seq((901L, s"other words make a new eight gram here $benchPad"))),
      suite = "s2")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).toSeq
    val clean = rows(ContamGate.audit(wh, "cg"))
    assert(clean.nonEmpty && clean.forall(_._2 == "ok"), clean.toString)
    assert(clean.map(_._1).toSet == Set("digests", "distinct"),
      clean.toString)
    val sql = spark.sql("AUDIT CONTAM INDEX cg").collect()
    assert(sql.nonEmpty && sql.forall(_.getString(1) == "ok"),
      sql.mkString(", "))

    // a broken advance duplicates an existing (suite, digest) row,
    // and a null digest sneaks in
    val donor = wh.table("cg_grams").first()
    wh.append("cg_grams", Seq(
      (donor.getAs[String]("suite"), donor.getAs[String]("h")))
      .toDF("suite", "h"))
    wh.append("cg_grams",
      Seq(("s1", null.asInstanceOf[String])).toDF("suite", "h"))
    val res = rows(ContamGate.audit(wh, "cg"))
    assert(res.exists(r => r._1 == "distinct" && r._2 == "error" &&
      r._4.contains("1 (suite, digest)")), res.toString)
    assert(res.exists(r => r._1 == "digests" && r._2 == "error" &&
      r._4.contains("1 rows carry a null")), res.toString)
    assert(res.head._2 == "error", res.toString)
  }
}
