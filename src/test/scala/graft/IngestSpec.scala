package graft

import graft.olist.Warehouse
import graft.operators.{AnnIndex, Ingest, TextAnalysis, TextIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Transactional searchable-corpus ingest ([[graft.operators.Ingest]]):
  * each micro-batch advances base table + BM25 index + ANN index under
  * ONE commit marker. The invariant worth the machinery: at every
  * observable instant the STORED index reproduces the scan over the
  * base table bit-for-bit — search and fetch can never disagree. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** The first 50 documents with their embeddings, driver-side. */
  private lazy val corpus: Seq[(Long, String, Seq[Float])] = {
    val d = Tables.documents(spark, sf).select("doc_id", "text")
      .filter(col("doc_id") < 50).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .filter(col("vec_id") < 50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    (0L until 50L).map(i => (i, d(i), e(i)))
  }
  private def seed = corpus.take(30)
  private def b1 = corpus.slice(30, 40)
  private def b2 = corpus.slice(40, 50)

  private def frame(rows: Seq[(Long, String, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  /** Bootstrap: base table + both indexes over the seed corpus. */
  private def bootstrap(p: String): Warehouse = {
    val wh = new Warehouse(spark, tmp(p))
    wh.save("docs", frame(seed))
    TextIndex.build(wh, "ti", frame(seed))
    AnnIndex.build(wh, "ann",
      frame(seed).select(col("doc_id").as("vec_id"), col("embedding")),
      nCells = 4, m = 4, k = 8)
    wh
  }

  /** Stored BM25 == base-table scan, bit-for-bit (the TextIndexSpec
    * comparison: positive-score prefix, (doc_id, dl, score)). */
  private def consistent(wh: Warehouse): Unit = {
    val terms = TextAnalysis.bm25Query
    val scan = TextAnalysis.bm25TopK(wh.table("docs"), terms, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._3 > 0.0).toSeq
    val stored = TextIndex.query(wh, "ti", terms, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(scan == stored,
      s"stored BM25 must equal the base-table scan:\n$scan\n$stored")
  }

  test("streaming ingest advances base + both indexes per trigger, consistently") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = bootstrap("ingest_stream")
    consistent(wh)
    val src = MemoryStream[(Long, String, Seq[Float])]
    val q = Ingest.streamIndexed(wh, "docs",
      src.toDF().toDF("doc_id", "text", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")),
      tmp("ingest_ckpt"), textIdx = Some("ti"), annIdx = Some("ann"))
    try {
      src.addData(b1: _*); q.processAllAvailable()
      assert(wh.countRows("docs").contains(40L))
      consistent(wh)
      src.addData(b2: _*); q.processAllAvailable()
      assert(wh.countRows("docs").contains(50L))
      consistent(wh)
      // a vector streamed in the SECOND batch is immediately probe-able
      // and ranks itself first (exact re-rank; cosine self-sim = 1)
      val top = AnnIndex.query(wh, "ann", frame(corpus)
        .select(col("doc_id").as("vec_id"), col("embedding")),
        queryId = 45L, topK = 3).collect()
      assert(top.nonEmpty && top.head.getLong(0) == 45L,
        s"streamed vector must be its own nearest neighbor: " +
          top.map(_.getLong(0)).toSeq)
    } finally q.stop()
  }

  test("replayed batch is a no-op everywhere; a rewound batchId refuses") {
    val wh = bootstrap("ingest_replay")
    assert(Ingest.ingestBatch(wh, "docs", frame(b1), 0L,
      Some("ti"), Some("ann")))
    val counts = () => (wh.countRows("docs"),
      wh.table("ti_doclen").count(), wh.table("ann_codes").count(),
      wh.table("ti_stats").first().getLong(0))
    val before = counts()
    assert(before == ((Some(40L), 40L, 40L, 40L)))
    // the at-least-once replay: same batchId → false, nothing moves
    assert(!Ingest.ingestBatch(wh, "docs", frame(b1), 0L,
      Some("ti"), Some("ann")))
    assert(counts() == before)
    // a batchId BELOW the mark is a checkpoint reset — loud refusal
    intercept[IllegalStateException] {
      Ingest.ingestBatch(wh, "docs", frame(b1), -1L,
        Some("ti"), Some("ann"))
    }
    assert(counts() == before)
    consistent(wh)
  }

  test("a mid-batch failure rolls everything back; the retry lands exactly once") {
    val wh = bootstrap("ingest_atomic")
    // the ANN leg throws (no embedding column) AFTER the base append
    // and the text-index advance have staged — one marker means the
    // reader-visible world never moves
    intercept[Exception] {
      Ingest.ingestBatch(wh, "docs", frame(b1).drop("embedding"), 0L,
        Some("ti"), Some("ann"))
    }
    assert(wh.countRows("docs").contains(30L))
    assert(wh.table("ti_doclen").count() == 30L)
    assert(wh.table("ti_stats").first().getLong(0) == 30L)
    assert(wh.table("ann_codes").count() == 30L)
    consistent(wh)
    // the stream would re-drive the SAME batchId after the failure —
    // it lands exactly once, all structures agree
    assert(Ingest.ingestBatch(wh, "docs", frame(b1), 0L,
      Some("ti"), Some("ann")))
    assert(wh.countRows("docs").contains(40L))
    assert(wh.table("ann_codes").count() == 40L)
    consistent(wh)
  }

  test("gated ingest: near-dups of anything ever seen — stored corpus, own batch, or earlier DROPPED docs — never become corpus; every structure stays consistent") {
    import graft.operators.DedupIndex
    val wh = bootstrap("ingest_gated")
    DedupIndex.build(wh, "di", frame(seed))
    val emb = corpus(5)._3
    val fresh = "uniquesauce quorval zintrap melkovar dresnip oblarn"
    // 1000 = verbatim copy of an already-stored doc; 1001 = genuinely
    // new; 1002 = exact in-batch dup of 1001
    val g1 = Seq((1000L, corpus(5)._2, emb), (1001L, fresh, emb),
      (1002L, fresh, emb))
    assert(Ingest.ingestBatch(wh, "docs", frame(g1), 0L,
      Some("ti"), Some("ann"), Some("di")))
    assert(wh.countRows("docs").contains(31L),
      "only the first-of-its-neighborhood doc may land")
    assert(wh.table("docs").filter(col("doc_id") === 1001L).count() == 1)
    assert(wh.table("docs")
      .filter(col("doc_id").isin(1000L, 1002L)).isEmpty)
    // the indexes hold exactly the base table — search, fetch, and
    // vector lanes agree about what the corpus IS
    assert(wh.table("ti_doclen").count() == 31L)
    assert(wh.table("ann_codes").count() == 31L)
    consistent(wh)
    // dropped docs still entered the GATE's memory…
    assert(wh.table("di_bands").select("doc_id").distinct()
      .filter(col("doc_id").isin(1000L, 1002L)).count() == 2)
    // …so a later copy of a doc that never LANDED is still convicted
    // (the transitive keep-first policy, now across micro-batches)
    assert(Ingest.ingestBatch(wh, "docs",
      frame(Seq((1003L, fresh, emb))), 1L,
      Some("ti"), Some("ann"), Some("di")))
    assert(wh.countRows("docs").contains(31L))
    assert(wh.table("ti_doclen").count() == 31L)
    assert(wh.table("ann_codes").count() == 31L)
    consistent(wh)
    // replayed gated batch: nothing moves anywhere, gate included
    val vers = (DedupIndex.tables("di") ++ Seq("docs", "ti_doclen"))
      .map(t => t -> wh.tableVersions(t))
    assert(!Ingest.ingestBatch(wh, "docs",
      frame(Seq((1003L, fresh, emb))), 1L,
      Some("ti"), Some("ann"), Some("di")))
    vers.foreach { case (t, v) =>
      assert(wh.tableVersions(t) == v, s"replay advanced $t")
    }
  }

  test("admission ledger: per-gate drop counts ≡ gate verdicts; rollbacks/replays write none; fenced-out batches never touch gate memory") {
    import graft.operators.{ContamGate, DedupIndex}
    import spark.implicits._
    val wh = bootstrap("ingest_ledger")
    DedupIndex.build(wh, "di", frame(seed))
    val gram8 = "alpha bravo charlie delta echo foxtrot golf hotel"
    ContamGate.build(wh, "cg",
      Seq((900L, s"$gram8 " + (1 to 40).map(i => s"b$i").mkString(" ")))
        .toDF("doc_id", "text"))
    val emb = corpus(5)._3
    val fresh = "a genuinely new document with the usual structure " +
      "and plenty of ordinary words uniquesauce quorval zintrap"
    // one stored-dup, one keeper, its in-batch dup, one quality
    // reject, one contaminated doc — every gate drops something
    val g1 = Seq(
      (1000L, corpus(5)._2, emb), (1001L, fresh, emb),
      (1002L, fresh, emb), (1004L, "zz", emb),
      (1005L, s"stolen $gram8 wrapped in otherwise the normal text", emb))
    def gates(b: org.apache.spark.sql.DataFrame, id: Long) =
      Ingest.ingestBatch(wh, "docs", b, id, Some("ti"), Some("ann"),
        dedupIdx = Some("di"), contamIdx = Some("cg"),
        minQuality = Some(0.2))
    assert(gates(frame(g1), 0L))
    def ledger() = Ingest.ledger(wh, "docs").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(ledger() == Seq((0L, 5L, 1L, 1L, 2L, 1L)),
      s"ledger ≠ gate verdicts: ${ledger()}")
    assert(wh.countRows("docs").contains(31L))
    // a replay writes no ledger row (and advances nothing)
    assert(!gates(frame(g1), 0L))
    assert(ledger().size == 1)
    // a rolled-back batch (ANN leg throws: no embedding) leaves no row
    val followUp = "a completely different follow-up document about " +
      "other topics carrying its own words blargfizz cromulent xanthic"
    intercept[Exception] {
      gates(frame(Seq((1010L, followUp, emb))).drop("embedding"), 1L)
    }
    assert(ledger().size == 1)
    // the retry of the same batchId lands with its own row
    assert(gates(frame(Seq((1010L, followUp, emb))), 1L))
    assert(ledger() == Seq((0L, 5L, 1L, 1L, 2L, 1L),
      (1L, 1L, 0L, 0L, 0L, 1L)), s"got ${ledger()}")
    // the ADVICE scenario: a restart driven from an OLD checkpoint
    // re-delivers the committed batchId carrying genuinely unseen
    // doc_ids — the fence settles it BEFORE any gate stages state, so
    // the unseen ids never enter the dedup gate's band memory (they
    // would otherwise convict their future legitimate deliveries)
    val stale = frame(Seq((2000L,
      "an unseen document arriving under a stale batch identifier " +
        "with plenty of perfectly ordinary words", emb)))
    assert(!gates(stale, 1L))
    assert(wh.table("di_bands").filter(col("doc_id") === 2000L).isEmpty,
      "a fenced-out batch committed gate memory")
    assert(ledger().size == 2)
    // …and its later legitimate delivery (next batchId) is admitted
    assert(gates(stale, 2L))
    assert(wh.table("docs").filter(col("doc_id") === 2000L).count() == 1)
  }

  test("suite blame ledger: per-suite drops ≡ verdictsBySuite; replays and rollbacks write none; SQL surfaces it") {
    import graft.operators.{ContamGate, DedupIndex}
    import spark.implicits._
    val wh = bootstrap("ingest_blame")
    DedupIndex.build(wh, "di", frame(seed))
    // two suites with disjoint 8-gram signatures
    val gA = "alpha bravo charlie delta echo foxtrot golf hotel"
    val gB = "india juliet kilo lima mike november oscar papa"
    ContamGate.build(wh, "cg",
      Seq((900L, s"$gA " + (1 to 40).map(i => s"a$i").mkString(" ")))
        .toDF("doc_id", "text"), suite = "suiteA")
    ContamGate.refresh(wh, "cg",
      Seq((901L, s"$gB " + (1 to 40).map(i => s"b$i").mkString(" ")))
        .toDF("doc_id", "text"), suite = "suiteB")
    val emb = corpus(5)._3
    // one doc per suite, one BOTH suites convict, one clean
    val batch = frame(Seq(
      (1000L, s"leaked $gA wrapped in otherwise quite usual text", emb),
      (1001L, s"leaked $gB wrapped in otherwise quite usual text", emb),
      (1002L, s"doubly leaked $gA and then also $gB in one text", emb),
      (1003L, "a perfectly clean document with plenty of ordinary " +
        "words uniquesauce zorbal quanth", emb)))
    // the expectation straight from the public blame lens: the ledger
    // must record exactly what verdictsBySuite attributes
    val expect = ContamGate.verdictsBySuite(wh, "cg", batch)
      .groupBy("suite").agg(countDistinct(col("doc_id")).as("drops"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(expect == Map("suiteA" -> 2L, "suiteB" -> 2L), s"$expect")
    def gates(b: org.apache.spark.sql.DataFrame, id: Long) =
      Ingest.ingestBatch(wh, "docs", b, id, Some("ti"), Some("ann"),
        dedupIdx = Some("di"), contamIdx = Some("cg"),
        minQuality = Some(0.2), blameSuites = true)
    assert(gates(batch, 0L))
    def blame() = Ingest.blameLedger(wh, "docs").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSeq
    assert(blame() == Seq((0L, "suiteA", 2L), (0L, "suiteB", 2L)),
      s"blame ledger ≠ gate attribution: ${blame()}")
    // the main ledger's contam_drops stays DISTINCT-doc counting (3
    // convicted docs), while blame sums per-suite evidence (2 + 2) —
    // a doubly-convicted doc counts in both suites by design
    val led = Ingest.ledger(wh, "docs").collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSeq
    assert(led == Seq((0L, 3L)), s"ledger: $led")
    // a replay writes no blame rows
    assert(!gates(batch, 0L))
    assert(blame().size == 2)
    // a rolled-back batch (ANN leg throws: no embedding) leaves none
    intercept[Exception] {
      gates(frame(Seq((1010L, "another fine document with plenty of " +
        "perfectly ordinary words cromulent blargfizz", emb)))
        .drop("embedding"), 1L)
    }
    assert(blame().size == 2)
    // a clean landed batch appends ZERO blame rows (no suite convicted)
    assert(gates(frame(Seq((1010L, "another fine document with plenty " +
      "of perfectly ordinary words cromulent blargfizz", emb))), 1L))
    assert(blame().size == 2)
    // the SQL read path
    wh.enableSql()
    val sqlRows = spark.sql("DESCRIBE INGEST LOG docs BLAME").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSeq
    assert(sqlRows == blame(), s"SQL blame surface diverged: $sqlRows")
  }

  test("ledger hygiene: many one-row batches fold — file count stays bounded, rows and content conserved") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmp("ingest_hygiene"))
    def doc(i: Long) = (i, s"document number $i with the usual " +
      "ordinary words of the corpus and then some more of them")
    wh.save("d2", Seq(doc(0L)).toDF("doc_id", "text"))
    val n = 24
    (1 to n).foreach { i =>
      assert(Ingest.ingestBatch(wh, "d2",
        Seq(doc(i.toLong)).toDF("doc_id", "text"), i.toLong))
    }
    val log = Ingest.ledgerTable("d2")
    val files = wh.describeDetail(log).toMap.apply("numFiles").toInt
    // without folding this is n files; the size-tiered fold keeps it
    // at (since-last-fold) + sealed — the 100k-batch year must not
    // mean 100k files
    assert(files <= 10, s"$n one-row batches left $files ledger files")
    // folding is a rewrite, never a loss: every batch's row survives
    val rows = Ingest.ledger(wh, "d2").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(6))).toSeq
    assert(rows == (1 to n).map(i => (i.toLong, 1L, 1L)),
      s"ledger content diverged after folding: $rows")
  }

  test("property: id-sorted batch splits — the landed set is invariant of batching; the ledger conserves per batch") {
    import graft.operators.{ContamGate, DedupIndex}
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val gram8 = "alpha bravo charlie delta echo foxtrot golf hotel"
    def s(seed: Int): String = (0 until 30).map(j => s"p${seed}w$j")
      .mkString("the ", " of the ", " and to in a")
    // a pool whose per-gate verdicts are known by construction
    val pool: Seq[(Long, String)] =
      (0 until 8).map(i => (1000L + i, s(i))) ++ Seq(
        (1008L, s(0)),                    // exact dup of 1000
        (1009L, s(3) + " tiny extra"),    // near dup of 1003
        (1010L, "zz"),                    // quality reject
        (1011L, s"stolen $gram8 wrapped in otherwise the normal text"),
        (1012L, s(12)),
        (1013L, s(12)),                   // exact dup of 1012
        (1014L, "qq xx"),                 // quality reject
        // same proven-quality shape as 1011 (contam gate runs FIRST,
        // so their mutual similarity never reaches the dedup gate)
        (1015L, s"stolen $gram8 wrapped in otherwise the usual text"))
    val expectLanded = ((1000L to 1007L) :+ 1012L).toSet
    val seed = Seq((0L, "seed corpus document with entirely its own " +
      "vocabulary and a perfectly ordinary sentence shape"))
    // with ids ascending ACROSS batches, first-arrival-wins ≡ the
    // ascending-id keep-first policy, so any id-sorted split must
    // land the identical set — batching is an implementation detail,
    // not a semantics knob
    for (trial <- 0 until 4) {
      val wh = new Warehouse(spark, tmp(s"ingest_prop$trial"))
      wh.save("docs", seed.toDF("doc_id", "text"))
      DedupIndex.build(wh, "di", wh.table("docs"))
      ContamGate.build(wh, "cg",
        Seq((900L, s"$gram8 " + (1 to 40).map(i => s"b$i").mkString(" ")))
          .toDF("doc_id", "text"))
      val k = 1 + rnd.nextInt(4)
      // k-1 random cut points over the id-sorted pool
      val cuts = Seq.fill(k - 1)(rnd.nextInt(pool.size + 1)).sorted
      val batches = (Seq(0) ++ cuts ++ Seq(pool.size)).sliding(2).map {
        case Seq(a, b) => pool.slice(a, b)
      }.toSeq
      batches.zipWithIndex.foreach { case (b, i) =>
        val landed = Ingest.ingestBatch(wh, "docs",
          b.toDF("doc_id", "text"), i.toLong,
          dedupIdx = Some("di"), contamIdx = Some("cg"),
          minQuality = Some(0.2))
        assert(landed || b.isEmpty,
          s"trial $trial: a non-empty fresh batch must land")
      }
      val ids = wh.table("docs").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(ids == expectLanded + 0L,
        s"trial $trial (k=$k, cuts=$cuts): landed $ids")
      // ledger conservation: every landed batch's row balances, and
      // the landed column sums to the docs that actually arrived
      val led = Ingest.ledger(wh, "docs").collect()
      led.foreach { r =>
        assert(r.getLong(2) - r.getLong(3) - r.getLong(4) - r.getLong(5)
          == r.getLong(6), s"trial $trial: unbalanced ledger row $r")
      }
      assert(led.map(_.getLong(6)).sum == expectLanded.size.toLong,
        s"trial $trial: ledger landed ≠ corpus growth")
      assert(led.map(_.getLong(3)).sum == 2L &&
        led.map(_.getLong(4)).sum == 2L &&
        led.map(_.getLong(5)).sum == 3L,
        s"trial $trial: per-gate totals off: ${led.toSeq}")
    }
  }

  test("Ingest.optimize: one maintenance call folds the stream's whole footprint; answers unchanged; tombstones untouched") {
    val wh = bootstrap("ingest_opt")
    // two landed triggers leave per-trigger debris in base + indexes
    assert(Ingest.ingestBatch(wh, "docs", frame(b1), 1L,
      textIdx = Some("ti"), annIdx = Some("ann")))
    assert(Ingest.ingestBatch(wh, "docs", frame(b2), 2L,
      textIdx = Some("ti"), annIdx = Some("ann")))
    // a forgotten doc: its guards must survive ANY maintenance —
    // the next delivery may replay it
    graft.operators.Forget.forgetDocs(wh, "docs", Seq(35L),
      textIdx = Seq("ti"), annIdx = Seq("ann"))
    consistent(wh)
    val baseFiles0 = wh.describeDetail("docs").toMap.apply("numFiles").toInt
    val terms = TextAnalysis.bm25Query
    val before = TextIndex.query(wh, "ti", terms, 50).collect().toSeq
    val r = Ingest.optimize(wh, "docs", textIdx = Some("ti"),
      annIdx = Some("ann")).toMap
    assert(r("docs.files_compacted") > 0L &&
      wh.describeDetail("docs").toMap.apply("numFiles").toInt < baseFiles0,
      s"base debris not folded: $r")
    assert(r.contains("ti.df_segments_folded") &&
      r("ti.df_segments_folded") > 0L, s"df segments not folded: $r")
    assert(r.contains("ann.codes_files_compacted"))
    // NO tombstone key and NO tombstone movement: the stream's guards
    // are not foldable against the base (the resurrection argument)
    assert(!r.keys.exists(_.endsWith("tombstones_dropped")))
    assert(wh.table("ti_gone").count() == 1L &&
      wh.table("ann_gone").count() == 1L,
      "Ingest.optimize touched right-to-be-forgotten guards")
    // answers byte-identical and stored ≡ scan still holds (the
    // replay-resurrection guard itself is pinned per-index in
    // TextIndexSpec/AnnIndexSpec — what matters HERE is that the
    // stream's maintenance left it armed)
    assert(TextIndex.query(wh, "ti", terms, 50).collect().toSeq == before)
    consistent(wh)
    // the batchId fence rode the base compaction: a replay of the
    // last committed trigger is still a no-op, not a double-land
    assert(!Ingest.ingestBatch(wh, "docs", frame(b2), 2L,
      textIdx = Some("ti"), annIdx = Some("ann")),
      "base compaction lost the stream high-water mark")
  }

  test("streamIndexed(optimizeEvery): in-stream maintenance keeps the footprint bounded; consistency holds throughout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = bootstrap("ingest_optevery")
    val src = MemoryStream[(Long, String, Seq[Float])]
    val q = Ingest.streamIndexed(wh, "docs",
      src.toDF().toDF("doc_id", "text", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")),
      tmp("ingest_oe_ckpt"), textIdx = Some("ti"), annIdx = Some("ann"),
      optimizeEvery = Some(2))
    try {
      // four one-doc triggers: maintenance fires after the 2nd and
      // 4th landed batches, INSIDE foreachBatch (trigger-serialized —
      // the single-maintainer contract by construction)
      corpus.slice(30, 34).foreach { row =>
        src.addData(row); q.processAllAvailable()
      }
      assert(wh.countRows("docs").contains(34L))
      consistent(wh)
      // the 4th trigger's optimize just ran: df is folded to one row
      // per live term and the per-trigger file debris is packed
      val segs = wh.table("ti_df").count()
      val live = wh.table("ti_df").select("term").distinct().count()
      assert(segs == live,
        s"df segments not folded by the in-stream optimize: $segs rows " +
          s"for $live terms")
      def files(t: String) = wh.describeDetail(t).toMap
        .apply("numFiles").toInt
      assert(files("docs") <= 2 && files("ti_postings") <= 2,
        s"debris not packed: docs=${files("docs")} " +
          s"postings=${files("ti_postings")}")
      // every scheduled attempt is in the maintenance ledger: two
      // optimize rows (after triggers 2 and 4), each a success carrying
      // duration + the per-step counters — the observability the old
      // silent Try lacked
      val maint = Ingest.maintLedger(wh, "docs").collect()
      assert(maint.length == 2, s"expected 2 maint rows, got " +
        s"${maint.map(_.toString).mkString("; ")}")
      assert(maint.forall(r => r.getString(0) == "optimize" &&
        r.isNullAt(4) && r.getString(3).contains("docs.files_compacted=")),
        maint.map(_.toString).mkString("; "))
    } finally q.stop()
  }

  test("property: a second-instance reader racing the ingest stream only ever sees committed batch boundaries — search ≡ fetch at every cut") {
    // the cross-instance end-to-end of the in-process race spec: one
    // Warehouse instance drives ingestBatch transactions (base + BOTH
    // indexes under one marker), a SECOND instance over the same
    // directory concurrently takes serving cuts on a randomized
    // cadence. Every cut must be coherent with SOME committed batch:
    // its doc count is exactly a batch boundary (never a torn
    // intermediate), the stored BM25 through the cut reproduces the
    // scan over the cut's OWN base table bit-for-bit, and the vector
    // index at the cut covers exactly the cut's docs. This exercises
    // the lock/marker machinery across instances — the reader shares
    // no in-memory state with the writer, only the manifest log.
    val dir = tmp("ingest_race")
    val whW = { // bootstrap through the writer's instance
      val wh = new Warehouse(spark, dir)
      wh.save("docs", frame(seed))
      TextIndex.build(wh, "ti", frame(seed))
      AnnIndex.build(wh, "ann",
        frame(seed).select(col("doc_id").as("vec_id"), col("embedding")),
        nCells = 4, m = 4, k = 8)
      wh
    }
    val whR = new Warehouse(spark, dir)
    val batches = (0 until 4).map(i => corpus.slice(30 + i * 5, 35 + i * 5))
    val boundaries = (0 to 4).map(i => 30L + i * 5).toSet
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
    @volatile var writing = true
    val rnd = new scala.util.Random(41)
    val writer = new Thread(() => {
      try batches.zipWithIndex.foreach { case (b, i) =>
        Thread.sleep(rnd.nextInt(120).toLong)
        assert(Ingest.ingestBatch(whW, "docs", frame(b), i.toLong,
          textIdx = Some("ti"), annIdx = Some("ann")))
      } catch { case e: Throwable =>
        failures.add(s"writer: ${e.getMessage}")
      } finally writing = false
    })
    val reader = new Thread(() => {
      val r2 = new scala.util.Random(42)
      try {
        var rounds = 0
        while ((writing || rounds < 2) && rounds < 30) {
          Thread.sleep(r2.nextInt(80).toLong)
          val cutMap = whR.snapshotTables(Seq("docs") ++
            TextIndex.servingTables("ti") :+ "ann_codes")
          val cut: String => org.apache.spark.sql.DataFrame = cutMap(_)
          val n = cut("docs").count()
          if (!boundaries.contains(n))
            failures.add(s"torn cut: $n docs is no batch boundary")
          // search ≡ fetch AT THE CUT: the stored index reproduces
          // the scan over the cut's own base table
          val scan = TextAnalysis.bm25TopK(cut("docs"),
              TextAnalysis.bm25Query, 50)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
            .filter(_._3 > 0.0).toSeq
          val stored = TextIndex.queryOn(cut, "ti",
              TextAnalysis.bm25Query, 50)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
            .toSeq
          if (scan != stored)
            failures.add(s"cut at $n docs: stored BM25 ≠ scan")
          // the vector index at the cut covers exactly the cut's docs
          val coded = cut("ann_codes").count()
          if (coded != n)
            failures.add(s"cut at $n docs has $coded code rows")
          rounds += 1
        }
      } catch { case e: Throwable =>
        failures.add(s"reader: ${e.getMessage}")
      }
    })
    writer.start(); reader.start()
    writer.join(120000); reader.join(120000)
    assert(failures.isEmpty,
      failures.toArray.mkString("; "))
    assert(whW.countRows("docs").contains(50L))
    consistent(whR) // final state coherent through the reader instance
  }

  test("optimizeLogged: a failing maintenance attempt lands an ERROR row and does NOT throw (the stream-safety contract); SQL surfaces the ledger") {
    val wh = bootstrap("ingest_maint")
    // success: counters land in the row's detail
    assert(Ingest.optimizeLogged(wh, "docs", textIdx = Some("ti"))
      .nonEmpty)
    // failure: a maintenance target that cannot be optimized (the
    // index doesn't exist) — the persistent-failure shape. The call
    // must RETURN, not throw: streamIndexed runs this verbatim inside
    // foreachBatch after the batch committed, so a throw here would
    // fail a committed batch — and the stream only keeps committing
    // because this contract holds
    assert(Ingest.optimizeLogged(wh, "docs", textIdx = Some("no_such"))
      .isEmpty)
    val led = Ingest.maintLedger(wh, "docs").collect()
    assert(led.length == 2, led.map(_.toString).mkString("; "))
    val ok = led.filter(_.isNullAt(4))
    val err = led.filterNot(_.isNullAt(4))
    assert(ok.length == 1 && err.length == 1)
    assert(ok.head.getString(0) == "optimize" &&
      ok.head.getString(3).contains("ti.df_segments_folded="),
      ok.head.toString)
    assert(err.head.getString(0) == "optimize" &&
      err.head.getString(4).nonEmpty, err.head.toString)
    assert(err.head.getLong(2) >= 0L) // duration recorded on failure too
    // the on-call read path: DESCRIBE INGEST LOG docs MAINT
    wh.enableSql()
    val viaSql = spark.sql(
      "DESCRIBE INGEST LOG docs MAINT").collect()
    assert(viaSql.length == 2 &&
      viaSql.count(!_.isNullAt(4)) == 1, viaSql.mkString("; "))
  }

  test("maint ledger rides the size-tiered fold: N recorded attempts leave O(1) files, rows intact") {
    val wh = bootstrap("ingest_maint_fold")
    // 20 recorded attempts (> the 16-file fold trigger): the failure
    // path is the cheap one — each lands one error row
    val n = 20
    (1 to n).foreach { _ =>
      assert(Ingest.optimizeLogged(wh, "docs",
        textIdx = Some("no_such_idx")).isEmpty)
    }
    val led = Ingest.maintLedger(wh, "docs").collect()
    assert(led.length == n, s"rows must be conserved: ${led.length}")
    assert(led.forall(!_.isNullAt(4)), "every attempt was an error row")
    // the ledger of the debris-folding operation must not itself be
    // debris: one row per attempt would otherwise be one FILE per
    // attempt forever
    val files = wh.describeDetail(Ingest.maintTable("docs"))
      .toMap[String, String].apply("numFiles").toInt
    assert(files < 16,
      s"maint ledger accumulated $files files for $n attempts — " +
        "the fold never ran")
  }

  test("the RECORDER's own failure is visible in DESCRIBE INGEST LOG MAINT, not just stderr") {
    val dir = tmp("ingest_maint_rec")
    val wh = new Warehouse(spark, dir)
    wh.save("docs", frame(seed))
    TextIndex.build(wh, "ti", frame(seed))
    // force recordMaint's append to fail: a regular FILE squats on the
    // maint table's directory path, so the ledger write itself throws
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, Ingest.maintTable("docs")),
      "squatter".getBytes)
    // the host operation survives (counters returned), the recorder
    // fails silently to stderr — and COUNTS it
    assert(Ingest.optimizeLogged(wh, "docs", textIdx = Some("ti"))
      .nonEmpty)
    val led = Ingest.maintLedger(wh, "docs").collect()
    val rec = led.filter(_.getString(0) == "maint_recorder")
    assert(rec.length == 1, led.mkString("; "))
    assert(rec.head.getString(3).contains("append_failures=1"),
      rec.head.toString)
    assert(!rec.head.isNullAt(4) &&
      rec.head.getString(4).contains("MISSING"), rec.head.toString)
    // the on-call SQL read surfaces the same synthetic row
    wh.enableSql()
    val viaSql = spark.sql("DESCRIBE INGEST LOG docs MAINT").collect()
    assert(viaSql.exists(r => r.getString(0) == "maint_recorder" &&
      r.getString(3).contains("append_failures=1")),
      viaSql.mkString("; "))
  }
}
