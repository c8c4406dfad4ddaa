package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (the [[AnnBatchScale]] tradition — not library surface):
  * measures what index OPTIMIZE is FOR, recorded in BASELINE.md. The
  * claim under test: a long-lived incremental index accumulates
  * refresh debris — small postings/codes files (one per touched
  * partition per micro-batch) and df LSM segments — so serving cost
  * drifts upward with every maintenance event even though the CORPUS
  * is unchanged; one `optimize()` (segment fold + size-tiered debris
  * pack) restores the from-scratch build's serving profile without
  * changing any answer.
  *
  * Protocol per family: build FRESH (one shot over the whole corpus),
  * build INCREMENTAL (seed + N micro-refreshes over the same corpus),
  * time the same stored-index query on both (median of 3), optimize
  * the incremental one, time again, and assert the answers stayed
  * byte-identical while reporting files/segments at each stage.
  *
  * Usage: runMain graft.MaintScale [sfDir] [microBatches]
  */
object MaintScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = if (args.length > 1) args(1).toInt else 40
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-maintscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def wh() = new graft.olist.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("maintscale").toString)
    def timeMedian3(body: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }

    // ── TEXT: BM25 over fresh vs debris-laden vs optimized ─────────
    val docs = Tables.documents(spark, src)
    val nDocs = docs.agg(max("doc_id")).first().getLong(0) + 1
    val step = math.max(1L, nDocs / batches)
    val whFresh = wh()
    graft.operators.TextIndex.build(whFresh, "ti", docs)
    val whInc = wh()
    graft.operators.TextIndex.build(whInc, "ti",
      docs.filter(col("doc_id") < step))
    var lo = step
    while (lo < nDocs) {
      graft.operators.TextIndex.refresh(whInc, "ti",
        docs.filter(col("doc_id") < lo + step))
      lo += step
    }
    val terms = graft.operators.TextAnalysis.bm25Query
    def bm25(w: graft.olist.Warehouse) =
      graft.operators.TextIndex.query(w, "ti", terms, 10).collect()
    def tiState(w: graft.olist.Warehouse): String = {
      val d = graft.operators.TextIndex.describe(w, "ti").toMap
      s"postings_files=${d("postings_files")} " +
        s"df_files=${d("df_segment_files")} " +
        s"df_rows=${d("df_segment_rows")}"
    }
    bm25(whFresh); bm25(whInc) // warm
    val ansFresh = bm25(whFresh).toSeq
    val ansDebris = bm25(whInc).toSeq
    val tF = timeMedian3 { bm25(whFresh); () }
    val tD = timeMedian3 { bm25(whInc); () }
    println(f"[text] fresh      $tF%7.3f s  ${tiState(whFresh)}")
    println(f"[text] debris($batches%2d) $tD%7.3f s  ${tiState(whInc)}")
    graft.operators.TextIndex.optimize(whInc, "ti")
    val ansOpt = bm25(whInc).toSeq
    val tO = timeMedian3 { bm25(whInc); () }
    println(f"[text] optimized  $tO%7.3f s  ${tiState(whInc)}")
    require(ansDebris == ansFresh && ansOpt == ansFresh,
      "[text] answers diverged across maintenance states")

    // ── ANN: stored-probe over fresh vs debris-laden vs optimized ──
    val emb = Tables.embeddings(spark, src)
    val nVec = emb.agg(max("vec_id")).first().getLong(0) + 1
    val vstep = math.max(1L, nVec / batches)
    val whAF = wh()
    graft.operators.AnnIndex.build(whAF, "ann", emb)
    // the incremental twin trains on its seed slice, so its RANKINGS
    // legitimately differ from the fresh build's (frozen-codebook
    // semantics); the answer-identity requirement is within whAI
    // across optimize, and the timing contrast is debris vs packed
    val whAI = wh()
    graft.operators.AnnIndex.build(whAI, "ann",
      emb.filter(col("vec_id") < vstep))
    var vlo = vstep
    while (vlo < nVec) {
      graft.operators.AnnIndex.refresh(whAI, "ann",
        emb.filter(col("vec_id") < vlo + vstep))
      vlo += vstep
    }
    val qids = emb.select("vec_id").orderBy("vec_id").limit(8)
      .collect().map(_.getLong(0)).toSeq
    def probe(w: graft.olist.Warehouse) =
      graft.operators.AnnIndex.queryBatch(w, "ann", emb, qids).collect()
    def annState(w: graft.olist.Warehouse): String =
      s"codes_files=${graft.operators.AnnIndex.describe(w, "ann")
        .toMap.apply("codes_files")}"
    probe(whAF); probe(whAI) // warm
    val tAF = timeMedian3 { probe(whAF); () }
    val tAD = timeMedian3 { probe(whAI); () }
    println(f"[ann]  fresh      $tAF%7.3f s  ${annState(whAF)}")
    println(f"[ann]  debris($batches%2d) $tAD%7.3f s  ${annState(whAI)}")
    val ansAD = probe(whAI).toSeq
    graft.operators.AnnIndex.optimize(whAI, "ann")
    val tAO = timeMedian3 { probe(whAI); () }
    println(f"[ann]  optimized  $tAO%7.3f s  ${annState(whAI)}")
    require(probe(whAI).toSeq == ansAD,
      "[ann] optimize changed probe answers")
    spark.stop()
  }
}
