package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (the [[MaintScale]] tradition — not library surface):
  * measures what AUTO-WIDENING filtered search is FOR, recorded in
  * BASELINE.md. The claim under test: the probe cost of a filtered
  * vector search should be SELECTIVITY-ADAPTIVE — a permissive
  * predicate fills k from the nProbe nearest cells (the unfiltered
  * cost), a selective one widens only as far as it must, and only a
  * needle-rare predicate degrades to the full-cell scan. The
  * pre-widening remedy ("raise nProbe by hand") forces the WORST
  * case on every filtered query, because the caller cannot know the
  * cell layout: to guarantee k results under any predicate it must
  * probe ALL cells, paying the needle price for the permissive
  * query too.
  *
  * Protocol: one stored IVF index with a deliberately fine cell
  * geometry (so there is headroom between "a few cells" and "all
  * cells"), one literal query batch, three predicates of stepped
  * selectivity (~50% / ~10% / ~2%). For each: wall time (median of
  * 3) of the AUTO-WIDENING probe from nProbe = 3 vs the manual
  * guarantee (fixed nProbe = nCells), plus the widened result's row
  * count (must be exactly k — the correctness the widening buys).
  *
  * Usage: runMain graft.WidenScale [sfDir] [nCells]
  */
object WidenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nCells = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-widenscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.AnnIndex

    val emb = Tables.embeddings(spark, src)
    val wh = new graft.olist.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("widenscale").toString)
    AnnIndex.build(wh, "ann", emb, nCells = nCells, m = 8, k = 16)

    // three literal queries = three stored rows (contents irrelevant;
    // the probe shape is what's measured)
    val qs: Seq[(Long, Seq[Double])] = emb
      .filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1): Seq[Double]))
      .toSeq

    def timeMedian3(body: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }

    val preds = Seq(
      ("~50%", col("vec_id") % 2 === 0),
      ("~10%", col("vec_id") % 10 === 0),
      ("~2%", col("vec_id") % 50 === 0))
    println(f"${"selectivity"}%-12s ${"auto-widen"}%-12s " +
      f"${"manual nProbe=" + nCells}%-18s rows/query")
    preds.foreach { case (label, pred) =>
      var rows = 0L
      val auto = timeMedian3 {
        rows = AnnIndex.queryVecBatch(wh, "ann", emb, qs, topK = 10,
          nProbe = 3, filter = Some(pred))
          .count()
      }
      val manual = timeMedian3 {
        AnnIndex.queryVecBatch(wh, "ann", emb, qs, topK = 10,
          nProbe = nCells, filter = Some(pred))
          .count()
      }
      println(f"$label%-12s $auto%-12.3f $manual%-18.3f ${rows / 3}")
    }
    spark.stop()
  }
}
