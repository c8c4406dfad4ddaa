package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (the [[ContamScale]] tradition — not library surface):
  * measures batched stored-ANN serving ([[operators.AnnIndex.queryBatch]])
  * against the per-query loop as the query-set size grows, recorded in
  * BASELINE.md. The claim under test: the loop pays O(|queries|)
  * driver-scheduled jobs and O(|queries|) probed-cell reads, while the
  * batch pays ONE pruned codes scan + one two-level cut regardless —
  * so batch wall-clock should stay near-flat in |queries| where the
  * loop grows linearly.
  *
  * Usage: runMain graft.AnnBatchScale [sfDir] [maxQ]
  */
object AnnBatchScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxQ = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-annbatchscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = new graft.olist.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("annbatchscale").toString)
    val emb = Tables.embeddings(spark, src)
    val n = graft.operators.AnnIndex.build(wh, "ann", emb)
    println(s"[annbatchscale] indexed $n vectors from $src")

    def timeMedian3(body: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }

    val allIds = emb.select("vec_id").orderBy("vec_id")
      .limit(maxQ).collect().map(_.getLong(0)).toSeq
    // warm both paths once (codebook/coarse reads, JVM)
    graft.operators.AnnIndex.queryBatch(wh, "ann", emb, allIds.take(1))
      .collect()
    graft.operators.AnnIndex.query(wh, "ann", emb, allIds.head).collect()

    println(f"${"nq"}%4s ${"loop_s"}%8s ${"batch_s"}%8s ${"speedup"}%8s")
    var q = 1
    while (q <= maxQ) {
      val ids = allIds.take(q)
      val tLoop = timeMedian3 {
        ids.foreach(id => graft.operators.AnnIndex
          .query(wh, "ann", emb, id).collect())
      }
      val tBatch = timeMedian3 {
        graft.operators.AnnIndex.queryBatch(wh, "ann", emb, ids).collect()
      }
      println(f"$q%4d $tLoop%8.3f $tBatch%8.3f ${tLoop / tBatch}%8.2f")
      q *= 4
    }
    spark.stop()
  }
}
