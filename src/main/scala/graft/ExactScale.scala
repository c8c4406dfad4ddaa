package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (the [[WidenScale]] tradition — not library surface):
  * measures what CELL-BOUND EXACT search is FOR, recorded in
  * BASELINE.md. The claim under test: exact (brute-force-equal)
  * ranking should cost an ADAPTIVE number of probed cells — on
  * clustered data the k-th candidate's exact distance bounds out
  * most cells after a few probes, so exactness prices near the
  * approximate probe; only adversarially spread data degrades to
  * the full scan. The pre-exact remedy ("pin nProbe = nCells")
  * forces the full-probe price on EVERY query that needs a
  * guarantee.
  *
  * Protocol: one stored IVF index over CLUSTERED vectors (the shape
  * real embedding corpora have — that is the premise of IVF), at a
  * deliberately fine geometry. For a query batch: wall time (median
  * of 3) of (a) the adaptive EXACT probe, (b) the brute-force corpus
  * scan (the only previously sound exactness path — note a PROBED
  * read at nProbe = nCells is NOT one: its ADC overquery cut is
  * still approximate, and on tightly clustered data the quantized
  * ranking cannot separate near-duplicates, so "probe everything"
  * does not buy exactness), (c) the default approximate probe (the
  * recall trade, for the floor). Exactness of (a) vs (b) is
  * asserted, not assumed.
  *
  * Usage: runMain graft.ExactScale [nVectors] [nCells] [dim]
  */
object ExactScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 50000
    val nCells = if (args.length > 1) args(1).toInt else 32
    val dim = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-exactscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.AnnIndex

    // clustered corpus: nCells/2 true centers, tight jitter — the
    // regime IVF is built for; ids deterministic, values seeded
    val centers = nCells / 2
    val emb = spark.range(n.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j => {
        val c = pmod(col("id"), lit(centers)).cast("double")
        // per-center base pattern + deterministic per-vector jitter
        sin(c * lit(7.0) + j.cast("double")) +
          sin((col("id") * lit(131) + j.cast("double") * lit(17))
            .cast("double")) * lit(0.05)
      }).as("embedding")).localCheckpoint()

    val wh = new graft.olist.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("exactscale").toString)
    AnnIndex.build(wh, "ann", emb, nCells = nCells, m = 8, k = 16)
    // the IVF-flat twin: raw vectors ride the codes rows, so its
    // exact probe reads ONLY the probed cells — zero source I/O
    AnnIndex.build(wh, "annv", emb, nCells = nCells, m = 8, k = 16,
      storeVectors = true)

    val qs: Seq[(Long, Seq[Double])] = emb
      .filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1): Seq[Double]))
      .toSeq

    def timeMedian3(body: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }

    // the pre-exact sound path: brute-force cosine over the corpus,
    // the same arithmetic exactCore's re-rank uses
    import graft.functions.VectorFunctions
    def brute(q: Seq[Double]): Seq[(Long, Double)] =
      emb.withColumn("qe", array(q.map(lit): _*))
        .select(col("vec_id"),
          round(VectorFunctions.cosineExact(col("embedding"), col("qe")), 12).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // exactness cross-check once, before timing: adaptive ≡ brute
    val read = AnnIndex.servingSnapshot(wh, "ann")
    qs.foreach { case (_, q) =>
      val qn = AnnIndex.normalizedQueryVecs(spark, Seq((0L, q))).head._2
      val (adaptive, probed) =
        AnnIndex.exactCore(read, "ann", emb, qn, 10, None, 3)
      val got = adaptive.collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      require(got == brute(q),
        s"adaptive exact diverged from brute force:\n$got\n${brute(q)}")
      println(s"  exactness ok, probed $probed/$nCells cells")
    }

    // stored-vector exactness cross-check too
    qs.foreach { case (_, q) =>
      val got = AnnIndex.queryVecExact(wh, "annv", emb, q, topK = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      require(got == brute(q),
        s"stored-vector exact diverged from brute force")
    }

    val exact = timeMedian3 {
      AnnIndex.queryVecBatchExact(wh, "ann", emb, qs, topK = 10).count()
    }
    val exactV = timeMedian3 {
      AnnIndex.queryVecBatchExact(wh, "annv", emb, qs, topK = 10).count()
    }
    val manual = timeMedian3 { qs.foreach { case (_, q) => brute(q) } }
    val approx = timeMedian3 {
      AnnIndex.queryVecBatch(wh, "ann", emb, qs, topK = 10).count()
    }
    // on a vector-storing index the approximate batch ALSO serves
    // index-only (candidate re-rank reads the probed partitions, not
    // a source scan) — the production literal-serving shape
    val approxV = timeMedian3 {
      AnnIndex.queryVecBatch(wh, "annv", emb, qs, topK = 10).count()
    }
    println(f"n=$n nCells=$nCells dim=$dim (3-query batch, median-of-3)")
    println(f"adaptive EXACT (source join)    $exact%8.3f s")
    println(f"adaptive EXACT (stored vecs)    $exactV%8.3f s")
    println(f"brute-force scan                $manual%8.3f s")
    println(f"approximate probe (source join) $approx%8.3f s")
    println(f"approximate probe (stored vecs) $approxV%8.3f s")
    spark.stop()
  }
}
