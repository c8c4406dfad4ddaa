package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (like [[IngestScale]] — not library surface): measures the
  * decontamination-firewall serving twins (b11) against SUITE size,
  * recorded in BASELINE.md. The honest claim under test: on b11's
  * layout Catalyst already prunes the raw lane's scan to the suite +
  * batch rows (the source filter pushes down), so BOTH lanes are
  * corpus-size independent — what actually diverges is the per-question
  * cost in the SUITE's volume: the raw lane re-TOKENIZES the suite's
  * text every time (split + explode + md5 + distinct over every suite
  * gram), while the stored [[operators.ContamGate]] SCANS precomputed
  * 16-byte digests. Each corpus copy here rotates the text's vowels
  * (per-copy alphabet), so every copy contributes genuinely new grams
  * and the suite's gram volume scales with `copies`.
  *
  * Usage: runMain graft.ContamScale [sfDir] [maxCopies]
  */
object ContamScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxCopies = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-contamscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{ContamGate, Dedup}

    val docs0 = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "source", "text")

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Long): Double =
      (1 to 3).map(_ => time(f)).sorted.apply(1)

    // the b11 raw shape: derive the suite's grams by re-shingling the
    // corpus's src0 docs, judge the batch against them — per question
    Seq(1, 2, maxCopies).distinct.filter(_ >= 1).foreach { copies =>
      val dir = java.nio.file.Files.createTempDirectory("contamscale").toString
      val wh = new graft.olist.Warehouse(spark, dir)
      // per-copy alphabet rotation: every copy's tokens (hence grams)
      // are distinct, so suite gram volume truly scales with copies
      val alpha = "aeiousnrt"
      val corpus = (0 until copies).map(i =>
        docs0.select(
          (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          col("source"),
          translate(col("text"), alpha,
            alpha.drop(i % 9) + alpha.take(i % 9)).as("text")))
        .reduce(_ unionByName _)
      wh.save("docs", corpus.repartitionByRange(32, col("doc_id")),
        clusterBy = Seq("doc_id"))
      val table = wh.table("docs")
      val n = wh.countRows("docs").getOrElse(-1L)
      val cutoff = docs0.agg(max("doc_id")).first().getLong(0) - 100
      val batch = table.filter(col("doc_id") > cutoff &&
        col("doc_id") <= cutoff + 100).localCheckpoint()

      def rawVerdicts(): Long = {
        val ex = table
          .select(col("doc_id"), col("source"),
            split(trim(col("text")), "\\s+").as("ts"))
          .filter(size(col("ts")) >= 8)
          .select(col("doc_id"), col("source"),
            explode(Dedup.shingles(col("ts"), 8)).as("g"))
          .select(col("doc_id"), col("source"), md5(col("g")).as("h"))
          .distinct()
        val bench = ex.filter(col("source") === "src0")
          .select("h").distinct()
        val bids = batch.select("doc_id")
        val hits = ex.join(bids, Seq("doc_id"), "left_semi")
          .join(broadcast(bench), Seq("h"))
          .groupBy("doc_id").agg(count(lit(1)).as("shared_grams"))
        bids.join(hits, Seq("doc_id"), "left").count()
      }
      val tRaw = median3(rawVerdicts())
      val tBuild = time(ContamGate.build(wh, "cg",
        table.filter(col("source") === "src0")))
      val tWh = median3(ContamGate.verdicts(wh, "cg", batch).count())
      println(f"CONTAMSCALE copies=$copies corpus=$n " +
        f"raw=$tRaw%.2f gate_build=$tBuild%.1f stored=$tWh%.2f")
    }
    spark.stop()
  }
}
