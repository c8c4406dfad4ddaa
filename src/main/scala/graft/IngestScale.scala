package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (like [[JoinMvScale]] — not library surface): measures the
  * transactional searchable-corpus ingest ([[operators.Ingest]])
  * against base-corpus size, recorded in BASELINE.md. The claim under
  * test: a micro-batch costs O(batch WRITE work) — tokenize + encode +
  * append + one marker — with only a thin columnar membership
  * anti-join (id column reads) growing in the base, so the per-batch
  * time stays near-flat while the base grows 4×.
  *
  * Usage: runMain graft.IngestScale [sfDir] [copies] [both|ti|ann]
  */
object IngestScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 2
    val mode = if (args.length > 2) args(2) else "both"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-ingestscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("ingestscale").toString
    val wh = new graft.olist.Warehouse(spark, dir)

    val docs0 = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "text")
    val emb0 = spark.read.parquet(s"$src/embeddings.parquet")
      .select("vec_id", "embedding")
    def shifted(i: Int) = (
      docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)),
      emb0.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
    val base = (0 until copies).map(shifted).reduce { (a, b) =>
      (a._1.unionByName(b._1), a._2.unionByName(b._2)) }
    val baseDocs = base._1.join(
      base._2.withColumnRenamed("vec_id", "doc_id"), "doc_id")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tSave) = time(wh.save("docs",
      baseDocs.repartitionByRange(32, col("doc_id")),
      clusterBy = Seq("doc_id")))
    val n = wh.countRows("docs").getOrElse(-1L)
    val ti = if (mode == "ann") None else Some("ti")
    val ann = if (mode == "ti") None else Some("ann")
    val (_, tTi) = time(ti.foreach(i =>
      graft.operators.TextIndex.build(wh, i, wh.table("docs"))))
    val (_, tAnn) = time(ann.foreach(i =>
      graft.operators.AnnIndex.build(wh, i,
        wh.table("docs").select(col("doc_id").as("vec_id"),
          col("embedding")))))

    // three 500-doc batches of FRESH ids (the steady-state ingest
    // shape), each one transaction: base append + BM25 advance + ANN
    // advance under one marker
    val batchTimes = (1 to 3).map { b =>
      // pin the batch frame: a stream's micro-batch arrives
      // materialized; without this the base-sized union lineage above
      // would re-execute inside every ingest evaluation and the
      // measurement would charge the TOOL's plumbing to the library
      val batch = baseDocs.limit(500)
        .withColumn("doc_id", col("doc_id") + lit(900000000L * b))
        .localCheckpoint()
      val (_, t) = time(graft.operators.Ingest.ingestBatch(
        wh, "docs", batch, b.toLong, ti, ann))
      t
    }
    println(f"INGESTSCALE base=$n save=$tSave%.1f ti_build=$tTi%.1f " +
      f"ann_build=$tAnn%.1f " +
      batchTimes.zipWithIndex.map { case (t, i) =>
        f"batch${i + 1}=$t%.2f" }.mkString(" "))
    spark.stop()
  }
}
