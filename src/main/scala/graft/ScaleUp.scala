package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: materialize an sf1-shaped dataset by unioning the sf0.1
  * tables `copies` times with disjoint key ranges (facts get offset
  * keys so join fan-outs stay realistic; dims stay dim-sized, as they
  * do at real TPC-H scale growth). Used once per round to record the
  * scale trend in BASELINE.md — NOT part of the library surface.
  *
  * Usage: runMain graft.ScaleUp [srcDir] [outDir] [copies]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ns → long
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    // dims: verbatim (broadcast-sized at any sf)
    Seq("region", "nation", "customer", "supplier", "part").foreach(t =>
      write(raw(t), t))

    /** Union `copies` shifted replicas; each key column is offset by
      * copy × (max+1) so replicas never cross-join each other. */
    def replicate(df: DataFrame, keys: Seq[String]): DataFrame = {
      val offsets = keys.map(k =>
        k -> (df.agg(max(col(k))).head.getLong(0) + 1L)).toMap
      (0 until copies).map { i =>
        keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i * offsets(k))))
      }.reduce(_ unionByName _)
    }

    write(replicate(raw("orders"), Seq("o_orderkey")), "orders")
    write(replicate(raw("lineitem"), Seq("l_orderkey")), "lineitem")
    write(replicate(raw("events"), Seq("event_id", "user_id")), "events")
    write(replicate(raw("documents"), Seq("doc_id")), "documents")
    write(replicate(raw("embeddings"), Seq("vec_id")), "embeddings")
    println(s"wrote ${copies}x $src -> $out")
    spark.stop()
  }
}
