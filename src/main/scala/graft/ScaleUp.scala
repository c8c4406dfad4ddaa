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
      * copy × its given stride so replicas never cross-join. */
    def replicate(df: DataFrame, offsets: Map[String, Long]): DataFrame =
      (0 until copies).map { i =>
        offsets.foldLeft(df) { case (d, (k, o)) =>
          d.withColumn(k, col(k) + lit(i * o))
        }
      }.reduce(_ unionByName _)

    def maxOf(df: DataFrame, k: String): Long = df.agg(max(col(k))).head.getLong(0)

    // the order key appears on BOTH orders and lineitem — one SHARED
    // stride, or replica i's lineitems would point at wrong orders
    val orders = raw("orders"); val lineitem = raw("lineitem")
    val orderStride =
      math.max(maxOf(orders, "o_orderkey"), maxOf(lineitem, "l_orderkey")) + 1L
    write(replicate(orders, Map("o_orderkey" -> orderStride)), "orders")
    write(replicate(lineitem, Map("l_orderkey" -> orderStride)), "lineitem")
    val events = raw("events")
    write(replicate(events, Map(
      "event_id" -> (maxOf(events, "event_id") + 1L),
      "user_id" -> (maxOf(events, "user_id") + 1L))), "events")
    val docs = raw("documents")
    write(replicate(docs, Map("doc_id" -> (maxOf(docs, "doc_id") + 1L))), "documents")
    val emb = raw("embeddings")
    write(replicate(emb, Map("vec_id" -> (maxOf(emb, "vec_id") + 1L))), "embeddings")
    println(s"wrote ${copies}x $src -> $out")
    spark.stop()
  }
}
