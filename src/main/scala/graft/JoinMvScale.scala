package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (like [[MvScale]] — not library surface): measures
  * incremental JOIN-view maintenance against full recomputation,
  * recorded in BASELINE.md. The scenario is the production CDC shape:
  * a large id-clustered fact, a broadcast-sized dim, a trickle delta
  * (small append + point delete + one dim-key update), then ONE
  * refreshJoinView — which must cost O(delta), not O(fact).
  *
  * Usage: runMain graft.JoinMvScale [sfDir] [copies]
  */
object JoinMvScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-joinmvscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("joinmvscale").toString
    val wh = new graft.olist.Warehouse(spark, dir)

    val ord = spark.read.parquet(s"$src/orders.parquet")
    val fact = (0 until copies).map(i => ord
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    val dim = spark.read.parquet(s"$src/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // id-clustered fact: the bounded-delta re-derive probe file-prunes
    val (_, tSave) = time {
      wh.save("fact", fact.repartitionByRange(32, col("o_orderkey")),
        clusterBy = Seq("o_orderkey"))
      wh.save("dim", dim.coalesce(1))
    }
    val n = wh.table("fact").count()

    val (_, tBoot) = time(wh.refreshJoinView("fact", "dim", "mv",
      Seq("o_custkey"), "o_orderkey", bootstrapFiles = 32))

    // lane 1 — trickle fact CDC (the dominant shape): 200-row append +
    // 100-id point delete. Both affected-id sets are range-local, so
    // the id-clustered layouts let the refresh prune probe and
    // re-derive to a few candidate files.
    val delta = ord.limit(200)
      .withColumn("o_orderkey", col("o_orderkey") + lit(990000000L))
    wh.append("fact", delta)
    wh.delete("fact", col("o_orderkey").isin((0L until 100L): _*))
    val (res, tInc) = time(wh.refreshJoinView("fact", "dim", "mv",
      Seq("o_custkey"), "o_orderkey"))

    // lane 2 — a dim payload update on one popular key: every view row
    // of that key rewrites, and a popular key lives in EVERY file of
    // an id-clustered view — denormalization's inherent dim-churn
    // cost, reported separately so lane 1's O(delta) claim is honest.
    wh.update("dim", col("o_custkey") === 7L,
      Map("c_mktsegment" -> lit("MOVED")))
    val (resD, tDim) = time(wh.refreshJoinView("fact", "dim", "mv",
      Seq("o_custkey"), "o_orderkey"))

    // the alternative without IVM: a true view rebuild (join + write —
    // a noop sink would flatter the comparison by skipping the I/O a
    // real rebuild pays)
    val (_, tFull) = time {
      wh.save("mv_rebuild",
        wh.table("fact").join(wh.table("dim"), Seq("o_custkey"))
          .repartitionByRange(32, col("o_orderkey")))
    }
    println(f"JOINMVSCALE rows=$n save=$tSave%.1f bootstrap=$tBoot%.1f " +
      f"fact_delta=$tInc%.2f (ids=${res.factIdsChanged}, " +
      f"files=${res.filesRewritten}) " +
      f"dim_update=$tDim%.2f (keys=${resD.dimKeysChanged}, " +
      f"files=${resD.filesRewritten}) " +
      f"full_rebuild=$tFull%.1f fact_delta_speedup=${tFull / tInc}%.1fx")
    spark.stop()
  }
}
