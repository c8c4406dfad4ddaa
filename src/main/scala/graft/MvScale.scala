package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (like [[ScaleUp]] — not library surface): measures
  * incremental MV maintenance against full recomputation on a
  * high-cardinality aggregate, recorded in BASELINE.md.
  *
  * Usage: runMain graft.MvScale [sfDir] [copies]
  */
object MvScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-mvscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("mvscale").toString
    val wh = new graft.olist.Warehouse(spark, dir)

    // fact: lineitem replicated with shifted order keys → copies × rows
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val fact = (0 until copies).map(i => li
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tSave) = time(wh.save("fact", fact))
    val n = wh.table("fact").count()

    // MV: per-part units + revenue (high-cardinality keys → real file
    // surgery, not a toy group count)
    val (_, tBoot) = time(wh.refreshAggregate("fact", "mv",
      Seq("l_partkey"), Seq("l_quantity"), bootstrapFiles = 32))
    val groups = wh.table("mv").count()

    // daily delta: 5k rows touching ~1k parts
    val delta = li.limit(5000)
      .withColumn("l_orderkey", col("l_orderkey") + lit(990000000L))
    wh.append("fact", delta)
    val (res, tInc) = time(wh.refreshAggregate("fact", "mv",
      Seq("l_partkey"), Seq("l_quantity")))

    // the alternative a user without IVM pays: full recompute
    val (_, tFull) = time {
      wh.table("fact").groupBy("l_partkey")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_l_quantity"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"MVSCALE rows=$n groups=$groups save=$tSave%.1f " +
      f"bootstrap=$tBoot%.1f incremental=$tInc%.2f " +
      f"(keys=${res.keysChanged}, files=${res.filesRewritten}) " +
      f"full_recompute=$tFull%.1f speedup=${tFull / tInc}%.1fx")
    spark.stop()
  }
}
