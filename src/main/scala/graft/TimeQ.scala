package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer (dev tool): runMain graft.TimeQ <sfDir> <q> [q...] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new GraftExtensions)
      .appName("graft-timeq")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.lineitem(spark, sfDir).count()
    args.tail.foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $name median=${times.sorted.apply(1)}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
