package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the formatted physical plan (and optionally
  * time) of one `SparkEntry.queries` entry against a testdata dir.
  *
  *   sbt "runMain graft.tools.PlanDump p6_not_in_anti /root/testdata/sf0.1 [time]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    if (args.length > 2 && args(2) == "time") {
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"timed: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
