package graft.olist

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** S4/S5 sink generality: the same warehouse build round-trips through
  * every supported columnar/text format with identical fact contents.
  */
class SinkFormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val src = OlistFixtures.sources(spark)

  private def factCount(format: String): (Long, Long) = {
    val dir = java.nio.file.Files.createTempDirectory(s"olist_wh_$format").toString
    val wh = new Warehouse(spark, dir, format)
    wh.build(src)
    (wh.table("orders_fact").count(), wh.table("product").count())
  }

  private lazy val reference = factCount("parquet")

  Seq("orc", "json", "csv").foreach { fmt =>
    test(s"warehouse builds identically on $fmt") {
      assert(factCount(fmt) == reference)
    }
  }

  test("unsupported format is rejected eagerly") {
    intercept[IllegalArgumentException] {
      new Warehouse(spark, "/tmp/x", "avro")
    }
  }

  test("explicit file:// URI basePath: meta travels through the Hadoop FileSystem") {
    // csv doesn't self-describe — reading back NEEDS the _graft_meta
    // schema file, so this exercises both the meta write and read over
    // a scheme-qualified URI (the cluster-scale path shape)
    val dir = java.nio.file.Files.createTempDirectory("olist_uri").toString
    val wh = new Warehouse(spark, s"file://$dir", "csv")
    wh.build(src)
    assert(wh.table("orders_fact").count() == reference._1)
    // a NEW instance over the same URI recovers partitioning + schema
    // from meta alone (cross-job incremental scenario)
    val wh2 = new Warehouse(spark, s"file://$dir", "csv")
    assert(wh2.table("orders_fact").count() == reference._1)
    assert(wh2.table("product").count() == reference._2)
  }

  test("stats file skipping is format-agnostic: a csv table prunes like parquet") {
    // the stats agg reads the written files back through the table's
    // own format reader, so skipping works even where the format has
    // no native footers (csv) — the manifest IS the stats store
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.olist.Warehouse.ColRange
    val dir = java.nio.file.Files.createTempDirectory("wh_csv_stats").toString
    val wh = new Warehouse(spark, dir, "csv")
    wh.save("t", Seq.range(0, 100).map(i => (i.toLong, s"a$i")).toDF("k", "v")
      .coalesce(1), clusterBy = Seq("k"))
    wh.append("t", Seq.range(1000, 1100).map(i => (i.toLong, s"b$i")).toDF("k", "v")
      .coalesce(1))
    val (read, total) = wh.scanFileCounts("t",
      Seq(ColRange("k", Some(1000L), Some(1099L))))
    assert(total == 2 && read == 1, s"csv stats skipping: $read/$total")
    assert(wh.scan("t", ColRange("k", Some(1000L), Some(1050L))).count() == 51)
  }
}
