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
}
