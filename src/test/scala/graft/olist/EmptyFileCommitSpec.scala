package graft.olist

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A scan task whose rows are all filtered out still writes a
  * schema-only parquet file. Those files must not reach the manifest:
  * they carry no data, bloat the log at scale, and (because a zero-row
  * file yields no group in the per-file stats aggregation) used to
  * leave the table without a metadata row count intermittently —
  * `countRows` flipped between Some and None run to run depending on
  * how the scheduler split the scan. */
class EmptyFileCommitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(n).toString

  test("zero-row part files never reach the manifest; countRows stays metadata-answerable") {
    import spark.implicits._
    (1 to 8).foreach { i =>
      val dir = tmp(s"wh_empty$i")
      val wh = new Warehouse(spark, dir)
      wh.save("raw", Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
        .toDF("id", "grp", "amt"))
      // multi-file scan + selective filter: some write task gets zero
      // rows whenever the scheduler gives it only the filtered-out file
      wh.save("staged", wh.table("raw").filter(col("amt") > 10))
      assert(wh.countRows("staged") == Some(2L),
        s"iteration $i: committed file without a row-count stat")
      assert(wh.table("staged").count() == 2L)
      // the dropped empty file is gone from disk too, not just the log
      val detail = wh.describeDetail("staged").toMap
      val committed = detail("numFiles").toInt
      val onDisk = new java.io.File(s"$dir/staged").listFiles()
        .count(f => !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      assert(onDisk == committed,
        s"iteration $i: $onDisk files on disk vs $committed committed")
    }
  }

  test("an all-empty write commits a zero-file version that still reads") {
    import spark.implicits._
    val dir = tmp("wh_allempty")
    val wh = new Warehouse(spark, dir)
    wh.save("raw", Seq((1L, "a", 10.0)).toDF("id", "grp", "amt"))
    wh.save("none", wh.table("raw").filter(col("amt") > 99))
    assert(wh.countRows("none") == Some(0L))
    assert(wh.table("none").count() == 0L)
    assert(wh.table("none").columns.toSeq == Seq("id", "grp", "amt"))
    // and appending after the empty save works normally
    wh.append("none", Seq((9L, "z", 1.0)).toDF("id", "grp", "amt"))
    assert(wh.countRows("none") == Some(1L))
  }
}
