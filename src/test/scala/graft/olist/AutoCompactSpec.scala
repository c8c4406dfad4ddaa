package graft.olist

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in small-file auto-compaction: appends that push their target
  * (table, or the touched partitions) to `graft.autocompact.minFiles`
  * files trigger a bounded inline compaction riding the write.
  */
class AutoCompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(n).toString

  private def withConf(k: String, v: String)(body: => Unit): Unit = {
    spark.conf.set(k, v)
    try body finally spark.conf.unset(k)
  }

  test("unpartitioned: appends accumulate, threshold collapses the table to one file") {
    import spark.implicits._
    val dir = tmp("wh_ac1")
    val wh = new Warehouse(spark, dir)
    withConf("graft.autocompact.minFiles", "4") {
      wh.save("t", Seq((1L, "a")).toDF("k", "v"))
      (2L to 5L).foreach(i => wh.append("t", Seq((i, s"v$i")).toDF("k", "v")))
      // save(1 file) + 3 appends = 4 files -> compacted; the 5th lands after
      val files = wh.describeDetail("t").toMap.apply("numFiles").toInt
      assert(files < 4, s"expected auto-compaction, still $files files")
      assert(wh.table("t").count() == 5L)
      assert(wh.history("t").map(_.op).contains("compact"))
      assert(wh.countRows("t") == Some(5L))
    }
  }

  test("partitioned: only the hot partition compacts; cold partition files stay byte-identical") {
    import spark.implicits._
    val dir = tmp("wh_ac2")
    val wh = new Warehouse(spark, dir)
    withConf("graft.autocompact.minFiles", "3") {
      wh.save("t", Seq((1L, "cold")).toDF("k", "p"), partitionBy = Seq("p"))
      val coldBefore = new java.io.File(s"$dir/t/p=cold").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
      (2L to 6L).foreach(i => wh.append("t", Seq((i, "hot")).toDF("k", "p")))
      val hotFiles = new java.io.File(s"$dir/t/p=hot").listFiles()
        .count(_.getName.endsWith(".parquet"))
      // 5 hot appends with threshold 3: compacted at least once (old
      // files linger on disk for time travel until vacuum — count the
      // MANIFEST, not the directory)
      val committedHot = wh.describeDetail("t").toMap.apply("numFiles").toInt
      assert(committedHot < 6, s"expected compaction, $committedHot committed")
      val coldAfter = new java.io.File(s"$dir/t/p=cold").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
      assert(coldAfter == coldBefore, "cold partition files were touched")
      assert(wh.table("t").count() == 6L)
    }
  }

  test("knob unset: no auto-compaction happens") {
    import spark.implicits._
    val dir = tmp("wh_ac3")
    val wh = new Warehouse(spark, dir)
    wh.save("t", Seq((1L, "a")).toDF("k", "v"))
    (2L to 6L).foreach(i => wh.append("t", Seq((i, s"v$i")).toDF("k", "v")))
    assert(!wh.history("t").map(_.op).contains("compact"))
  }

  test("mixed write-time layouts: auto-compaction skips silently, append succeeds") {
    import spark.implicits._
    val dir = tmp("wh_ac4")
    val wh = new Warehouse(spark, dir)
    withConf("graft.autocompact.minFiles", "2") {
      wh.save("t", Seq((1L, "a")).toDF("k", "p"), partitionBy = Seq("p"))
      wh.repartitionTable("t", Nil)
      (2L to 4L).foreach(i => wh.append("t", Seq((i, s"p$i")).toDF("k", "p")))
      assert(!wh.history("t").map(_.op).contains("compact"))
      assert(wh.table("t").count() == 4L)
    }
  }

  test("size-tiered mode: only sub-target debris counts and rewrites; the big file keeps its path across triggers") {
    import spark.implicits._
    val dir = tmp("wh_ac_tier")
    val wh = new Warehouse(spark, dir)
    withConf("graft.autocompact.minFiles", "3") {
      withConf("graft.autocompact.targetRows", "50") {
        // one 100-row file (>= target: never "small") + debris appends
        wh.save("t", (0L until 100L).map(i => (i, "x")).toDF("k", "v")
          .coalesce(1))
        def files(): Set[String] = wh.table("t")
          .select(input_file_name()).distinct()
          .collect().map(_.getString(0)).toSet
        val big = files()
        assert(big.size == 1)
        // two small appends: 2 small files < minFiles=3 -> no trigger
        (1L to 2L).foreach(i => wh.append("t",
          Seq((1000 + i, s"d$i")).toDF("k", "v")))
        assert(files().size == 3)
        // third small append crosses the threshold: the three debris
        // files fold into one, the big file keeps its exact path
        wh.append("t", Seq((1003L, "d3")).toDF("k", "v"))
        val after = files()
        assert(after.size == 2, s"expected big+folded, got ${after.size}")
        assert(big.subsetOf(after), "the compact file must keep its path")
        assert(wh.table("t").count() == 103L)
        assert(wh.countRows("t") == Some(103L))
        // the folded debris file is itself below target -> it re-enters
        // the small set with the NEXT debris wave; big still untouched
        (1L to 2L).foreach(i => wh.append("t",
          Seq((2000 + i, s"e$i")).toDF("k", "v")))
        val again = files()
        assert(again.size == 2 && big.subsetOf(again))
        assert(wh.table("t").count() == 105L)
      }
    }
  }
}
