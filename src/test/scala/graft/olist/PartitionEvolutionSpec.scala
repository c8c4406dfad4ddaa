package graft.olist

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition evolution (`repartitionTable`): change the layout for
  * future writes without rewriting existing data. Mixed-layout
  * snapshots must read correctly (each file's columns come from its
  * own data/directory split), path-keyed operations must refuse
  * loudly until a compact normalizes, and compact must in fact
  * normalize.
  */
class PartitionEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(n).toString

  private def rows(wh: Warehouse, t: String): Set[(Long, String, String)] =
    wh.table(t).select("id", "grp", "region").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("unpartitioned -> partitioned: old files stay, new writes land in dirs, reads union") {
    import spark.implicits._
    val dir = tmp("wh_pevo1")
    val wh = new Warehouse(spark, dir)
    wh.save("t", Seq((1L, "a", "eu"), (2L, "b", "us"))
      .toDF("id", "grp", "region"))
    val filesBefore = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getName).toSet
    wh.repartitionTable("t", Seq("grp"))
    wh.append("t", Seq((3L, "a", "apac")).toDF("id", "grp", "region"))
    // old files untouched on disk; the new file is under grp=
    val after = new java.io.File(s"$dir/t").listFiles()
    assert(filesBefore.subsetOf(
      after.filter(_.getName.endsWith(".parquet")).map(_.getName).toSet))
    assert(after.exists(f => f.isDirectory && f.getName == "grp=a"))
    // the mixed snapshot reads the full logical rows from both layouts
    assert(rows(wh, "t") ==
      Set((1L, "a", "eu"), (2L, "b", "us"), (3L, "a", "apac")))
    assert(wh.countRows("t") == Some(3L))
    assert(wh.history("t").map(_.op) == Seq("save", "repartition", "append"))
  }

  test("partitioned -> different column: reads, deletes, and time travel stay correct") {
    import spark.implicits._
    val dir = tmp("wh_pevo2")
    val wh = new Warehouse(spark, dir)
    wh.save("t", Seq((1L, "a", "eu"), (2L, "b", "us"), (3L, "b", "eu"))
      .toDF("id", "grp", "region"), partitionBy = Seq("grp"))
    wh.repartitionTable("t", Seq("region"))
    wh.append("t", Seq((4L, "c", "us")).toDF("id", "grp", "region"))
    assert(rows(wh, "t") == Set((1L, "a", "eu"), (2L, "b", "us"),
      (3L, "b", "eu"), (4L, "c", "us")))
    // predicate delete does file surgery across BOTH layouts
    val del = wh.delete("t", col("region") === "eu")
    assert(del.rowsDeleted == 2L)
    assert(rows(wh, "t") == Set((2L, "b", "us"), (4L, "c", "us")))
    // time travel reads the pre-evolution version under its own layout
    assert(wh.tableAt("t", 1L).count() == 3L)
  }

  test("path-keyed ops refuse on mixed layouts; compact normalizes and unblocks") {
    import spark.implicits._
    val dir = tmp("wh_pevo3")
    val wh = new Warehouse(spark, dir)
    wh.save("t", Seq((1L, "a", "eu"), (2L, "b", "us"))
      .toDF("id", "grp", "region"), partitionBy = Seq("grp"))
    wh.repartitionTable("t", Seq("region"))
    wh.append("t", Seq((3L, "c", "apac")).toDF("id", "grp", "region"))
    val e1 = intercept[IllegalArgumentException](wh.overwritePartitions("t",
      Seq((9L, "z", "eu")).toDF("id", "grp", "region")))
    assert(e1.getMessage.contains("different partition layout"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      wh.merge("t", Seq((2L, "b2", "us")).toDF("id", "grp", "region"),
        Seq("id")))
    assert(e2.getMessage.contains("different partition layout"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      wh.compactWhere("t", col("region") === "eu"))
    assert(e3.getMessage.contains("different partition layout"), e3.getMessage)
    // compact rewrites every file into the CURRENT scheme...
    wh.compact("t")
    val root = new java.io.File(s"$dir/t")
    assert(root.listFiles().exists(f => f.isDirectory &&
      f.getName.startsWith("region=")))
    assert(rows(wh, "t") ==
      Set((1L, "a", "eu"), (2L, "b", "us"), (3L, "c", "apac")))
    // ...after which the path-keyed ops work again
    wh.overwritePartitions("t", Seq((9L, "z", "eu"))
      .toDF("id", "grp", "region"))
    assert(rows(wh, "t") ==
      Set((9L, "z", "eu"), (2L, "b", "us"), (3L, "c", "apac")))
    wh.merge("t", Seq((2L, "b2", "us")).toDF("id", "grp", "region"), Seq("id"))
    assert(rows(wh, "t") ==
      Set((9L, "z", "eu"), (2L, "b2", "us"), (3L, "c", "apac")))
  }

  test("repartitionTable refuses unknown and renamed columns") {
    import spark.implicits._
    val dir = tmp("wh_pevo4")
    val wh = new Warehouse(spark, dir)
    wh.save("t", Seq((1L, "a", "eu")).toDF("id", "grp", "region"))
    val e1 = intercept[IllegalArgumentException](
      wh.repartitionTable("t", Seq("nope")))
    assert(e1.getMessage.contains("no column nope"), e1.getMessage)
    wh.renameColumn("t", "grp", "cohort")
    val e2 = intercept[IllegalArgumentException](
      wh.repartitionTable("t", Seq("cohort")))
    assert(e2.getMessage.contains("renamed"), e2.getMessage)
    // an un-renamed column is fine after other renames
    wh.repartitionTable("t", Seq("region"))
    wh.append("t", Seq((2L, "b", "us")).toDF("id", "cohort", "region"))
    assert(wh.table("t").count() == 2L)
  }

  test("ALTER TABLE ... PARTITIONED BY drives the evolution from SQL") {
    import spark.implicits._
    val dir = tmp("wh_pevo5")
    val wh = new Warehouse(spark, dir).enableSql()
    wh.save("t", Seq((1L, "a", "eu")).toDF("id", "grp", "region"))
    assert(spark.sql("ALTER TABLE t PARTITIONED BY (region)")
      .collect()(0).getAs[String]("status") == "OK")
    spark.sql("INSERT INTO t VALUES (2, 'b', 'us')")
    assert(new java.io.File(s"$dir/t").listFiles()
      .exists(f => f.isDirectory && f.getName == "region=us"))
    assert(spark.sql("SELECT count(*) FROM dw_t").collect()(0).getLong(0) == 2L)
    // back to unpartitioned for future writes
    spark.sql("ALTER TABLE t PARTITION BY ()")
    spark.sql("INSERT INTO t VALUES (3, 'c', 'apac')")
    assert(spark.sql("SELECT count(*) FROM dw_t").collect()(0).getLong(0) == 3L)
  }
}
