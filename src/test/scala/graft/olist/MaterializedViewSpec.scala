package graft.olist

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental view maintenance: `Warehouse.refreshAggregate` keeps an
  * aggregate table in step with its base through appends, deletes,
  * updates and merges by reading ONLY the row-level change feed — the
  * base is never rescanned after bootstrap, and the applied base
  * version rides the MV's own manifest commit (exactly-once).
  */
class MaterializedViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Full recompute of what the MV must equal. */
  private def expected(wh: Warehouse): Set[(Long, Long, Long)] =
    wh.table("b").groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def mvRows(wh: Warehouse): Set[(Long, Long, Long)] =
    wh.table("mv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("refreshAggregate maintains cnt/sum through the whole CRUD cycle") {
    import spark.implicits._
    val dir = tmp("wh_mv")
    val wh = new Warehouse(spark, dir)
    // base: unique id (merge key), group key g, value v, partition year
    val base = spark.range(1000).select(col("id"),
      (col("id") % 10).as("g"), col("id").as("v"), lit(2020).as("year"))
    wh.save("b", base.repartition(2), partitionBy = Seq("year"))        // b v1

    // bootstrap: one full aggregation, version stamped
    val boot = wh.refreshAggregate("b", "mv", keys = Seq("g"), sums = Seq("v"))
    assert(boot.bootstrapped)
    assert(mvRows(wh) == expected(wh))
    assert(wh.history("mv").last.op == "mv-refresh")

    // append: an existing group grows, a brand-new group appears
    wh.append("b", Seq((9001L, 3L, 50L, 2020), (9002L, 12L, 7L, 2020))
      .toDF("id", "g", "v", "year").coalesce(1))                        // b v2
    val r1 = wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
    assert(!r1.bootstrapped && r1.keysChanged == 2, r1.toString)
    assert(mvRows(wh) == expected(wh))

    // delete: group 5 disappears entirely → zero-count row REMOVED
    wh.delete("b", col("g") === 5L)                                     // b v3
    val r2 = wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
    assert(mvRows(wh) == expected(wh))
    assert(!mvRows(wh).exists(_._1 == 5L))

    // update: group 7's values shift in place
    wh.update("b", col("g") === 7L, Map("v" -> (col("v") + 1L)))        // b v4
    val r3 = wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
    assert(r3.keysChanged == 1)
    assert(mvRows(wh) == expected(wh))

    // merge: one row's value replaced, one new row upserted
    wh.merge("b", Seq((7L, 7L, 1000L, 2020), (9100L, 4L, 11L, 2020))
      .toDF("id", "g", "v", "year"), keys = Seq("id"))                  // b v5
    wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
    assert(mvRows(wh) == expected(wh))

    // exactly-once: nothing new → no commit, same version
    val ver = wh.tableVersions("mv").last
    val r4 = wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
    assert(r4.keysChanged == 0 && r4.fromVersion == r4.toVersion)
    assert(wh.tableVersions("mv").last == ver)

    // row-neutral base compaction: the mark advances, zero files rewritten
    wh.compact("b")                                                     // b v6
    val r5 = wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
    assert(r5.keysChanged == 0 && r5.filesRewritten == 0 && r5.toVersion > r5.fromVersion)
    assert(mvRows(wh) == expected(wh))
  }

  test("refresh rewrites only the MV files holding affected keys") {
    import spark.implicits._
    val dir = tmp("wh_mvsurg")
    val wh = new Warehouse(spark, dir)
    wh.save("b", spark.range(10000).select(col("id"),
      (col("id") % 100).as("g"), lit(1L).as("v"), lit(2020).as("year"))
      .repartition(2), partitionBy = Seq("year"))
    wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"), bootstrapFiles = 8)
    val root = java.nio.file.Paths.get(dir, "mv")
    def digests(): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith("."))
        .map { p =>
          val md = java.security.MessageDigest.getInstance("MD5")
          p.toString -> md.digest(java.nio.file.Files.readAllBytes(p))
            .map("%02x".format(_)).mkString
        }.toMap
    }
    val total = wh.scanFileCounts("mv", Nil)._2
    val before = digests()
    // touch exactly one group
    wh.append("b", Seq((90001L, 42L, 5L, 2020)).toDF("id", "g", "v", "year")
      .coalesce(1))
    val res = wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
    assert(res.keysChanged == 1)
    assert(res.filesRewritten < total,
      s"rewrote ${res.filesRewritten} of $total MV files for one group")
    // the files that survived are byte-identical
    val after = digests()
    val common = before.keySet intersect after.keySet
    assert(common.nonEmpty)
    common.foreach(p => assert(before(p) == after(p), s"$p changed bytes"))
    // and the view is exact
    val g42 = wh.table("mv").filter(col("g") === 42L)
      .select("cnt", "sum_v").collect()(0)
    assert(g42.getLong(0) == 101 && g42.getLong(1) == 105)
  }

  test("unrecorded base rewrite refuses; full=true re-bootstraps; wrong base refused") {
    import spark.implicits._
    val dir = tmp("wh_mvguard")
    val wh = new Warehouse(spark, dir)
    wh.save("b", spark.range(100).select(col("id"), (col("id") % 5).as("g"),
      col("id").as("v"), lit(2020).as("year")).coalesce(1),
      partitionBy = Seq("year"))
    wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
    // save-over: a rewrite the feed cannot describe
    wh.save("b", spark.range(50).select(col("id"), (col("id") % 5).as("g"),
      col("id").as("v"), lit(2020).as("year")).coalesce(1),
      partitionBy = Seq("year"))
    val ex = intercept[IllegalArgumentException] {
      wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
    }
    assert(ex.getMessage.contains("rewrite"))
    val rb = wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"), full = true)
    assert(rb.bootstrapped)
    assert(mvRows(wh) == expected(wh))
    // an MV refuses to refresh from a table it does not track
    wh.save("other", Seq((1L, 1L, 1L, 2020)).toDF("id", "g", "v", "year"),
      partitionBy = Seq("year"))
    val ex2 = intercept[IllegalArgumentException] {
      wh.refreshAggregate("other", "mv", Seq("g"), Seq("v"))
    }
    assert(ex2.getMessage.contains("tracks"))
  }
}
