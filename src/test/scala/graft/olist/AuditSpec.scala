package graft.olist

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The warehouse fsck ([[Warehouse.audit]] / SQL `AUDIT TABLE`):
  * corruption should be a finding on a report, not a FileNotFound (or
  * a silently short count) inside some later query. Each scenario
  * tampers with the disk behind the manifest's back and asserts the
  * audit names the damage; the clean path asserts zero findings and
  * that the audit itself commits nothing.
  */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Regular files under `dir` (recursive), skipping `_`/`.` names —
    * the same visibility rule the audit's orphan walk applies. */
  private def dataFilesUnder(dir: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Nil
    else java.nio.file.Files.walk(p).iterator().asScala
      .filter(f => java.nio.file.Files.isRegularFile(f) &&
        !f.getFileName.toString.startsWith("_") &&
        !f.getFileName.toString.startsWith("."))
      .toSeq
  }

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Seq[(String, String, String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toSeq

  /** Write a one-part parquet of `df` and return the part file. */
  private def onePartFile(df: org.apache.spark.sql.DataFrame)
      : java.nio.file.Path = {
    val stage = tmp("audit_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    dataFilesUnder(stage).find(_.toString.endsWith(".parquet")).get
  }

  /** Swap `fake` in over `target`, dropping the local filesystem's
    * stale `.crc` sidecar — without that, Hadoop's checksum layer
    * rejects the read outright and the audit reports the (also
    * correct, but different) `unreadable` finding instead of the
    * count mismatch this scenario pins. */
  private def swapIn(fake: java.nio.file.Path,
      target: java.nio.file.Path): Unit = {
    java.nio.file.Files.copy(fake, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.deleteIfExists(
      target.getParent.resolve("." + target.getFileName + ".crc"))
  }

  test("clean table: every category ok, audit is read-only") {
    import spark.implicits._
    val dir = tmp("wh_audit_clean")
    val wh = new Warehouse(spark, dir)
    wh.save("t", spark.range(4000).select(col("id").as("k"),
      (col("id") % 7).as("v")).coalesce(2), clusterBy = Seq("k"))
    wh.append("t", Seq((9001L, 1L)).toDF("k", "v").coalesce(1))
    // a point delete below the DV fraction: head carries a DvRef, so
    // the deep dv_rows check has something real to verify
    val del = wh.delete("t", col("k") === 5L)
    assert(del.filesDv >= 1, s"expected a DV delete, got $del")
    val before = wh.tableVersions("t")
    val res = rows(wh.audit("t", deep = true))
    val bad = res.filter(r => r._2 != "ok")
    assert(bad.isEmpty, s"clean table produced findings: $bad")
    val cats = res.map(_._1).toSet
    assert(Set("log_chain", "data_files", "orphan_files", "pins",
      "row_stats", "dv_rows").subsetOf(cats), cats.toString)
    // read-only: no version committed, nothing swept
    assert(wh.tableVersions("t") == before)
  }

  test("a missing data file and a missing DV sidecar are errors") {
    import spark.implicits._
    val dir = tmp("wh_audit_missing")
    val wh = new Warehouse(spark, dir)
    wh.save("t", spark.range(1000).select(col("id").as("k"),
      (col("id") % 7).as("v")).coalesce(2))
    wh.delete("t", col("k") === 3L) // DV sidecar under t/_dv/
    val dataFile = dataFilesUnder(s"$dir/t")
      .find(f => !f.toString.contains("/_dv/")).get
    java.nio.file.Files.delete(dataFile)
    val sidecar = java.nio.file.Files.walk(
      java.nio.file.Paths.get(s"$dir/t/_dv")).iterator()
    import scala.jdk.CollectionConverters._
    // the MANIFEST-referenced sidecar specifically: when an earlier
    // suite leaves a checksumming LocalFileSystem in the Hadoop FS
    // cache, a `.dv-….parquet.crc` twin sits beside it and a bare
    // "first regular file" walk can delete THAT instead — the audit
    // then rightly reports nothing and the test goes red only in
    // full-suite order
    val dv = sidecar.asScala.find(f =>
      java.nio.file.Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.delete(dv)
    val res = rows(wh.audit("t"))
    assert(res.exists(r => r._1 == "data_files" && r._2 == "error" &&
      r._3.contains(dataFile.getFileName.toString)), res.toString)
    assert(res.exists(r => r._1 == "dv_sidecars" && r._2 == "error" &&
      r._3.contains(dv.getFileName.toString)), res.toString)
  }

  test("an untracked file under the table dir is an orphan warning") {
    val dir = tmp("wh_audit_orphan")
    val wh = new Warehouse(spark, dir)
    wh.save("t", spark.range(100).toDF("k").coalesce(1))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/t/part-crashed-write.parquet"),
      Array[Byte](1, 2, 3))
    val res = rows(wh.audit("t"))
    assert(res.exists(r => r._1 == "orphan_files" && r._2 == "warn" &&
      r._3 == "part-crashed-write.parquet"), res.toString)
    // grace: a young file is not flagged when the caller allows for
    // in-flight writers
    val graced = rows(wh.audit("t", graceMs = 3600000L))
    assert(!graced.exists(r => r._1 == "orphan_files" && r._2 == "warn"),
      graced.toString)
  }

  test("an expired pin lease is a warning") {
    val dir = tmp("wh_audit_pin")
    val wh = new Warehouse(spark, dir)
    wh.save("t", spark.range(10).toDF("k").coalesce(1))
    wh.pinVersion("t", 1L, "crashed-svc", leaseMs = Some(1L))
    Thread.sleep(20)
    val res = rows(wh.audit("t"))
    assert(res.exists(r => r._1 == "pins" && r._2 == "warn" &&
      r._3 == "crashed-svc"), res.toString)
    // a live lease-less pin is clean
    wh.unpinVersion("t", "crashed-svc")
    wh.pinVersion("t", 1L, "svc")
    val clean = rows(wh.audit("t"))
    assert(clean.exists(r => r._1 == "pins" && r._2 == "ok"),
      clean.toString)
  }

  test("deep: a swapped data file fails its recorded row count") {
    import spark.implicits._
    val dir = tmp("wh_audit_swap")
    val wh = new Warehouse(spark, dir)
    wh.save("t", spark.range(500).select(col("id").as("k"),
      (col("id") % 7).as("v")).coalesce(1))
    // the shallow audit is clean — the file EXISTS; only content drifted
    val target = dataFilesUnder(s"$dir/t").head
    val fake = onePartFile(Seq((1L, 1L)).toDF("k", "v"))
    swapIn(fake, target)
    assert(!rows(wh.audit("t")).exists(_._2 == "error"))
    val res = rows(wh.audit("t", deep = true))
    assert(res.exists(r => r._1 == "row_stats" && r._2 == "error" &&
      r._4.contains("records 500") && r._4.contains("holds 1")),
      res.toString)
    // genuine corruption (garbage bytes): the fused read fails and the
    // per-file fallback isolates the culprit as an `unreadable` finding
    java.nio.file.Files.write(target, Array.fill[Byte](64)(7))
    java.nio.file.Files.deleteIfExists(
      target.getParent.resolve("." + target.getFileName + ".crc"))
    val res2 = rows(wh.audit("t", deep = true))
    assert(res2.exists(r => r._1 == "row_stats" && r._2 == "error" &&
      r._4.contains("unreadable")), res2.toString)
  }

  test("deep: a truncated DV sidecar fails its recorded position count") {
    import spark.implicits._
    val dir = tmp("wh_audit_dv")
    val wh = new Warehouse(spark, dir)
    wh.save("t", spark.range(1000).select(col("id").as("k"),
      (col("id") % 7).as("v")).coalesce(1))
    val del = wh.delete("t", col("k").isin(3L, 4L, 5L))
    assert(del.filesDv >= 1, s"expected a DV delete, got $del")
    val sidecar = dataFilesUnder(s"$dir/t/_dv").head
    val emptyDv = onePartFile(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType, nullable = false)))))
    swapIn(emptyDv, sidecar)
    val res = rows(wh.audit("t", deep = true))
    assert(res.exists(r => r._1 == "dv_rows" && r._2 == "error" &&
      r._4.contains("records 3") && r._4.contains("holds 0")),
      res.toString)
  }

  test("AUDIT TABLE [DEEP] as SQL; errors sort first") {
    val dir = tmp("wh_audit_sql")
    val wh = new Warehouse(spark, dir).enableSql()
    wh.save("t", spark.range(100).toDF("k").coalesce(1))
    val clean = spark.sql("AUDIT TABLE t DEEP").collect()
    assert(clean.nonEmpty && clean.forall(_.getString(1) == "ok"),
      clean.mkString(", "))
    java.nio.file.Files.delete(dataFilesUnder(s"$dir/t").head)
    val res = spark.sql("AUDIT TABLE t").collect()
    assert(res.head.getString(1) == "error", res.mkString(", "))
    assert(res.head.getString(0) == "data_files")
  }
}
