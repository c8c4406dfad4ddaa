package graft.olist

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-time CHECK constraints (reference: the SSIS data flow's
  * per-column errorRowDisposition — FailComponent / IgnoreFailure /
  * error output — `Package.dtsx:61,227,349`): declared once, stored in
  * the manifest metadata, enforced on every append from any instance.
  */
class ChecksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("fail disposition blocks the whole batch; NULL passes (SQL CHECK)") {
    import spark.implicits._
    val dir = tmp("wh_chk")
    val wh = new Warehouse(spark, dir)
    wh.save("t", Seq((1L, 10.0)).toDF("k", "v").coalesce(1))
    wh.addCheck("t", "v_nonneg", "v >= 0", onViolation = "fail")
    assert(wh.history("t").last.op == "alter-check")
    // clean batch lands
    wh.append("t", Seq((2L, 5.5)).toDF("k", "v").coalesce(1))
    assert(wh.table("t").count() == 2)
    // violating batch: throws, NOTHING commits (atomicity)
    val ver = wh.tableVersions("t").last
    val ex = intercept[IllegalArgumentException] {
      wh.append("t", Seq((3L, 1.0), (4L, -7.0)).toDF("k", "v").coalesce(1))
    }
    assert(ex.getMessage.contains("v_nonneg"))
    assert(wh.table("t").count() == 2)
    assert(wh.tableVersions("t").last == ver)
    // NULL predicate value passes, like SQL CHECK
    wh.append("t", Seq[(Long, java.lang.Double)]((5L, null))
      .toDF("k", "v").coalesce(1))
    assert(wh.table("t").count() == 3)
    // a non-boolean or non-resolving expression is rejected at declare time
    intercept[Exception] { wh.addCheck("t", "bad", "k + 1") }
    intercept[Exception] { wh.addCheck("t", "bad", "no_such_col > 0") }
  }

  test("drop filters silently, quarantine routes to <table>_rejects") {
    import spark.implicits._
    val dir = tmp("wh_chk2")
    val wh = new Warehouse(spark, dir)
    wh.save("t", Seq((1L, 10.0)).toDF("k", "v").coalesce(1))
    wh.addCheck("t", "k_known", "k < 100", onViolation = "drop")
    wh.addCheck("t", "v_nonneg", "v >= 0", onViolation = "quarantine")
    wh.append("t", Seq(
      (2L, 5.0),     // clean
      (500L, 1.0),   // k_known fails → dropped
      (3L, -2.0),    // v_nonneg fails → quarantined
      (600L, -9.0)   // fails BOTH → first declared soft check (drop) wins
    ).toDF("k", "v").coalesce(1))
    val ks = wh.table("t").select("k").as[Long].collect().sorted.toSeq
    assert(ks == Seq(1L, 2L), s"main table keys: $ks")
    val rej = wh.table("t_rejects")
      .select("k", "_check").as[(Long, String)].collect().toSeq
    assert(rej == Seq((3L, "v_nonneg")), s"rejects: $rej")
    // the quarantine row carries the full original record
    assert(wh.table("t_rejects").select("v").as[Double].collect().toSeq ==
      Seq(-2.0))
  }

  test("checks persist across instances and restore; dropCheck removes") {
    import spark.implicits._
    val dir = tmp("wh_chk3")
    val wh = new Warehouse(spark, dir)
    wh.save("t", Seq((1L, 1.0)).toDF("k", "v").coalesce(1))     // v1
    wh.addCheck("t", "v_nonneg", "v >= 0")                      // v2
    // a FRESH instance enforces the same check (manifest metadata)
    val wh2 = new Warehouse(spark, dir)
    intercept[IllegalArgumentException] {
      wh2.append("t", Seq((2L, -1.0)).toDF("k", "v").coalesce(1))
    }
    assert(wh2.checks("t").map(_.name) == Seq("v_nonneg"))
    // dropping re-opens the gate
    wh2.dropCheck("t", "v_nonneg")
    wh2.append("t", Seq((2L, -1.0)).toDF("k", "v").coalesce(1))
    assert(wh2.table("t").count() == 2)
    assert(wh.checks("t").isEmpty)
  }
}
