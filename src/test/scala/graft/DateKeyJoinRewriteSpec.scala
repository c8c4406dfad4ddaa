package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DateKeyJoinRewrite resolution rule (injected by GraftExtensions,
  * active in the shared test session): a join written in the
  * reference's int→string→date parse form must be rewritten to an int
  * equi-join, and produce identical results.
  */
class DateKeyJoinRewriteSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def naiveJoin = {
    val dk = Tables.orders(spark, sf)
      .select(date_format(col("o_orderdate"), "yyyyMMdd").cast("int").as("date_key"))
      .distinct()
    Tables.lineitem(spark, sf).join(dk,
      to_date(col("date_key").cast("string"), "yyyyMMdd") === to_date(col("l_shipdate")))
  }

  test("parse-form join condition is rewritten to an int equi-join") {
    val analyzed = naiveJoin.queryExecution.analyzed.toString
    // the rewritten condition is date_key = cast(date_format(ts) as int);
    // assert on the condition itself (a bare date_format appears in the
    // dk-construction subtree regardless)
    assert(analyzed.contains("Join Inner, (date_key"),
      s"rewrite did not fire:\n$analyzed")
    assert(!analyzed.contains("to_date(cast(date_key"),
      s"parse form survived:\n$analyzed")
  }

  test("rewritten join returns the same rows as the semantic reference") {
    val viaRule = naiveJoin.count()
    // reference result computed with the already-int formulation
    val dk = Tables.orders(spark, sf)
      .select(date_format(col("o_orderdate"), "yyyyMMdd").cast("int").as("date_key"))
      .distinct()
    val direct = Tables.lineitem(spark, sf)
      .withColumn("lk", date_format(col("l_shipdate"), "yyyyMMdd").cast("int"))
      .join(dk, col("lk") === col("date_key")).count()
    assert(viaRule == direct)
  }
}
