package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale techniques: salting equivalence and bucketed co-located joins. */
class ScaleTechniquesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf)
    val sup = Tables.supplier(spark, sf)
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(sup, Seq("l_suppkey"))
      .agg(count(lit(1)), sum("l_quantity"), sum("s_acctbal")).head
    val salted = Skew.saltedJoin(li, sup, "l_suppkey", 8)
      .agg(count(lit(1)), sum("l_quantity"), sum("s_acctbal")).head
    assert(plain == salted)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_suppkey")
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"))
      .orderBy("l_suppkey").collect().toSeq
    val salted = Skew.saltedSum(li, "l_suppkey", "l_quantity", 8)
      .select(col("l_suppkey"), col("sum_l_quantity").as("sq"), col("n_rows").as("n"))
      .orderBy("l_suppkey").collect().toSeq
    assert(direct == salted)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val wdir = "/tmp/graft-test-warehouse"
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wdir/b_orders").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity")).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wdir/b_lineitem").saveAsTable("b_lineitem")
    val j = spark.table("b_lineitem").join(spark.table("b_orders"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(j.count() == Tables.lineitem(spark, sf).count())
  }
}
