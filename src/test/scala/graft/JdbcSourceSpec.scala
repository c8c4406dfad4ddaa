package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S3 — the JDBC pushdown source (`Sources.jdbc`), round-tripped
  * against an embedded Derby database (the JDBC engine Spark ships
  * for its Hive metastore, so no new dependency): write the Olist
  * source tables over JDBC, push the SSIS OLE DB Source's query shape
  * (`Package.dtsx:471-482` — join + filter + SUM/COUNT aggregate
  * executed ON the source server, only the result crossing the wire)
  * through `option("query", …)`, and assert schema + rows against the
  * same plan computed natively over the in-memory frames.
  */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dbDir =
    java.nio.file.Files.createTempDirectory("derby_olist").toString
  private val url = s"jdbc:derby:$dbDir/olist;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  // keep Derby's log out of the repo working directory
  System.setProperty("derby.stream.error.file", s"$dbDir/derby.log")

  test("JDBC round-trip: pushdown query result matches the native plan") {
    val src = graft.olist.OlistFixtures.sources(spark)
    val orders = src("orders")
      .select("order_id", "customer_id", "order_status",
        "order_purchase_timestamp")
    val items = src("order_items")
      .select("order_id", "product_id", "seller_id", "price")

    def jdbcWrite(df: org.apache.spark.sql.DataFrame, table: String,
        colTypes: String): Unit = {
      // Derby's default StringType mapping is CLOB, which it cannot
      // compare or group by — declare VARCHAR explicitly
      val w = df.write.format("jdbc").option("url", url)
        .option("dbtable", table)
        .option("createTableColumnTypes", colTypes).mode("overwrite")
      props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.save()
    }
    jdbcWrite(orders, "orders",
      "order_id VARCHAR(64), customer_id VARCHAR(64), order_status VARCHAR(32)")
    jdbcWrite(items, "order_items",
      "order_id VARCHAR(64), product_id VARCHAR(64), seller_id VARCHAR(64)")

    // the SSIS source query shape: inner join on order_id, status
    // filter, SUM(price)/COUNT(product_id) grouped by seller — ANSI
    // rendering of Package.dtsx:471-482 (Derby has no T-SQL CONVERT;
    // the date-key join leg is exercised natively in Facts/J6)
    // Spark's JDBC writer creates case-sensitive (quoted) lowercase
    // identifiers in Derby, so the pushdown SQL quotes them
    val pushed = Sources.jdbc(spark, url,
      """SELECT oi."seller_id" AS "seller_id",
        |       SUM(oi."price") AS "sales_total",
        |       CAST(COUNT(oi."product_id") AS BIGINT) AS "sales_quantity"
        |FROM orders o
        |INNER JOIN order_items oi ON oi."order_id" = o."order_id"
        |WHERE o."order_status" <> 'canceled'
        |GROUP BY oi."seller_id"""".stripMargin, props)

    val expected = orders.filter(col("order_status") =!= "canceled")
      .join(items, "order_id")
      .groupBy("seller_id")
      .agg(sum("price").as("sales_total"),
        count("product_id").as("sales_quantity"))

    // Derby upper-cases unquoted identifiers; compare case-insensitively
    val got = pushed.select(pushed.columns.map(c =>
      col(c).as(c.toLowerCase)): _*)
    assert(got.columns.toSeq == expected.columns.toSeq)
    assert(got.schema("sales_quantity").dataType ==
      org.apache.spark.sql.types.LongType)
    val g = got.orderBy("seller_id").collect().map(r =>
      (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2)))
    val e = expected.orderBy("seller_id").collect().map(r =>
      (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2)))
    assert(g.toSeq == e.toSeq)
    assert(g.nonEmpty)
  }

  test("JDBC source: the query executes remotely — plan has a JDBCRelation scan") {
    val df = Sources.jdbc(spark, url,
      """SELECT "order_id", "price" FROM order_items WHERE "price" > 100""",
      props)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation"), plan)
    // the WHERE ran on the server: every returned row satisfies it
    assert(df.collect().forall(_.getDouble(1) > 100))
  }
}
