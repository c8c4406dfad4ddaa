package graft.olist

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-scale throughput check: synthesizes Olist-proportioned
  * data (README.md:3 of the reference: ~100k orders, ~112k order_items,
  * ~1M geolocation rows; order dates extended into Jan 2019 so the timed incremental window is non-empty), builds the full warehouse,
  * and times build + the six report queries. This is the direct
  * comparison point against the reference's single-node SQL Server
  * workload at identical scale.
  *
  * All columns derive deterministically from spark.range ids (no
  * driver-side data generation, no RNG) — the generator itself is a
  * distributed plan, so the same code synthesizes 100× the rows on a
  * cluster by changing the counts.
  */
object ScaleBench {

  private def hexId(prefix: String, c: org.apache.spark.sql.Column) =
    md5(concat(lit(prefix), c.cast("string")))

  def sources(spark: SparkSession, nOrders: Long = 100000, nItems: Long = 112000,
      nGeo: Long = 1000000, nSellers: Long = 3000, nProducts: Long = 500,
      nLeads: Long = 8000, nDeals: Long = 842): Map[String, DataFrame] = {
    val catNames = (0 until 70).map(i => s"categoria_$i")
    val catRows = catNames.map(c => (c, s"category_${c.drop(10)}_en"))
    import spark.implicits._

    val category = (catRows :+
      ("Product_category_name_english", "Product_category_name_english"))
      .toDF("product_category_name", "product_category_name_english")

    val products = spark.range(nProducts).select(
      concat(lit("p_"), col("id")).as("product_id"),
      element_at(typedlit(catNames), pmod(col("id"), lit(70)).cast("int") + 1)
        .as("product_category_name"))

    val geo = spark.range(nGeo).select(
      pmod(col("id"), lit(1000)).cast("int").as("geolocation_zip_code_prefix"),
      (lit(-23.0) - pmod(col("id"), lit(100)) / 100.0).as("geolocation_lat"),
      (lit(-46.0) - pmod(col("id"), lit(100)) / 100.0).as("geolocation_lng"),
      concat(lit("city_"), pmod(col("id"), lit(1000))).as("geolocation_city"),
      // state derived from zip so (zip, city) determines one location —
      // independent mods would give every zip up to 27 states and fan
      // the composite-key location join 27x
      concat(lit("st"), pmod(pmod(col("id"), lit(1000)), lit(27))).as("geolocation_state"))

    val sellers = spark.range(nSellers).select(
      concat(lit("s_"), col("id")).as("seller_id"),
      pmod(col("id"), lit(1000)).cast("int").as("seller_zip_code_prefix"),
      concat(lit("CITY_"), pmod(col("id"), lit(1000))).as("seller_city"), // CI join
      concat(lit("st"), pmod(pmod(col("id"), lit(1000)), lit(27))).as("seller_state"))

    val baseTs = to_timestamp(lit("2016-09-01 00:00:00"))
    val orders = spark.range(nOrders).select(
      hexId("o", col("id")).as("order_id"),
      concat(lit("c_"), pmod(col("id"), lit(50000))).as("customer_id"),
      when(pmod(col("id"), lit(100)) === 0, "canceled")
        .when(pmod(col("id"), lit(100)) === 1, "shipped")
        .otherwise("delivered").as("order_status"),
      (baseTs + make_interval(lit(0), lit(0), lit(0), lit(0), pmod(col("id"), lit(880L * 24)).cast("int")))
        .as("order_purchase_timestamp"))
      .withColumn("order_approved_at", col("order_purchase_timestamp"))
      .withColumn("order_delivered_carrier_date", col("order_purchase_timestamp"))
      .withColumn("order_delivered_customer_date", col("order_purchase_timestamp"))
      .withColumn("order_estimated_delivery_date", col("order_purchase_timestamp"))

    val orderItems = spark.range(nItems).select(
      hexId("o", pmod(col("id"), lit(nOrders))).as("order_id"),
      lit(1).as("order_item_id"),
      concat(lit("p_"), pmod(col("id"), lit(nProducts))).as("product_id"),
      concat(lit("s_"), pmod(col("id"), lit(nSellers))).as("seller_id"),
      baseTs.as("shipping_limit_date"),
      (pmod(col("id") * 37, lit(20000)) / 100.0 + 5.0).as("price"),
      lit(10.0).as("freight_value"))

    val origins = Seq("organic_search", "paid_search", "social", "email", "direct")
    val leads = spark.range(nLeads).select(
      concat(lit("m_"), col("id")).as("mql_id"),
      (baseTs + make_interval(lit(0), lit(0), lit(0), lit(0), pmod(col("id"), lit(700L * 24)).cast("int")))
        .as("first_contact_date"),
      concat(lit("lp_"), pmod(col("id"), lit(300))).as("landing_page_id"),
      when(pmod(col("id"), lit(50)) === 0, null)
        .otherwise(element_at(typedlit(origins), pmod(col("id"), lit(5)).cast("int") + 1))
        .as("origin"))

    val segments = (0 until 30).map(i => s"category_${i}_en") // overlap product dim
    val closedDeals = spark.range(nDeals).select(
      concat(lit("m_"), pmod(col("id") * 13, lit(nLeads))).as("mql_id"),
      concat(lit("s_"), pmod(col("id"), lit(nSellers))).as("seller_id"),
      lit("sdr").as("sdr_id"), lit("sr").as("sr_id"),
      (baseTs + make_interval(lit(0), lit(0), lit(0), lit(0),
        (pmod(col("id") * 7, lit(700L * 24)) + 48).cast("int"))).as("won_date"),
      element_at(typedlit(segments), pmod(col("id"), lit(30)).cast("int") + 1)
        .as("business_segment"),
      concat(lit("lt_"), pmod(col("id"), lit(8))).as("lead_type"),
      lit("cat").as("lead_behaviour_profile"),
      lit(true).as("has_company"), lit(true).as("has_gtin"),
      lit("mid").as("average_stock"),
      concat(lit("bt_"), pmod(col("id"), lit(3))).as("business_type"),
      lit(10.0).as("declared_product_catalog_size"),
      lit(1000.0).as("declared_monthly_revenue"))

    Map("orders" -> orders, "order_items" -> orderItems,
      "products" -> products.withColumns(Map(
        "product_name_lenght" -> lit(10), "product_description_lenght" -> lit(100),
        "product_photos_qty" -> lit(1), "product_weight_g" -> lit(100),
        "product_length_cm" -> lit(10), "product_height_cm" -> lit(10),
        "product_width_cm" -> lit(10))),
      "category" -> category, "sellers" -> sellers, "geolocation" -> geo,
      "leads" -> leads, "closed_deals" -> closedDeals)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .appName("olist-scale-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_OLIST_SCALE=10 → 1M orders / 10M geolocation: one
    // decade above the reference dataset, same proportions. Row-count
    // dims (products, deals) stay reference-sized — scaling a dim does
    // not model the workload, it just breaks broadcastability.
    val scale = sys.env.getOrElse("SPARK_GRAFT_OLIST_SCALE", "1").toLong
    val (nOrders, nItems, nGeo) =
      (100000 * scale, 112000 * scale, 1000000 * scale)
    val src = sources(spark, nOrders = nOrders, nItems = nItems, nGeo = nGeo,
      nSellers = 3000 * scale, nLeads = 8000 * scale)
      .map { case (k, v) => k -> v.cache() }
    src.values.foreach(_.count()) // materialize generators outside the timing

    val whDir = java.nio.file.Files.createTempDirectory("olist_scale_wh").toString
    val wh = new Warehouse(spark, whDir)
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tBuild) = time(wh.build(src))
    val (_, t1) = time(Reports.topSellersByUnitsOltp(src("orders"), src("order_items"),
      src("products"), src("category"), src("sellers"), 2018).collect())
    val (_, t2) = time(Reports.topSellersByUnitsDw(wh.table("orders_fact"),
      wh.table("time_period"), src("sellers"), 2018).collect())
    // the same report through the file-skipping layer: manifest stats on
    // the date_key clustering drop out-of-year fact files before the read
    val (_, t2p) = time(Reports.topSellersByUnitsDwPruned(
      wh, src("sellers"), 2018).collect())
    val (factRead, factTotal) =
      wh.scanFileCounts("orders_fact", Seq(Reports.yearRange(2018)))
    val (_, t3) = time(Reports.topSellersByRevenueOltp(src("orders"), src("order_items"),
      src("sellers"), 2018).collect())
    val (_, t4) = time(Reports.topSellersByRevenueDw(wh.table("orders_fact"),
      wh.table("time_period"), src("sellers"), 2018).collect())
    val (_, t5) = time(Reports.fastestConversionsOltp(src("leads"), src("closed_deals"),
      src("sellers"), src("order_items")).collect())
    val (_, t6) = time(Reports.fastestConversionsDw(wh.table("conversions_fact"),
      wh.table("origin"), wh.table("time_period")).collect())
    val (incRows, tInc) = time(
      IncrementalLoad.run(wh, src, "2019-01-01", "2019-02-01").count())
    println(f"""{"metric":"olist_scale","build_s":$tBuild%.2f,"units_oltp_s":$t1%.2f,"units_dw_s":$t2%.2f,"units_dw_pruned_s":$t2p%.2f,"fact_files_read":$factRead%d,"fact_files_total":$factTotal%d,"revenue_oltp_s":$t3%.2f,"revenue_dw_s":$t4%.2f,"conv_oltp_s":$t5%.2f,"conv_dw_s":$t6%.2f,"incremental_s":$tInc%.2f,"incremental_rows":$incRows%d,"orders":$nOrders%d,"order_items":$nItems%d,"geolocation":$nGeo%d}""")
    spark.stop()
  }
}
