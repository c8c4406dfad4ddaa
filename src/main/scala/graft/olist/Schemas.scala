package graft.olist

import org.apache.spark.sql.types._

/** Declared schemas for the 11 Olist source tables (FIXTURES.md; column
  * usage evidence cited there from `Olist DW.sql` / `Package.dtsx`).
  * Explicit StructTypes — schema-on-read is never inferred (SURVEY §1.3).
  */
object Schemas {

  val orders: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("customer_id", StringType),
    StructField("order_status", StringType),
    StructField("order_purchase_timestamp", TimestampType),
    StructField("order_approved_at", TimestampType),
    StructField("order_delivered_carrier_date", TimestampType),
    StructField("order_delivered_customer_date", TimestampType),
    StructField("order_estimated_delivery_date", TimestampType)))

  val orderItems: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("order_item_id", IntegerType),
    StructField("product_id", StringType),
    StructField("seller_id", StringType),
    StructField("shipping_limit_date", TimestampType),
    StructField("price", DoubleType),
    StructField("freight_value", DoubleType)))

  val products: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("product_category_name", StringType),
    StructField("product_name_lenght", IntegerType),
    StructField("product_description_lenght", IntegerType),
    StructField("product_photos_qty", IntegerType),
    StructField("product_weight_g", IntegerType),
    StructField("product_length_cm", IntegerType),
    StructField("product_height_cm", IntegerType),
    StructField("product_width_cm", IntegerType)))

  val category: StructType = StructType(Seq(
    StructField("product_category_name", StringType),
    StructField("product_category_name_english", StringType)))

  val sellers: StructType = StructType(Seq(
    StructField("seller_id", StringType),
    StructField("seller_zip_code_prefix", IntegerType),
    StructField("seller_city", StringType),
    StructField("seller_state", StringType)))

  val customers: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("customer_unique_id", StringType),
    StructField("customer_zip_code_prefix", IntegerType),
    StructField("customer_city", StringType),
    StructField("customer_state", StringType)))

  val geolocation: StructType = StructType(Seq(
    StructField("geolocation_zip_code_prefix", IntegerType),
    StructField("geolocation_lat", DoubleType),
    StructField("geolocation_lng", DoubleType),
    StructField("geolocation_city", StringType),
    StructField("geolocation_state", StringType)))

  val payments: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("payment_sequential", IntegerType),
    StructField("payment_type", StringType),
    StructField("payment_installments", IntegerType),
    StructField("payment_value", DoubleType)))

  val reviews: StructType = StructType(Seq(
    StructField("review_id", StringType),
    StructField("order_id", StringType),
    StructField("review_score", IntegerType),
    StructField("review_comment_title", StringType),
    StructField("review_comment_message", StringType),
    StructField("review_creation_date", TimestampType),
    StructField("review_answer_timestamp", TimestampType)))

  val leads: StructType = StructType(Seq(
    StructField("mql_id", StringType),
    StructField("first_contact_date", TimestampType),
    StructField("landing_page_id", StringType),
    StructField("origin", StringType)))

  val closedDeals: StructType = StructType(Seq(
    StructField("mql_id", StringType),
    StructField("seller_id", StringType),
    StructField("sdr_id", StringType),
    StructField("sr_id", StringType),
    StructField("won_date", TimestampType),
    StructField("business_segment", StringType),
    StructField("lead_type", StringType),
    StructField("lead_behaviour_profile", StringType),
    StructField("has_company", BooleanType),
    StructField("has_gtin", BooleanType),
    StructField("average_stock", StringType),
    StructField("business_type", StringType),
    StructField("declared_product_catalog_size", DoubleType),
    StructField("declared_monthly_revenue", DoubleType)))
}
