package graft.olist

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Normalize.norm

/** Dimension builds (reference: Olist DW.sql:55-131).
  *
  * Surrogate keys: the reference uses CREATE SEQUENCE .. START WITH 1000
  * (`Olist DW.sql:55-57`) assigned by NEXT VALUE FOR during CTAS. Here:
  * deterministic `row_number()` over the natural key + offset — a global
  * window is acceptable ONLY because dims are broadcast-sized; fact
  * tables never receive sequence keys (their identity is the grouping
  * key — SURVEY §7.4 trap #5/#8).
  */
object Dimensions {

  val KEY_START = 1000L

  /** Hard ceiling for the surrogate-key window: the unpartitioned
    * `row_number()` funnels ALL rows through one task, which is fine
    * for a broadcast-sized dim and catastrophic for a fact. Enforced
    * (not just documented) so a future caller can't silently
    * single-task a 100 TB table — the count is one cheap slim-column
    * job against an input that's about to be fully sorted anyway. */
  val MAX_DIM_ROWS = 10000000L

  private[graft] def requireDimSized(df: DataFrame, what: String): DataFrame = {
    // limit-probe: stops scanning shortly past the ceiling instead of
    // counting a fact-sized input end to end
    val probe = df.limit((MAX_DIM_ROWS + 1).toInt).count()
    require(probe <= MAX_DIM_ROWS,
      s"$what exceeds $MAX_DIM_ROWS rows: the surrogate-key window is " +
        "dims-only — a global row_number() would single-task a table this " +
        "size; use a grouping-key identity or zipWithIndex-style keys instead")
    // pin the (now known dim-sized) input so the window reads the
    // materialized rows instead of recomputing the scan + distinct
    df.localCheckpoint()
  }

  private[graft] def withKey(df: DataFrame, keyName: String, natKey: String): DataFrame =
    requireDimSized(df, s"dim($keyName)").select(
      (row_number().over(Window.orderBy(natKey)) + (KEY_START - 1))
        .cast("long").as(keyName),
      col(natKey))

  /** product dim from the category translation table
    * (Olist DW.sql:63-67). Keeps the reference's header-row hygiene
    * filter — the CSV import leaked a literal header row into the data. */
  def product(category: DataFrame): DataFrame =
    withKey(
      category
        .select(col("product_category_name_english").as("product"))
        .filter(norm(col("product")) =!= "product_category_name_english")
        .filter(col("product").isNotNull)
        .distinct(),
      "product_key", "product")

  /** location dim: DISTINCT (zip, city, state) from geolocation
    * (Olist DW.sql:92-97). City normalized once here — the join side
    * normalizes too (F6 collation trap). */
  def location(geolocation: DataFrame): DataFrame = {
    val distinctLoc = requireDimSized(geolocation.select(
      col("geolocation_zip_code_prefix").as("zip"),
      norm(col("geolocation_city")).as("city"),
      norm(col("geolocation_state")).as("state")).distinct(),
      "dim(location_key)")
    distinctLoc.select(
      (row_number().over(Window.orderBy("zip", "city", "state")) + (KEY_START - 1))
        .cast("long").as("location_key"),
      col("zip"), col("city"), col("state"))
  }

  /** origin dim (Olist DW.sql:119-121). */
  def origin(leads: DataFrame): DataFrame =
    withKey(leads.select(col("origin")).filter(col("origin").isNotNull).distinct(),
      "origin_key", "origin")

  /** lead_type dim (Olist DW.sql:124-126). */
  def leadType(closedDeals: DataFrame): DataFrame =
    withKey(closedDeals.select(col("lead_type"))
      .filter(col("lead_type").isNotNull).distinct(),
      "lead_type_key", "lead_type")

  /** business_type dim (Olist DW.sql:129-131). */
  def businessType(closedDeals: DataFrame): DataFrame =
    withKey(closedDeals.select(col("business_type"))
      .filter(col("business_type").isNotNull).distinct(),
      "business_type_key", "business_type")

  /** New business segments to append to the product dim — the
    * reference's NOT IN + INSERT..SELECT (Olist DW.sql:71-75) as
    * left-anti join + keyed append. Keys continue after the current max
    * (an agg over a broadcast-sized dim, not a collect of data rows). */
  def newSegments(closedDeals: DataFrame, productDim: DataFrame): DataFrame = {
    val segs = closedDeals
      .filter(col("business_segment").isNotNull)
      .select(norm(col("business_segment")).as("product"))
      .distinct()
      .join(productDim.select(norm(col("product")).as("product")),
        Seq("product"), "left_anti")
    val maxKey = productDim.agg(max("product_key").as("mk"))
    segs.crossJoin(broadcast(maxKey))
      .select(
        (row_number().over(Window.orderBy("product")) + col("mk"))
          .cast("long").as("product_key"),
        col("product"))
  }
}
