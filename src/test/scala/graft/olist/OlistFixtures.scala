package graft.olist

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.jdk.CollectionConverters._

/** In-memory fixture set covering the FIXTURES.md edge-case checklist:
  * header row in category, NULL/'unknown' origins, NULL business_segment
  * + segment overlapping the product dim, a canceled order, a negative
  * conversion duration, duplicate geolocation rows, a seller with no
  * geolocation match (only active in 2019), and the six fake 2019
  * orders/items from Olist DW.sql:294-312.
  */
object OlistFixtures {

  private def ts(s: String) = Timestamp.valueOf(s)

  def sources(spark: SparkSession): Map[String, DataFrame] = {
    def df(schema: org.apache.spark.sql.types.StructType, rows: Seq[Row]) =
      spark.createDataFrame(rows.asJava, schema)

    val category = df(Schemas.category, Seq(
      Row("cama_mesa_banho", "bed_bath_table"),
      Row("beleza_saude", "health_beauty"),
      Row("esporte_lazer", "sports_leisure"),
      Row("Product_category_name_english", "Product_category_name_english"), // leaked header
      Row("informatica_acessorios", "computers_accessories")))

    val products = df(Schemas.products, Seq(
      Row("prod_bed", "cama_mesa_banho", 40, 200, 2, 500, 30, 10, 20),
      Row("prod_health", "beleza_saude", 35, 150, 1, 200, 15, 5, 10),
      Row("prod_sport", "esporte_lazer", 30, 100, 3, 800, 50, 20, 30),
      Row("prod_comp", "informatica_acessorios", 25, 120, 2, 300, 20, 10, 15)))

    val sellers = df(Schemas.sellers, Seq(
      Row("seller_sp", 1001, "Sao Paulo", "SP"),       // case differs from geo city
      Row("seller_rj", 2002, "rio de janeiro", "RJ"),
      Row("seller_mg", 3003, "belo horizonte", "MG"),
      Row("seller_nogeo", 9999, "nowhere", "XX")))      // no geolocation match

    val geolocation = df(Schemas.geolocation, Seq(
      Row(1001, -23.55, -46.63, "sao paulo", "sp"),
      Row(1001, -23.56, -46.64, "sao paulo", "sp"),    // duplicate (zip,city,state)
      Row(2002, -22.90, -43.20, "rio de janeiro", "rj"),
      Row(3003, -19.92, -43.94, "belo horizonte", "mg")))

    val orders = df(Schemas.orders, Seq(
      Row("o1", "c1", "delivered", ts("2018-03-01 10:00:00"), ts("2018-03-01 11:00:00"),
        ts("2018-03-02 10:00:00"), ts("2018-03-05 10:00:00"), ts("2018-03-10 10:00:00")),
      Row("o2", "c2", "delivered", ts("2018-03-01 15:30:00"), ts("2018-03-01 16:00:00"),
        ts("2018-03-02 15:00:00"), ts("2018-03-06 15:00:00"), ts("2018-03-11 15:00:00")),
      Row("o3", "c3", "shipped", ts("2018-06-10 09:00:00"), ts("2018-06-10 10:00:00"),
        ts("2018-06-11 09:00:00"), ts("2018-06-15 09:00:00"), ts("2018-06-20 09:00:00")),
      Row("o4", "c4", "canceled", ts("2018-06-12 12:00:00"), ts("2018-06-12 12:30:00"),
        ts("2018-06-13 12:00:00"), ts("2018-06-17 12:00:00"), ts("2018-06-22 12:00:00")),
      Row("o5", "c5", "delivered", ts("2017-11-20 18:45:00"), ts("2017-11-20 19:00:00"),
        ts("2017-11-21 18:00:00"), ts("2017-11-25 18:00:00"), ts("2017-11-30 18:00:00")),
      // fake 2019 rows (Olist DW.sql:294-312) — excluded from initial
      // build by the < '20190101' cutoff, loaded by the incremental run
      Row("f1", "c1", "delivered", ts("2019-01-01 12:30:00"), ts("2019-01-01 13:00:00"),
        ts("2019-01-02 12:00:00"), ts("2019-01-05 12:00:00"), ts("2019-01-10 12:00:00")),
      Row("f2", "c2", "delivered", ts("2019-01-02 12:30:00"), ts("2019-01-02 13:00:00"),
        ts("2019-01-03 12:00:00"), ts("2019-01-06 12:00:00"), ts("2019-01-11 12:00:00")),
      Row("f3", "c3", "delivered", ts("2019-01-03 12:30:00"), ts("2019-01-03 13:00:00"),
        ts("2019-01-04 12:00:00"), ts("2019-01-07 12:00:00"), ts("2019-01-12 12:00:00")),
      Row("f4", "c4", "delivered", ts("2019-01-04 12:30:00"), ts("2019-01-04 13:00:00"),
        ts("2019-01-05 12:00:00"), ts("2019-01-08 12:00:00"), ts("2019-01-13 12:00:00")),
      Row("f5", "c5", "delivered", ts("2019-01-05 12:30:00"), ts("2019-01-05 13:00:00"),
        ts("2019-01-06 12:00:00"), ts("2019-01-09 12:00:00"), ts("2019-01-14 12:00:00")),
      Row("f6", "c1", "delivered", ts("2019-01-06 12:30:00"), ts("2019-01-06 13:00:00"),
        ts("2019-01-07 12:00:00"), ts("2019-01-10 12:00:00"), ts("2019-01-15 12:00:00"))))

    val orderItems = df(Schemas.orderItems, Seq(
      Row("o1", 1, "prod_bed", "seller_sp", ts("2018-03-03 10:00:00"), 120.0, 15.0),
      Row("o1", 2, "prod_health", "seller_sp", ts("2018-03-03 10:00:00"), 45.5, 8.0),
      Row("o2", 1, "prod_bed", "seller_rj", ts("2018-03-03 15:00:00"), 99.9, 12.0),
      Row("o3", 1, "prod_sport", "seller_mg", ts("2018-06-12 09:00:00"), 250.0, 25.0),
      Row("o4", 1, "prod_comp", "seller_sp", ts("2018-06-14 12:00:00"), 77.0, 9.0), // canceled order
      Row("o5", 1, "prod_health", "seller_rj", ts("2017-11-22 18:00:00"), 60.0, 10.0),
      // fake 2019 items (prices from FIXTURES.md), one per fake order;
      // f6 sold by the geolocation-less seller — dropped by J7
      Row("f1", 1, "prod_bed", "seller_sp", ts("2019-01-05 12:30:00"), 58.9, 10.0),
      Row("f2", 1, "prod_bed", "seller_rj", ts("2019-01-05 12:30:00"), 239.9, 20.0),
      Row("f3", 1, "prod_health", "seller_sp", ts("2019-01-05 12:30:00"), 199.0, 18.0),
      Row("f4", 1, "prod_sport", "seller_mg", ts("2019-01-05 12:30:00"), 12.99, 5.0),
      Row("f5", 1, "prod_comp", "seller_rj", ts("2019-01-05 12:30:00"), 199.9, 15.0),
      Row("f6", 1, "prod_bed", "seller_nogeo", ts("2019-01-05 12:30:00"), 239.9, 20.0)))

    val customers = df(Schemas.customers, Seq(
      Row("c1", "u1", 1001, "sao paulo", "SP"),
      Row("c2", "u2", 2002, "rio de janeiro", "RJ"),
      Row("c3", "u3", 3003, "belo horizonte", "MG"),
      Row("c4", "u4", 1001, "sao paulo", "SP"),
      Row("c5", "u5", 2002, "rio de janeiro", "RJ")))

    val leads = df(Schemas.leads, Seq(
      Row("mql1", ts("2018-01-01 08:00:00"), "lp1", "organic_search"),
      Row("mql2", ts("2018-02-01 09:30:00"), "lp2", "paid_search"),
      Row("mql3", ts("2018-03-01 10:00:00"), "lp3", null),            // NULL origin
      Row("mql4", ts("2018-04-01 11:00:00"), "lp4", "unknown"),
      Row("mql5", ts("2018-05-01 12:00:00"), "lp5", "social")))

    val closedDeals = df(Schemas.closedDeals, Seq(
      // two deals in ONE fact grain with 5 and 6 boundary-hours →
      // avg 5.5 → T-SQL integer AVG truncates to 5
      Row("mql1", "seller_sp", "sdr1", "sr1", ts("2018-01-01 13:00:00"),
        "bed_bath_table", "online_medium", "cat", true, true, "low",
        "reseller", 100.0, 5000.0),
      Row("mql1", "seller_sp", "sdr1", "sr1", ts("2018-01-01 14:30:00"),
        "bed_bath_table", "online_medium", "cat", true, false, "low",
        "reseller", 50.0, 3000.0),
      // negative duration (won before first contact) → avg < 1 → deleted
      Row("mql5", "seller_rj", "sdr2", "sr2", ts("2018-04-30 10:00:00"),
        "health_beauty", "online_big", "eagle", false, true, "mid",
        "manufacturer", 20.0, 1000.0),
      // NULL business_segment → excluded from dim append and fact
      Row("mql4", "seller_mg", "sdr2", "sr2", ts("2018-04-02 11:00:00"),
        null, "online_small", "wolf", false, false, "high",
        "reseller", 10.0, 500.0),
      // new segment not in product dim → appended by newSegments
      Row("mql2", "seller_mg", "sdr3", "sr3", ts("2018-02-03 09:30:00"),
        "car_accessories", "industry", "tiger", true, true, "mid",
        "manufacturer", 75.0, 2500.0)))

    Map(
      "orders" -> orders, "order_items" -> orderItems,
      "products" -> products, "category" -> category,
      "sellers" -> sellers, "customers" -> customers,
      "geolocation" -> geolocation, "leads" -> leads,
      "closed_deals" -> closedDeals)
  }
}
