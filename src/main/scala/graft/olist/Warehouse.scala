package graft.olist

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Olist star-schema warehouse on Spark — the engine with the same
  * capability surface as the reference's `Olist DW.sql` + SSIS package,
  * re-expressed Spark-first.
  *
  * Source tables arrive as a Map of DataFrames (from CSV with declared
  * schemas, Parquet, or test fixtures); warehouse tables are written as
  * Parquet under `basePath` and registered as temp views `dw_<name>`.
  * At cluster scale `basePath` is a distributed store and the fact
  * tables are written partitioned by year (SURVEY §4: partition pruning
  * on the date axis; dims stay broadcast-sized and unpartitioned).
  */
class Warehouse(spark: SparkSession, basePath: String,
    format: String = "parquet") {
  import Normalize.norm

  require(Seq("parquet", "orc", "json", "csv").contains(format),
    s"unsupported warehouse format: $format")

  /** Partition spec recorded at save time so appends lay files out
    * identically (a flat append into a partitioned directory corrupts
    * partition discovery). */
  private val partitioning = scala.collection.mutable.Map.empty[String, Seq[String]]

  /** S4 CTAS-style sink + catalog registration (reference:
    * SELECT..INTO, Olist DW.sql:64-67 etc.). */
  def save(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): DataFrame = {
    partitioning(name) = partitionBy
    schemas(name) = df.schema
    val w = df.write.mode("overwrite").format(format)
      .option("header", "true") // no-op outside csv
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(s"$basePath/$name")
    // meta only AFTER the data write succeeds — a failed write must not
    // leave metadata describing data that never landed
    writeMeta(name, partitionBy, df.schema)
    val back = read(name)
    back.createOrReplaceTempView(s"dw_$name")
    back
  }

  /** S5/S7 append sink (reference: SSIS fast-load `Package.dtsx:281-445`;
    * INSERT..SELECT `Olist DW.sql:71-75`). Parquet append is bulk and
    * atomic per task — the moral equivalent of TABLOCK fast load. */
  def append(name: String, df: DataFrame): Unit = {
    val parts = partitioning.getOrElseUpdate(name, loadMeta(name)._1)
    val w = df.write.mode("append").format(format)
      .option("header", "true")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
      .save(s"$basePath/$name")
  }

  /** Schema recorded at save time — json/csv don't self-describe. */
  private val schemas = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.types.StructType]

  private def read(name: String): DataFrame = {
    val sc = schemas.getOrElseUpdate(name,
      loadMeta(name)._2.getOrElse(org.apache.spark.sql.types.StructType(Nil)))
    val r = spark.read.format(format).option("header", "true")
    (if (sc.isEmpty) r else r.schema(sc)).load(s"$basePath/$name")
  }

  /** Table metadata persisted beside the data so a NEW Warehouse
    * instance over an existing basePath (the cross-job incremental
    * scenario) appends with the original partition layout and reads
    * csv/json with the declared schema. Two plain files per table —
    * no hand-rolled JSON parsing. */
  private def metaDir = java.nio.file.Paths.get(s"$basePath/_graft_meta")

  private def writeMeta(name: String,
      parts: Seq[String], schema: org.apache.spark.sql.types.StructType): Unit = {
    java.nio.file.Files.createDirectories(metaDir)
    java.nio.file.Files.writeString(metaDir.resolve(s"$name.partitions"),
      parts.mkString("\n"))
    java.nio.file.Files.writeString(metaDir.resolve(s"$name.schema.json"),
      schema.json)
  }

  private def loadMeta(name: String)
      : (Seq[String], Option[org.apache.spark.sql.types.StructType]) = {
    val pf = metaDir.resolve(s"$name.partitions")
    val sf = metaDir.resolve(s"$name.schema.json")
    val parts =
      if (java.nio.file.Files.exists(pf))
        java.nio.file.Files.readString(pf).split("\n").map(_.trim)
          .filter(_.nonEmpty).toSeq
      else Nil
    val schema =
      if (java.nio.file.Files.exists(sf))
        scala.util.Try(org.apache.spark.sql.types.DataType
          .fromJson(java.nio.file.Files.readString(sf))
          .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption
      else None
    (parts, schema)
  }

  def table(name: String): DataFrame = read(name)

  /** Build every dim + both facts from the given source tables.
    * Statement order mirrors the reference build (Olist DW.sql:39-184). */
  def build(src: Map[String, DataFrame]): Unit = {
    val time = TimeDim.generate(spark, "2016-09-01", "2019-12-31")
    save("time_period", time)
    save("product", Dimensions.product(src("category")))
    save("location", Dimensions.location(src("geolocation")))
    save("origin", Dimensions.origin(src("leads")))
    save("lead_type", Dimensions.leadType(src("closed_deals")))
    save("business_type", Dimensions.businessType(src("closed_deals")))
    // dim append: new business segments not already in product dim
    // (Olist DW.sql:71-75 — NOT IN + INSERT..SELECT as anti-join+append)
    append("product",
      Dimensions.newSegments(src("closed_deals"), table("product")))
    save("orders_fact",
      Facts.ordersFact(src("orders"), src("order_items"), src("products"),
        src("category"), src("sellers"), table("product"), table("location"),
        table("time_period"), cutoff = "2019-01-01"),
      partitionBy = Seq("year"))
    val conv = Facts.conversionsFact(src("leads"), src("closed_deals"),
      src("sellers"), src("order_items"), table("origin"),
      table("lead_type"), table("business_type"), table("product"),
      table("time_period"))
    // S8: DELETE WHERE avg_hrs_convert < 1 (Olist DW.sql:183-184) as
    // anti-filter rewrite
    save("conversions_fact", conv.filter(col("avg_hrs_convert") >= 1))
  }
}

/** F6 — SQL Server's default collation is case-insensitive; Spark is
  * case-sensitive. All join/filter boundaries on human-entered strings
  * normalize through here (SURVEY §7.4 trap #1). */
object Normalize {
  def norm(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(trim(c))
}
