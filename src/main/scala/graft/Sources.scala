package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source facade (SURVEY §2.1) — every reader takes a DECLARED schema;
  * schema-on-read inference is never used (the reference's leaked CSV
  * header row is the cautionary tale, Olist DW.sql:62-67).
  */
object Sources {

  /** S1 — CSV bulk import with declared schema + header row. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S3 — JDBC source with server-side pushdown query (the SSIS OLE DB
    * Source ran its 7-way join SQL on the source server,
    * Package.dtsx:446-655). `query` executes remotely; only its result
    * crosses the wire. Partitioned reads via predicates for parallelism.
    * Round-tripped against embedded Derby in JdbcSourceSpec; the same
    * plan over Parquet is the native rendering used everywhere else in
    * this repo. */
  def jdbc(spark: SparkSession, url: String, query: String,
      properties: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
    properties.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }
}
