package graft.olist

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `time_period` date dimension — used throughout the reference but
  * never created in it (SURVEY §7.4 trap #2). date_key is the yyyymmdd
  * int the SSIS Lookup keys on (`Package.dtsx:175`, DT_I4).
  *
  * Generated distributively from spark.range (no driver-side loop);
  * a few thousand rows, always broadcast in joins.
  */
object TimeDim {
  def generate(spark: SparkSession, start: String, end: String): DataFrame = {
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(start), java.time.LocalDate.parse(end)).toInt + 1
    spark.range(nDays)
      .select(date_add(to_date(lit(start)), col("id").cast("int")).as("date"))
      .select(
        date_format(col("date"), "yyyyMMdd").cast("int").as("date_key"),
        col("date"),
        year(col("date")).as("year"),
        month(col("date")).as("month"),
        dayofmonth(col("date")).as("day"))
  }
}
