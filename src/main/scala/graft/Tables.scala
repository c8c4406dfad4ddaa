package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). All queries take the sf directory as a parameter so
  * the same plan runs at any scale factor — at cluster scale the same
  * code points at a distributed filesystem path.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet has stored `ts` two ways across driver testdata
    * generations: TIMESTAMP(NANOS), which Spark's reader rejects (read
    * nanos as long via the legacy conf and integer-divide to µs —
    * ns-since-epoch exceeds double's 2^53 mantissa), or plain
    * timestamp[us], which Spark reads as TIMESTAMP_NTZ. Both normalize
    * here to a session-zone µs TIMESTAMP (sessions pin UTC, so the NTZ
    * cast is value-preserving). DuckDB reads the same column natively;
    * queries must only compare at ≥ microsecond granularity. */
  def events(s: SparkSession, d: String): DataFrame = {
    // probe under the CURRENT conf first; only the TIMESTAMP(NANOS)
    // generation (which the reader rejects outright) needs the legacy
    // session conf — don't flip the shared session's parquet semantics
    // for data that reads fine without it
    val df =
      try table(s, d, "events")
      catch {
        // flip the session conf ONLY for the specific rejection the
        // conf exists to cure — a missing file or transient FS error
        // must neither be masked by a second identical failure nor
        // leave the shared session decoding every later
        // TIMESTAMP(NANOS) column as raw longs as a side effect
        case scala.util.control.NonFatal(e)
            if isNanosRejection(e) =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(s, d, "events")
      }
    normalizeTs(df)
  }

  /** The one failure the legacy conf cures: Spark's parquet reader
    * rejecting INT64 TIMESTAMP(NANOS) ("Illegal Parquet type …
    * TIMESTAMP(NANOS…"). Matched anywhere on the cause chain. */
  private[graft] def isNanosRejection(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage)
        .exists(_.toUpperCase.contains("NANOS")))

  /** Normalize an events frame's `ts` to TimestampType µs regardless of
    * the on-disk encoding (long nanos / NTZ µs / already LTZ). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** A named query paired with its DuckDB oracle SQL (None for
  * non-SQL-expressible operators → driver does a rows-only check).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
