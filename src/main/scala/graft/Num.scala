package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared exact-numeric aggregation idioms (see Relational.scala header
  * for the rationale): double summation is accumulation-order-dependent,
  * so every sum that must be reproducible across engines or plan shapes
  * goes through an exact DECIMAL cast. One definition — precision
  * changes apply everywhere at once.
  */
object Num {

  /** Exact sum of a double expression: per-row cast to DECIMAL(18,s)
    * (deterministic rounding of the identical IEEE value on every
    * engine), exact sum, back to double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact average: exact sum divided by count in double (one double
    * division of identical operands on every engine). */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)

  /** The DuckDB rendering of dsum for oracle SQL generators. */
  def sqlDsum(e: String, scale: Int = 2): String =
    s"cast(sum(cast($e as decimal(18,$scale))) as double)"

  def sqlDavg(e: String, scale: Int = 2): String =
    s"(cast(sum(cast($e as decimal(18,$scale))) as double) / count($e))"
}
