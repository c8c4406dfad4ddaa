package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / builder's scale checklist).
  *
  * AQE's skew-join splitting handles sort-merge joins at runtime; these
  * cover the cases AQE does not: aggregations over hot keys, and joins
  * where the build side is small enough to replicate but the probe key
  * distribution is pathological (one key = 30% of a 100 TB fact).
  */
object Skew {

  /** Salted equi-join: the probe side scatters each row into one of
    * `salts` sub-keys (deterministically, from the full row hash); the
    * build side replicates `salts`×. The hot key's rows spread over
    * `salts` tasks instead of one. Build side must be replication-sized
    * (a dimension), which is exactly the skewed-fact⋈dim case. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    val probeSalted = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val buildSalted = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    probeSalted.join(buildSalted, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates over skewed
    * group keys: partial-aggregate on (key, salt), then final-aggregate
    * on key. The hot key's partial state is built by `salts` tasks in
    * parallel. Hard-codes the sum+count pair (the composable partial/
    * final shape generalizes to any algebraic aggregate). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valueCol"), sum("_pn").as("n_rows"))
}
