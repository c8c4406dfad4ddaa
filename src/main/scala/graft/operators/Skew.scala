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
    * `salts` sub-keys; the build side replicates `salts`×. The hot key's
    * rows spread over `salts` tasks instead of one. Build side must be
    * replication-sized (a dimension), which is exactly the
    * skewed-fact⋈dim case.
    *
    * The salt is a per-partition row counter, NOT a content hash:
    * byte-identical duplicate rows of a hot key (the degenerate corpus
    * salting exists for) would all hash to the same salt and still pin
    * one task. The join result is salt-invariant — every probe row meets
    * exactly the build replica carrying its salt — so the
    * non-deterministic counter cannot change the output, only the task
    * placement. */
  /** The salt assignment: round-robins rows within each input partition
    * (monotonically_increasing_id is partitionId<<33 + row index, so
    * pmod by `salts` cycles through every salt). Independent of row
    * content by construction. */
  def saltExpr(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    val probeSalted = probe.withColumn("_salt", saltExpr(salts))
    val buildSalted = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    probeSalted.join(buildSalted, Seq(key, "_salt")).drop("_salt")
  }

  /** Exact hot-bucket-safe within-bucket pair enumeration — the guard
    * for LSH/blocking self-joins. A naive self-join on the bucket key
    * puts a hot bucket's entire O(n²) pair generation in ONE task: a
    * near-constant corpus (boilerplate-heavy crawl at 100 TB) turns a
    * single straggler task quadratic while 999 executors idle.
    *
    * This splits every bucket larger than `maxBucket` ids into
    * m = ceil(n / maxBucket) chunks (deterministic hash of the id) and
    * emits each of the m(m+1)/2 chunk pairs as its own join task —
    * per-task work is bounded by maxBucket² and spreads across the
    * cluster, while the output is EXACTLY the all-pairs set (each
    * unordered pair appears once, oriented d1 < d2): same-chunk tasks
    * keep the d1 < d2 half; cross-chunk tasks cover each pair exactly
    * once (the (min,max) chunk task) and re-orient by id. Replication
    * cost is m+1 slim (bucket, id, task) rows per input row — ids only,
    * never payloads; callers join payloads back on the (much smaller)
    * pair set.
    *
    * Input: (bucketCol, idCol) rows, one per member. Output:
    * (bucketCol, d1, d2) with d1 < d2, all within-bucket pairs. */
  def boundedSelfPairs(items: DataFrame, bucketCol: String, idCol: String,
      maxBucket: Int): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be ≥ 2, got $maxBucket")
    // count(_id), not count(1): ids are non-null by contract, so the
    // counts are identical — but requiring _id keeps column pruning
    // from shrinking this branch's scan below what the pair branches
    // read, so all three consume ONE identical (reused) exchange when
    // the caller materializes `items` behind a repartition (d4 does:
    // its upstream is a full MinHash pass worth computing exactly once)
    val sz = items.select(col(bucketCol).as("_bk"), col(idCol).as("_id"))
      .groupBy("_bk").agg(count(col("_id")).as("_n"))
    val t = items.select(col(bucketCol).as("_bk"), col(idCol).as("_id"))
      .join(sz, Seq("_bk"))
      .withColumn("_m", ceil(col("_n").cast("double") / maxBucket).cast("long"))
      .withColumn("_c", pmod(xxhash64(col("_id")), col("_m")))
    // each row serves as the "low" side of tasks (c, j≥c) and the
    // "high" side of tasks (i≤c, c)
    val low = t.select(col("_bk"), col("_id").as("d1"), col("_c").as("_i"),
      explode(sequence(col("_c"), col("_m") - 1)).as("_j"))
    val high = t.select(col("_bk"), col("_id").as("d2"),
      explode(sequence(lit(0L), col("_c"))).as("_i"), col("_c").as("_j"))
    low.join(high, Seq("_bk", "_i", "_j"))
      .filter((col("_i") =!= col("_j")) || (col("d1") < col("d2")))
      .select(col("_bk").as(bucketCol),
        least(col("d1"), col("d2")).as("d1"),
        greatest(col("d1"), col("d2")).as("d2"))
  }

  /** Two-phase salted aggregation for algebraic aggregates over skewed
    * group keys: partial-aggregate on (key, salt), then final-aggregate
    * on key. The hot key's partial state is built by `salts` tasks in
    * parallel. Hard-codes the sum+count pair (the composable partial/
    * final shape generalizes to any algebraic aggregate). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    // same per-row counter salt as saltedJoin (sum/count are algebraic,
    // so the final aggregate is salt-invariant)
    df.withColumn("_salt", saltExpr(salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valueCol"), sum("_pn").as("n_rows"))
}
