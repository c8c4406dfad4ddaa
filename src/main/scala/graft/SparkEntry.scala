package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 (and the training-data
  * extension set) is one entry in `queries`; SQL-expressible ones have a
  * matching DuckDB oracle in `oracleSql`. Column names are aliased
  * identically on both sides (the driver sorts columns by name before
  * hashing).
  */
object SparkEntry {

  /** All query groups, each a Seq[Q] of (name, oracle, runner). */
  private def allQ: Seq[Q] =
    operators.Relational.all ++ operators.TextAnalysis.all ++
      operators.Bpe.all ++
      operators.Dedup.all ++ operators.Similarity.all ++
      operators.Multimodal.all ++ operators.Temporal.all ++
      operators.Sampling.all ++ operators.Graph.all ++
      operators.WarehouseBench.all ++
      streaming.EventStream.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
