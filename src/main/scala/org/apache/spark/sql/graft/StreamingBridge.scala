package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The one `private[sql]` bridge the change-feed stream needs: re-tag a
  * batch DataFrame's relation as streaming.
  *
  * MicroBatchExecution asserts that every V1 `Source.getBatch` frame has
  * `isStreaming = true`; Spark's own file source satisfies it by
  * building `LogicalRelation(relation, isStreaming = true)`
  * (FileStreamSource.getBatch in the Spark source tree). The relation
  * constructors live behind `private[sql]`, so this helper sits in a
  * nested `org.apache.spark.sql` package — the same technique public
  * table formats use for their streaming sources. Nothing else in the
  * library reaches into Spark internals.
  */
object StreamingBridge {

  /** `df` with its leaf relation marked streaming — the file-backed
    * (LogicalRelation) and empty-batch (LocalRelation) shapes the
    * warehouse change feed produces. */
  def asStreaming(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[SparkSession]
    val plan = df.queryExecution.analyzed transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
      case loc: LocalRelation => loc.copy(isStreaming = true)
    }
    Dataset.ofRows(session, plan)
  }
}
