package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** File-relation → streaming-DataFrame bridge (Spark 4.x classic
  * API). Lives under `org.apache.spark.sql` solely to reach the
  * `private[sql]` `Dataset.ofRows` — the same technique Spark's own
  * `FileStreamSource.getBatch` uses internally: a V1 streaming
  * source's batch must be a DataFrame whose leaf is flagged
  * `isStreaming = true` (MicroBatchExecution asserts it), which no
  * public constructor produces over a file relation.
  */
object RelationBridge {
  def streamingFrame(spark: SparkSession, relation: HadoopFsRelation): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      LogicalRelation(relation, isStreaming = true))
}
