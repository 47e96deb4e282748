package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the classic converters
  * `private[sql]`; this shim lives inside the sql package namespace to
  * re-export just the conversions custom Catalyst expressions and the
  * V1 streaming Source need.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-plan a batch DataFrame as a STREAMING one — the V1
    * `Source.getBatch` contract (MicroBatchExecution asserts
    * `isStreaming=true` on what a source returns, exactly how
    * FileStreamSource builds its per-batch frames via
    * `internalCreateDataFrame(..., isStreaming = true)`, which is
    * `private[sql]` — hence this shim). The input plan executes lazily
    * inside the micro-batch; nothing is materialized here.
    */
  def streamingFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** The inverse bridge, for the V1 `Sink.addBatch` contract: the
    * micro-batch arrives as a streaming-tagged plan that batch writers
    * refuse; re-plan it as a plain batch frame over the same physical
    * rows (exactly ForeachBatchSink's `LogicalRDD.fromDataset(...,
    * isStreaming = false)` move, reached through the same private[sql]
    * converter).
    */
  def batchFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }

  /** A DataFrame over an already-analyzed logical plan — the
    * `private[sql] Dataset.ofRows` door a RunnableCommand needs to
    * execute the plan a resolution rule captured (the MERGE source).
    */
  def frameOf(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan
    )
}
