package org.apache.spark.sql.execution.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.LogicalRDD

/** Shim for [[graft.sources.LakeSink]] — the ONE `private[sql]` device
  * a V1 `Sink` needs, lifted verbatim from what Spark's own
  * `ForeachBatchSink.addBatch` does before handing the user a usable
  * frame: re-bind the micro-batch's already-planned incremental
  * execution as a plain batch `LogicalRDD`. The Dataset passed to
  * `Sink.addBatch` still carries streaming-marked sources in its
  * logical plan, so ANY derived plan (a persist, a count, an
  * aggregate) fails `QueryExecution.assertSupported`; wrapping
  * `queryExecution.toRdd` in a non-streaming `LogicalRDD` yields a
  * frame every batch API composes over. This package placement exists
  * solely for `private[sql]` access (the Delta-connector convention);
  * nothing else in the engine lives outside the `graft` namespace. */
object GraftBatchRebind {
  def rebind(data: Dataset[Row]): DataFrame = {
    val impl = castToImpl(data)
    val node = LogicalRDD.fromDataset(
      impl.queryExecution.toRdd, impl, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(impl.sparkSession, node)
  }
}
