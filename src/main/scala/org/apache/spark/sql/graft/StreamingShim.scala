package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` hop a V1 streaming `Source` implementation
  * needs: `MicroBatchExecution` asserts every `getBatch` result has
  * `isStreaming=true`, and the only constructor for such a frame is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * exactly how Spark's own `FileStreamSource` builds its batches. The
  * V1 `Source` API is the right tool for a change-feed source whose
  * batches are computed DataFrames (manifest-pruned diffs + a key
  * join): the DSv2 `MicroBatchStream` path would force the feed
  * through driver-side rows or a hand-rolled reader factory, losing
  * the distributed plan. This shim is the entire package intrusion —
  * one call, no state, nothing overridden. */
object StreamingShim {
  def internalStreamingFrame(spark: SparkSession, rdd: RDD[InternalRow],
                             schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  def emptyStreamingFrame(spark: SparkSession,
                          schema: StructType): DataFrame =
    internalStreamingFrame(
      spark, spark.sparkContext.emptyRDD[InternalRow], schema)

  /** Re-wrap a streaming-flagged frame as an ordinary batch frame —
    * test support for asserting on a `Source.getBatch` result without
    * running a full query (a streaming frame refuses `collect`, and
    * even `toRdd` trips the batch-unsupported check, so the underlying
    * RDD is lifted straight out of the `LogicalRDD` this shim built). */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        spark.internalCreateDataFrame(l.rdd, df.schema,
          isStreaming = false)
      case other => throw new IllegalArgumentException(
        s"asBatchFrame expects a Source.getBatch frame (LogicalRDD), " +
          s"got ${other.getClass.getSimpleName}")
    }
  }
}
