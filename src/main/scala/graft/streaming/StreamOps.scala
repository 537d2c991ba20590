package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming operators (SURVEY §2.H, T3 — no batch oracle; unit
  * tests drive them with MemoryStream). Each takes a streaming DataFrame
  * with the `events` schema (event_id, ts, user_id, event_type, value) and
  * returns a transformed stream; the batch-mode twins live in
  * graft.ops.EventOps (same window semantics, oracle-checked).
  *
  * Scale: state lives in the StateStore keyed by (window, group) —
  * partitioned by the shuffle key, so state sharding follows data
  * sharding; the watermark bounds state size. */
object StreamOps {

  /** Watermarked 1-hour tumbling counts. Append mode emits a window only
    * once the 10-minute watermark passes its end; later rows are dropped. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("cnt"), col("sum_value"))

  /** Stateful exact dedup by event_id, state bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Sessionization on a stream: same session_window as the batch twin,
    * with watermark-driven state eviction. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"), col("n_events"))

  /** foreachBatch sink: per-microbatch append to parquet — the
    * idempotent-upsert shape (batchId available for exactly-once
    * bookkeeping). */
  def foreachBatchParquet(stream: DataFrame, path: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(path)
      }
}
