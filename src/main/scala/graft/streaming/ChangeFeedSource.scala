package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructType}
import graft.engine.Versioned
import graft.ops.MergeOps

/** A Structured Streaming SOURCE over a versioned store's change feed —
  * the read-side completion of the CDC story (Delta's
  * `readStream.option("readChangeFeed", ...)`): each micro-batch is one
  * net [[graft.ops.MergeOps.changeFeed]] slice, the OFFSET is the
  * source-table version already fully emitted, and Spark's own offset
  * log gives restart-exactly-where-you-stopped for free. Downstream
  * exactly-once composes the usual way: an idempotent `foreachBatch`
  * sink keyed on the batch id ([[StreamOps.feedMirrorMaintenance]]) —
  * a replayed batch id recomputes the SAME version range (versions are
  * immutable), so the replay applies the identical feed and the
  * destination ledger no-ops it.
  *
  * Options (case-insensitive): `dir` (the store root), `keyCol`,
  * `partCol`, and optional `startVersion` — absent: emit changes
  * committed AFTER stream start; `0`: BOOTSTRAP (first batch is the
  * full current snapshot as `insert` rows — the content diff from
  * empty); `N>0`: first batch is the net diff from version N.
  *
  * Contracts shared with every table format's CDC stream: the schema
  * is pinned at stream start (an evolving table needs a stream
  * restart); a `from` version vacuumed below the retention floor while
  * the stream was down fails LOUDLY with the floor error (tag the
  * mirror's high-water version to pin it); each getOffset is one
  * bounded `commits/` listing.
  *
  * Scale shape: the batch plan is [[graft.ops.MergeOps.changeFeed]]'s —
  * manifest+dv-ref pruning reads only changed partitions, one
  * key-shuffled full-outer join on the changed slice — wrapped
  * streaming via the single `private[sql]` hop
  * ([[org.apache.spark.sql.graft.StreamingShim]]); nothing is
  * collected to the driver. */
class ChangeFeedSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-change-feed"

  private def lower(m: Map[String, String]): Map[String, String] =
    m.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }

  private def required(p: Map[String, String], k: String): String =
    p.getOrElse(k, throw new IllegalArgumentException(
      s"graft-change-feed needs option '$k' (have: ${p.keys.toSeq.sorted
        .mkString(", ")})"))

  private[streaming] def feedSchema(spark: SparkSession, dir: String,
                                    partCol: String): StructType = {
    val base = Versioned.readCurrent(spark, dir, Some(partCol)).schema
    require(!base.fieldNames.contains("change_type"),
      s"the table under $dir already has a change_type column — the " +
        "feed cannot add its classification column")
    base.add("change_type", StringType, nullable = false)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val p = lower(parameters)
    (shortName(), feedSchema(sqlContext.sparkSession,
      required(p, "dir"), required(p, "partcol")))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val p = lower(parameters)
    new ChangeFeedSource(sqlContext.sparkSession, required(p, "dir"),
      required(p, "keycol"), required(p, "partcol"),
      p.get("startversion").map(_.trim.toLong))
  }
}

class ChangeFeedSource(spark: SparkSession, dir: String, keyCol: String,
                       partCol: String, startVersion: Option[Long])
    extends Source {

  /** The version everything BEFORE the stream is folded into: batches
    * emit changes strictly after it. None of `startVersion` means
    * "changes from now on" — the current version at source creation. */
  private val baseVersion: Long = startVersion.getOrElse(
    Versioned.currentVersion(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no committed version under $dir — nothing to stream; pass " +
          "startVersion=0 to bootstrap from the first commit")))

  override val schema: StructType =
    new ChangeFeedSourceProvider().feedSchema(spark, dir, partCol)

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] =
    Versioned.currentVersion(spark, dir) match {
      case Some(cur) if cur > baseVersion => Some(LongOffset(cur))
      case _ => None  // nothing past the base yet
    }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(baseVersion)
    val to = versionOf(end)
    val batch =
      if (from >= to)
        return org.apache.spark.sql.graft.StreamingShim
          .emptyStreamingFrame(spark, schema)
      else if (from == 0L)
        // bootstrap: the content diff from empty IS the full snapshot
        Versioned.readVersion(spark, dir, to, Some(partCol))
          .withColumn("change_type", lit("insert"))
      else
        MergeOps.changeFeed(spark, dir, from, to, keyCol, partCol)
    // pin the declared column order; a mid-stream schema evolution
    // surfaces here as a loud unresolved column (restart the stream)
    val aligned = batch.select(schema.fieldNames.map(col).toSeq: _*)
    org.apache.spark.sql.graft.StreamingShim.internalStreamingFrame(
      spark, aligned.queryExecution.toRdd, schema)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"ChangeFeedSource[$dir, key=$keyCol, part=$partCol, base=$baseVersion]"
}
