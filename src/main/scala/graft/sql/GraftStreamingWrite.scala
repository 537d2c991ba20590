package graft.sql

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID,
  TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo,
  WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{OutputWriter,
  OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.ops.MergeOps

/** One staged parquet file's worth of a micro-batch, reported from the
  * executor task that wrote it back to the driver-side epoch commit.
  * Carries the row count so empty writers (a partition with no rows
  * this trigger) cost the commit nothing — no file is even created. */
case class GraftStagedFile(path: String, rows: Long)
    extends WriterCommitMessage

/** Continuous ingestion into the versioned store through the SQL
  * catalog: `df.writeStream.toTable("graft.t")` (and
  * `.outputMode("update")` for streaming aggregations — upsert by the
  * table's merge key IS update-mode semantics, so the update-as-append
  * marker routes it here unchanged).
  *
  * The shape is the Delta/Iceberg streaming-sink design re-expressed
  * over this store's own protocol:
  *
  *  - WRITE distributed, COMMIT centralized. Each executor task
  *    streams its partition's `InternalRow`s straight into a parquet
  *    file under `<table>/_streamstage/<queryId>/epoch-<n>/` (Spark's
  *    own `ParquetFileFormat.prepareWrite` writer — identical bytes to
  *    a batch write; nothing ever transits the driver). The driver's
  *    epoch commit then reads the staged files back DISTRIBUTED and
  *    hands them to [[graft.ops.MergeOps.mergeUpsert]]: persisted
  *    constraints re-checked, OCC claim taken, crash-atomic publish —
  *    one store version per micro-batch, so time travel and the change
  *    feed see every trigger.
  *  - EXACTLY-ONCE by the applied-batch ledger. The epoch commits
  *    under `ledgerId = stream:<queryId>:<epochId>`, the id landing
  *    tokenized BEFORE publish (the store's mirror-bootstrap rule), so
  *    a post-crash replay of the same epoch — Structured Streaming's
  *    recovery contract — no-ops instead of double-applying. The
  *    staging dir is only deleted AFTER the publish: a crash between
  *    publish and cleanup replays into the no-op and then cleans.
  *  - The staging root is a top-level underscore dir: invisible to
  *    parquet listings, outside the manifest, and outside vacuum's
  *    sweep roots (`data/`, `dvdata/`, `uvdata/`, `commits/`), so a
  *    retention pass can never race an in-flight epoch.
  *
  * Complete mode is declined loudly at build time (see
  * [[GraftTable.newWriteBuilder]]): a per-trigger full-table replace
  * has no ledger slot today, so its replay would not be exactly-once —
  * `foreachBatch` + `replaceTable` is the sanctioned spelling. */
class GraftStreamingWrite(spark: SparkSession, dir: String, ident: String,
                          queryId: String, writeSchema: StructType,
                          keyCol: String, partCol: String)
    extends StreamingWrite {

  private val stagingRoot = s"$dir/_streamstage/$queryId"

  // Driver-side once: Spark's own parquet write pipeline (schema
  // converter, compression, rebase modes — everything a batch write
  // configures), captured into a serializable (factory, conf) pair the
  // executor writers reopen per file.
  private val (owf, serConf)
      : (OutputWriterFactory, SerializableConfiguration) = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val f = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, writeSchema)
    (f, new SerializableConfiguration(job.getConfiguration))
  }

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new GraftEpochWriterFactory(stagingRoot, writeSchema, owf, serConf)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq
      .collect { case GraftStagedFile(p, n) if n > 0 => p }
    if (files.nonEmpty) {
      val batch = spark.read.schema(writeSchema).parquet(files: _*)
      MergeOps.mergeUpsert(spark, dir, batch, keyCol, partCol,
        ledgerId = Some(s"stream:$queryId:$epochId"))
    }
    cleanEpoch(epochId)
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    cleanEpoch(epochId)

  private def cleanEpoch(epochId: Long): Unit = {
    val p = new Path(s"$stagingRoot/epoch-$epochId")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  override def toString: String =
    s"GraftStreamingWrite[$ident, query=$queryId]"
}

/** Serialized to executors; names each task's staging file by
  * (epoch, partition, task attempt) — task retries get distinct
  * `taskId`s, and only the committed attempt's message reaches the
  * epoch commit, so a zombie attempt's file is never read and is
  * swept with the epoch dir. */
class GraftEpochWriterFactory(stagingRoot: String, schema: StructType,
                              owf: OutputWriterFactory,
                              conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftEpochFileWriter(
      s"$stagingRoot/epoch-$epochId/" +
        f"part-$partitionId%05d-$taskId.snappy.parquet",
      schema, owf, conf)
}

/** Executor-side writer: opens the parquet file lazily on the first
  * row (an empty partition creates nothing), streams rows through
  * Spark's `OutputWriter`, and reports (path, rows) on commit. */
class GraftEpochFileWriter(filePath: String, schema: StructType,
                           owf: OutputWriterFactory,
                           conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {

  private var rows = 0L
  private var opened: Option[OutputWriter] = None

  private def writer: OutputWriter = opened.getOrElse {
    val hc = new Configuration(conf.value)
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-stream", 0), TaskType.MAP, 0), 0)
    val w = owf.newInstance(filePath, schema,
      new TaskAttemptContextImpl(hc, attempt))
    opened = Some(w); w
  }

  override def write(row: InternalRow): Unit = {
    writer.write(row); rows += 1
  }

  override def commit(): WriterCommitMessage = {
    opened.foreach(_.close()); opened = None
    GraftStagedFile(filePath, rows)
  }

  override def abort(): Unit = {
    scala.util.Try(opened.foreach(_.close())); opened = None
    scala.util.Try {
      val p = new Path(filePath)
      val fs = p.getFileSystem(conf.value)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }

  override def close(): Unit = {
    opened.foreach(_.close()); opened = None
  }
}
