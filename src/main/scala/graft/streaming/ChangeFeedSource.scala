package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{BytesWritable, NullWritable, SequenceFile}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

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
  * DSv2 `MicroBatchStream` implementation (round 14 — the V1 `Source`
  * + `private[sql]` shim hop is gone). The V2 reader contract wants
  * executor-side row production, but a feed batch is a COMPUTED
  * distributed plan (manifest-pruned diff + a key join), not a
  * partitioned scan — so each batch runs its full Catalyst plan ONCE
  * as a distributed job that stages the result's UnsafeRows into
  * SequenceFiles under the stream's own checkpoint dir
  * (`<checkpoint>/graft-feed-stage/<from>_<to>`), and
  * `planInputPartitions` hands one staged file to each
  * [[StagedRowReader]], which replays the raw UnsafeRow bytes — no row
  * ever transits the driver, no private API, and the staged bytes are
  * exactly the CHANGE rows (bounded by the pacing options, never
  * corpus-sized). Staging is also what makes crash-replay free: a
  * replayed range finds its `_SUCCESS`-marked stage dir and re-serves
  * the identical bytes without recomputing; committed ranges' dirs are
  * swept in `commit`.
  *
  * Options (case-insensitive): `dir` (the store root), `keyCol`,
  * `partCol`, optional `startVersion` — absent: emit changes
  * committed AFTER stream start; `0`: BOOTSTRAP (first batch is the
  * full current snapshot as `insert` rows — the content diff from
  * empty); `N>0`: first batch is the net diff from version N — and
  * optional `maxVersionsPerTrigger` (backlog pacing, Delta's
  * `maxFilesPerTrigger` shape at this source's granularity): each
  * trigger's offset advances at most that many SOURCE VERSIONS past
  * what was already offered, so a mirror that slept through a weekend
  * of high-cadence ingest drains the backlog as many bounded batches
  * with a checkpoint after each, instead of one micro-batch spanning
  * days of changes. Net-effect semantics are unchanged — each paced
  * batch is still a net [[graft.ops.MergeOps.changeFeed]] slice, and
  * the concatenation of slices applies to the same mirror end state
  * as the single spanning slice.
  *
  * Optional `maxBytesPerTrigger` paces by DATA instead of commit
  * count (Delta's `maxBytesPerTrigger` shape): version count is a bad
  * proxy for batch size — one compaction-day version can touch every
  * partition while a hundred trickle versions touch one — so each
  * trigger extends its offset version by version only while the
  * cumulative CHANGED-PARTITION BYTES of the added steps stay within
  * the cap, priced from the same manifest/dv/uv diff the batch plan
  * prunes with (a `getContentSummary` per changed dir; nothing is
  * read). A SOFT cap, like Delta's: the first version past the floor
  * is always included — version granularity is the atom, a single fat
  * version lands as its own (possibly over-cap) batch rather than
  * stalling the stream. Composes with `maxVersionsPerTrigger` as the
  * min of both limits, and shares its persisted pacing floor.
  *
  * `startTag` starts from a NAMED pinned version — the mirror-restart
  * idiom (a mirror tags its high-water version to hold its data
  * through vacuums; the stream that resumes it starts exactly there).
  * Resolved once at first creation and persisted like any base, so a
  * later re-tag cannot silently move a running stream.
  *
  * The INITIAL BASE VERSION is resolved once and persisted under the
  * stream's checkpoint dir (the same write-once pattern as Spark's
  * file source and Delta's CDF source): with the default
  * startVersion-absent mode the base is "current at FIRST creation",
  * and a crash-restart that replays a logged-but-uncommitted batch 0
  * must recompute the SAME range — recomputing "current" at
  * re-creation would fold the crashed batch's changes into the new
  * base and silently lose them at the mirror.
  *
  * Contracts shared with every table format's CDC stream: the schema
  * is pinned at stream start (an evolving table needs a stream
  * restart); a `from` version vacuumed below the retention floor while
  * the stream was down fails LOUDLY with the floor error (tag the
  * mirror's high-water version to pin it); each latestOffset is one
  * bounded `commits/` listing. */
class ChangeFeedSourceProvider extends TableProvider with DataSourceRegister {

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

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val p = lower(options.asScala.toMap)
    feedSchema(SparkSession.active, required(p, "dir"),
      required(p, "partcol"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChangeFeedTable(schema, lower(properties.asScala.toMap))

  private[streaming] def parse(p: Map[String, String])
      : (String, String, String, Option[Long], Option[Long], Option[Long],
         Option[String]) = {
    val maxPerTrigger = p.get("maxversionspertrigger").map(_.trim.toLong)
    maxPerTrigger.foreach(m => require(m >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $m"))
    val maxBytes = p.get("maxbytespertrigger").map(_.trim.toLong)
    maxBytes.foreach(b => require(b >= 1,
      s"maxBytesPerTrigger must be >= 1, got $b"))
    require(!(p.contains("startversion") && p.contains("starttag")),
      "pass startVersion or startTag, not both")
    (required(p, "dir"), required(p, "keycol"), required(p, "partcol"),
      p.get("startversion").map(_.trim.toLong), maxPerTrigger, maxBytes,
      p.get("starttag").map(_.trim))
  }
}

private[graft] class ChangeFeedTable(schema: StructType,
                                     props: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String =
    s"graft-change-feed(${props.getOrElse("dir", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new ScanBuilder with Scan {
      // scan-time options override table properties: on the V1-format
      // path both maps are the same stream options (merge is a no-op);
      // on the CATALOG path props carry what the table derived (dir,
      // partcol) and the reader's .option(...) calls land here
      private val merged: Map[String, String] = props ++
        options.asScala.toMap.map { case (k, v) =>
          k.toLowerCase(java.util.Locale.ROOT) -> v }
      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream = {
        val spark = SparkSession.active
        val (dir, keyCol, partCol, startV0, maxV, maxB, startTag) =
          new ChangeFeedSourceProvider().parse(merged)
        // `startTag`: resolved once at first creation; the persisted
        // base (below) makes a later re-tag invisible to this stream
        val startV = startV0.orElse(startTag.map { t =>
          Versioned.tags(spark, dir).getOrElse(t,
            throw new IllegalArgumentException(
              s"no tag '$t' under $dir — live tags: " +
                Versioned.tags(spark, dir).keys.toSeq.sorted
                  .mkString(", ")))
        })
        new ChangeFeedStream(spark, dir, keyCol, partCol,
          ChangeFeedStream.resolveBase(spark, checkpointLocation, dir,
            startV),
          maxV, maxB, checkpointLocation, schema,
          // rowImage stays false here: this table IS the CDC stream
          // (its schema carries change_type); the row-image shape is
          // the plain-table door, [[graft.sql.GraftTable]]'s
          ignoreDeletes =
            merged.get("ignoredeletes").exists(_.trim.toBoolean),
          pinRetention =
            merged.get("pinretention").exists(_.trim.toBoolean))
      }
    }
}

/** The stream's offset: the source-table version already fully
  * emitted. */
case class FeedOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

object ChangeFeedStream {
  /** Resolve-and-persist the stream's initial base version: first
    * creation computes it (explicit `startVersion`, else current) and
    * records it write-once under the stream's own checkpoint dir;
    * every re-creation — including a crash-restart about to REPLAY a
    * logged batch 0 — reads the recorded value back, so the batch-0
    * range is deterministic across restarts. */
  private[graft] def resolveBase(spark: SparkSession,
                                     checkpointLocation: String,
                                     dir: String,
                                     startVersion: Option[Long]): Long = {
    val mp = new Path(checkpointLocation, "graft-feed-base")
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readBack(): Long = {
      val in = fs.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
    if (fs.exists(mp)) readBack()
    else {
      val base = startVersion.getOrElse(
        Versioned.currentVersion(spark, dir).getOrElse(
          throw new IllegalStateException(
            s"no committed version under $dir — nothing to stream; pass " +
              "startVersion=0 to bootstrap from the first commit")))
      fs.mkdirs(mp.getParent)
      try {
        val out = fs.create(mp, false)  // write-once: first creation wins
        try out.write(s"$base\n".getBytes("UTF-8")) finally out.close()
        base
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => readBack()
        case e: java.io.IOException if fs.exists(mp) => readBack()
      }
    }
  }
}

class ChangeFeedStream(spark: SparkSession, dir: String, keyCol: String,
                       partCol: String,
                       /** resolved-and-persisted by the scan: the
                         * version everything BEFORE the stream is folded
                         * into — batches emit changes strictly after it */
                       baseVersion: Long,
                       maxVersionsPerTrigger: Option[Long],
                       maxBytesPerTrigger: Option[Long],
                       checkpointLocation: String,
                       pinnedSchema: StructType,
                       /** ROW-IMAGE mode (the plain
                         * `readStream.table("graft.t")` semantics): emit
                         * insert/update row images AT THE TABLE SCHEMA —
                         * no change_type column — and fail LOUDLY when a
                         * slice contains deletes (a row-image stream
                         * cannot represent them; the CDC stream can).
                         * `ignoreDeletes` drops them instead, Delta's
                         * escape hatch for append-mostly corpora. */
                       rowImage: Boolean = false,
                       ignoreDeletes: Boolean = false,
                       /** Pin the stream's unread floor against vacuum:
                         * each committed offset re-tags
                         * `__feed_<ckhash>` to itself, so an aggressive
                         * retention sweep during a paced backlog keeps
                         * the next batch's `from` endpoint readable
                         * (tagged versions are retention-exempt)
                         * instead of failing with the floor error.
                         * OPT-IN: the loud floor failure is the
                         * documented default contract, and the tag
                         * outlives the stream by design — drop the
                         * stream's checkpoint, drop its tag. */
                       pinRetention: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** `Trigger.AvailableNow` + pacing: without this interface Spark's
    * generic wrapper captures latestOffset ONCE as the run's target —
    * on a paced stream that is just the FIRST bounded slice, so the
    * run would stop with the backlog undrained. Implementing it
    * ourselves, `prepare` pins the UNPACED current version as the
    * run's ceiling and [[latestOffset]] keeps pacing bounded batches
    * toward it (never past it — versions committed after the trigger
    * fired belong to the next run). */
  @volatile private var availableNowCeiling: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCeiling =
      Some(Versioned.currentVersion(spark, dir).getOrElse(baseVersion))

  /** Either pacing option makes the source paced: the persisted floor
    * and its clean-restart re-seed apply to both. */
  private def paced: Boolean =
    maxVersionsPerTrigger.isDefined || maxBytesPerTrigger.isDefined

  /** The pacing floor's PERSISTED high-water: crash-restarts replay
    * `planInputPartitions(prevStart, prevEnd)` before the first new
    * `latestOffset` and re-seed the floor that way, but a CLEAN
    * restart — last batch committed — replays nothing, and an
    * in-memory-only floor would reset to the base: the first paced
    * latestOffset would then return base+m, BELOW the committed
    * offset, and after the resulting empty batch the next trigger
    * would span the whole already-processed range as one unbounded,
    * DUPLICATE slice (breaking both the pacing promise and the
    * non-overlapping CDC contract for non-idempotent consumers). So
    * every paced advance drops a marker file `graft-feed-hw/<off>`
    * under the stream's own checkpoint dir (create-then-sweep — each
    * marker is an atomic create, so a crash between the two leaves
    * only a stale LOWER marker that the max() read ignores), and
    * creation re-seeds the floor from the highest marker. Unpaced
    * streams skip the write: their latestOffset returns `current`,
    * which never regresses. */
  private val hwDir = new Path(checkpointLocation, "graft-feed-hw")
  private val hwFs =
    hwDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readHw(): Long =
    if (!hwFs.exists(hwDir)) baseVersion
    else hwFs.listStatus(hwDir).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .foldLeft(baseVersion)(math.max)

  private def persistHw(off: Long): Unit = {
    hwFs.mkdirs(hwDir)
    val marker = new Path(hwDir, off.toString)
    try hwFs.create(marker, false).close()
    catch { case _: java.io.IOException if hwFs.exists(marker) => () }
    // sweep lower markers, best-effort: the read takes the max, so a
    // leftover only costs a directory entry
    hwFs.listStatus(hwDir).foreach { st =>
      if (scala.util.Try(st.getPath.getName.toLong).toOption
            .exists(_ < off))
        scala.util.Try(hwFs.delete(st.getPath, false))
    }
  }

  /** Highest offset this stream instance has offered or seen — the
    * pacing floor, so a capped [[latestOffset]] never regresses below
    * an already-logged offset. Seeded from the persisted high-water
    * (clean restarts), re-seeded by [[planInputPartitions]]' replayed
    * offsets (crash restarts) — both paths keep the floor monotone. */
  @volatile private var lastOffered: Long =
    if (paced) readHw() else baseVersion

  private lazy val storeFs =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Upper bound on the bytes the feed slice grows by when its end
    * extends across the single version step `prev -> v`: the on-disk
    * size of every data dir (both sides) of a partition whose manifest
    * entry, dv refs, or uv refs changed across the step — the SAME
    * changed-partition rule [[graft.ops.MergeOps.changeFeed]] prunes
    * with, priced via one `getContentSummary` per changed dir instead
    * of a read. An upper bound, not exact: a partition rewritten in
    * several steps of one slice is priced per step but read once, and
    * <=> row-dedup can shrink the emitted rows further — conservative
    * is the right direction for a pacing cap. `prev = None` (nothing
    * committed at or below the floor — the bootstrap walk) prices the
    * full version, which is what the bootstrap batch reads. */
  /** Versions are immutable, so a step's price never changes: cache it
    * for the stream's lifetime — without this, every trigger re-lists
    * and re-prices every candidate step of a long backlog (the pacing
    * walk restarts from the floor each time). Bounded by the number of
    * distinct steps this stream ever considers. */
  private val deltaBytesCache =
    scala.collection.mutable.Map.empty[(Option[Long], Long), Long]

  private def deltaBytes(prev: Option[Long], v: Long): Long =
    deltaBytesCache.getOrElseUpdate((prev, v), {
    val tm = Versioned.manifest(spark, dir, v).toMap
    val fm = prev.map(p => Versioned.manifest(spark, dir, p).toMap)
      .getOrElse(Map.empty[String, String])
    val dvF = prev.map(p => Versioned.readDvRefs(spark, dir, p))
      .getOrElse(Map.empty[String, Seq[String]])
    val uvF = prev.map(p => Versioned.readUvRefs(spark, dir, p))
      .getOrElse(Map.empty[String, Seq[(String, String)]])
    val dvT = Versioned.readDvRefs(spark, dir, v)
    val uvT = Versioned.readUvRefs(spark, dir, v)
    val changed = (fm.keySet ++ tm.keySet).filter { n =>
      fm.get(n) != tm.get(n) ||
        dvF.getOrElse(n, Nil) != dvT.getOrElse(n, Nil) ||
        uvF.getOrElse(n, Nil) != uvT.getOrElse(n, Nil)
    }
    changed.flatMap(n => fm.get(n).toSeq ++ tm.get(n).toSeq)
      .toSeq.distinct.map { rel =>
        scala.util.Try(storeFs.getContentSummary(
          new Path(s"$dir/$rel")).getLength) match {
          case scala.util.Success(b) => b
          case scala.util.Failure(e) =>
            // a swept/vacuumed dir prices at 0 — log it instead of
            // silently over-admitting, so a paced stream that starts
            // overshooting its byte cap is diagnosable
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"graft-change-feed: could not price $dir/$rel for " +
                s"byte pacing (${e.getMessage}); counting it as 0 bytes")
            0L
        }
      }.sum
    })

  override def initialOffset(): Offset = FeedOffset(baseVersion)

  /** SupportsAdmissionControl entry point (what Spark actually calls
    * once SupportsTriggerAvailableNow is in play): this source's
    * admission control is its own option-driven pacing — the engine's
    * ReadLimit is always allAvailable here (we declare no default
    * limit), so both arguments delegate to the paced walk. */
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    FeedOffset(json.trim.toLong)

  override def latestOffset(): Offset =
    Versioned.currentVersion(spark, dir)
        .map(c => availableNowCeiling.fold(c)(math.min(c, _))) match {
      case Some(cur) if cur > baseVersion =>
        val hi = math.max(lastOffered, baseVersion)
        // version pacing: advance at most maxVersionsPerTrigger
        // COMMITTED versions past what was already offered; a backlog
        // then drains as bounded batches, each with its own checkpoint.
        // Walking the committed list (not hi + m arithmetic) matters
        // once a vacuum has swept mid-backlog versions: every offset
        // this source logs must be a version whose manifest still
        // exists, or the batch endpoints can't be diffed — swept
        // versions simply collapse into their successor's net slice.
        val vCap = maxVersionsPerTrigger match {
          case Some(m) =>
            val nexts = Versioned.committedVersions(spark, dir)
              .filter(v => v > hi && v <= cur)
              .take(math.min(m, Int.MaxValue.toLong).toInt)
            if (nexts.isEmpty) hi else nexts.last
          case None => cur
        }
        // byte pacing: within the version cap, extend the offset one
        // committed version at a time while the cumulative changed-
        // partition bytes stay under the cap — soft (the first version
        // always lands, so one fat commit can't stall the stream)
        val off = maxBytesPerTrigger match {
          case Some(maxB) if vCap > hi =>
            val all = Versioned.committedVersions(spark, dir)
            val candidates = all.filter(v => v > hi && v <= vCap)
            var prev = all.filter(_ <= hi).lastOption
            var chosen = hi
            var acc = 0L
            val it = candidates.iterator
            var full = false
            while (it.hasNext && !full) {
              val v = it.next()
              val b = deltaBytes(prev, v)
              if (chosen == hi || acc + b <= maxB) {
                chosen = v; acc += b; prev = Some(v)
              } else full = true
            }
            chosen
          case _ => vCap
        }
        if (paced && off > lastOffered)
          persistHw(off)
        lastOffered = math.max(lastOffered, off)
        FeedOffset(off)
      case _ => FeedOffset(math.max(lastOffered, baseVersion))
    }

  private def versionOf(o: Offset): Long = o match {
    case f: FeedOffset => f.v
    case other => other.json.trim.toLong
  }

  /** The batch's DataFrame — the same plan the V1 source wrapped
    * streaming: a bootstrap snapshot at `to` for `from == 0`, else the
    * net [[graft.ops.MergeOps.changeFeed]] slice, aligned to the
    * pinned schema with the loud-evolution guard. */
  /** The staged row layout: the pinned schema, plus — in row-image
    * mode, where the pin IS the table schema — a trailing change_type
    * the staging pass consumes (delete guard + filter) and strips. */
  private def stagedFrameSchema: StructType =
    if (rowImage) pinnedSchema.add("change_type", StringType,
      nullable = false)
    else pinnedSchema

  private def batchFrame(from: Long, to: Long): DataFrame = {
    val frameSchema = stagedFrameSchema
    val batch =
      if (from == 0L)
        // bootstrap: the content diff from empty IS the full snapshot
        Versioned.readVersion(spark, dir, to, Some(partCol))
          .withColumn("change_type", lit("insert"))
      else
        MergeOps.changeFeed(spark, dir, from, to, keyCol, partCol)
    // pin the declared column order; a mid-stream schema evolution
    // surfaces LOUDLY here, both directions: a dropped pinned column
    // as Spark's unresolved-column error from the select, an ADDED
    // column via the explicit guard below — without it the pinned
    // projection would silently discard the new column's values and
    // the mirror would diverge (the round-12 verdict's "not silent
    // nulls" contract). Restarting the stream re-creates the source,
    // re-pins the WIDENED schema, and the replayed batch flows.
    val extra = batch.columns.filterNot(frameSchema.fieldNames.contains)
    require(extra.isEmpty,
      s"the source table under $dir evolved mid-stream: column(s) " +
        s"[${extra.mkString(", ")}] are not in this stream's pinned " +
        "schema — restart the stream to pick up the widened schema")
    // A batch NARROWER than the pin is the restart-replay of a range
    // that predates a widening (the re-created source pinned the
    // widened schema; the replayed slice was computed before the new
    // column existed): those rows null-fill at the pinned type —
    // exactly the value they'd carry read through the widened table.
    // Present columns CAST-ALIGN to the pinned type (no-op casts fold
    // away): on a mixed-layout store the slice's union can coerce a
    // dir-derived column wider than the pin recorded, and the staged
    // UnsafeRow bytes must be laid out at exactly the pinned types the
    // replaying projection reads them with.
    batch.select(frameSchema.fields.map(f =>
      if (batch.columns.contains(f.name))
        col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  private def stageRoot = new Path(checkpointLocation, "graft-feed-stage")

  /** Stage the batch's rows once, distributed: run the feed plan as an
    * ordinary job whose tasks write their partitions' UnsafeRow BYTES
    * to SequenceFiles — the full Catalyst plan (pruned reads, one key
    * shuffle) executes exactly as the V1 source's did, nothing transits
    * the driver, and the staged payload is the change rows only. The
    * dir is keyed by the range, committed by rename, and reused
    * verbatim on replay (versions are immutable, so the recompute
    * would be identical anyway — the reuse just makes replay free). */
  /** The staged bytes are raw UnsafeRows of the schema that was pinned
    * WHEN THEY WERE WRITTEN — replaying them under a different pin
    * (crash with an uncommitted batch, source schema widened, restart
    * re-pins the wider schema) would re-wrap old-width bytes with the
    * new numFields and silently misread the null bitset and offsets.
    * So each stage dir records its schema, and reuse is conditional on
    * the recorded schema matching the CURRENT pin — a mismatch (or a
    * legacy dir with no record) deletes the dir and restages through
    * [[batchFrame]], which aligns/null-fills the recomputed slice to
    * the new pin (versions are immutable, so the recompute is the same
    * logical batch in the new width). */
  private val stageSchemaFile = "_graft_schema.json"

  private def stagedSchemaMatches(dest: Path): Boolean = {
    val sp = new Path(dest, stageSchemaFile)
    hwFs.exists(sp) && {
      val in = hwFs.open(sp)
      val recorded =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      recorded == pinnedSchema.json
    }
  }

  private def stage(from: Long, to: Long): Path = {
    val dest = new Path(stageRoot, s"${from}_$to")
    if (hwFs.exists(new Path(dest, "_SUCCESS"))) {
      if (stagedSchemaMatches(dest)) return dest
      hwFs.delete(dest, true)  // stale-pin bytes: restage under the new pin
    }
    val tmp = new Path(stageRoot,
      s".${from}_${to}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val emitSchema = pinnedSchema
    val frameSchema = stagedFrameSchema
    val imageMode = rowImage
    // row-image delete guard: counted DURING the one staging pass (no
    // second action over the computed feed plan), checked after it
    val deleted = spark.sparkContext.longAccumulator("graft-feed-deletes")
    batchFrame(from, to).queryExecution.toRdd
      .mapPartitions { it =>
        import org.apache.spark.sql.catalyst.expressions.BoundReference
        // in row-image mode the frame carries a trailing change_type
        // the emitted rows strip; the no-op projection otherwise
        val proj = UnsafeProjection.create(
          emitSchema.fields.toIndexedSeq.zipWithIndex.map {
            case (f, i) => BoundReference(i, f.dataType, f.nullable) })
        val ctOrd = frameSchema.length - 1
        it.flatMap { r =>
          if (imageMode) {
            val ct = r.getUTF8String(ctOrd).toString
            if (ct == "delete") { deleted.add(1L); None }
            else Some((NullWritable.get(),
                       new BytesWritable(proj(r).getBytes)))
          } else Some((NullWritable.get(),
                       new BytesWritable(proj(r).getBytes)))
        }
      }
      .saveAsSequenceFile(tmp.toString)
    if (imageMode && deleted.value > 0L && !ignoreDeletes) {
      hwFs.delete(tmp, true)
      throw new IllegalStateException(
        s"the change feed $from -> $to under $dir contains " +
          s"${deleted.value} DELETE row(s): a plain table stream is an " +
          "append/upsert row-image stream and cannot represent " +
          "deletions — read the CDC stream (the catalog's " +
          "`changes` namespace, or format(\"graft-change-feed\")) for " +
          "change_type rows, or pass ignoreDeletes=true to drop them")
    }
    val out = hwFs.create(new Path(tmp, stageSchemaFile), true)
    try out.write(pinnedSchema.json.getBytes("UTF-8")) finally out.close()
    hwFs.delete(dest, true)  // a torn earlier attempt without _SUCCESS
    require(hwFs.rename(tmp, dest),
      s"could not commit staged feed batch $tmp -> $dest")
    dest
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = versionOf(start)
    val to = versionOf(end)
    // fold replayed/logged offsets into the pacing floor (crash-restart
    // path); the persisted marker catches up lazily at the next advance
    lastOffered = math.max(lastOffered, math.max(from, to))
    if (from >= to) return Array.empty
    val dest = stage(from, to)
    pinFloor(to)  // staged: the source is only needed beyond `to` now
    hwFs.listStatus(dest).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("part-"))
      .sortBy(_.getName)
      .map(p => StagedFilePartition(p.toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StagedRowReaderFactory(pinnedSchema.fields.length,
      new SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))

  /** The stream's vacuum pin: one tag per checkpoint (stable across
    * restarts — the checkpoint IS the stream's identity), re-pointed
    * to each batch's END as soon as its bytes are STAGED — from then
    * on the staged SequenceFiles serve any replay of the range, and
    * everything the stream still needs from the source is versions
    * > end (the next slice's from-side) — so every advance releases
    * the versions behind it. Staging time, not `commit`, because Spark
    * defers the source-commit callback to the NEXT trigger (or the
    * next restart): a Trigger.Once run would otherwise end with its
    * pin one batch behind, and a vacuum between runs could sweep the
    * very version the next slice diffs FROM. Registered at creation
    * too (the base would otherwise be sweepable between stream start
    * and the first batch). Tag writes are atomic rename-replace, so a
    * racing vacuum sees old-or-new — both safe. One lagging edge,
    * documented: a schema-widening RESTAGE of an already-staged range
    * needs the from-side's data again, and a vacuum past it fails with
    * the loud floor error. */
  private val retentionTag: String = "__feed_" + java.security.MessageDigest
    .getInstance("MD5").digest(checkpointLocation.getBytes("UTF-8"))
    .take(6).map("%02x".format(_)).mkString

  private def pinFloor(v: Long): Unit =
    if (pinRetention &&
        Versioned.committedVersions(spark, dir).contains(v) &&
        // MONOTONE: the deferred source-commit callback of an already-
        // superseded batch (Spark fires it a trigger late) must not
        // regress the pin a newer staging already advanced
        !Versioned.tags(spark, dir).get(retentionTag).exists(_ >= v) &&
        // already below the floor: tagging is refused (the data may be
        // gone) — skip, and let the feed's own floor check fail loudly
        Versioned.retentionFloor(spark, dir).forall(f => v >= f))
      Versioned.tagVersion(spark, dir, retentionTag, v)

  pinFloor(math.max(readHw(), baseVersion))

  /** A committed range's staged bytes can never be replayed — sweep
    * every stage dir whose end is at or below the committed offset
    * (and any torn tmp attempt). */
  override def commit(end: Offset): Unit = {
    val committed = versionOf(end)
    pinFloor(committed)
    if (!hwFs.exists(stageRoot)) return
    hwFs.listStatus(stageRoot).foreach { st =>
      val n = st.getPath.getName
      val sweep =
        if (n.startsWith(".")) true  // torn tmp attempt
        else n.split('_') match {
          case Array(_, t) =>
            scala.util.Try(t.toLong).toOption.exists(_ <= committed)
          case _ => false
        }
      if (sweep) scala.util.Try(hwFs.delete(st.getPath, true))
    }
  }

  override def stop(): Unit = ()
  override def toString: String =
    s"ChangeFeedStream[$dir, key=$keyCol, part=$partCol, base=$baseVersion]"
}

/** One staged SequenceFile of UnsafeRow bytes. */
case class StagedFilePartition(path: String) extends InputPartition

class StagedRowReaderFactory(numFields: Int,
                             conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new StagedRowReader(
      partition.asInstanceOf[StagedFilePartition].path, numFields,
      conf.value)
}

/** Replays one staged SequenceFile: each record's bytes ARE an
  * UnsafeRow of the pinned schema — `pointTo` re-wraps them with zero
  * decoding (the same-version write/read pairing every shuffle relies
  * on). */
class StagedRowReader(path: String, numFields: Int, conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val reader =
    new SequenceFile.Reader(conf, SequenceFile.Reader.file(new Path(path)))
  private val key = NullWritable.get()
  private val value = new BytesWritable()
  private var row: UnsafeRow = _

  override def next(): Boolean =
    if (reader.next(key, value)) {
      val r = new UnsafeRow(numFields)
      r.pointTo(value.copyBytes(), value.getLength)
      row = r
      true
    } else false

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
