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
  * The INITIAL BASE VERSION is resolved once and persisted under the
  * query's `metadataPath` (the same write-once pattern as Spark's file
  * source and Delta's CDF source): with the default
  * startVersion-absent mode the base is "current at FIRST creation",
  * and a crash-restart that replays a logged-but-uncommitted batch 0
  * must recompute the SAME range — recomputing "current" at re-creation
  * would fold the crashed batch's changes into the new base and
  * silently lose them at the mirror.
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
    val spark = sqlContext.sparkSession
    val dir = required(p, "dir")
    val maxPerTrigger = p.get("maxversionspertrigger").map(_.trim.toLong)
    maxPerTrigger.foreach(m => require(m >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $m"))
    val maxBytes = p.get("maxbytespertrigger").map(_.trim.toLong)
    maxBytes.foreach(b => require(b >= 1,
      s"maxBytesPerTrigger must be >= 1, got $b"))
    // `startTag`: start from a NAMED pinned version — the mirror-restart
    // idiom (a mirror tags its high-water version to hold its data
    // through vacuums; the stream that resumes it starts exactly
    // there). Resolved once at first creation and persisted like any
    // base, so a later re-tag cannot silently move a running stream.
    require(!(p.contains("startversion") && p.contains("starttag")),
      "pass startVersion or startTag, not both")
    val startV = p.get("startversion").map(_.trim.toLong)
      .orElse(p.get("starttag").map { t =>
        Versioned.tags(spark, dir).getOrElse(t.trim,
          throw new IllegalArgumentException(
            s"no tag '${t.trim}' under $dir — live tags: " +
              Versioned.tags(spark, dir).keys.toSeq.sorted
                .mkString(", ")))
      })
    new ChangeFeedSource(spark, dir, required(p, "keycol"),
      required(p, "partcol"),
      resolveBase(spark, metadataPath, dir, startV),
      maxPerTrigger, maxBytes, metadataPath)
  }

  /** Resolve-and-persist the stream's initial base version: first
    * creation computes it (explicit `startVersion`, else current) and
    * records it write-once under the query's own metadataPath; every
    * re-creation — including a crash-restart about to REPLAY a logged
    * batch 0 — reads the recorded value back, so `getBatch(None, end)`
    * is deterministic across restarts. */
  private def resolveBase(spark: SparkSession, metadataPath: String,
                          dir: String, startVersion: Option[Long]): Long = {
    val mp = new org.apache.hadoop.fs.Path(metadataPath, "graft-feed-base")
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

class ChangeFeedSource(spark: SparkSession, dir: String, keyCol: String,
                       partCol: String,
                       /** resolved-and-persisted by the provider: the
                         * version everything BEFORE the stream is folded
                         * into — batches emit changes strictly after it */
                       baseVersion: Long,
                       maxVersionsPerTrigger: Option[Long],
                       maxBytesPerTrigger: Option[Long],
                       metadataPath: String)
    extends Source {

  /** Either pacing option makes the source paced: the persisted floor
    * and its clean-restart re-seed apply to both. */
  private def paced: Boolean =
    maxVersionsPerTrigger.isDefined || maxBytesPerTrigger.isDefined

  /** The pacing floor's PERSISTED high-water: crash-restarts replay
    * `getBatch(prevStart, prevEnd)` before the first new `getOffset`
    * (the Kafka-source assumption in MicroBatchExecution's
    * populateStartOffsets) and re-seed the floor that way, but a CLEAN
    * restart — last batch committed — replays nothing, and an
    * in-memory-only floor would reset to the base: the first paced
    * getOffset would then return base+m, BELOW the committed offset,
    * and after the resulting empty batch the next trigger would span
    * the whole already-processed range as one unbounded, DUPLICATE
    * slice (breaking both the pacing promise and the non-overlapping
    * CDC contract for non-idempotent consumers). So every paced
    * advance drops a marker file `graft-feed-hw/<off>` under the
    * query's own metadataPath (create-then-sweep — each marker is an
    * atomic create, so a crash between the two leaves only a stale
    * LOWER marker that the max() read ignores), and creation re-seeds
    * the floor from the highest marker. Unpaced streams skip the
    * write: their getOffset returns `current`, which never regresses. */
  private val hwDir = new org.apache.hadoop.fs.Path(
    metadataPath, "graft-feed-hw")
  private val hwFs =
    hwDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readHw(): Long =
    if (!hwFs.exists(hwDir)) baseVersion
    else hwFs.listStatus(hwDir).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .foldLeft(baseVersion)(math.max)

  private def persistHw(off: Long): Unit = {
    hwFs.mkdirs(hwDir)
    val marker = new org.apache.hadoop.fs.Path(hwDir, off.toString)
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

  /** Highest offset this source instance has offered or seen — the
    * pacing floor, so a capped [[getOffset]] never regresses below an
    * already-logged offset. Seeded from the persisted high-water
    * (clean restarts), re-seeded by [[getBatch]]'s replayed offsets
    * (crash restarts) — both paths keep the floor monotone. */
  @volatile private var lastOffered: Long =
    if (paced) readHw() else baseVersion

  private lazy val storeFs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

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
  private def deltaBytes(prev: Option[Long], v: Long): Long = {
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
          new org.apache.hadoop.fs.Path(s"$dir/$rel")).getLength)
          .getOrElse(0L)
      }.sum
  }

  override val schema: StructType =
    new ChangeFeedSourceProvider().feedSchema(spark, dir, partCol)

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] =
    Versioned.currentVersion(spark, dir) match {
      case Some(cur) if cur > baseVersion =>
        val hi = math.max(lastOffered, baseVersion)
        // version pacing: advance at most maxVersionsPerTrigger past
        // what was already offered; a backlog then drains as bounded
        // batches, each with its own checkpoint
        val vCap = maxVersionsPerTrigger match {
          case Some(m) => math.max(math.min(cur, hi + m), hi)
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
        lastOffered = off
        Some(LongOffset(off))
      case _ => None  // nothing past the base yet
    }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(baseVersion)
    val to = versionOf(end)
    // fold replayed/logged offsets into the pacing floor (crash-restart
    // path); the persisted marker catches up lazily at the next advance
    lastOffered = math.max(lastOffered, math.max(from, to))
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
    // surfaces LOUDLY here, both directions: a dropped pinned column
    // as Spark's unresolved-column error from the select, an ADDED
    // column via the explicit guard below — without it the pinned
    // projection would silently discard the new column's values and
    // the mirror would diverge (the round-12 verdict's "not silent
    // nulls" contract). Restarting the stream re-creates the source,
    // re-pins the WIDENED schema, and the replayed batch flows.
    val extra = batch.columns.filterNot(schema.fieldNames.contains)
    require(extra.isEmpty,
      s"the source table under $dir evolved mid-stream: column(s) " +
        s"[${extra.mkString(", ")}] are not in this stream's pinned " +
        "schema — restart the stream to pick up the widened schema")
    // A batch NARROWER than the pin is the restart-replay of a range
    // that predates a widening (the re-created source pinned the
    // widened schema; the replayed slice was computed before the new
    // column existed): those rows null-fill at the pinned type —
    // exactly the value they'd carry read through the widened table.
    val aligned = batch.select(schema.fields.map(f =>
      if (batch.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
    org.apache.spark.sql.graft.StreamingShim.internalStreamingFrame(
      spark, aligned.queryExecution.toRdd, schema)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"ChangeFeedSource[$dir, key=$keyCol, part=$partCol, base=$baseVersion]"
}
