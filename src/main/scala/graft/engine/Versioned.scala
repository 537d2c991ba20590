package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thrown when a writer loses a commit race: another writer claimed the
  * same version's manifest or marker first. The loser's staged data is
  * never visible (its stage dir is unique and unreferenced); the correct
  * response is to redo the whole stage+publish at [[Versioned.nextVersion]]
  * — the state it computed from has changed, so re-deriving, not just
  * re-publishing, is required. */
class ConcurrentCommitException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Minimal crash-atomic commit protocol for in-place table rewrites — the
  * write-audit-publish discipline [[graft.ops.MergeOps]] sits on (SURVEY
  * §2 merge rows; the design every table format with a commit log uses,
  * scaled down to "one manifest per version + one empty marker file").
  *
  * Layout under a table root `dir` (protocol v3, round 10):
  * {{{
  *   dir/commits/<v>               marker — EXISTENCE is the commit,
  *                                 CONTENT is the winning attempt token
  *   dir/manifest/<v>_<token>.txt  partition-dir-name \t rel-data-dir,
  *                                 one per ATTEMPT (winner bound by the
  *                                 marker; legacy: manifest/<v>.txt with
  *                                 an empty marker)
  *   dir/stats|ledger/<v>_<token>.txt  sidecars, same attempt binding
  *   dir/data/<v>_<token>/...      data staged by ONE writer's attempt
  * }}}
  *
  * A writer allocates `v` = current+1, mints an attempt token, stages
  * data under its UNIQUE `data/<v>_<token>` dir, writes its sidecars and
  * `manifest/<v>_<token>.txt`, and only THEN claims `commits/<v>` —
  * created exclusively with the token as content, the one winner-takes-
  * all step that both publishes `v` and binds it to this attempt's
  * files. Readers resolve the highest committed version, read its
  * marker token, and read exactly the directories the WINNING manifest
  * lists. A crash anywhere before the marker leaves every reader on the
  * previous version — always fully-old or fully-new, never a mix (the
  * property [[graft.AtomicCommitSpec]] kills a staged write mid-flight
  * to prove).
  *
  * Concurrency contract (two LIVE writers racing — the streaming
  * maintenance sink + a batch merge sharing one store): exactly one
  * wins, and EVERY loser learns it lost. Three mechanisms compose:
  *   1. every attempt's files (stage dir, manifest, sidecars) are
  *      tokenized — attempts can never overwrite each other's bytes,
  *      and a crashed ghost can never collide with (and so never burn)
  *      a retry at the same version;
  *   2. [[nextVersion]] allocates STRICTLY at current+1, so all racers
  *      that staged from one snapshot contend on the SAME marker — the
  *      round-9 protocol skipped in-flight sidecars and let a racer
  *      slip to a higher number staged from a stale snapshot, where
  *      both writers "won" and the first commit silently vanished (the
  *      r9 advice lost-update);
  *   3. the marker is claimed with `createNewFile` — atomic on POSIX
  *      local filesystems AND HDFS-class stores, the single claim; its
  *      recorded token is what makes a loser's same-version manifest
  *      and sidecars inert ghosts rather than ambient state.
  * A loser gets [[ConcurrentCommitException]] and must redo the whole
  * stage at [[nextVersion]] (the state it computed from changed);
  * ghosts are reclaimed by [[vacuum]] once `current` passes them. The
  * one residual window: the marker's token write is not atomic WITH the
  * `createNewFile` claim — a writer dying inside those few microseconds
  * of driver-local code leaves a token-less marker with no legacy
  * manifest, which readers reject LOUDLY with the recovery step
  * (delete the marker) instead of resolving arbitrarily.
  *
  * Scale notes: resolution is one `listStatus` of `commits/` (one entry
  * per version — the same bounded metadata walk a commit log replays);
  * the manifest is one line per partition, so planning-time partition
  * pruning is a driver-side filter over it, exactly what `PartitionFilters`
  * does for Hive layouts. Untouched partitions keep pointing at older
  * versions' data dirs — a merge pays for touched partitions only, and a
  * reader never lists data dirs it does not need. */
object Versioned {

  /** Manifest key used for the single entry of an unpartitioned table. */
  private val WholeTable = "__ALL__"

  /** Optimistic-concurrency retry — the loop every commit-log system
    * wraps its writers in. `op` must be a COMPLETE stage+publish that
    * RE-DERIVES from the current committed state on every call (every
    * [[graft.ops.MergeOps]] / [[graft.ops.IncrementalOps]] writer is:
    * they read current, compute, allocate, stage, publish); a loser's
    * retry then automatically lands against the winner's state instead
    * of surfacing [[ConcurrentCommitException]] to the caller. Bounded
    * attempts keep a livelock loud; jittered linear backoff de-syncs
    * herds of racers (jitter only times the SLEEP — it can never reach
    * committed data, so output determinism is untouched). */
  def withCommitRetry[T](maxAttempts: Int = 5, baseBackoffMs: Long = 50L)
                        (op: => T): T = {
    require(maxAttempts >= 1, "withCommitRetry needs at least one attempt")
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e: ConcurrentCommitException =>
          if (attempt >= maxAttempts) throw new ConcurrentCommitException(
            s"commit still losing races after $maxAttempts attempts — " +
              "writer contention is pathological, not transient", e)
          Thread.sleep(baseBackoffMs * attempt +
            java.util.concurrent.ThreadLocalRandom.current().nextLong(50L))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def fsOf(s: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Legacy fixed stage path (round-8 layout, version-only name). Still
    * readable — [[stageDirVersion]] parses both forms — and used by the
    * kill-tests to hand-craft torn states; live writers use
    * [[newStageRel]] so concurrent attempts can never collide. */
  def stagePath(dir: String, v: Long): String = s"$dir/data/$v"

  /** A fresh attempt token: 8 hex chars of a UUID. One token identifies
    * ONE writer attempt — its stage dir, its manifest, and its sidecars
    * all carry it, and the commit marker records the winner's token so
    * readers resolve exactly the winning attempt's files. Uniqueness
    * (not secrecy) is the point. */
  def newToken(): String = java.util.UUID.randomUUID().toString.take(8)

  /** The UNIQUE relative stage dir of attempt `token` at version `v`:
    * `data/<v>_<token>`. */
  def newStageRel(v: Long, token: String): String = s"data/${v}_$token"

  /** [[newStageRel]] with a throwaway token — for writers that carry no
    * sidecars (the stage token never needs to match the publish token;
    * manifest entries record full relative paths). */
  def newStageRel(v: Long): String = newStageRel(v, newToken())

  /** The version a data dir name was staged for: `<v>` or `<v>_<token>`. */
  private[graft] def stageDirVersion(name: String): Option[Long] =
    scala.util.Try(name.takeWhile(_ != '_').toLong).toOption

  /** All committed versions, ascending — one bounded metadata listing.
    * May have gaps: a crashed or race-losing writer burns its version
    * number (see [[nextVersion]]), so consumers iterate THIS list, never
    * `1..current`. */
  def committedVersions(s: SparkSession, dir: String): Seq[Long] = {
    val fs = fsOf(s, dir)
    val c = new Path(dir, "commits")
    if (!fs.exists(c)) Seq.empty
    else fs.listStatus(c).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .sorted
  }

  /** Highest committed version, if any — one bounded metadata listing. */
  def currentVersion(s: SparkSession, dir: String): Option[Long] =
    committedVersions(s, dir).lastOption

  /** The version a writer deriving from current RIGHT NOW may attempt:
    * highest committed version + 1. The load-bearing invariant is
    * stronger and belongs to every writer: **publish at SNAPSHOT + 1**,
    * where the snapshot is the version the write actually derived from
    * — allocated from the SAME read, never from a later re-listing.
    * Two distinct lost-update holes close under that rule:
    *   - allocating past orphaned sidecars (the round-9 protocol) let a
    *     racer slip to a higher number with a stale snapshot;
    *   - re-listing current at allocation time (the first round-10
    *     draft) had the same hole in miniature — a racer committing
    *     between a writer's derivation and its allocation leapfrogged
    *     the claim instead of contesting it (caught live by the Wave18
    *     threaded race).
    * With snapshot+1, any commit that intervenes makes the claim FAIL
    * with [[ConcurrentCommitException]] and the loser redoes its whole
    * derivation. Crashed attempts cannot burn a version because every
    * manifest/stats/ledger file is tokenized per attempt
    * ([[newToken]]) — nothing write-once lives at a shared name except
    * the marker itself. One bounded metadata listing. */
  def nextVersion(s: SparkSession, dir: String): Long =
    currentVersion(s, dir).getOrElse(0L) + 1

  /** The winning attempt's token recorded in a COMMITTED version's
    * marker: Some(token) for tokenized commits, None for legacy commits
    * (empty marker + version-named `manifest/<v>.txt`). The marker is
    * created exclusively WITH its token in one stream; a racing reader
    * can still glimpse the file between the exclusive create and the
    * token landing, so an empty marker with no legacy manifest is
    * re-read once before being declared torn — a real torn marker (the
    * writer died inside the few-microsecond claim write) fails LOUDLY
    * with the recovery step rather than resolving to the wrong attempt. */
  private[graft] def committedToken(s: SparkSession, dir: String,
                                    v: Long): Option[String] = {
    val fs = fsOf(s, dir)
    val p = new Path(dir, s"commits/$v")
    def readMarker(): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    val t = readMarker()
    if (t.nonEmpty) Some(t)
    else if (fs.exists(new Path(dir, s"manifest/$v.txt"))) None
    else {
      Thread.sleep(100)
      val t2 = readMarker()
      if (t2.nonEmpty) Some(t2)
      else throw new IllegalStateException(
        s"torn commit marker commits/$v under $dir: the marker exists " +
          "but records no winner token and no legacy manifest is " +
          s"present — the publishing writer died mid-claim; delete " +
          s"commits/$v to discard the torn commit")
    }
  }

  /** The on-disk path of a version's `side` sidecar under attempt
    * resolution: `side/<v>_<token>.txt` for tokenized commits,
    * `side/<v>.txt` for legacy ones. */
  private def sidecarPathFor(dir: String, v: Long, token: Option[String],
                             side: String): Path = token match {
    case Some(t) => new Path(dir, s"$side/${v}_$t.txt")
    case None => new Path(dir, s"$side/$v.txt")
  }

  /** The COMMITTED version `v`'s `side` sidecar path, if the winning
    * attempt wrote one. Resolves through the marker token, so a losing
    * or crashed attempt's ghost sidecar at the same version can never
    * be read. */
  private[graft] def committedSidecar(s: SparkSession, dir: String, v: Long,
                                      side: String): Option[Path] = {
    val fs = fsOf(s, dir)
    val p = sidecarPathFor(dir, v, committedToken(s, dir, v), side)
    if (fs.exists(p)) Some(p) else None
  }

  private def readLines(fs: FileSystem, p: Path): List[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The committed manifest of version `v`: (partition dir name, relative
    * data dir) pairs; dir name `__ALL__` marks an unpartitioned table.
    * Resolved through the marker token (see [[committedToken]]). */
  def manifest(s: SparkSession, dir: String, v: Long): Seq[(String, String)] = {
    val fs = fsOf(s, dir)
    val p = sidecarPathFor(dir, v, committedToken(s, dir, v), "manifest")
    readLines(fs, p).map { line =>
      val i = line.indexOf('\t')
      (line.substring(0, i), line.substring(i + 1))
    }
  }

  /** Stage-dir partition listing → manifest entries: every `col=value`
    * child of the staged dir (the dirs Spark's partitionBy writer
    * created), named exactly as written so no unescaping round-trip can
    * drift. `stageRel` is the writer's own unique dir from
    * [[newStageRel]]. */
  def listStagedPartDirs(s: SparkSession, dir: String, stageRel: String,
                         partCol: String): Seq[(String, String)] = {
    val fs = fsOf(s, dir)
    fs.listStatus(new Path(s"$dir/$stageRel")).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
      .map(st => (st.getPath.getName, s"$stageRel/${st.getPath.getName}"))
      .sortBy(_._1)
  }

  /** [[listStagedPartDirs]] for the legacy version-only stage layout —
    * kept for the kill-tests that hand-craft torn round-8-shaped states. */
  def listPartDirs(s: SparkSession, dir: String, v: Long,
                   partCol: String): Seq[(String, String)] =
    listStagedPartDirs(s, dir, s"data/$v", partCol)

  /** Create a file write-once, translating "already exists" into the
    * commit-race signal. The existence pre-check is only for a friendlier
    * message; `overwrite=false` is the atomic claim. */
  private[graft] def createExclusive(fs: FileSystem, p: Path, what: String)
      : org.apache.hadoop.fs.FSDataOutputStream =
    try fs.create(p, false)
    catch {
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(
          s"$what $p already exists — another writer claimed this " +
            "version; redo the stage at nextVersion", e)
      case e: java.io.IOException if fs.exists(p) =>
        throw new ConcurrentCommitException(
          s"$what $p already exists — another writer claimed this " +
            "version; redo the stage at nextVersion", e)
    }

  /** Publish version `v` as attempt `token`: write the attempt's own
    * manifest (`manifest/<v>_<token>.txt` — unique per attempt, so
    * concurrent attempts and crashed ghosts can never collide), then
    * claim `commits/<v>` exclusively WITH the token as its content —
    * the single winner-takes-all step that both makes `v` visible and
    * binds it to this attempt's manifest and sidecars. Because
    * [[nextVersion]] allocates strictly at current+1, every racer that
    * staged from the same snapshot claims the SAME marker: exactly one
    * wins; every loser throws [[ConcurrentCommitException]] here and
    * its staged data, manifest, and sidecars are inert ghosts (vacuum
    * reclaims them). A writer whose snapshot went stale mid-flight also
    * loses here — its version number is by then committed by whoever
    * advanced current.
    *
    * Sidecar contract: [[writeStats]] / ledger writes that belong to
    * this version must use the SAME token and land BEFORE publish, so a
    * committed version and its sidecars are bound atomically by the one
    * marker. */
  def publish(s: SparkSession, dir: String, v: Long, token: String,
              entries: Seq[(String, String)]): Unit = {
    val fs = fsOf(s, dir)
    val man = sidecarPathFor(dir, v, Some(token), "manifest")
    val out = createExclusive(fs, man, "manifest")
    try out.write(entries.map { case (k, p) => s"$k\t$p" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    fs.mkdirs(new Path(dir, "commits"))
    // Only the single claim winner writes its token into the file it
    // owns; a reader glimpsing the claimed-but-unwritten marker is
    // handled by committedToken's one re-read.
    val marker = new Path(dir, s"commits/$v")
    if (!atomicCreateNewFile(fs, marker))
      throw new ConcurrentCommitException(
        s"commit marker for version $v already exists under $dir — " +
          "another writer won this version; redo the stage at nextVersion")
    val tokOut = fs.create(marker, true)
    try tokOut.write(token.getBytes("UTF-8")) finally tokOut.close()
  }

  /** Create-empty-if-absent with a REAL atomicity guarantee. Hadoop's
    * `FileSystem.createNewFile` and `RawLocalFileSystem.create(
    * overwrite=false)` are exists-check-then-create — under genuine
    * thread races on `file://` BOTH racers can pass the check and both
    * "win" the claim (observed as a once-in-many-runs lost update in
    * the Wave18 threaded test). For `file://` the claim drops to
    * `java.io.File#createNewFile` — POSIX O_CREAT|O_EXCL, kernel-atomic;
    * for HDFS-class stores `create(overwrite=false)` is already
    * namenode-atomic and is used as-is. */
  private def atomicCreateNewFile(fs: FileSystem, p: Path): Boolean = {
    val q = fs.makeQualified(p)
    if (Option(q.toUri.getScheme).forall(_ == "file")) {
      val f = new java.io.File(q.toUri.getPath)
      f.getParentFile.mkdirs()
      f.createNewFile()
    } else {
      try { fs.create(p, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException => if (fs.exists(p)) false else throw e
      }
    }
  }

  /** [[publish]] for writers that carry no sidecars: mints a throwaway
    * token. */
  def publish(s: SparkSession, dir: String, v: Long,
              entries: Seq[(String, String)]): Unit =
    publish(s, dir, v, newToken(), entries)

  /** Per-partition zone-map sidecar (Iceberg's manifest-stats idea):
    * `stats/<v>.txt` maps each partition dir name to the min/max of a
    * designated LONG column, written BEFORE publish so stats and data
    * commit together (a torn stats write precedes the marker — the
    * version is simply not visible yet). WRITE-ONCE for the same reason
    * the manifest is: a racing loser must not replace the bounds a
    * committed version's readers prune by. Stats make range pruning
    * LAYOUT-AGNOSTIC: the reader needs no knowledge of how the writer
    * clustered the data, only the per-partition bounds. */
  def writeStats(s: SparkSession, dir: String, v: Long, token: String,
                 stats: Seq[(String, (Long, Long))]): Unit = {
    val fs = fsOf(s, dir)
    val out = createExclusive(
      fs, sidecarPathFor(dir, v, Some(token), "stats"), "stats")
    try out.write(stats.map { case (k, (lo, hi)) => s"$k\t$lo\t$hi" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The COMMITTED zone-map sidecar of version `v` (resolved through the
    * marker token), empty if the winning attempt wrote none. */
  def readStats(s: SparkSession, dir: String,
                v: Long): Map[String, (Long, Long)] = {
    val fs = fsOf(s, dir)
    committedSidecar(s, dir, v, "stats") match {
      case None => Map.empty
      case Some(p) =>
        readLines(fs, p).map { line =>
          val parts = line.split('\t')
          parts(0) -> (parts(1).toLong, parts(2).toLong)
        }.toMap
    }
  }

  /** Read the current committed state. `partCol` present: entries are
    * `col=value` dirs possibly spread across versions — they are grouped
    * by staging dir and each group is read with that dir as `basePath`,
    * so Spark re-derives the partition column exactly as a plain
    * partitioned-directory read would (same value escaping, same type
    * inference). `partValues` prunes to the named values BEFORE any file
    * is listed — the manifest is the partition index. */
  def readCurrent(s: SparkSession, dir: String, partCol: Option[String],
                  partValues: Option[Seq[String]] = None): DataFrame = {
    val v = currentVersion(s, dir).getOrElse(
      throw new IllegalStateException(s"no committed version under $dir"))
    val man = manifest(s, dir, v)
    val kept = (partCol, partValues) match {
      case (Some(c), Some(vals)) =>
        val want = vals.map(x => partDirName(c, x)).toSet
        man.filter(e => want.contains(e._1))
      case _ => man
    }
    readEntries(s, dir, kept, partCol)
  }

  /** Union-read a set of manifest entries (see [[readCurrent]]). An empty
    * entry set is the caller's "partition absent" case — callers handle it
    * before calling (we cannot conjure a schema from nothing). */
  def readEntries(s: SparkSession, dir: String,
                  entries: Seq[(String, String)],
                  partCol: Option[String]): DataFrame = {
    require(entries.nonEmpty, "readEntries needs at least one entry")
    partCol match {
      case None =>
        s.read.parquet(entries.map(e => s"$dir/${e._2}"): _*)
      case Some(_) =>
        // allowMissingColumns: version groups may disagree on schema
        // after a schema-evolving merge (a later version's partitions
        // carry columns older ones predate) — missing columns null-fill,
        // the same union semantics scan_evolved pins for file sources.
        entries.groupBy(_._2.split("/").take(2).mkString("/"))
          .toSeq.sortBy(_._1)
          .map { case (verDir, es) =>
            s.read.option("basePath", s"$dir/$verDir")
              .parquet(es.map(e => s"$dir/${e._2}"): _*)
          }.reduce(_.unionByName(_, allowMissingColumns = true))
    }
  }

  /** Manifest entry for an unpartitioned table staged at `stageRel`. */
  def wholeTableEntryAt(stageRel: String): Seq[(String, String)] =
    Seq((WholeTable, stageRel))

  /** Legacy form of [[wholeTableEntryAt]] for the version-only layout. */
  def wholeTableEntries(v: Long): Seq[(String, String)] =
    wholeTableEntryAt(s"data/$v")

  /** The directory name Spark's partitionBy writer gives a partition
    * value — same escaping, so manifest pruning matches the physical
    * layout for ANY value (spaces, unicode, nulls). */
  def partDirName(partCol: String, value: Any): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    if (value == null) s"$partCol=${ExternalCatalogUtils.DEFAULT_PARTITION_NAME}"
    else s"$partCol=${ExternalCatalogUtils.escapePathName(String.valueOf(value))}"
  }

  /** Number of data files under one manifest entry's dir — the
    * fragmentation measure [[graft.ops.MergeOps.compactPartitions]] acts
    * on. Driver-side listing bounded by that partition's file count. */
  def dataFileCount(s: SparkSession, dir: String, relDir: String): Int = {
    val fs = fsOf(s, dir)
    fs.listStatus(new Path(s"$dir/$relDir")).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** The retention floor [[vacuum]] recorded, if any: versions below it
    * may have had their data reclaimed and refuse to time-travel. The
    * floor is ADVISORY (a fail-fast, not a correctness gate), so a
    * torn/empty file — a crash mid-record — parses as None rather than
    * bricking every readVersion/rollback/vacuum until hand-repaired. */
  def retentionFloor(s: SparkSession, dir: String): Option[Long] = {
    val fs = fsOf(s, dir)
    val p = new Path(dir, "floor.txt")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try scala.util.Try(scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().next().trim.toLong).toOption
      finally in.close()
    }
  }

  /** Time travel: read the table AS OF a specific committed version —
    * free with this layout, because publishing never deletes the data
    * dirs an older manifest references (only [[vacuum]] does, and only
    * below its retention floor). One metadata read resolves the
    * manifest; the data files are immutable. Versions below the floor
    * fail fast with a clear error instead of a missing-file surprise. */
  def readVersion(s: SparkSession, dir: String, v: Long,
                  partCol: Option[String]): DataFrame = {
    val fs = fsOf(s, dir)
    require(fs.exists(new Path(dir, s"commits/$v")),
      s"version $v was never committed under $dir")
    retentionFloor(s, dir).foreach(f => require(v >= f,
      s"version $v is below the retention floor $f under $dir — " +
        "its data dirs may have been vacuumed; raise keepVersions " +
        "before vacuuming if you need deeper time travel"))
    readEntries(s, dir, manifest(s, dir, v), partCol)
  }

  /** Roll back to an earlier committed version — published as a NEW
    * version whose manifest is the old one verbatim, so the rollback is
    * itself atomic, auditable in the commit log, and reversible (nothing
    * is deleted; a bad rollback rolls forward the same way). Sidecar
    * state rolls back WITH the data: the target version's stats and
    * applied-batch ledger (if any) are copied forward to the new
    * version, so zone-map pruning and exactly-once fold replay resume
    * from the restored state — without the ledger copy, a re-fold of a
    * rolled-back batch would find the PRE-rollback ledger and silently
    * no-op, losing the batch (the round-8 advice defect). */
  def rollback(s: SparkSession, dir: String, toVersion: Long): Unit = {
    val v = currentVersion(s, dir).getOrElse(
      throw new IllegalStateException(s"no committed version under $dir"))
    if (toVersion == v) return
    val fs = fsOf(s, dir)
    require(fs.exists(new Path(dir, s"commits/$toVersion")),
      s"version $toVersion was never committed under $dir")
    retentionFloor(s, dir).foreach(f => require(toVersion >= f,
      s"cannot roll back to version $toVersion: below the retention " +
        s"floor $f under $dir (its data dirs may have been vacuumed)"))
    val nv = v + 1  // OCC: the rollback derives from current = v
    val tok = newToken()
    def copyTo(from: Path, side: String): Unit = {
      val in = fs.open(from)
      val bytes = try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
        bos.toByteArray
      } finally in.close()
      val out = createExclusive(
        fs, sidecarPathFor(dir, nv, Some(tok), side), side)
      try out.write(bytes) finally out.close()
    }
    // Stats describe exactly one manifest, so only the target version's
    // own sidecar may roll forward (a neighbor's bounds could wrongly
    // prune a partition whose data differs; missing stats merely skip
    // pruning — safe).
    committedSidecar(s, dir, toVersion, "stats").foreach(copyTo(_, "stats"))
    // The ledger is cumulative history and its READER
    // (IncrementalOps.appliedIds) walks back past ledgerless versions —
    // so the rollback must restore the same ledger that walk would have
    // found AT the target: the newest committed ledger at or below
    // toVersion. Copying only the exact-version sidecar (the previous
    // behavior) broke the fold → compact → fold → rollback-to-compact
    // composition: nothing copied, the newest ledger stayed the
    // post-rollback one, and the rolled-back batch re-fold silently
    // no-opped — the lost-batch defect class again. If NO ledger exists
    // at or below the target but some exists above, an empty ledger is
    // written at the rollback version to mask the newer ones.
    val committed = committedVersions(s, dir)
    val ledgerAtOrBelow = committed.filter(_ <= toVersion).sorted.reverse
      .iterator.map(w => committedSidecar(s, dir, w, "ledger"))
      .collectFirst { case Some(p) => p }
    ledgerAtOrBelow match {
      case Some(from) => copyTo(from, "ledger")
      case None =>
        val anyAbove = committed.filter(w => w > toVersion && w <= v)
          .exists(w => committedSidecar(s, dir, w, "ledger").isDefined)
        if (anyAbove) {
          val out = createExclusive(
            fs, sidecarPathFor(dir, nv, Some(tok), "ledger"), "ledger")
          out.close()
        }
    }
    publish(s, dir, nv, tok, manifest(s, dir, toVersion))
  }

  /** What a [[vacuum]] pass actually reclaimed — the operator-facing
    * receipt (every table format's VACUUM prints one): deleting storage
    * is the one irreversible act in an otherwise append-only protocol,
    * so it should be auditable without diffing directory listings. */
  final case class VacuumReport(
      floor: Long, dataDirsDeleted: Int, versionsSwept: Int,
      ghostFilesDeleted: Int)

  /** Reclaim data dirs no RETAINED manifest references — retained =
    * the newest `keepVersions` committed versions (default 1: current
    * only, the round-8 behavior). This is the hard-delete half of the
    * soft/hard retention split: manifest-only drops ([[graft.ops
    * .MergeOps.applyRetention]], [[rollback]]) leave data in place for
    * time travel until a vacuum passes. Records the retention floor
    * (lowest retained version, monotonically non-decreasing) so
    * [[readVersion]]/[[rollback]] below it fail fast instead of hitting
    * missing files. Crashed/losing stages ABOVE current are left for
    * their writer's retry or a later vacuum; everything at or below
    * current that no retained manifest references is deleted. Also
    * sweeps METADATA below the floor (markers, manifests, sidecars,
    * attempt ghosts) so the commit log stays bounded by the retention
    * window, not the table's lifetime commit count — with the one
    * exactly-once guard documented inline: the newest committed
    * applied-batch ledger is never deleted, even below the floor.
    * Bounded metadata work: one listing each of `data/`, `manifest/`,
    * `stats/`, `ledger/` plus `keepVersions` manifests.
    *
    * Concurrency: two racing vacuums may leave `floor.txt` at the
    * SMALLER of their floors (last write wins; no marker claim guards
    * the advisory file). That weakens nothing: the sweep itself is
    * idempotent, and a version one racer already swept fails loudly as
    * "never committed" regardless of the recorded floor — the floor is
    * a fail-fast courtesy, never the correctness gate. A vacuum racing
    * a LIVE writer can at worst delete the stage of a writer that has
    * already lost its version race (its claim will fail anyway); a
    * writer at current+1 is never touched (`n > cur` keep rule). */
  def vacuum(s: SparkSession, dir: String,
             keepVersions: Int = 1): VacuumReport = {
    require(keepVersions >= 1, "vacuum must keep at least the current version")
    val fs = fsOf(s, dir)
    val committed = committedVersions(s, dir)
    if (committed.isEmpty) return VacuumReport(0L, 0, 0, 0)
    val cur = committed.last
    var dataDeleted = 0
    var ghostsDeleted = 0
    val retained = committed.takeRight(keepVersions)
    val floor = math.max(retained.min, retentionFloor(s, dir).getOrElse(1L))
    val referenced = retained.flatMap(rv => manifest(s, dir, rv))
      .map(_._2.split("/").take(2).mkString("/")).toSet
    val dataRoot = new Path(dir, "data")
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot).toSeq.foreach { st =>
      val name = st.getPath.getName
      val keep = stageDirVersion(name).forall(n =>
        n > cur || referenced.contains(s"data/$name"))
      if (!keep) { fs.delete(st.getPath, true); dataDeleted += 1 }
    }
    // Metadata sweep below the floor: versions under the floor already
    // refuse to time-travel (their data may be gone), so their markers,
    // manifests, and sidecars are pure growth — at a streaming fold
    // cadence the commit log would otherwise accumulate forever. One
    // guard: the applied-batch ledger is CUMULATIVE state, and if the
    // newest committed ledger sits below the floor (every later commit
    // was ledgerless maintenance), deleting it would forget every
    // applied batch id — exactly-once replay would double-count. That
    // single version is retained whole (marker + sidecars) until a
    // later fold writes a newer ledger above the floor. Legacy
    // version-named sidecars are deleted here; tokenized ones fall to
    // the ghost sweep below once their marker is gone.
    val newestLedgerV = committed.sorted.reverse.find(w =>
      scala.util.Try(committedSidecar(s, dir, w, "ledger")).toOption
        .flatten.isDefined)
    val ledgerKeep = newestLedgerV.filter(_ < floor)
    val swept = committed
      .filter(v => v < floor && !ledgerKeep.contains(v)).toSet
    swept.foreach { v =>
      Seq("manifest", "stats", "ledger").foreach(side =>
        fs.delete(new Path(dir, s"$side/$v.txt"), false))
      fs.delete(new Path(dir, s"commits/$v"), false)
    }
    val survivors = committed.filterNot(swept)
    // Ghost-sidecar sweep: a losing or crashed attempt's tokenized
    // manifest/stats/ledger files at versions current has passed are
    // inert (the marker binds each committed version to its winner's
    // token) — reclaim them so the metadata dirs stay bounded by the
    // commit count, not the attempt count. Conservative by design:
    // only `<v>_<token>.txt` files whose token is NOT the committed
    // winner's are touched (legacy version-named files and anything at
    // a version a live writer could still claim are left alone), and a
    // torn marker keeps its version's files in place.
    val tokenOf = survivors.map(cv => cv ->
      scala.util.Try(committedToken(s, dir, cv)).toOption.flatten).toMap
    Seq("manifest", "stats", "ledger").foreach { side =>
      val root = new Path(dir, side)
      if (fs.exists(root)) fs.listStatus(root).toSeq.foreach { st =>
        val name = st.getPath.getName.stripSuffix(".txt")
        val i = name.indexOf('_')
        if (i > 0) {
          val ghost = scala.util.Try(name.take(i).toLong).toOption.exists {
            gv =>
              gv <= cur &&
                (!tokenOf.contains(gv) ||
                 tokenOf(gv).exists(_ != name.drop(i + 1)))
          }
          if (ghost) { fs.delete(st.getPath, false); ghostsDeleted += 1 }
        }
      }
    }
    // Record the floor via temp + rename: the plain in-place overwrite
    // could tear to an empty file on a crash; with the tolerant parse in
    // [[retentionFloor]] either failure mode now degrades to "floor
    // forgotten" (advisory lost, correctness unaffected), never a brick.
    val fp = new Path(dir, "floor.txt")
    val tmp = new Path(dir, s"floor.txt.tmp_${newToken()}")
    val out = fs.create(tmp, true)
    try out.write(s"$floor\n".getBytes("UTF-8")) finally out.close()
    fs.delete(fp, false)
    if (!fs.rename(tmp, fp)) fs.delete(tmp, false)
    VacuumReport(floor, dataDeleted, swept.size, ghostsDeleted)
  }
}
