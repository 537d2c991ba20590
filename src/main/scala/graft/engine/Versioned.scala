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
  * Layout under a table root `dir`:
  * {{{
  *   dir/commits/<v>            empty marker — its EXISTENCE is the commit
  *   dir/manifest/<v>.txt       partition-dir-name \t relative-data-dir
  *   dir/data/<v>_<token>/...   data staged by ONE writer's attempt at v
  * }}}
  *
  * A writer stages data under a UNIQUE `data/<v>_<token>` dir, writes
  * `manifest/<v>.txt`, and only THEN creates the empty `commits/<v>`
  * marker. Readers resolve the highest committed version and read exactly
  * the directories its manifest lists. The marker file carries no
  * content, so its creation is the one atomic step; a crash anywhere
  * before it leaves every reader on the previous version — the corpus is
  * always fully-old or fully-new, never a mix (the property
  * [[graft.AtomicCommitSpec]] kills a staged write mid-flight to prove).
  *
  * Concurrency contract (two LIVE writers racing the same version — the
  * streaming maintenance sink + a batch merge sharing one store):
  * exactly one wins. Three mechanisms compose:
  *   1. the stage dir is unique per ATTEMPT (`data/<v>_<token>`), so a
  *      racing writer can never overwrite data another writer's manifest
  *      references — the round-8 design staged both writers into one
  *      `data/<v>` dir, where the loser's files could silently become
  *      the winner's committed bytes;
  *   2. the manifest is WRITE-ONCE (created with overwrite=false): the
  *      second writer to reach `manifest/<v>.txt` fails here, before
  *      anything it staged can be referenced;
  *   3. the marker is claimed with `createNewFile`, whose result is
  *      REQUIRED true — the final backstop making the commit point a
  *      single atomic winner-takes-all step.
  * A loser gets [[ConcurrentCommitException]] and must redo the stage at
  * [[nextVersion]]; its orphaned unique dir is reclaimed by [[vacuum]]
  * once `current` passes its version. A writer that CRASHED between
  * manifest and marker leaves an orphaned manifest; [[nextVersion]] skips
  * past orphaned manifests (and stats/ledger sidecars), so retries
  * allocate a fresh number instead of contending with a ghost.
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

  private def fsOf(s: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Legacy fixed stage path (round-8 layout, version-only name). Still
    * readable — [[stageDirVersion]] parses both forms — and used by the
    * kill-tests to hand-craft torn states; live writers use
    * [[newStageRel]] so concurrent attempts can never collide. */
  def stagePath(dir: String, v: Long): String = s"$dir/data/$v"

  /** A fresh UNIQUE relative stage dir for one writer's attempt at
    * version `v`: `data/<v>_<token>`. Uniqueness (not secrecy) is the
    * point — see the concurrency contract above. */
  def newStageRel(v: Long): String =
    s"data/${v}_${java.util.UUID.randomUUID().toString.take(8)}"

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

  /** The next version a writer may attempt: past every committed version
    * AND every orphaned manifest/stats/ledger sidecar a crashed writer
    * left behind (those versions are burned — re-claiming a write-once
    * sidecar would fail forever). Three bounded metadata listings. */
  def nextVersion(s: SparkSession, dir: String): Long = {
    val fs = fsOf(s, dir)
    def versionsIn(sub: String): Seq[Long] = {
      val p = new Path(dir, sub)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.flatMap(st =>
        scala.util.Try(
          st.getPath.getName.stripSuffix(".txt").toLong).toOption)
    }
    (versionsIn("commits") ++ versionsIn("manifest") ++
     versionsIn("stats") ++ versionsIn("ledger"))
      .foldLeft(0L)(math.max) + 1
  }

  /** The committed manifest of version `v`: (partition dir name, relative
    * data dir) pairs; dir name `__ALL__` marks an unpartitioned table. */
  def manifest(s: SparkSession, dir: String, v: Long): Seq[(String, String)] = {
    val fs = fsOf(s, dir)
    val in = fs.open(new Path(dir, s"manifest/$v.txt"))
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map { line =>
          val i = line.indexOf('\t')
          (line.substring(0, i), line.substring(i + 1))
        }.toList
    } finally in.close()
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
  private def createExclusive(fs: FileSystem, p: Path, what: String)
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

  /** Publish version `v`: write its manifest (WRITE-ONCE), then create
    * the empty commit marker — the single atomic winner-takes-all step
    * that makes `v` visible. Throws [[ConcurrentCommitException]] if
    * another writer claimed `v` first; the loser's staged data is never
    * visible (unique stage dir, unreferenced). */
  def publish(s: SparkSession, dir: String, v: Long,
              entries: Seq[(String, String)]): Unit = {
    val fs = fsOf(s, dir)
    val man = new Path(dir, s"manifest/$v.txt")
    val out = createExclusive(fs, man, "manifest")
    try out.write(entries.map { case (k, p) => s"$k\t$p" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    fs.mkdirs(new Path(dir, "commits"))
    if (!fs.createNewFile(new Path(dir, s"commits/$v")))
      throw new ConcurrentCommitException(
        s"commit marker for version $v already exists under $dir — " +
          "another writer won this version; redo the stage at nextVersion")
  }

  /** Per-partition zone-map sidecar (Iceberg's manifest-stats idea):
    * `stats/<v>.txt` maps each partition dir name to the min/max of a
    * designated LONG column, written BEFORE publish so stats and data
    * commit together (a torn stats write precedes the marker — the
    * version is simply not visible yet). WRITE-ONCE for the same reason
    * the manifest is: a racing loser must not replace the bounds a
    * committed version's readers prune by. Stats make range pruning
    * LAYOUT-AGNOSTIC: the reader needs no knowledge of how the writer
    * clustered the data, only the per-partition bounds. */
  def writeStats(s: SparkSession, dir: String, v: Long,
                 stats: Seq[(String, (Long, Long))]): Unit = {
    val fs = fsOf(s, dir)
    val out = createExclusive(fs, new Path(dir, s"stats/$v.txt"), "stats")
    try out.write(stats.map { case (k, (lo, hi)) => s"$k\t$lo\t$hi" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The zone-map sidecar of version `v`, empty if none was written. */
  def readStats(s: SparkSession, dir: String,
                v: Long): Map[String, (Long, Long)] = {
    val fs = fsOf(s, dir)
    val p = new Path(dir, s"stats/$v.txt")
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map { line =>
          val parts = line.split('\t')
          parts(0) -> (parts(1).toLong, parts(2).toLong)
        }.toMap
      finally in.close()
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
    * may have had their data reclaimed and refuse to time-travel. */
  def retentionFloor(s: SparkSession, dir: String): Option[Long] = {
    val fs = fsOf(s, dir)
    val p = new Path(dir, "floor.txt")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().next().trim.toLong)
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
    val nv = nextVersion(s, dir)
    Seq("stats", "ledger").foreach { side =>
      val from = new Path(dir, s"$side/$toVersion.txt")
      if (fs.exists(from)) {
        val in = fs.open(from)
        val bytes = try {
          val bos = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
          bos.toByteArray
        } finally in.close()
        val out = createExclusive(fs, new Path(dir, s"$side/$nv.txt"), side)
        try out.write(bytes) finally out.close()
      }
    }
    publish(s, dir, nv, manifest(s, dir, toVersion))
  }

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
    * current that no retained manifest references is deleted. Bounded
    * metadata work: one listing of `data/` plus `keepVersions`
    * manifests. */
  def vacuum(s: SparkSession, dir: String, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, "vacuum must keep at least the current version")
    val fs = fsOf(s, dir)
    val committed = committedVersions(s, dir)
    if (committed.isEmpty) return
    val cur = committed.last
    val retained = committed.takeRight(keepVersions)
    val floor = math.max(retained.min, retentionFloor(s, dir).getOrElse(1L))
    val referenced = retained.flatMap(rv => manifest(s, dir, rv))
      .map(_._2.split("/").take(2).mkString("/")).toSet
    val dataRoot = new Path(dir, "data")
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot).toSeq.foreach { st =>
      val name = st.getPath.getName
      val keep = stageDirVersion(name).forall(n =>
        n > cur || referenced.contains(s"data/$name"))
      if (!keep) fs.delete(st.getPath, true)
    }
    val fp = new Path(dir, "floor.txt")
    val out = fs.create(fp, true)
    try out.write(s"$floor\n".getBytes("UTF-8")) finally out.close()
  }
}
