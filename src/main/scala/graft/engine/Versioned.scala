package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Minimal crash-atomic commit protocol for in-place table rewrites — the
  * write-audit-publish discipline [[graft.ops.MergeOps]] sits on (SURVEY
  * §2 merge rows; the design every table format with a commit log uses,
  * scaled down to "one manifest per version + one empty marker file").
  *
  * Layout under a table root `dir`:
  * {{{
  *   dir/commits/<v>          empty marker — its EXISTENCE is the commit
  *   dir/manifest/<v>.txt     partition-dir-name \t relative-data-dir
  *   dir/data/<v>/...         data files staged by version v's writer
  * }}}
  *
  * A writer stages data under `data/<v>`, writes `manifest/<v>.txt`, and
  * only THEN creates the empty `commits/<v>` marker. Readers resolve the
  * highest committed version and read exactly the directories its
  * manifest lists. The marker file carries no content, so its creation is
  * the one atomic step; a crash anywhere before it leaves every reader on
  * the previous version — the corpus is always fully-old or fully-new,
  * never a mix (the property [[graft.AtomicCommitSpec]] kills a staged
  * write mid-flight to prove). Orphaned stages are clobbered by the next
  * writer (`mode("overwrite")` on the stage dir) or removed by [[vacuum]].
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

  def stagePath(dir: String, v: Long): String = s"$dir/data/$v"

  /** Highest committed version, if any — one bounded metadata listing. */
  def currentVersion(s: SparkSession, dir: String): Option[Long] = {
    val fs = fsOf(s, dir)
    val c = new Path(dir, "commits")
    if (!fs.exists(c)) None
    else {
      val vs = fs.listStatus(c).toSeq
        .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      if (vs.isEmpty) None else Some(vs.max)
    }
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

  /** Stage-dir partition listing → manifest entries for version `v`:
    * every `col=value` child of `data/<v>` (the dirs Spark's partitionBy
    * writer created), named exactly as written so no unescaping round-trip
    * can drift. */
  def listPartDirs(s: SparkSession, dir: String, v: Long,
                   partCol: String): Seq[(String, String)] = {
    val fs = fsOf(s, dir)
    fs.listStatus(new Path(stagePath(dir, v))).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
      .map(st => (st.getPath.getName, s"data/$v/${st.getPath.getName}"))
      .sortBy(_._1)
  }

  /** Publish version `v`: write its manifest, then create the empty
    * commit marker — the single atomic step that makes `v` visible. */
  def publish(s: SparkSession, dir: String, v: Long,
              entries: Seq[(String, String)]): Unit = {
    val fs = fsOf(s, dir)
    val man = new Path(dir, s"manifest/$v.txt")
    val out = fs.create(man, true)
    try out.write(entries.map { case (k, p) => s"$k\t$p" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    fs.mkdirs(new Path(dir, "commits"))
    fs.createNewFile(new Path(dir, s"commits/$v"))
  }

  /** Per-partition zone-map sidecar (Iceberg's manifest-stats idea):
    * `stats/<v>.txt` maps each partition dir name to the min/max of a
    * designated LONG column, written BEFORE publish so stats and data
    * commit together (a torn stats write precedes the marker — the
    * version is simply not visible yet). Stats make range pruning
    * LAYOUT-AGNOSTIC: the reader needs no knowledge of how the writer
    * clustered the data, only the per-partition bounds. */
  def writeStats(s: SparkSession, dir: String, v: Long,
                 stats: Seq[(String, (Long, Long))]): Unit = {
    val fs = fsOf(s, dir)
    val out = fs.create(new Path(dir, s"stats/$v.txt"), true)
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
    * by staging version and each group is read with that version's
    * `basePath`, so Spark re-derives the partition column exactly as a
    * plain partitioned-directory read would (same value escaping, same
    * type inference). `partValues` prunes to the named values BEFORE any
    * file is listed — the manifest is the partition index. */
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

  /** Manifest entries for an unpartitioned table staged at version `v`. */
  def wholeTableEntries(v: Long): Seq[(String, String)] =
    Seq((WholeTable, s"data/$v"))

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

  /** Time travel: read the table AS OF a specific committed version —
    * free with this layout, because publishing never deletes the data
    * dirs an older manifest references (only [[vacuum]] does, and only
    * for dirs no CURRENT entry needs — callers retaining history for
    * travel simply don't vacuum, or vacuum to a retention floor). One
    * metadata read resolves the manifest; the data files are immutable. */
  def readVersion(s: SparkSession, dir: String, v: Long,
                  partCol: Option[String]): DataFrame = {
    val fs = fsOf(s, dir)
    require(fs.exists(new Path(dir, s"commits/$v")),
      s"version $v was never committed under $dir")
    readEntries(s, dir, manifest(s, dir, v), partCol)
  }

  /** Roll back to an earlier committed version — published as a NEW
    * version whose manifest is the old one verbatim, so the rollback is
    * itself atomic, auditable in the commit log, and reversible (nothing
    * is deleted; a bad rollback rolls forward the same way). */
  def rollback(s: SparkSession, dir: String, toVersion: Long): Unit = {
    val v = currentVersion(s, dir).getOrElse(
      throw new IllegalStateException(s"no committed version under $dir"))
    if (toVersion == v) return
    val fs = fsOf(s, dir)
    require(fs.exists(new Path(dir, s"commits/$toVersion")),
      s"version $toVersion was never committed under $dir")
    publish(s, dir, v + 1, manifest(s, dir, toVersion))
  }

  /** Delete data dirs no committed-current manifest entry references and
    * whose version is at or below current — crashed stages above current
    * are left for their next writer to overwrite. Bounded metadata work:
    * one listing of `data/` plus the current manifest. */
  def vacuum(s: SparkSession, dir: String): Unit = {
    currentVersion(s, dir).foreach { v =>
      val fs = fsOf(s, dir)
      val referenced = manifest(s, dir, v)
        .map(_._2.split("/").take(2).mkString("/")).toSet
      val dataRoot = new Path(dir, "data")
      if (fs.exists(dataRoot)) fs.listStatus(dataRoot).toSeq.foreach { st =>
        val name = st.getPath.getName
        val keep = scala.util.Try(name.toLong).toOption.forall(n =>
          n > v || referenced.contains(s"data/$name"))
        if (!keep) fs.delete(st.getPath, true)
      }
    }
  }
}
