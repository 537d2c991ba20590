package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.engine.Versioned

/** Batch MERGE/upsert into a partitioned parquet corpus — the write-side
  * operator every incremental pipeline needs on day one: fold a new crawl
  * batch into the standing corpus, replacing rows whose key already
  * exists and appending the rest, while rewriting ONLY the partitions the
  * batch touches.
  *
  * Both merges commit through [[graft.engine.Versioned]]'s
  * write-audit-publish protocol: the merged partitions are STAGED under a
  * new version dir, a manifest is written, and an empty commit marker
  * makes the version visible — a crash anywhere before the marker leaves
  * readers on the previous version in full (kill-tested in
  * AtomicCommitSpec). This also removes the round-7 localCheckpoint: the
  * writer never overwrites a directory it is reading, so there is no
  * read-your-own-write hazard to cut lineage around.
  *
  * Scale shape: the touched-partition values are a `distinct().collect()`
  * of the PARTITION column only (bounded by the partition count — the
  * same driver-side list Spark's own dynamic-partition-overwrite commit
  * builds; never row data). The corpus read is manifest-pruned to those
  * values, the anti-join keeps surviving old rows, and untouched
  * partitions keep their manifest entries pointing at older version dirs
  * — never opened, never rewritten. Cost per merge ∝ touched-partition
  * bytes + batch bytes, independent of corpus size. Idempotent by
  * construction: re-merging the same batch anti-joins away exactly the
  * rows it would re-insert. */
object MergeOps {

  /** Cap on the exact-key probe a MIXED-LAYOUT upsert sends against
    * foreign entries' dictionary/bloom sidecars: up to this many
    * distinct batch keys collect to the driver (one bounded job, run
    * only when the manifest holds foreign-layout entries); a larger
    * batch falls back to the key-RANGE tier alone. */
  private[graft] val MixedLayoutProbeCap = 10000

  /** Per-partition zone-map stats of a staged write: one partition-
    * pruned aggregate over what was just written (ALL stats columns in
    * the single job), collected as a bounded (#partitions) driver
    * list — the same metadata class as the manifest itself. Stats
    * columns must be integral: validated up front with a clear error
    * rather than a ClassCastException at collect time (r8 advice), and
    * read back through Number so parquet re-inference to a narrower
    * integral type (int day keys and the like) still lands in the Long
    * bounds. `statsKey` emits the legacy single-key 3-field sidecar;
    * `statsKeys` emits the multi-column 4-field form (see
    * [[Versioned.writeStatsMulti]]) — the two are mutually exclusive
    * because one write-once sidecar holds one format. Shared by every
    * stats-writing stage ([[mergeUpsert]], [[mergeApplyChangelog]]). */
  /** Cap on a recorded per-partition dictionary: a column whose
    * distinct set inside some partition exceeds this gets NO line there
    * (unprunable, always read) — the cap is what keeps the sidecar
    * metadata-sized at any scale. 32 covers the categorical columns
    * dictionaries exist for (status, lang, source, tier). */
  private val DictCap = 32

  /** Bloom sidecar knobs: a partition above the row cap gets NO bloom
    * line (always reads — the DictCap rule at bloom scale), and the
    * fpp target sets the bits-per-row. At the cap the worst line is
    * ~7.3 bits/row × 200k rows ≈ 183 KB raw (~240 KB base64) — bounded
    * sidecar growth; a corpus whose partitions routinely exceed the cap
    * would move blooms to per-partition binary sidecar files (the
    * Iceberg Puffin shape) rather than raise it. */
  private val BloomRowCap = 200000L

  /** Per-FILE cap on recorded deletion-vector row positions
    * ([[mergeDeleteMor]]): under it, the file's doomed rows are named
    * exactly and the read applies a positional filter; over it, the
    * file keeps the per-file key anti-join (a dense delete is headed
    * for compaction anyway, and an unbounded position list would make
    * the sidecar the thing it exists to avoid — data-sized). */
  private val DvPosCap = 4096

  /** DENSITY guard on the positional tier (round 16): positions are
    * recorded for a hit file only when its doomed rows are SPARSE —
    * at most max(DvPosFloor, DvPosDensity × file rows). A dense hit
    * (the hash-spread 10% delete in [[mergeZorderCompactQuery]]'s
    * lifecycle) skips no file on read — every file is tainted — so
    * the positional filter buys nothing over the scope anti-join
    * while costing a large literal collection per file in every
    * read plan plus sidecar parse time (the round-15 regression:
    * that lifecycle's compact tripled). The absolute floor keeps
    * genuinely small hits positional even in small files (one GDPR
    * key in a 10-row file is still a sparse delete). */
  private val DvPosDensity = 0.05
  private val DvPosFloor = 64L
  private val BloomFpp = 0.03

  /** Scope scan shared by the MOR delete and update writers
    * ([[mergeDeleteMor]], [[mergeUpdateMor]]): one bounded pass over
    * `bearing`'s base dirs finds every data file holding at least one
    * of `keys`' key values and, ONLY where the positional tier can pay
    * (hits ≤ [[DvPosCap]] and hits ≤ max([[DvPosFloor]],
    * [[DvPosDensity]] × file rows)), the exact doomed row positions.
    * TWO passes so the aggregation state is bounded by construction
    * (the round-15 single pass collect_list'd every file's full
    * position list into the executor buffer before slicing — an OOM
    * risk on a dense delete over a large file): pass 1 counts rows and
    * hits per file (two longs per group, map-side combined); pass 2
    * collects positions for the QUALIFYING files alone, reading only
    * those files, each group ≤ the cap by pass-1 qualification.
    * Returns one (file path, positions) per hit file — positions empty
    * when the file stays at the scope tier — or None when a foreign
    * verDir predates keyCol (column evolution: the caller publishes
    * unscoped lines, the always-correct fallback). */
  private def scanHitScopes(s: SparkSession, corpusDir: String,
                            bearing: Seq[(String, String)],
                            keyCol: String, keys: DataFrame)
      : Option[Seq[(String, Seq[Long])]] = {
    if (bearing.isEmpty) return Some(Seq.empty)
    def baseRead(byVer: Map[String, Seq[String]]) =
      byVer.toSeq.sortBy(_._1).map { case (verDir, paths) =>
        Versioned.readParquetCached(s, Some(s"$corpusDir/$verDir"), paths)
          .select(col(keyCol),
                  col("_metadata.file_path").as("__mor_f"),
                  col("_metadata.row_index").as("__mor_i"))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
    val entryPaths: Map[String, Seq[String]] = bearing
      .groupBy(_._2.split("/").take(2).mkString("/"))
      .map { case (verDir, es) =>
        verDir -> es.map(e => s"$corpusDir/${e._2}") }
    val k = keys.select(col(keyCol)).distinct()
    try {
      val counts = baseRead(entryPaths)
        .join(k.withColumn("__mor_hit", lit(1)), Seq(keyCol), "left")
        .groupBy(col("__mor_f"))
        .agg(count(lit(1)).as("__rows"),
             count(col("__mor_hit")).as("__hits"))
        .where(col("__hits") > 0)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val sparse = counts.filter { case (_, rows, hits) =>
        hits <= DvPosCap &&
          hits <= math.max(DvPosFloor, (DvPosDensity * rows).toLong)
      }.map(_._1).toSet
      val sparseByVer: Map[String, Seq[String]] = sparse.toSeq.sorted
        .flatMap(p => entryPaths.keys.find(vd => p.contains(s"/$vd/"))
          .map(_ -> p))
        .groupBy(_._1).map { case (vd, ps) => vd -> ps.map(_._2) }
      val posByFile: Map[String, Seq[Long]] =
        if (sparseByVer.isEmpty) Map.empty
        else baseRead(sparseByVer)
          .join(k, Seq(keyCol), "left_semi")
          .groupBy(col("__mor_f"))
          .agg(sort_array(collect_list(col("__mor_i"))).as("__ps"))
          .collect()
          .map(r => (r.getString(0), r.getSeq[Long](1))).toMap
      Some(counts.map { case (p, _, _) =>
        (p, posByFile.getOrElse(p, Seq.empty)) })
    } catch {
      case _: org.apache.spark.sql.AnalysisException => None
    }
  }

  /** Map [[scanHitScopes]]' hit-file paths onto their holder manifest
    * entries, recording each file under its verDir-QUALIFIED relative
    * path (`<entry relpath>/<leaf>`, round 16): the read side's
    * positional filter matches the full path suffix, so a same-named
    * file in ANOTHER version dir of the partition group can never take
    * this file's positions (with bare leaf names that collision —
    * improbable under Spark's UUID part names, but possible — would
    * silently drop wrong rows). */
  private def hitsByHolderEntry(bearing: Seq[(String, String)],
                                hits: Seq[(String, Seq[Long])])
      : Map[String, Seq[(String, Seq[Long])]] =
    hits.flatMap { case (path, ps) =>
      bearing.find(e => path.contains(s"/${e._2}/")).map { e =>
        val leaf = path.substring(path.lastIndexOf('/') + 1)
        e._1 -> (s"${e._2}/$leaf", ps)
      }
    }
    .groupBy(_._1)
    .map { case (n, fs) => n -> fs.map(_._2).sortBy(_._1) }

  /** Write-side CHECK constraints (Delta's `ADD CONSTRAINT` at merge
    * time): ONE aggregate pass over the batch counts violations of
    * every named predicate, and any violation fails the write loudly —
    * per-constraint counts in the message — BEFORE a byte stages, so a
    * bad batch can never become a committed version some reader then
    * trusts. SQL CHECK semantics: a row where the predicate evaluates
    * NULL passes (violation = definitively FALSE), matching every SQL
    * engine's three-valued CHECK rule. Cost: one codegen'd conditional
    * aggregate over the batch only — never the corpus.
    *
    * PRECONDITION (per-call constraints): the check runs on the batch
    * PLAN, and the stage re-evaluates that plan — a non-deterministic
    * batch (rand(), current_timestamp, a re-read of mutable input) can
    * stage rows the check never saw. Per-call constraints are therefore
    * batch-scoped fast-fail sugar for deterministic batches; the
    * airtight table-level contract is [[addConstraint]], whose
    * persisted set is ALSO validated on the staged files' read-back
    * ([[validateStaged]]) — the rows that actually land. */
  def checkConstraints(batch: DataFrame,
                       constraints: Seq[(String, Column)],
                       what: String = "batch"): Unit = {
    if (constraints.isEmpty) return
    val aggs = constraints.map { case (n, c) =>
      sum(when(coalesce(c, lit(true)) === false, 1L).otherwise(0L)).as(n)
    }
    val r = batch.agg(aggs.head, aggs.tail: _*).head()
    val bad = constraints.zipWithIndex.flatMap { case ((n, _), i) =>
      val cnt = if (r.isNullAt(i)) 0L else r.getLong(i)
      if (cnt > 0) Some(s"'$n' ($cnt rows)") else None
    }
    require(bad.isEmpty,
      s"$what rejected — CHECK constraint violations: " +
        bad.mkString(", ") + "; nothing was committed")
  }

  /** The PERSISTED constraint set in force at version `v` — (name,
    * sql-expr) pairs from the newest committed `constraints` sidecar at
    * or below `v` ([[Versioned.readConstraintLines]]). Empty for tables
    * that never ran [[addConstraint]] — the zero-cost fast path every
    * unconstrained write takes (one directory-existence probe). */
  def tableConstraints(s: SparkSession, corpusDir: String,
                       v: Long): Seq[(String, String)] =
    Versioned.readConstraintLines(s, corpusDir, v).map { line =>
      val i = line.indexOf('\t')
      (line.substring(0, i), line.substring(i + 1))
    }

  /** Parse the persisted set into enforceable columns, first requiring
    * every referenced column to exist in the write's schema — a LOUD
    * schema/contract mismatch beats Spark's generic unresolved-column
    * error deep inside an aggregate (and beats the silent alternative:
    * a batch-authoritative restage DROPS columns the batch lacks, so a
    * write missing a constrained column would destroy the evidence the
    * constraint checks). */
  private def persistedConstraintCols(cs: Seq[(String, String)],
                                      writeCols: Seq[String])
      : Seq[(String, Column)] =
    cs.map { case (n, e) =>
      val refs = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(e).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.name
        }.distinct
      // Spark resolves columns case-insensitively by default
      // (spark.sql.caseSensitive=false), so the existence check must
      // match that resolution: a constraint written as O_TOTALPRICE > 0
      // against a column named o_totalprice enforces fine and must not
      // be rejected here as "missing".
      val caseSensitive = org.apache.spark.sql.SparkSession.active
        .sessionState.conf.caseSensitiveAnalysis
      def norm(c: String): String =
        if (caseSensitive) c else c.toLowerCase(java.util.Locale.ROOT)
      val writeSet = writeCols.map(norm).toSet
      val missing = refs.filterNot(r => writeSet.contains(norm(r)))
      require(missing.isEmpty,
        s"persisted CHECK constraint '$n' ($e) references " +
          s"[${missing.mkString(", ")}] absent from the write's schema " +
          s"[${writeCols.mkString(", ")}] — a batch-authoritative merge " +
          "would drop the constrained column; evolve the constraint " +
          "(dropConstraint) or carry the column")
      (n, expr(e))
    }

  /** ADD CONSTRAINT (Delta's table-level CHECK, on this store's commit
    * log): validate the EXISTING corpus against the new predicate (a
    * constraint must be true of the data it starts guarding — the Delta
    * rule), then commit the grown constraint set as a manifest-carry
    * version. From that version on EVERY writer — plain upserts,
    * changelog applies, predicate updates, writers passed no
    * per-call constraints at all — loads and enforces the set
    * automatically: the contract lives with the table, not with
    * whichever caller remembered to pass it (the round-11 advice hole).
    * Publishes through the same OCC claim as every writer, so a racing
    * write either sees the constraint (it derived from the new version)
    * or makes this add lose and retry. */
  def addConstraint(s: SparkSession, corpusDir: String, name: String,
                    exprSql: String, partCol: String): Unit = {
    require(name.nonEmpty && name.forall(c =>
        c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"constraint name '$name' must be [A-Za-z0-9._-]+")
    require(!exprSql.exists(c => c == '\t' || c == '\n' || c == '\r'),
      "constraint expression must be a single line without tabs")
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(
      throw new IllegalStateException(
        s"no committed version under $corpusDir — create the corpus " +
          "before constraining it"))
    val existing = tableConstraints(s, corpusDir, v)
    require(!existing.exists(_._1 == name),
      s"constraint '$name' already exists on $corpusDir — drop it first " +
        "to redefine")
    checkConstraints(
      Versioned.readVersion(s, corpusDir, v, Some(partCol)),
      Seq((name, expr(exprSql))), what = s"ADD CONSTRAINT on existing data")
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    carrySidecars(s, corpusDir, v, nv, tok)
    Versioned.writeConstraintLines(s, corpusDir, nv, tok,
      (existing :+ (name, exprSql)).map { case (n, e) => s"$n\t$e" })
    Versioned.publish(s, corpusDir, nv, tok,
      Versioned.manifest(s, corpusDir, v))
  }

  /** SET TBLPROPERTIES: merge `props` into the table's persisted
    * property set ([[graft.engine.Versioned.tableProps]]) in one
    * manifest-carry commit — the [[addConstraint]] shape, OCC claim
    * included, so a racing writer either sees the new set (it derived
    * from the new version) or makes this set lose and retry. Keys and
    * values must be single-line, tab-free (the sidecar line format).
    * The store interprets `keyCol` (the merge key — the SQL INSERT
    * door and the plain-table stream read it); everything else is
    * caller-owned annotation. */
  def setTableProperties(s: SparkSession, corpusDir: String,
                         props: Map[String, String]): Unit = {
    require(props.nonEmpty, "SET TBLPROPERTIES needs at least one pair")
    props.foreach { case (k, vv) =>
      require(k.nonEmpty && !k.exists(c => c == '\t' || c == '\n' ||
          c == '\r') && !vv.exists(c => c == '\t' || c == '\n' ||
          c == '\r'),
        s"property '$k' must have a non-empty single-line tab-free " +
          "key and value")
    }
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(
      throw new IllegalStateException(
        s"no committed version under $corpusDir — create the corpus " +
          "before annotating it"))
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    carrySidecars(s, corpusDir, v, nv, tok)
    Versioned.writePropsLines(s, corpusDir, nv, tok,
      Versioned.tableProps(s, corpusDir, v) ++ props)
    Versioned.publish(s, corpusDir, nv, tok,
      Versioned.manifest(s, corpusDir, v))
  }

  /** UNSET TBLPROPERTIES: commit the shrunken property set (possibly
    * empty — an empty sidecar masks every older one). Unknown keys are
    * a loud error, matching Spark's UNSET semantics without IF EXISTS. */
  def unsetTableProperties(s: SparkSession, corpusDir: String,
                           keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "UNSET TBLPROPERTIES needs at least one key")
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(
      throw new IllegalStateException(
        s"no committed version under $corpusDir"))
    val existing = Versioned.tableProps(s, corpusDir, v)
    val missing = keys.filterNot(existing.contains)
    require(missing.isEmpty,
      s"no properties ${missing.mkString(", ")} on $corpusDir — live " +
        s"properties: ${existing.keys.toSeq.sorted.mkString(", ")}")
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    carrySidecars(s, corpusDir, v, nv, tok)
    Versioned.writePropsLines(s, corpusDir, nv, tok, existing -- keys)
    Versioned.publish(s, corpusDir, nv, tok,
      Versioned.manifest(s, corpusDir, v))
  }

  /** DROP CONSTRAINT: commit the shrunken set (possibly EMPTY — an
    * empty sidecar masks every older one, releasing the table). Same
    * manifest-carry commit shape as [[addConstraint]]. */
  def dropConstraint(s: SparkSession, corpusDir: String,
                     name: String): Unit = {
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(
      throw new IllegalStateException(
        s"no committed version under $corpusDir"))
    val existing = tableConstraints(s, corpusDir, v)
    require(existing.exists(_._1 == name),
      s"no constraint '$name' on $corpusDir — live constraints: " +
        existing.map(_._1).sorted.mkString(", "))
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    carrySidecars(s, corpusDir, v, nv, tok)
    Versioned.writeConstraintLines(s, corpusDir, nv, tok,
      existing.filterNot(_._1 == name).map { case (n, e) => s"$n\t$e" })
    Versioned.publish(s, corpusDir, nv, tok,
      Versioned.manifest(s, corpusDir, v))
  }

  /** Validate the STAGED files (read-back) against the table's
    * persisted constraint set before anything publishes — the airtight
    * half of enforcement: the rows checked here are the literal bytes
    * that would become the committed version (batch rows after any
    * non-deterministic expression resolved, survivors after alignment,
    * updated rows after their SET transforms — the round-11 advice
    * hole on plan-level checks). A violation reclaims the staged ghost
    * and fails loudly; nothing was committed. Cost: one codegen'd
    * conditional aggregate over the staged (touched-partition-bound)
    * bytes, only on constraint-bearing tables. */
  private def validateStaged(s: SparkSession, corpusDir: String,
                             stageRel: String,
                             cs: Seq[(String, Column)]): Unit = {
    if (cs.isEmpty) return
    try checkConstraints(Versioned.readParquetCached(s, None, Seq(s"$corpusDir/$stageRel")), cs,
      what = "staged write (read-back)")
    catch {
      case e: IllegalArgumentException =>
        val p = new org.apache.hadoop.fs.Path(s"$corpusDir/$stageRel")
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        throw e
    }
  }

  /** Carry the stats and MOR sidecars of `v` verbatim onto attempt
    * (`nv`, `tok`) — the manifest-carry commit shape metadata-only
    * writers (constraint DDL, ledger ticks) share. The ledger and
    * constraints sidecars need no carry: their readers walk back. */
  private def carrySidecars(s: SparkSession, corpusDir: String, v: Long,
                            nv: Long, tok: String): Unit = {
    val stats = Versioned.readStatsLines(s, corpusDir, v)
    if (stats.nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok, stats)
    carryMorSidecars(s, corpusDir, v, nv, tok, _ => false)
  }

  /** Carry BOTH merge-on-read sidecars (dv tombstone refs, uv image
    * refs) of `v` onto attempt (`nv`, `tok`), DROPPING the lines of
    * partitions `drop` — the shared rule: a restaging writer reads its
    * partitions LIVE (tombstones anti-joined, images substituted), so
    * the restage is the materialization point and stale refs must not
    * survive it; untouched partitions' refs are CORRECTNESS state and
    * carry verbatim. */
  private def carryMorSidecars(s: SparkSession, corpusDir: String, v: Long,
                               nv: Long, tok: String,
                               drop: String => Boolean): Unit = {
    val dvKept = Versioned.readDvLines(s, corpusDir, v)
      .filterNot(l => drop(Versioned.statsLinePart(l)))
    if (dvKept.nonEmpty)
      Versioned.writeDvLines(s, corpusDir, nv, tok, dvKept)
    val uvKept = Versioned.readUvLines(s, corpusDir, v)
      .filterNot(l => drop(Versioned.statsLinePart(l)))
    if (uvKept.nonEmpty)
      Versioned.writeUvLines(s, corpusDir, nv, tok, uvKept)
  }

  /** The REPLACE rule an ANALYZE-style refresh shares with the z-order
    * compaction: a carried line is dropped only if this call recomputed
    * its exact FORM for its column — a range refresh must never cost
    * the table its dictionary or its bloom on the same column (the
    * no-silent-stripping rule; routing an unrecognized tagged form into
    * the range branch was exactly the round-13 bloom near-miss). */
  private def statsLineReplaced(statsKey: Option[String],
                                statsKeys: Seq[String],
                                dictKeys: Seq[String],
                                bloomKeys: Seq[String])
      : String => Boolean = { line =>
    val parts = line.split('\t')
    if (parts.length == 3) statsKey.isDefined
    else if (parts(2) == "dict") dictKeys.contains(parts(1))
    else if (parts(2) == "bloom") bloomKeys.contains(parts(1))
    // per-file row-count lines regenerate on EVERY stats job (cheap,
    // and a dropped line is safe — the metadata-count reader falls
    // back to parquet footers when a file has no recorded count)
    else if (parts(2) == "rows") true
    else statsKeys.contains(parts(1))
  }

  /** Per-partition cap on per-FILE row-count entries
    * ([[freshStatsLines]]' `rows` lines — the Iceberg
    * manifest-recorded-counts tier): a partition with more data files
    * gets no line (the DictCap rule — the reader then prices COUNT
    * from parquet footers; stats are never a correctness gate). */
  private val RowsLineFileCap = 512

  private def freshStatsLines(df: DataFrame, partCol: String,
                              statsKey: Option[String],
                              statsKeys: Seq[String],
                              dictKeys: Seq[String] = Nil,
                              bloomKeys: Seq[String] = Nil): Seq[String] = {
    // PER-FILE ROW COUNTS (round 16 — Iceberg's manifest-recorded
    // counts, the upgrade path named for the metadata COUNT at 100 TB):
    // `part \t __rows__ \t rows \t leaf:N,…` rides the stats sidecar
    // under its carry rules. Exactness is enforced at READ time by
    // construction: the catalog uses a recorded count only when the
    // entry's LISTED data files all carry one, and file names are
    // immutable for an entry's life — a carried line naming a restaged
    // partition's dead files simply never matches, so the reader falls
    // back to footers (never a stale answer). Requires a file-source
    // df (`_metadata`): callers passing a composed live read (e.g.
    // refreshStats) skip the lines — missing lines only cost footers.
    val rowsLines: Seq[String] =
      try df.groupBy(col(partCol),
            col("_metadata.file_path").as("__rows_f"))
        .count().collect().toSeq
        .groupBy(r => Versioned.partDirName(partCol, r.get(0)))
        .toSeq.flatMap { case (part, rs) =>
          if (rs.length > RowsLineFileCap) None
          else Some(s"$part\t__rows__\trows\t" + rs.map { r =>
            val f = r.getString(1)
            s"${f.substring(f.lastIndexOf('/') + 1)}:${r.getLong(2)}"
          }.sorted.mkString(","))
        }
      catch {
        case _: org.apache.spark.sql.AnalysisException => Nil
      }
    freshStatsTail(df, partCol, statsKey, statsKeys, dictKeys, bloomKeys,
                   rowsLines)
  }

  /** The dict/bloom/range halves of [[freshStatsLines]], shared with the
    * footer-fed staged variant below; `rowsLines` rides through so the
    * composed line order stays identical for either producer. */
  private def freshStatsTail(df: DataFrame, partCol: String,
                             statsKey: Option[String],
                             statsKeys: Seq[String],
                             dictKeys: Seq[String],
                             bloomKeys: Seq[String],
                             rowsLines: Seq[String],
                             footerBounds: Option[Seq[(String,
                               Seq[(String, (Long, Long))])]] = None)
      : Seq[String] = {
    val bloomLines: Seq[String] =
      if (bloomKeys.isEmpty) Seq.empty
      else {
        graft.functions.GraftExtensions.register(
          df.sparkSession, "graft_bloom_agg")
        // one small pre-pass for sizing: the aggregate needs ONE
        // constant bit width across groups, so it is sized for the
        // largest under-cap partition; over-cap partitions get NO line
        // (no line → always read — the DictCap rule, stats are never a
        // correctness gate). Row count upper-bounds distinct count, so
        // the fpp target only tightens.
        val counts = df.groupBy(col(partCol)).count().collect()
          .map(r => Versioned.partDirName(partCol, r.get(0)) ->
            r.getLong(1)).toMap
        val underCap = counts.filter(_._2 <= BloomRowCap)
        if (underCap.isEmpty) Seq.empty
        else {
          val nSize = math.max(1L, underCap.values.max)
          val numBits = org.apache.spark.util.sketch.BloomFilter
            .optimalNumOfBits(nSize, BloomFpp)
          val aggs = bloomKeys.map(k =>
            call_function("graft_bloom_agg",
              xxhash64(col(k).cast("string")), lit(nSize), lit(numBits))
              .as(s"__bloom_$k"))
          df.groupBy(col(partCol)).agg(aggs.head, aggs.tail: _*)
            .collect().toSeq.flatMap { r =>
              val part = Versioned.partDirName(partCol, r.get(0))
              if (!underCap.contains(part)) Nil
              else bloomKeys.zipWithIndex.flatMap { case (k, i) =>
                Option(r.get(1 + i)).map(b =>
                  s"$part\t$k\tbloom\t" + java.util.Base64.getEncoder
                    .encodeToString(b.asInstanceOf[Array[Byte]]))
              }
            }
        }
      }
    val dictLines: Seq[String] =
      if (dictKeys.isEmpty) Seq.empty
      else {
        // collect_set drops NULLs — correct for the dictionary's one
        // use (equality/IN pruning): NULL never satisfies an equality,
        // so a set without it stays a complete answer key. slice to
        // cap+1 so an over-cap partition is detectable without ever
        // shipping an unbounded set to the driver.
        val aggs = dictKeys.map(k =>
          slice(sort_array(collect_set(col(k).cast("string"))),
                1, DictCap + 1).as(s"__dict_$k"))
        df.groupBy(col(partCol)).agg(aggs.head, aggs.tail: _*)
          .collect().toSeq.flatMap { r =>
            val part = Versioned.partDirName(partCol, r.get(0))
            dictKeys.zipWithIndex.flatMap { case (k, i) =>
              val vs = r.getSeq[String](1 + i)
              if (vs.isEmpty || vs.length > DictCap) None
              else Some(s"$part\t$k\tdict\t" + vs
                .map(java.net.URLEncoder.encode(_, "UTF-8"))
                .mkString(","))
            }
          }
      }
    def checkIntegral(k: String): Unit = {
      val dt = df.schema(k).dataType
      // No DATE here: Spark disallows DateType→LongType casts, so a date
      // key would pass this check and then die at analysis with exactly
      // the confusing cast error the check exists to prevent (r9 advice).
      require(Seq("long", "integer", "short", "byte")
                .contains(dt.typeName),
        s"statsKey column '$k' must be integral for zone-map bounds, " +
          s"got ${dt.typeName}")
    }
    def boundsOf(ks: Seq[String])
        : Seq[(String, Seq[(String, (Long, Long))])] = {
      if (footerBounds.isDefined) return footerBounds.get
      ks.foreach(checkIntegral)
      val aggs = ks.flatMap(k => Seq(min(col(k).cast("long")),
                                     max(col(k).cast("long"))))
      df.groupBy(col(partCol)).agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          Versioned.partDirName(partCol, r.get(0)) ->
            ks.zipWithIndex.flatMap { case (k, i) =>
              // an all-NULL column in a partition has no bounds (min/max
              // return null): emit NO line for it — a missing bound
              // always reads, so correctness never rides on the stats
              if (r.isNullAt(1 + 2 * i)) None
              else Some(k -> (r.getAs[Number](1 + 2 * i).longValue,
                              r.getAs[Number](2 + 2 * i).longValue))
            }
        }.toSeq
    }
    val rangeLines =
      if (statsKey.isDefined)
        boundsOf(statsKey.toSeq).flatMap { case (part, cols) =>
          cols.headOption.map { case (_, (lo, hi)) => s"$part\t$lo\t$hi" }
        }
      else if (statsKeys.nonEmpty)
        boundsOf(statsKeys).flatMap { case (part, cols) =>
          cols.map { case (c, (lo, hi)) => s"$part\t$c\t$lo\t$hi" }
        }
      else Seq.empty
    rangeLines ++ dictLines ++ bloomLines ++ rowsLines
  }

  /** [[freshStatsLines]] for a freshly STAGED dir (round 17, guide §6 /
    * §1.2): the per-file row counts and the integral zone-map bounds the
    * data-pass aggregates computed are already sitting in the staged
    * parquet FOOTERS the write just produced — read them driver-side
    * (one bounded footer read per staged file, the same files the
    * aggregate job would have scanned) and skip the one-Spark-job-per-
    * stats-bearing-commit tax. Dict/bloom sidecars genuinely need the
    * data pass and keep it. Falls back to the data-pass variant whenever
    * a footer lacks exact statistics for a requested bound column (a
    * foreign writer, a non-integral physical type — where the fallback
    * then raises the same loud checkIntegral contract), so stats stay
    * exact-or-absent, never guessed. */
  private def freshStatsLinesStaged(s: SparkSession, corpusDir: String,
                                    stageRel: String, partCol: String,
                                    statsKey: Option[String],
                                    statsKeys: Seq[String],
                                    dictKeys: Seq[String] = Nil,
                                    bloomKeys: Seq[String] = Nil)
      : Seq[String] = {
    def df = Versioned.readParquetCached(s, None,
      Seq(s"$corpusDir/$stageRel"))
    footerStats(s, s"$corpusDir/$stageRel", partCol,
                statsKey.toSeq ++ statsKeys) match {
      case None =>
        freshStatsLines(df, partCol, statsKey, statsKeys, dictKeys,
                        bloomKeys)
      case Some((rowsLines, bounds)) =>
        if (dictKeys.isEmpty && bloomKeys.isEmpty) {
          // rangeLines straight from the footer bounds — no df at all
          val rangeLines =
            if (statsKey.isDefined)
              bounds.flatMap { case (part, cols) =>
                cols.headOption.map { case (_, (lo, hi)) =>
                  s"$part\t$lo\t$hi" } }
            else if (statsKeys.nonEmpty)
              bounds.flatMap { case (part, cols) =>
                cols.map { case (c, (lo, hi)) => s"$part\t$c\t$lo\t$hi" } }
            else Seq.empty
          rangeLines ++ rowsLines
        }
        else freshStatsTail(df, partCol, statsKey, statsKeys, dictKeys,
                            bloomKeys, rowsLines, Some(bounds))
    }
  }

  /** Driver-side footer scan of a staged dir: per-partition
    * (`rows` sidecar lines, per-column exact (lo, hi) bounds for
    * `boundCols`). None ⇒ some footer cannot answer exactly (missing or
    * truncatable statistics, a non-plain-integral physical type, an
    * unreadable file) — the caller must fall back to the data pass. */
  private def footerStats(s: SparkSession, stagedDir: String,
                          partCol: String, boundCols: Seq[String])
      : Option[(Seq[String], Seq[(String, Seq[(String, (Long, Long))])])] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{
      INT32, INT64}
    val conf = s.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(stagedDir)
    val fs = base.getFileSystem(conf)
    val parts =
      try fs.listStatus(base).toSeq.filter(st =>
        st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
      catch { case _: java.io.FileNotFoundException => return None }
    if (parts.isEmpty) return None
    val rows = Seq.newBuilder[String]
    val bounds = Seq.newBuilder[(String, Seq[(String, (Long, Long))])]
    for (pd <- parts) {
      val files = fs.listStatus(pd.getPath).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      val counts = Seq.newBuilder[(String, Long)]
      val lo = scala.collection.mutable.Map.empty[String, Long]
      val hi = scala.collection.mutable.Map.empty[String, Long]
      for (f <- files) {
        val blocks =
          try {
            val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile
                .fromStatus(f, conf))
            try rd.getFooter.getBlocks.asScala.toSeq finally rd.close()
          } catch { case _: java.io.IOException => return None }
        counts += ((f.getPath.getName, blocks.map(_.getRowCount).sum))
        for (c <- boundCols; b <- blocks) {
          val cc = b.getColumns.asScala
            .find(_.getPath.toDotString == c).getOrElse(return None)
          val pt = cc.getPrimitiveType
          // plain signed ints only: any logical annotation beyond a
          // signed int-width (DATE, TIMESTAMP, DECIMAL, unsigned) means
          // the footer value is not the column's long cast — decline
          val plainInt = (pt.getPrimitiveTypeName == INT32 ||
            pt.getPrimitiveTypeName == INT64) &&
            (pt.getLogicalTypeAnnotation match {
              case null => true
              case i: org.apache.parquet.schema.LogicalTypeAnnotation
                    .IntLogicalTypeAnnotation => i.isSigned
              case _ => false
            })
          if (!plainInt) return None
          val st = cc.getStatistics
          if (st == null || st.isEmpty) return None
          if (st.hasNonNullValue) {
            val (mn, mx) = (st.genericGetMin, st.genericGetMax) match {
              case (a: java.lang.Integer, b: java.lang.Integer) =>
                (a.longValue, b.longValue)
              case (a: java.lang.Long, b: java.lang.Long) =>
                (a.longValue, b.longValue)
              case _ => return None
            }
            lo(c) = math.min(lo.getOrElse(c, Long.MaxValue), mn)
            hi(c) = math.max(hi.getOrElse(c, Long.MinValue), mx)
          }
          // all-null chunk: contributes no bound, exactly like the
          // data-pass min/max — but only when the footer really says
          // every value is null; anything else is "unknown", decline
          else if (!st.isNumNullsSet || st.getNumNulls != b.getRowCount)
            return None
        }
      }
      val part = pd.getPath.getName
      val cs = counts.result()
      if (cs.length <= RowsLineFileCap && cs.nonEmpty)
        rows += s"$part\t__rows__\trows\t" + cs
          .map { case (f, n) => s"$f:$n" }.sorted.mkString(",")
      bounds += ((part,
        boundCols.flatMap(c => lo.get(c).map(l => c -> (l, hi(c))))))
    }
    Some((rows.result(), bounds.result()))
  }

  /** Merge `batch` into the versioned parquet corpus at `corpusDir`:
    * rows with a `keyCol` already present replace the old row, others
    * append; only partitions present in `batch` are restaged. Creates
    * the corpus (version 1) on first call.
    *
    * PRECONDITION — stable key→partition mapping: a key's `partCol`
    * value must never change across batches. The replace rule is
    * partition-LOCAL by design (that is what makes a merge cost
    * O(touched partitions), the operator's whole point at 100 TB); a
    * batch that moves a key to a new partition value would upsert there
    * while the stale row survives untouched in the old partition —
    * a duplicate no partition-pruned merge can see without scanning the
    * full corpus. Derive `partCol` from immutable key attributes (hash
    * buckets, creation date) or route moves through an explicit
    * delete+insert that touches both partitions. */
  def mergeUpsert(s: SparkSession, corpusDir: String, batch: DataFrame,
                  keyCol: String, partCol: String,
                  statsKey: Option[String] = None,
                  statsKeys: Seq[String] = Nil,
                  ledgerId: Option[String] = None,
                  dictKeys: Seq[String] = Nil,
                  constraints: Seq[(String, Column)] = Nil,
                  bloomKeys: Seq[String] = Nil): Unit = {
    // OCC snapshot FIRST, input materialization second: persist() plans
    // its input eagerly, and a local-relation input can evaluate
    // DRIVER-SIDE during that planning (ConvertToLocalRelation) — so a
    // persist-before-snapshot order would let work that happens inside
    // the input's evaluation (the Wave27 gate, a slow upstream read)
    // shift this write's derivation to a version a racer committed
    // meanwhile. The snapshot the write derives from is pinned before
    // the input's first possible evaluation, exactly as un-cached code
    // ordered it.
    val v0 = Versioned.currentVersion(s, corpusDir)
    // bootstrap (no committed version) writes the batch in a single
    // pass — materializing it would pay a cache write for no reuse
    if (v0.isEmpty)
      mergeUpsertImpl(s, corpusDir, v0, batch, keyCol, partCol, statsKey,
        statsKeys, ledgerId, dictKeys, constraints, bloomKeys)
    else withMaterialized(batch) { b =>
      mergeUpsertImpl(s, corpusDir, v0, b, keyCol, partCol, statsKey,
        statsKeys, ledgerId, dictKeys, constraints, bloomKeys)
    }
  }

  /** Materialize a write verb's INPUT DataFrame once for the verb's
    * several passes over it (round-16 optimization, guide §2.4/§5).
    * Every verb probes its input repeatedly — touched-partition
    * distinct, foreign-layout key probes, the anti-join's key side, the
    * final union — and uncached, each pass re-evaluates the input
    * subtree from scratch: for pipeline_cdc_mirror / sql_merge the
    * input is itself a multi-join change feed, re-run 4-5× per commit
    * (ProfileOne: 80 jobs for one sql_merge lifecycle). Persisting for
    * exactly the verb's scope evaluates it once; unpersist runs after
    * the verb's last action (all staging actions complete inside the
    * verb), so nothing persists across queries or runs. This is also
    * Delta's merge-source materialization move, which it makes for
    * determinism: a source that reads differently between the probe
    * pass and the write pass (non-deterministic sampling, a table a
    * concurrent writer advances) could otherwise stage rows the probe
    * never saw. */
  private def withMaterialized[A](df: DataFrame)(f: DataFrame => A): A = {
    // an input the CALLER already persisted (a query composing verbs
    // over one cached feed) keeps its own lifecycle — re-persisting
    // would only log CacheManager warnings and double-manage the entry
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      return f(df)
    val m = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try f(m) finally m.unpersist(false)
  }

  private def mergeUpsertImpl(s: SparkSession, corpusDir: String,
                  v0: Option[Long],
                  batch: DataFrame,
                  keyCol: String, partCol: String,
                  statsKey: Option[String],
                  statsKeys: Seq[String],
                  ledgerId: Option[String],
                  dictKeys: Seq[String],
                  constraints: Seq[(String, Column)],
                  bloomKeys: Seq[String]): Unit = {
    require(statsKey.isEmpty || statsKeys.isEmpty,
      "pass statsKey (single legacy bound) or statsKeys (multi-column), " +
        "not both")
    checkConstraints(batch, constraints)
    def freshStats(stageRel: String): Seq[String] =
      freshStatsLinesStaged(s, corpusDir, stageRel, partCol, statsKey,
                            statsKeys, dictKeys, bloomKeys)
    val wantStats = statsKey.isDefined || statsKeys.nonEmpty ||
      dictKeys.nonEmpty || bloomKeys.nonEmpty
    v0 match {
      case None =>
        // OCC rule: allocate from the snapshot this write DERIVES from
        // (here: the empty table → version 1), never from a re-listing
        // of current — a racer committing between derivation and
        // allocation must make the claim FAIL, not shift it to an
        // uncontested higher number carrying a stale snapshot (the
        // Wave18 threaded-race lost update).
        val nv = 1L
        val tok = Versioned.newToken()
        val stageRel = Versioned.newStageRel(nv, tok)
        // write-time clustering: a task-local sort by (partition, key)
        // before the partitioned write — the dynamic-partition writer's
        // required ordering is then already satisfied (no second sort),
        // each partition's rows land key-ordered, and parquet row-group
        // min/max skipping becomes effective on key residuals INSIDE
        // the partitions manifest pruning keeps. Two-level skipping for
        // one local sort: at 100 TB the row-group tier is what keeps a
        // narrow key range from reading a whole partition.
        batch.sortWithinPartitions(col(partCol), col(keyCol))
          .write.mode("overwrite").partitionBy(partCol)
          .parquet(s"$corpusDir/$stageRel")
        if (wantStats) Versioned.writeStatsLines(s, corpusDir, nv, tok,
          freshStats(stageRel).sorted)
        // exactly-once id (mirror bootstrap and friends): the ledger
        // lands tokenized BEFORE publish, so id and data commit together
        ledgerId.foreach(id =>
          Versioned.writeLedgerIds(s, corpusDir, nv, tok, Set(id)))
        val staged1 =
          Versioned.listStagedPartDirs(s, corpusDir, stageRel, partCol)
        Versioned.writeTouchLines(s, corpusDir, nv, tok, staged1.map(_._1))
        Versioned.publish(s, corpusDir, nv, tok, staged1)
      case Some(v) =>
        // a replayed identified write no-ops: its id is already in the
        // committed ledger, so the work (and the version) must not repeat
        if (ledgerId.exists(id =>
              Versioned.ledgerContains(
                Versioned.appliedLedgerIds(s, corpusDir, v), id)))
          return
        // PERSISTED constraints: loaded from the table's own metadata at
        // the snapshot — enforced on every writer automatically, plan-
        // checked here for a fast loud failure and read-back-checked on
        // the staged files below (the airtight half)
        val persisted = persistedConstraintCols(
          tableConstraints(s, corpusDir, v), batch.columns.toSeq)
        checkConstraints(batch, persisted)
        // Bounded driver-side list: distinct PARTITION VALUES of the batch
        // (#partitions, not #rows) — it becomes the manifest-pruning
        // predicate on the corpus read below.
        val touched = batch.select(partCol).distinct().collect()
          .map(_.get(0)).toSeq
        if (touched.isEmpty) return
        val man = Versioned.manifest(s, corpusDir, v)
        val touchedNames = touched.map(Versioned.partDirName(partCol, _)).toSet
        // METADATA-TIER PARTITION EVOLUTION (Iceberg's spec-evolution
        // shape): entries whose `col=` prefix differs from THIS write's
        // partCol were written under an earlier spec. Evolving is just
        // writing with a new partCol — no rewrite commit: new data
        // lands under the new layout, foreign-layout entries carry
        // byte-identical, and reads union the layouts (readEntries
        // derives each version-group's partition column from its own
        // dirs). The one correctness hazard is a batch key that already
        // LIVES under the old layout — new-spec value pruning cannot
        // see it, so a blind write would duplicate the key. Those
        // entries are found with the same three-tier skipping kernel
        // the readers use, probed on the KEY column (batch key range +
        // up to [[MixedLayoutProbeCap]] exact keys against dict/bloom
        // sidecars); every possibly-holding entry restages THROUGH the
        // merge — its survivors rewrite under the NEW spec, so upserts
        // migrate old partitions lazily, exactly the write that was
        // needed anyway. Cost honesty: with no key-column sidecars
        // recorded, every foreign entry is a candidate and the first
        // overlapping upsert migrates the whole old layout — record
        // statsKeys/bloomKeys on the key before evolving specs, and
        // the candidate set shrinks to true range/bloom overlaps.
        val foreign = man.filter(e => e._1.takeWhile(_ != '=') != partCol)
        val foreignCand: Seq[(String, String)] =
          if (foreign.isEmpty) Nil
          else {
            import org.apache.spark.sql.types.{ByteType, IntegerType,
              LongType, ShortType}
            val kr = batch.schema(keyCol).dataType match {
              case ByteType | ShortType | IntegerType | LongType =>
                val r = batch.agg(min(col(keyCol)).cast("long"),
                                  max(col(keyCol)).cast("long")).head
                if (r.isNullAt(0)) Nil
                else Seq((keyCol, r.getLong(0), r.getLong(1)))
              case _ => Nil
            }
            val keyStrs = batch.select(col(keyCol).cast("string"))
              .distinct().limit(MixedLayoutProbeCap + 1)
              .collect().map(_.getString(0)).toSeq
            val kv =
              if (keyStrs.size > MixedLayoutProbeCap) Nil
              else Seq((keyCol, keyStrs))
            if (kr.isEmpty && kv.isEmpty) foreign
            else skipEntries(s, corpusDir, v, foreign, kr, kv,
              Versioned.readStatsMulti(s, corpusDir, v),
              Versioned.readStatsDict(s, corpusDir, v),
              Versioned.readStatsBloom(s, corpusDir, v, Some(Set(keyCol))))
          }
        // COLLISION expansion (the foreignLayoutTouch rule): a migrated
        // candidate survivor stages into the current-spec dir of ITS
        // partition value — if an untouched same-layout entry carries
        // that name, publish would replace it by staged name and drop
        // its rows, so every such entry must restage into the merge.
        val migratedNames: Set[String] =
          if (foreignCand.isEmpty) Set.empty
          else migratedDirNames(s, corpusDir, foreignCand, partCol)
        val touchedAll = touchedNames ++ foreignCand.map(_._1) ++
          migratedNames
        val oldEntries =
          man.filter(e => touchedNames.contains(e._1) ||
            migratedNames.contains(e._1)) ++ foreignCand
        val cols = batch.columns.toSeq
        // Survivors = old rows in touched partitions whose key the batch
        // does NOT replace; merged = survivors + batch. Brand-new
        // partitions have no old side at all.
        val merged =
          if (oldEntries.isEmpty) batch
          else {
            // Schema evolution: the batch's schema is authoritative for
            // the partitions it touches — survivors align to it, with
            // columns the old rows predate null-filled at the batch's
            // type (the write-side twin of scan_evolved's union read).
            // Key and partition columns must exist on both sides by
            // construction of the join and the partitionBy below. LIVE
            // read: deletion vectors on the touched partitions apply
            // here and their lines drop below — the restage is the
            // materialization point, and a batch re-inserting a
            // previously-DV'd key must win.
            val old = Versioned.readEntriesLive(s, corpusDir, v, oldEntries,
                                                Some(partCol))
            val aligned = cols.map { c =>
              if (old.columns.contains(c)) col(c)
              else lit(null).cast(batch.schema(c).dataType).as(c)
            }
            old.select(aligned: _*)
              .join(batch.select(col(keyCol)), Seq(keyCol), "left_anti")
              .selectExpr(cols: _*)
              .unionByName(batch)
          }
        // OCC: publish at snapshot+1 (v is the version this merge
        // derived from) so a concurrent commit makes this claim lose
        // loudly instead of being leapfrogged (see the None branch).
        val nv = v + 1
        val tok = Versioned.newToken()
        val stageRel = Versioned.newStageRel(nv, tok)
        // PIN the stage against a racing vacuum BEFORE the first staged
        // byte: the moment a racing winner commits `nv`, this dir sits
        // at version ≤ current unreferenced — exactly vacuum's reclaim
        // shape — yet publishOrRebase may still re-publish it at a
        // higher version (the round-12 vacuum-vs-rebase window). The
        // pin-before-stage order is what makes vacuum's later pin read
        // sound; cleared in the finally once the claim is decided.
        Versioned.pinStage(s, corpusDir, tok, Seq(stageRel))
        // heartbeat the pin for the whole stage->publish window: a
        // multi-hour restage must never age past vacuum's pinGraceMs
        val beat = Versioned.pinHeartbeat(s, corpusDir, tok)
        try {
        merged.sortWithinPartitions(col(partCol), col(keyCol))
          .write.mode("overwrite").partitionBy(partCol)
          .parquet(s"$corpusDir/$stageRel")
        validateStaged(s, corpusDir, stageRel, persisted)
        val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel,
                                                  partCol)
        val stagedNames = staged.map(_._1).toSet
        // Fresh stats come from the STAGED files (read-back, partition-
        // local) — not from re-evaluating the merged plan; computed once,
        // they are stable across publish attempts (the staged bytes are
        // immutable).
        val fresh =
          if (wantStats) freshStats(stageRel)
          else Seq.empty
        // Publish the staged write against base version `base` as a new
        // attempt: all sidecars re-derive from the base so a REBASE (base
        // > v, see below) picks up every intervening commit's carried
        // state. Untouched partitions' stats lines carry VERBATIM
        // regardless of whether THIS write requested stats (format-
        // preserving, see Versioned.readStatsLines); restaged partitions'
        // DV lines drop (their tombstones materialized in the live read
        // above); the ledger unions the base's applied ids.
        def attemptPublish(base: Long): Unit = {
          val tok2 = if (base == v) tok else Versioned.newToken()
          val baseMan =
            if (base == v) man else Versioned.manifest(s, corpusDir, base)
          val carried = Versioned.readStatsLines(s, corpusDir, base)
            .filterNot(l => stagedNames(Versioned.statsLinePart(l)))
          if ((carried ++ fresh).nonEmpty)
            Versioned.writeStatsLines(s, corpusDir, base + 1, tok2,
              (carried ++ fresh).sorted)
          carryMorSidecars(s, corpusDir, base, base + 1, tok2,
            n => touchedAll(n) || stagedNames(n))
          ledgerId.foreach(id => Versioned.writeLedgerIds(s, corpusDir,
            base + 1, tok2,
            Versioned.ledgerAdd(
              Versioned.appliedLedgerIds(s, corpusDir, base), id)))
          Versioned.writeTouchLines(s, corpusDir, base + 1, tok2,
            (touchedAll ++ stagedNames).toSeq)
          Versioned.publish(s, corpusDir, base + 1, tok2,
            baseMan.filterNot(e =>
              stagedNames.contains(e._1) || touchedAll.contains(e._1))
              ++ staged)
        }
        Hooks.onBeforePublish()
        publishOrRebase(s, corpusDir, v, touchedAll ++ stagedNames,
                        ledgerId, attemptPublish)
        } finally {
          beat.close()
          Versioned.unpinStage(s, corpusDir, tok)
        }
    }
  }

  /** TEST-ONLY injection point (Delta's fault-injection idiom): runs on
    * the writer's thread after staging completes and before the first
    * publish attempt — the exact spot a deterministic interleaving test
    * parks a writer to race a vacuum or a competing commit against it.
    * Production never sets it; the default is a no-op. */
  private[graft] object Hooks {
    @volatile var onBeforePublish: () => Unit = () => ()
  }

  /** Optimistic REBASE after a lost version claim — the partition-
    * disjoint concurrent-writer path (Delta/Iceberg logical conflict
    * detection, at this store's partition granularity). A write that
    * derived from snapshot `v` and lost its claim normally re-derives
    * the WHOLE operation ([[graft.engine.Versioned.withCommitRetry]]);
    * but an UPSERT is partition-local by the stable key→partition
    * precondition — its staged output for its touched partitions is a
    * pure function of those partitions' content at `v` plus the batch —
    * so when EVERY intervening commit DECLARES a touched set
    * ([[Versioned.readTouched]]) disjoint from this write's, those
    * partitions' live content at the new current equals their content
    * at `v`, and the already-staged immutable dirs can be re-published
    * onto current+1 with freshly re-derived METADATA only (manifest,
    * carried stats/dv, ledger union). At 100 TB this is what lets many
    * ingest feeds share one store: losers pay a handful of small-file
    * writes instead of re-staging multi-TB partitions, and the single-
    * winner marker stays the only serialization point. Undeclared
    * intervening commits (rollback, retention, constraint DDL) or ANY
    * overlap fall back to the loud re-derive signal — correctness never
    * rides on the declaration being present, only on it being true.
    * Delete/changelog writers do NOT rebase: their touched set is
    * discovered from the corpus (a disjoint intervening insert could
    * hold a key they should have removed), so they always re-derive. */
  private def publishOrRebase(s: SparkSession, corpusDir: String, v: Long,
                              ourTouch: Set[String],
                              ledgerId: Option[String],
                              attemptPublish: Long => Unit): Unit = {
    try attemptPublish(v)
    catch {
      case first: graft.engine.ConcurrentCommitException =>
        var attempts = 0
        while (true) {
          attempts += 1
          if (attempts > 5) throw first
          val cur = Versioned.currentVersion(s, corpusDir).getOrElse(
            throw first)
          if (cur <= v) throw first  // claim lost to a repair at our own
                                     // version — re-derive, never rebase
          val intervening = Versioned.committedVersions(s, corpusDir)
            .filter(w => w > v && w <= cur)
          val disjoint = intervening.forall { w =>
            scala.util.Try(Versioned.readTouched(s, corpusDir, w))
              .toOption.flatten
              .exists(_.intersect(ourTouch).isEmpty)
          }
          if (!disjoint) throw first
          // an intervening commit may have applied our exactly-once id
          // (a racing replay of the same identified batch): no-op, the
          // work is committed
          if (ledgerId.exists(id =>
                Versioned.ledgerContains(
                  Versioned.appliedLedgerIds(s, corpusDir, cur), id)))
            return
          try { attemptPublish(cur); return }
          catch { case _: graft.engine.ConcurrentCommitException => () }
        }
    }
  }

  /** MIXED-LAYOUT write support (metadata-tier partition evolution —
    * the round-14 fuzz catch, seed 131): every restaging writer that
    * finds its touched set by `partDirName(partCol, value)` is blind
    * to FOREIGN-layout entries — a hit row living under an older
    * spec's dir has a partition VALUE whose current-spec name matches
    * no foreign entry, so the old copy silently survived the restage.
    * This helper closes both halves of the gap for a writer whose hit
    * rows are selected by `hits`:
    *
    *  - `_1` foreignTouched: foreign-layout manifest entries whose
    *    BASE files hold at least one hit row (one bounded pass reading
    *    `_metadata.file_path`, attributed back to entries — a
    *    conservative superset: a tombstoned hit row forces a restage
    *    whose LIVE read then resolves it correctly). These entries
    *    must restage through the write, migrating their survivors to
    *    the current spec — the lazy-migration rule mergeUpsert's
    *    candidate probe established.
    *  - `_2` migratedNames: current-spec partition dir names of EVERY
    *    row in those entries — the COLLISION set. A migrated survivor
    *    stages into one of these dirs, and publish replaces manifest
    *    entries by staged NAME, so an untouched same-layout entry with
    *    a colliding name must also restage into the merge or its rows
    *    would be silently dropped with the replaced entry.
    *
    * Unevolved tables have no foreign entries — (Nil, empty), zero
    * cost, the common case. */
  private def foreignLayoutTouch(s: SparkSession, corpusDir: String,
                                 man: Seq[(String, String)],
                                 partCol: String,
                                 hits: DataFrame => DataFrame)
      : (Seq[(String, String)], Set[String]) = {
    val layoutPrefix = s"$partCol="
    val foreign = man.filterNot(_._1.startsWith(layoutPrefix))
    if (foreign.isEmpty) return (Nil, Set.empty)
    val base = foreign.groupBy(_._2.split("/").take(2).mkString("/")).toSeq
      .map { case (verDir, es) =>
        s.read.option("basePath", s"$corpusDir/$verDir")
          .parquet(es.map(e => s"$corpusDir/${e._2}"): _*)
          .withColumn("__ml_f", col("_metadata.file_path"))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
    // A predicate referencing a column the old layout's files predate
    // cannot be evaluated against them — fall back to treating EVERY
    // foreign entry as touched (a conservative restage superset; the
    // live merge read aligns and null-fills, so content stays right).
    val paths =
      try hits(base).select("__ml_f").distinct()
        .collect().map(_.getString(0)).toSeq
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          foreign.map(e => s"x/${e._2}/x")
      }
    val touched = foreign.filter(e => paths.exists(_.contains(s"/${e._2}/")))
    if (touched.isEmpty) return (Nil, Set.empty)
    (touched, migratedDirNames(s, corpusDir, touched, partCol))
  }

  /** Current-spec partition dir names every row of `entries` would
    * stage under — the collision surface of a migration. Rows that
    * PREDATE the current partition column null-fill it on the aligned
    * restage (the scan_evolved union rule), so an absent column maps
    * to the default-partition dir name rather than failing the read. */
  private def migratedDirNames(s: SparkSession, corpusDir: String,
                               entries: Seq[(String, String)],
                               partCol: String): Set[String] = {
    val df = Versioned.readEntries(s, corpusDir, entries, Some(partCol))
    if (!df.columns.contains(partCol))
      Set(Versioned.partDirName(partCol, null))
    else df.select(partCol).distinct().collect()
      .map(r => Versioned.partDirName(partCol, r.get(0))).toSet
  }

  /** Make a corpus-derived frame SAFE to stage `partitionBy(partCol)`:
    * a mixed-layout live read can surface the current partition column
    * as VOID (a basePath read over a dir whose only value is the
    * default partition infers NullType) or drop it entirely (every
    * group predates the column) — both crash the writer. partitionBy
    * never persists the column's TYPE into the data files (it only
    * names dirs, and null names the default dir regardless), so a
    * naming-only string cast is exact. */
  private def stageable(df: DataFrame, partCol: String): DataFrame =
    if (!df.columns.contains(partCol))
      df.withColumn(partCol, lit(null).cast("string"))
    else if (df.schema(partCol).dataType ==
             org.apache.spark.sql.types.NullType)
      df.withColumn(partCol, col(partCol).cast("string"))
    else df

  /** Collision expansion for a MAINTENANCE restage of `targets`
    * (compaction/materialization — the whole entry restages, no hit
    * predicate): any manifest entry whose name matches the current-spec
    * dir name of a row in a FOREIGN-layout target must restage too
    * (the [[foreignLayoutTouch]] `_2` rule — publish replaces entries
    * by staged name, so a colliding untouched entry's rows would
    * silently drop). A same-layout-only target set returns unchanged:
    * it stages back under its own names. */
  private def expandForMigration(s: SparkSession, corpusDir: String,
                                 man: Seq[(String, String)],
                                 targets: Seq[(String, String)],
                                 partCol: String): Seq[(String, String)] = {
    val layoutPrefix = s"$partCol="
    val foreign = targets.filterNot(_._1.startsWith(layoutPrefix))
    if (foreign.isEmpty) return targets
    val migrated = migratedDirNames(s, corpusDir, foreign, partCol)
    val names = targets.map(_._1).toSet
    targets ++ man.filter(e => migrated.contains(e._1) && !names(e._1))
  }

  /** Row-level DELETE (the GDPR / right-to-be-forgotten write every
    * lakehouse needs): remove every corpus row whose `keyCol` appears in
    * `keys`, by RESTAGING only the partitions that contain such a key —
    * copy-on-write deletes at merge cost, O(touched partitions) like
    * every write here, never a full-table rewrite. The touched set is
    * found with one semi-join of the committed corpus against the key
    * set (the same find-touched-files pass a Delta DELETE runs); a
    * partition whose every row dies drops out of the manifest entirely,
    * and deleting the last populated partition fails fast like
    * retention (an empty table cannot be read back — that is table
    * deletion, not a delete). Stats lines carry for SURVIVING
    * partitions only: a restaged partition's old bounds remain a VALID
    * superset after row removal (bounds can only narrow), so pruning
    * stays correct without recomputing — the next merge or sorted
    * compaction re-tightens them. Idempotent: a second identical delete
    * finds no touched partition and publishes nothing. Publishes at
    * snapshot+1 under the same OCC claim as every writer. */
  def mergeDelete(s: SparkSession, corpusDir: String, keys: DataFrame,
                  keyCol: String, partCol: String): Unit = {
    // snapshot before materialization — see mergeUpsert's ordering note
    val v0 = Versioned.currentVersion(s, corpusDir)
    if (v0.isEmpty) return  // nothing to delete from — and nothing to cache
    withMaterialized(keys) { k =>
      mergeDeleteImpl(s, corpusDir, v0, k, keyCol, partCol)
    }
  }

  private def mergeDeleteImpl(s: SparkSession, corpusDir: String,
                  v0: Option[Long], keys: DataFrame,
                  keyCol: String, partCol: String): Unit = {
    val v = v0.getOrElse(return)
    val man = Versioned.manifest(s, corpusDir, v)
    // LIVE reads throughout: a key already tombstoned by a MOR delete is
    // not present, so re-deleting it is the no-op idempotence promises,
    // and the restage below materializes the touched partitions' DVs.
    val corpus = Versioned.readEntriesLive(s, corpusDir, v, man,
        Some(partCol))
    val touched = corpus.join(keys.select(keyCol).distinct(),
        Seq(keyCol), "left_semi")
      .select(partCol).distinct().collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return
    // mixed layouts: fold in foreign-layout entries holding a doomed
    // key (their survivors migrate to the current spec) and any
    // same-layout entry a migrated survivor would collide with
    val (foreignTouched, migratedNames) = foreignLayoutTouch(
      s, corpusDir, man, partCol,
      df => df.join(keys.select(keyCol).distinct(), Seq(keyCol),
                    "left_semi"))
    val touchedNames = touched.map(Versioned.partDirName(partCol, _)).toSet ++
      migratedNames ++ foreignTouched.map(_._1)
    val oldEntries = man.filter(e => touchedNames.contains(e._1))
    val survivors = Versioned.readEntriesLive(s, corpusDir, v, oldEntries,
        Some(partCol))
      .join(keys.select(keyCol).distinct(), Seq(keyCol), "left_anti")
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val stageRel = Versioned.newStageRel(nv, tok)
    stageable(survivors, partCol)
      .sortWithinPartitions(col(partCol), col(keyCol))
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$corpusDir/$stageRel")
    val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel,
                                              partCol)
    val stagedNames = staged.map(_._1).toSet
    val newMan = man.filterNot(e => touchedNames.contains(e._1)) ++ staged
    require(newMan.nonEmpty,
      s"delete would remove every row of $corpusDir — an empty table " +
        "cannot be read back; delete the table instead")
    val carried = Versioned.readStatsLines(s, corpusDir, v)
      .filter { l =>
        val n = Versioned.statsLinePart(l)
        !touchedNames(n) || stagedNames(n)
      }
    if (carried.nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok, carried)
    carryMorSidecars(s, corpusDir, v, nv, tok, touchedNames)
    Versioned.writeTouchLines(s, corpusDir, nv, tok, touchedNames.toSeq)
    Versioned.publish(s, corpusDir, nv, tok, newMan)
  }

  /** Conservative pruning hints from a WHERE-verb predicate (round 17,
    * VERDICT item 1 / guide §6 data skipping): top-level AND conjuncts
    * that are simple `col <op> literal` comparisons or IN lists become
    * the zone-map ranges / dictionary-bloom-name value probes
    * [[skipEntries]] understands; every other conjunct contributes
    * nothing. Soundness: a row where the predicate is TRUE makes every
    * conjunct TRUE, so a partition an extracted conjunct's tier prunes
    * provably holds no hit row — and the verbs re-evaluate the REAL
    * predicate on every surviving partition, so hints only ever skip
    * reads, never change results. Type discipline keeps renderings
    * exact: range hints only for integral columns with integral
    * literals (the zone-map tier's own contract), value hints only
    * where the literal's string rendering equals the column's
    * cast-to-string (strings verbatim; integrals via toString) — a
    * double literal ("5" vs "5.0") never produces a hint. */
  private[graft] def predPruneHints(src: DataFrame, pred: Column)
      : (Seq[(String, Long, Long)], Seq[(String, Seq[String])]) = {
    import org.apache.spark.sql.catalyst.expressions.{
      And => CAnd, AttributeReference, Cast => CCast, EqualTo => CEq,
      Expression, GreaterThan => CGt, GreaterThanOrEqual => CGte,
      In => CIn, LessThan => CLt, LessThanOrEqual => CLte}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import org.apache.spark.sql.types._
    // resolve the predicate against the source frame (driver-side
    // analysis only, no job): the ANALYZED filter condition carries
    // typed attributes and foldable literals, so the rendering rules
    // below are exact by type
    val cond =
      try src.where(pred).queryExecution.analyzed match {
        case f: LFilter => f.condition
        case _ => return (Nil, Nil)
      } catch {
        case _: org.apache.spark.sql.AnalysisException => return (Nil, Nil)
      }
    def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    // the attribute side: a bare column, or a type-coercion cast to a
    // wider INTEGRAL type (the comparison then holds in the wide type,
    // and the extracted long bound is the same bound on the column)
    def attr(e: Expression): Option[(String, DataType)] = e match {
      case a: AttributeReference => Some((a.name, a.dataType))
      case c: CCast if integral(c.dataType) => c.child match {
        case a: AttributeReference if integral(a.dataType) =>
          Some((a.name, a.dataType))
        case _ => None
      }
      case _ => None
    }
    def intAttr(e: Expression): Option[String] =
      attr(e).collect { case (n, dt) if integral(dt) => n }
    // the literal side: any foldable subtree (the analyzer wraps
    // literals in coercion casts), evaluated driver-side
    def fold(e: Expression): Option[Any] =
      if (!e.foldable) None
      else scala.util.Try(Option(e.eval(null))).toOption.flatten
    def litLong(e: Expression): Option[Long] =
      if (integral(e.dataType)) fold(e).map(_.asInstanceOf[Number].longValue)
      else None
    def litStr(e: Expression): Option[String] =
      if (e.dataType == StringType) fold(e).map(_.toString) else None
    val ranges = Seq.newBuilder[(String, Long, Long)]
    val values = Seq.newBuilder[(String, Seq[String])]
    def walk(e: Expression): Unit = e match {
      case CAnd(l, r) => walk(l); walk(r)
      // each comparison handles both operand orders: `col > lit` bounds
      // below, `lit > col` bounds above
      case CGt(x, y) =>
        for (c <- intAttr(x); n <- litLong(y) if n < Long.MaxValue)
          ranges += ((c, n + 1, Long.MaxValue))
        for (c <- intAttr(y); n <- litLong(x) if n > Long.MinValue)
          ranges += ((c, Long.MinValue, n - 1))
      case CGte(x, y) =>
        for (c <- intAttr(x); n <- litLong(y))
          ranges += ((c, n, Long.MaxValue))
        for (c <- intAttr(y); n <- litLong(x))
          ranges += ((c, Long.MinValue, n))
      case CLt(x, y) =>
        for (c <- intAttr(x); n <- litLong(y) if n > Long.MinValue)
          ranges += ((c, Long.MinValue, n - 1))
        for (c <- intAttr(y); n <- litLong(x) if n < Long.MaxValue)
          ranges += ((c, n + 1, Long.MaxValue))
      case CLte(x, y) =>
        for (c <- intAttr(x); n <- litLong(y))
          ranges += ((c, Long.MinValue, n))
        for (c <- intAttr(y); n <- litLong(x))
          ranges += ((c, n, Long.MaxValue))
      case CEq(a, l) if attr(a).isDefined || attr(l).isDefined =>
        val (ae, le) = if (attr(a).isDefined) (a, l) else (l, a)
        for ((c, dt) <- attr(ae)) {
          if (integral(dt)) litLong(le).foreach { n =>
            ranges += ((c, n, n))
            values += ((c, Seq(n.toString)))
          }
          if (dt == StringType) litStr(le).foreach { v =>
            values += ((c, Seq(v)))
          }
        }
      case CIn(a, list) =>
        // all-or-nothing per list (the catalog's accept rule): a
        // partial rendering would prune a partition holding only an
        // unrendered value
        for ((c, dt) <- attr(a); if list.nonEmpty) {
          if (integral(dt)) {
            val ns = list.flatMap(litLong)
            if (ns.length == list.length)
              values += ((c, ns.map(_.toString)))
          } else if (dt == StringType) {
            val ss = list.flatMap(litStr)
            if (ss.length == list.length) values += ((c, ss))
          }
        }
      case _ => ()
    }
    walk(cond)
    (ranges.result(), values.result())
  }

  /** The WHERE verbs' find-touched probe, pre-pruned through the shared
    * skipping kernel: manifest entries every tier with an opinion
    * admits for [[predPruneHints]]' conjuncts, plus the live frame over
    * just those entries. Returns (full manifest, None) when no conjunct
    * is extractable, nothing prunes, or the pruned subset cannot
    * evaluate the predicate (its files predate a referenced column —
    * the full-manifest union null-fills it, so fall back). An EMPTY
    * entry list means every partition is provably hit-free. At 100 TB
    * this is the difference between a predicate write that scans the
    * corpus and one that scans the candidate partitions the sidecars
    * admit. */
  private def prunedLiveForPredicate(s: SparkSession, corpusDir: String,
      v: Long, man: Seq[(String, String)], partCol: String,
      pred: Column, src: DataFrame)
      : (Seq[(String, String)], Option[DataFrame]) = {
    val (ranges, values) = predPruneHints(src, pred)
    if (ranges.isEmpty && values.isEmpty) return (man, None)
    val entries = skipEntries(s, corpusDir, v, man, ranges, values,
      if (ranges.isEmpty) Map.empty
      else Versioned.readStatsMulti(s, corpusDir, v),
      if (values.isEmpty) Map.empty
      else Versioned.readStatsDict(s, corpusDir, v),
      if (values.isEmpty) Map.empty
      else Versioned.readStatsBloom(s, corpusDir, v,
        Some(values.map(_._1).toSet)))
    if (entries.length == man.length) (man, None)
    else if (entries.isEmpty) (Nil, None)
    else
      try (entries, Some(Versioned.readEntriesLive(s, corpusDir, v,
        entries, Some(partCol)).where(coalesce(pred, lit(false)))))
      catch {
        case _: org.apache.spark.sql.AnalysisException => (man, None)
      }
  }

  /** SQL DELETE WHERE — the PREDICATE form of [[mergeDelete]]: remove
    * every corpus row satisfying `pred`, restaging only the partitions
    * that hold one (found with one live filtered pass — the same
    * find-touched discipline as the key form, cost ∝ touched-partition
    * bytes). Three-valued logic is SQL's: a row where the predicate
    * evaluates NULL survives (DELETE removes TRUE rows only — the
    * coalesce makes that explicit). A fully-emptied partition leaves
    * the manifest; emptying the table fails fast; a no-match delete
    * publishes nothing (idempotent replay for stable predicates).
    * `sortCol` restores clustering in the restaged partitions. Stats
    * carry for every surviving partition (row removal keeps old bounds
    * and dictionaries valid supersets); touched partitions' deletion
    * vectors materialize in the restage. */
  def mergeDeleteWhere(s: SparkSession, corpusDir: String, pred: Column,
                       partCol: String,
                       sortCol: Option[String] = None): Unit = {
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(return)
    val man = Versioned.manifest(s, corpusDir, v)
    val corpus = Versioned.readEntriesLive(s, corpusDir, v, man,
        Some(partCol))
    val hit = coalesce(pred, lit(false))
    // find-touched probe pre-pruned through the skipping kernel
    // (round 17): entries the zone-map/dict/bloom/name tiers prune for
    // the predicate's extractable conjuncts provably hold no hit row,
    // so the probe (and the foreign-layout pass below) reads only the
    // candidates — predicate-write cost ∝ candidate partitions, not
    // corpus.
    val (candEntries, prunedHits) = prunedLiveForPredicate(s, corpusDir,
      v, man, partCol, pred, corpus)
    if (candEntries.isEmpty) return
    val touched = prunedHits.getOrElse(corpus.where(hit))
      .select(partCol).distinct().collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return
    // mixed layouts: foreign-layout entries holding a hit row restage
    // (survivors migrate), plus any collision entry (see
    // foreignLayoutTouch)
    val (foreignTouched, migratedNames) = foreignLayoutTouch(
      s, corpusDir, candEntries, partCol, _.where(hit))
    val touchedNames = touched.map(Versioned.partDirName(partCol, _)).toSet ++
      migratedNames ++ foreignTouched.map(_._1)
    val oldEntries = man.filter(e => touchedNames.contains(e._1))
    val survivors = Versioned.readEntriesLive(s, corpusDir, v, oldEntries,
        Some(partCol))
      .where(!hit)
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val stageRel = Versioned.newStageRel(nv, tok)
    val survivable = stageable(survivors, partCol)
    sortCol.fold(survivable.sortWithinPartitions(col(partCol)))(c =>
        survivable.sortWithinPartitions(col(partCol), col(c)))
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$corpusDir/$stageRel")
    val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel,
                                              partCol)
    val stagedNames = staged.map(_._1).toSet
    val newMan = man.filterNot(e => touchedNames.contains(e._1)) ++ staged
    require(newMan.nonEmpty,
      s"DELETE WHERE would remove every row of $corpusDir — an empty " +
        "table cannot be read back; delete the table instead")
    val carried = Versioned.readStatsLines(s, corpusDir, v)
      .filter { l =>
        val n = Versioned.statsLinePart(l)
        !touchedNames(n) || stagedNames(n)
      }
    if (carried.nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok, carried)
    carryMorSidecars(s, corpusDir, v, nv, tok, touchedNames)
    Versioned.writeTouchLines(s, corpusDir, nv, tok, touchedNames.toSeq)
    Versioned.publish(s, corpusDir, nv, tok, newMan)
  }

  /** SQL UPDATE WHERE: apply the `set` column transforms to every
    * corpus row satisfying `pred`, restaging only the partitions that
    * hold one (the [[mergeDeleteWhere]] cost model). NULL-predicate
    * rows are untouched (three-valued logic); rows are rewritten
    * in place, so neither the key nor the partition column may be a
    * set target — an identity or location change is a delete+insert,
    * not an update (the stable key→partition rule). Stats: untouched
    * partitions carry; an update can WIDEN a restaged partition's
    * bounds or grow its dictionary, so their lines are dropped unless
    * this call requests fresh ones (the changelog rule). */
  def mergeUpdateWhere(s: SparkSession, corpusDir: String, pred: Column,
                       set: Seq[(String, Column)], keyCol: String,
                       partCol: String,
                       statsKey: Option[String] = None,
                       statsKeys: Seq[String] = Nil,
                       dictKeys: Seq[String] = Nil,
                       bloomKeys: Seq[String] = Nil): Unit = {
    require(set.nonEmpty, "UPDATE needs at least one SET column")
    val setMap = set.toMap
    require(!setMap.contains(keyCol) && !setMap.contains(partCol),
      "UPDATE cannot SET the key or partition column — a row's identity " +
        "and location are fixed (stable key→partition); route moves " +
        "through an explicit delete+insert")
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(return)
    val man = Versioned.manifest(s, corpusDir, v)
    val corpus = Versioned.readEntriesLive(s, corpusDir, v, man,
        Some(partCol))
    // a SET column absent from the data would otherwise be SILENTLY
    // dropped by the per-column select below — refuse loudly (the
    // schema-evolution route is a write that CARRIES the column)
    setMap.keys.filterNot(c => corpus.columns.contains(c)).toSeq.sorted match {
      case Nil => ()
      case missing => throw new IllegalArgumentException(
        s"UPDATE under $corpusDir: SET column(s) " +
          s"${missing.mkString(", ")} do not exist in the data — " +
          "schema evolution routes through an upsert/changelog write " +
          "that carries the column")
    }
    val hit = coalesce(pred, lit(false))
    // probe pre-pruned through the skipping kernel — see mergeDeleteWhere
    val (candEntries, prunedHits) = prunedLiveForPredicate(s, corpusDir,
      v, man, partCol, pred, corpus)
    if (candEntries.isEmpty) return
    val touched = prunedHits.getOrElse(corpus.where(hit))
      .select(partCol).distinct().collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return
    // mixed layouts: foreign-layout entries holding a hit row restage
    // (their updated rows and survivors migrate), plus any collision
    // entry (see foreignLayoutTouch)
    val (foreignTouched, migratedNames) = foreignLayoutTouch(
      s, corpusDir, candEntries, partCol, _.where(hit))
    val touchedNames = touched.map(Versioned.partDirName(partCol, _)).toSet ++
      migratedNames ++ foreignTouched.map(_._1)
    val oldEntries = man.filter(e => touchedNames.contains(e._1))
    val old0 = Versioned.readEntriesLive(s, corpusDir, v, oldEntries,
        Some(partCol))
    // align the restaged partitions to the CORPUS schema (the
    // changelog alignment rule): a touched partition whose files
    // predate a schema-evolved column must null-fill it here, or a
    // SET of that column would silently vanish from the per-column
    // select below
    val old = old0.select(corpus.schema.fields.toSeq.map { f =>
      if (old0.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    val updated = old.select(old.columns.toSeq.map { c =>
      setMap.get(c) match {
        case Some(expr) => when(hit, expr).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val stageRel = Versioned.newStageRel(nv, tok)
    stageable(updated, partCol)
      .sortWithinPartitions(col(partCol), col(keyCol))
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$corpusDir/$stageRel")
    // persisted constraints: a SET transform can manufacture violations
    // in rows that were clean at ingest — the read-back over the staged
    // files is the only check that sees the transformed values
    validateStaged(s, corpusDir, stageRel, persistedConstraintCols(
      tableConstraints(s, corpusDir, v), old.columns.toSeq))
    val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel,
                                              partCol)
    val stagedNames = staged.map(_._1).toSet
    val carried = Versioned.readStatsLines(s, corpusDir, v)
      .filterNot(l => touchedNames(Versioned.statsLinePart(l)))
    val fresh =
      if (statsKey.isEmpty && statsKeys.isEmpty && dictKeys.isEmpty &&
          bloomKeys.isEmpty)
        Seq.empty
      else freshStatsLinesStaged(s, corpusDir, stageRel, partCol,
                                 statsKey, statsKeys, dictKeys, bloomKeys)
    if ((carried ++ fresh).nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok,
                                (carried ++ fresh).sorted)
    carryMorSidecars(s, corpusDir, v, nv, tok, touchedNames)
    Versioned.writeTouchLines(s, corpusDir, nv, tok, touchedNames.toSeq)
    Versioned.publish(s, corpusDir, nv, tok,
      man.filterNot(e => touchedNames.contains(e._1)) ++ staged)
  }

  /** MERGE-ON-READ UPDATE (round 12 — the update twin of
    * [[mergeDeleteMor]]): instead of restaging every touched partition
    * ([[mergeUpdateWhere]]'s copy-on-write), publish ONE small dir of
    * FULL replacement row images plus a `uv` sidecar line per touched
    * partition — manifest and data dirs carry verbatim, write cost
    * ∝ matched rows, never partition bytes. The read-side tax is the
    * latest-image-per-key substitution
    * ([[graft.engine.Versioned.readEntriesLive]]), applied BEFORE the
    * tombstone anti-join and paid until [[compactDeletes]] or any
    * restaging write materializes it. Repeated MOR updates STACK: the
    * image staged at the highest version wins per key, so the read
    * never needs the intermediate generations (though they remain until
    * materialization). Content semantics are IDENTICAL to
    * [[mergeUpdateWhere]] by contract — the declared query shares its
    * oracle. Same SET restrictions (key and partition are a row's
    * identity); NULL-predicate rows untouched; a no-match update
    * publishes nothing. Stats lines of touched partitions DROP (an
    * update can widen bounds — the one sidecar where MOR updates differ
    * from MOR deletes, whose bounds stay valid supersets); the persisted
    * constraint set is validated on the staged images (the rows that
    * land). */
  def mergeUpdateMor(s: SparkSession, corpusDir: String, pred: Column,
                     set: Seq[(String, Column)], keyCol: String,
                     partCol: String): Unit = {
    require(set.nonEmpty, "UPDATE needs at least one SET column")
    val setMap = set.toMap
    require(!setMap.contains(keyCol) && !setMap.contains(partCol),
      "UPDATE cannot SET the key or partition column — a row's identity " +
        "and location are fixed (stable key→partition); route moves " +
        "through an explicit delete+insert")
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(return)
    val man = Versioned.manifest(s, corpusDir, v)
    val corpus = Versioned.readEntriesLive(s, corpusDir, v, man,
        Some(partCol))
    // same loud contract as mergeUpdateWhere: a SET column absent from
    // the data would be silently dropped by the per-column select
    setMap.keys.filterNot(c => corpus.columns.contains(c)).toSeq.sorted match {
      case Nil => ()
      case missing => throw new IllegalArgumentException(
        s"UPDATE under $corpusDir: SET column(s) " +
          s"${missing.mkString(", ")} do not exist in the data — " +
          "schema evolution routes through an upsert/changelog write " +
          "that carries the column")
    }
    val hit = coalesce(pred, lit(false))
    // image source pre-pruned through the skipping kernel (round 17):
    // hit rows can only live in entries the tiers admit, so the image
    // scan reads only candidates; the per-column select needs the full
    // corpus schema, so a pruned subset that predates any referenced
    // column falls back to the full read (same result either way —
    // pruning only skips provably hit-free partitions).
    val (candEntries, prunedHits) = prunedLiveForPredicate(s, corpusDir,
      v, man, partCol, pred, corpus)
    if (candEntries.isEmpty) return
    val hitSrc = prunedHits
      .filter(_.columns.toSet == corpus.columns.toSet)
      .getOrElse(corpus.where(hit))
    val images = hitSrc.select(corpus.columns.toSeq.map { c =>
      setMap.get(c) match {
        case Some(e) => e.as(c)
        case None => col(c)
      }
    }: _*)
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val uvRel = s"uvdata/${nv}_$tok"
    stageable(images, partCol).write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(s"$corpusDir/$uvRel")
    val touched = Versioned.listStagedPartDirs(s, corpusDir, uvRel, partCol)
      .map(_._1)
    if (touched.isEmpty) {
      new org.apache.hadoop.fs.Path(s"$corpusDir/$uvRel")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(s"$corpusDir/$uvRel"), true)
      return
    }
    validateStaged(s, corpusDir, uvRel, persistedConstraintCols(
      tableConstraints(s, corpusDir, v), corpus.columns.toSeq))
    val touchedSet = touched.toSet
    // FILE SCOPE (round 14, the dv analogue — see mergeDeleteMor): one
    // bounded pass over the candidate entries' BASE dirs finds which
    // data files hold an imaged key, so the read-side substitution
    // anti-join runs over only those files' rows. The same pass is the
    // metadata-tier evolution detector: an imaged key living under an
    // older spec's layout cannot be substituted in place — the
    // per-partition image subdir lookup is keyed by the CURRENT spec's
    // names, so a foreign-layout base row would silently keep its
    // stale value beside the new image. Those HOLDER entries migrate
    // in this same commit (a pure live restage under the current spec,
    // plus collision entries — the foreignLayoutTouch rule), after
    // which the images substitute against the migrated base like any
    // other partition's.
    val layoutPrefix = s"$partCol="
    val uvBearing = man.filter(e =>
      if (e._1.startsWith(layoutPrefix)) touchedSet(e._1) else true)
    val imageKeys = images.select(col(keyCol)).distinct()
    // Same column-evolution fallback as mergeDeleteMor's scope scan: a
    // foreign verDir whose files predate keyCol cannot answer the
    // select — scoping is lost (whole-partition lines) and EVERY
    // foreign entry is treated as a holder (all migrate; a needless
    // migration is a content-preserving restage, never wrong).
    // Like mergeDeleteMor's scan, this also collects each hit file's
    // imaged-row POSITIONS where the density guard says the tier can
    // pay ([[scanHitScopes]] — two bounded passes, round 16) so the
    // read-side substitution drops them with a positional filter
    // instead of the anti-join.
    val uvHitAgg: Option[Seq[(String, Seq[Long])]] =
      scanHitScopes(s, corpusDir, uvBearing, keyCol, imageKeys)
    val uvScopeByEntry: Map[String, Seq[(String, Seq[Long])]] =
      hitsByHolderEntry(uvBearing, uvHitAgg.getOrElse(Seq.empty))
    val foreignHolders = uvHitAgg match {
      case None => uvBearing.map(_._1)
        .filterNot(_.startsWith(layoutPrefix)).toSet
      case Some(_) =>
        uvScopeByEntry.keys.filterNot(_.startsWith(layoutPrefix)).toSet
    }
    val migrate =
      if (foreignHolders.isEmpty) Nil
      else expandForMigration(s, corpusDir, man,
        man.filter(e => foreignHolders.contains(e._1)), partCol)
    val migrateNames = migrate.map(_._1).toSet
    val (newMan, stagedNames) =
      if (migrate.isEmpty) (man, Set.empty[String])
      else {
        // pure migration: the update is NOT applied here — the images
        // substitute on read exactly as they do for in-place holders;
        // old dv/uv refs on the migrated entries materialize in the
        // live read and their lines drop below
        val stageRel = Versioned.newStageRel(nv, tok)
        stageable(Versioned.readEntriesLive(s, corpusDir, v, migrate,
            Some(partCol)), partCol)
          .sortWithinPartitions(col(partCol), col(keyCol))
          .write.mode("overwrite").partitionBy(partCol)
          .parquet(s"$corpusDir/$stageRel")
        val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel,
                                                  partCol)
        (man.filterNot(e => migrateNames.contains(e._1)) ++ staged,
          staged.map(_._1).toSet)
      }
    val uvLines = Versioned.readUvLines(s, corpusDir, v)
      .filterNot(l => migrateNames(Versioned.statsLinePart(l))) ++
      touched.map { p =>
        // a partition whose base just migrated has new file names — its
        // scope (computed from the pre-migration base) is stale, so the
        // line falls back to the whole-partition form
        uvScopeByEntry.get(p) match {
          case Some(fs) if !stagedNames(p) =>
            val scope = fs.map(_._1).mkString(",")
            val posed = fs.filter(_._2.nonEmpty)
            if (posed.isEmpty) s"$p\t$uvRel\t$keyCol\t$scope"
            else {
              val posField = posed.map { case (f, ps) =>
                s"$f:${Versioned.encodePositions(ps)}" }.mkString(",")
              s"$p\t$uvRel\t$keyCol\t$scope\t$posField"
            }
          case _ => s"$p\t$uvRel\t$keyCol"
        }
      }
    Versioned.writeUvLines(s, corpusDir, nv, tok, uvLines.sorted)
    val dvLines = Versioned.readDvLines(s, corpusDir, v)
      .filterNot(l => migrateNames(Versioned.statsLinePart(l)))
    if (dvLines.nonEmpty)
      Versioned.writeDvLines(s, corpusDir, nv, tok, dvLines)
    val stats = Versioned.readStatsLines(s, corpusDir, v)
      .filterNot { l =>
        val n = Versioned.statsLinePart(l)
        touchedSet(n) || migrateNames(n)
      }
    if (stats.nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok, stats)
    Versioned.writeTouchLines(s, corpusDir, nv, tok,
      (touchedSet ++ migrateNames ++ stagedNames).toSeq)
    Versioned.publish(s, corpusDir, nv, tok, newMan)
  }

  /** MERGE-ON-READ row-level DELETE (Delta/Iceberg deletion vectors, at
    * FILE granularity since round 14): instead of restaging every
    * touched partition ([[mergeDelete]]'s copy-on-write), publish ONE
    * small tombstone-key dir plus a `dv` sidecar line per holder
    * manifest entry — the manifest, data dirs, and zone-map stats all
    * carry VERBATIM (bounds stay valid supersets after row removal).
    * Each line names the data FILES that held a doomed key (see
    * [[graft.engine.Versioned.dvLineFields]]), so the read-side tax is
    * one anti-join over ONLY those files' rows
    * ([[graft.engine.Versioned.readEntriesLive]]) — every other file
    * of a touched partition streams verbatim, and one deleted key in a
    * hot 10 GB partition taxes one file, not the partition — paid
    * until [[compactDeletes]] or any restaging write materializes it.
    * At 100 TB this is the difference between a GDPR sweep that
    * rewrites a terabyte-scale partition set and one that writes
    * kilobytes: CoW when deletes are dense (reclaim space now, keep
    * reads clean), MOR when they are sparse and latency-critical.
    *
    * WRITE-COST honesty (round 15): the staged BYTES are ∝ matched
    * keys, but computing the file scopes reads the KEY COLUMN of every
    * touched partition plus every foreign-layout entry (a columnar
    * single-column scan — the same price Delta pays to compute a DV's
    * row positions), and the hit file PATHS (not rows) collect to the
    * driver. Scoping earns that scan back on every subsequent read
    * until materialization; a deployment where the write-side scan
    * dominates (huge partitions, delete-heavy churn) should prefer
    * [[mergeDelete]]'s CoW, which pays a comparable scan and reclaims
    * immediately.
    *
    * One live-corpus pass finds the keys actually present (all-miss
    * keys publish NOTHING — idempotent like CoW, since re-deleting a
    * tombstoned key reads as absent); the tombstone dir is partitioned
    * by `partCol`, so touched-partition detection is a directory
    * listing of what was just written, not a second scan. A MOR delete
    * MAY logically empty the table — the manifest still carries the
    * schema, so the committed read is an empty frame, not an error
    * (materializing that state is what fails fast). */
  def mergeDeleteMor(s: SparkSession, corpusDir: String, keys: DataFrame,
                     keyCol: String, partCol: String): Unit = {
    // NOT withMaterialized: measured — the declared queries' key sets
    // are cheap filters and the verb's passes each prune differently
    // (the scope scan reads only keyCol), so caching cost ≥ re-eval.
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(return)
    val man = Versioned.manifest(s, corpusDir, v)
    val corpus = Versioned.readEntriesLive(s, corpusDir, v, man,
        Some(partCol))
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val dvRel = s"dvdata/${nv}_$tok"
    stageable(corpus.join(keys.select(keyCol).distinct(), Seq(keyCol),
        "left_semi"), partCol)
      .select(col(keyCol), col(partCol)).distinct()
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$corpusDir/$dvRel")
    val touched = Versioned.listStagedPartDirs(s, corpusDir, dvRel, partCol)
      .map(_._1)
    if (touched.isEmpty) {
      new org.apache.hadoop.fs.Path(s"$corpusDir/$dvRel")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(s"$corpusDir/$dvRel"), true)
      return
    }
    // FILE SCOPE + HOLDER-ENTRY KEYING (round 14). One more bounded
    // pass over the candidate entries' BASE dirs, reading each row's
    // file identity, finds which manifest entries — and which data
    // FILES within them — contain a doomed key. Two things fall out:
    //  - Per-file deletion-vector granularity (Delta/Iceberg's): the
    //    read side anti-joins ONLY the named files' rows and streams
    //    every other file of the partition verbatim
    //    ([[graft.engine.Versioned.readEntriesLive]]).
    //  - METADATA-TIER EVOLUTION correctness: lines key by the HOLDER
    //    entry's own manifest name, not partDirName(partCol, value) —
    //    a doomed key living under an older spec's layout gets its ref
    //    attached to the entry that actually holds it (the old keying
    //    could never match a foreign-layout entry's name, so its
    //    tombstones silently never applied).
    // Candidates: same-layout entries named by the live batch's
    // partition values, plus every FOREIGN-layout entry (value pruning
    // cannot see into an older spec's dirs — unevolved tables have
    // none, so the common case scans exactly the touched partitions).
    // Scopes come from the BASE files, ignoring earlier tombstones: a
    // superset is always correct, and any base file holding a doomed
    // key must be covered. Data dirs are immutable and any restage
    // drops the line, so file names stay valid for the ref's life.
    val touchedSet = touched.toSet
    val layoutPrefix = s"$partCol="
    val bearing = man.filter(e =>
      if (e._1.startsWith(layoutPrefix)) touchedSet(e._1) else true)
    // The scope scan selects keyCol over raw base files: a foreign-
    // layout verDir whose files PREDATE keyCol (column evolution)
    // cannot answer it — same fallback as [[foreignLayoutTouch]]:
    // unscoped whole-dir lines for the touched same-layout partitions
    // plus EVERY foreign entry (any of them may hold a doomed key; the
    // read-side anti-join on a non-holder is a no-op, so conservative
    // is exactly correct).
    // The same pass that names the hit FILES also collects each file's
    // doomed ROW POSITIONS where the density guard says the positional
    // tier can pay ([[scanHitScopes]] — two bounded passes, round 16):
    // a position-mapped file is read back through a codegen'd
    // positional filter — no anti-join, no shuffle, no tombstone read —
    // while dense or over-cap files keep the per-file anti-join.
    // Positions stay valid exactly as long as the file names do
    // (immutable dirs; any restage drops the line).
    val hitAgg: Option[Seq[(String, Seq[Long])]] =
      scanHitScopes(s, corpusDir, bearing, keyCol, keys)
    val hitsByEntry: Map[String, Seq[(String, Seq[Long])]] =
      hitsByHolderEntry(bearing, hitAgg.getOrElse(Seq.empty))
    // Defensive floor: a LIVE doomed key always has a base row (uv
    // images substitute for existing keys only), so a non-empty
    // tombstone write implies base hits. If that invariant ever broke,
    // fall back to the legacy whole-partition lines rather than lose
    // the delete.
    val newLines = hitAgg match {
      case None =>
        (touched ++ bearing.map(_._1)
          .filterNot(_.startsWith(layoutPrefix)))
          .distinct.sorted.map(p => s"$p\t$dvRel")
      case Some(_) if hitsByEntry.nonEmpty =>
        hitsByEntry.toSeq.sortBy(_._1).map { case (n, fs) =>
          val scope = fs.map(_._1).mkString(",")
          // emptiness encodes the write-side density guard: a dense or
          // over-cap file carries no positions — scope anti-join
          val posed = fs.filter(_._2.nonEmpty)
          if (posed.isEmpty) s"$n\t$dvRel\t$scope"
          else {
            val posField = posed.map { case (f, ps) =>
              s"$f:${Versioned.encodePositions(ps)}" }.mkString(",")
            s"$n\t$dvRel\t$scope\t$posField"
          }
        }
      case Some(_) => touched.map(p => s"$p\t$dvRel")
    }
    val lines = Versioned.readDvLines(s, corpusDir, v) ++ newLines
    Versioned.writeDvLines(s, corpusDir, nv, tok, lines.sorted)
    // update-vector refs carry VERBATIM: nothing restages here, and the
    // read order (substitute, then anti-join) makes a tombstone shadow
    // any earlier image of the same key
    val uvLines = Versioned.readUvLines(s, corpusDir, v)
    if (uvLines.nonEmpty)
      Versioned.writeUvLines(s, corpusDir, nv, tok, uvLines)
    val stats = Versioned.readStatsLines(s, corpusDir, v)
    if (stats.nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok, stats)
    Versioned.writeTouchLines(s, corpusDir, nv, tok, touched)
    Versioned.publish(s, corpusDir, nv, tok, man)
  }

  /** Materialize every outstanding deletion vector (Delta's
    * REORG TABLE … APPLY (PURGE)): restage ONLY the DV-bearing
    * partitions through the live read (tombstones fold into the
    * rewrite), drop every dv line, and let a partition whose every row
    * was tombstoned leave the manifest. After this the read-side
    * anti-join tax is gone and [[graft.engine.Versioned.vacuum]] can
    * reclaim the tombstone dirs. Stats carry verbatim (row removal
    * keeps old bounds valid supersets; the next merge or sorted
    * compaction re-tightens them). `sortCol` restores key clustering
    * in the rewritten partitions, as [[compactPartitions]] does.
    * No-op when no DVs are outstanding. Fails fast rather than
    * materializing a logically empty table. */
  def compactDeletes(s: SparkSession, corpusDir: String, partCol: String,
                     sortCol: Option[String] = None): Unit = {
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(return)
    // generalized to BOTH merge-on-read sidecars (round 12): a
    // partition bearing deletion vectors OR update vectors restages
    // through the live read, which folds tombstones out and images in
    val dvRefs = Versioned.readDvRefs(s, corpusDir, v)
    val uvRefs = Versioned.readUvRefs(s, corpusDir, v)
    val refs = dvRefs.keySet ++ uvRefs.keySet
    if (refs.isEmpty) return
    val man = Versioned.manifest(s, corpusDir, v)
    // mixed layouts: a foreign-layout bearing entry's rows migrate to
    // the current spec in this restage — fold in collision entries
    val bearing = expandForMigration(s, corpusDir, man,
      man.filter(e => refs.contains(e._1)), partCol)
    val bearingNames = bearing.map(_._1).toSet
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val stageRel = Versioned.newStageRel(nv, tok)
    val live = stageable(Versioned.readEntriesLive(s, corpusDir, v,
        bearing, Some(partCol)), partCol)
      .repartition(col(partCol))
    sortCol.fold(live)(c => live.sortWithinPartitions(col(partCol), col(c)))
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$corpusDir/$stageRel")
    val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel,
                                              partCol)
    val stagedNames = staged.map(_._1).toSet
    val newMan = man.filterNot(e => bearingNames.contains(e._1)) ++ staged
    require(newMan.nonEmpty,
      s"materializing the deletion vectors of $corpusDir would leave no " +
        "partition — a logically empty table cannot be materialized; " +
        "delete the table instead")
    val stats = Versioned.readStatsLines(s, corpusDir, v)
      .filter { l =>
        val n = Versioned.statsLinePart(l)
        !bearingNames(n) || stagedNames(n)
      }
    if (stats.nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok, stats)
    Versioned.writeTouchLines(s, corpusDir, nv, tok, bearingNames.toSeq)
    Versioned.publish(s, corpusDir, nv, tok, newMan)
  }

  /** Zone-map-pruned corpus read: keep only the manifest entries whose
    * stats range overlaps [lo, hi] (entries with no stats row are kept —
    * stats are an optimization, never a correctness gate), then apply
    * the residual filter. The reader never learns HOW the writer
    * clustered the data; the per-partition bounds alone prune, which is
    * what makes the layout freely evolvable (re-cluster, re-bucket,
    * compact — readers keep working and keep pruning). */
  def readCorpusKeyPruned(s: SparkSession, corpusDir: String,
                          partCol: String, keyCol: String,
                          lo: Long, hi: Long): DataFrame = {
    val v = Versioned.currentVersion(s, corpusDir)
      .getOrElse(sys.error(s"no committed version under $corpusDir"))
    val stats = Versioned.readStats(s, corpusDir, v)
    val man = Versioned.manifest(s, corpusDir, v)
    val entries = man.filter { case (n, _) =>
      stats.get(n).forall { case (slo, shi) => shi >= lo && slo <= hi }
    }
    // Every partition pruned: an empty frame with the corpus schema,
    // recovered from ONE manifest entry — the newest-staged one, whose
    // schema is authoritative under the batch-wins evolution rule — so
    // the all-pruned case costs one directory listing, not the full
    // per-partition metadata walk the pruning exists to avoid (r8
    // advice).
    if (entries.isEmpty) {
      val newest = man.maxBy(e =>
        Versioned.stageDirVersion(e._2.split("/")(1)).getOrElse(0L))
      Versioned.readEntries(s, corpusDir, Seq(newest), Some(partCol))
        .limit(0)
        .where(col(keyCol) >= lo && col(keyCol) <= hi)
    }
    else Versioned.readEntriesLive(s, corpusDir, v, entries, Some(partCol))
      .where(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** Apply ONE changelog batch ATOMICALLY — the full MERGE INTO form:
    * upserts (op `i`/`u`) and deletes (op `d`) from a single CDC batch
    * land in ONE committed version, where separate mergeUpsert +
    * mergeDelete calls would expose a half-applied intermediate
    * version to every reader (and to time travel forever). `changes`
    * carries the full row schema plus `opCol`; delete rows need only
    * their key (other columns ignored). Touched partitions = the
    * upsert rows' own `partCol` values ∪ the partitions the deleted
    * keys live in (one semi-join, as [[mergeDelete]]); those restage
    * key-sorted as survivors (old rows minus ALL changed keys) plus
    * the upsert rows. Same cost model as every write here:
    * ∝ touched-partition bytes + batch bytes. Stats: carried for
    * untouched partitions; `statsKey`/`statsKeys` recompute fresh
    * bounds for the restaged ones (without a stats request, restaged
    * partitions' lines are DROPPED — upserts can widen bounds, so the
    * old lines are not a valid superset the way [[mergeDelete]]'s
    * are). Idempotent: re-applying replaces keys with the same values
    * and re-deletes misses. */
  def mergeApplyChangelog(s: SparkSession, corpusDir: String,
                          changes: DataFrame, keyCol: String,
                          partCol: String, opCol: String = "op",
                          statsKey: Option[String] = None,
                          statsKeys: Seq[String] = Nil,
                          ledgerId: Option[String] = None,
                          constraints: Seq[(String, Column)] = Nil): Unit = {
    // snapshot before materialization — see mergeUpsert's ordering note
    val v0 = Versioned.currentVersion(s, corpusDir)
    withMaterialized(changes) { c =>
      mergeApplyChangelogImpl(s, corpusDir, v0, c, keyCol, partCol, opCol,
        statsKey, statsKeys, ledgerId, constraints)
    }
  }

  private def mergeApplyChangelogImpl(s: SparkSession, corpusDir: String,
                          v0: Option[Long],
                          changes: DataFrame, keyCol: String,
                          partCol: String, opCol: String,
                          statsKey: Option[String],
                          statsKeys: Seq[String],
                          ledgerId: Option[String],
                          constraints: Seq[(String, Column)]): Unit = {
    require(statsKey.isEmpty || statsKeys.isEmpty,
      "pass statsKey (single legacy bound) or statsKeys (multi-column), " +
        "not both")
    // constraints gate the rows that will LAND (upserts); delete rows
    // carry only a key and are exempt, as in every SQL engine
    if (constraints.nonEmpty)
      checkConstraints(changes.where(col(opCol) =!= "d"), constraints)
    val v = v0.getOrElse(
      throw new IllegalStateException(
        s"no committed version under $corpusDir — create the corpus " +
          "with mergeUpsert before applying changelogs"))
    // a replayed identified apply no-ops (exactly-once, see syncMirror)
    if (ledgerId.exists(id =>
          Versioned.ledgerContains(
            Versioned.appliedLedgerIds(s, corpusDir, v), id)))
      return
    val upserts = changes.where(col(opCol) =!= "d").drop(opCol)
    // persisted constraints: plan-check the landing rows now (fast loud
    // failure), read-back-check the staged files below (airtight)
    val persisted = persistedConstraintCols(
      tableConstraints(s, corpusDir, v), upserts.columns.toSeq)
    checkConstraints(upserts, persisted)
    val deleteKeys = changes.where(col(opCol) === "d")
      .select(keyCol).distinct()
    val man = Versioned.manifest(s, corpusDir, v)
    val upsertParts = upserts.select(partCol).distinct().collect()
      .map(_.get(0)).toSeq
    val corpus = Versioned.readEntriesLive(s, corpusDir, v, man,
        Some(partCol))
    val deleteParts = corpus.join(deleteKeys, Seq(keyCol), "left_semi")
      .select(partCol).distinct().collect().map(_.get(0)).toSeq
    // mixed layouts: foreign-layout entries holding ANY changed key
    // restage through the apply (survivors migrate), plus collision
    // entries (see foreignLayoutTouch)
    val (foreignTouched, migratedNames) = foreignLayoutTouch(
      s, corpusDir, man, partCol,
      df => df.join(changes.select(keyCol).distinct(), Seq(keyCol),
                    "left_semi"))
    val touchedNames = (upsertParts ++ deleteParts)
      .map(Versioned.partDirName(partCol, _)).toSet ++
      migratedNames ++ foreignTouched.map(_._1)
    if (touchedNames.isEmpty) {
      // No rows to move. An UNidentified apply publishes nothing; an
      // identified one still must RECORD the id — a ledger tick: one
      // manifest-carry commit (stats/dv verbatim) whose only content is
      // the applied id, so an empty feed (source advanced by maintenance
      // only) still advances the mirror's high-water mark instead of
      // being re-diffed on every future sync.
      ledgerId.foreach { id =>
        val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
        val tok = Versioned.newToken()
        val stats = Versioned.readStatsLines(s, corpusDir, v)
        if (stats.nonEmpty)
          Versioned.writeStatsLines(s, corpusDir, nv, tok, stats)
        carryMorSidecars(s, corpusDir, v, nv, tok, _ => false)
        Versioned.writeLedgerIds(s, corpusDir, nv, tok,
          Versioned.ledgerAdd(
            Versioned.appliedLedgerIds(s, corpusDir, v), id))
        // an EMPTY touch declaration: content untouched — a racing
        // upsert can rebase straight across a ledger tick
        Versioned.writeTouchLines(s, corpusDir, nv, tok, Nil)
        Versioned.publish(s, corpusDir, nv, tok, man)
      }
      return
    }
    val oldEntries = man.filter(e => touchedNames.contains(e._1))
    val cols = upserts.columns.toSeq
    val changedKeys = changes.select(keyCol).distinct()
    val merged =
      if (oldEntries.isEmpty) upserts
      else {
        // survivors align to the batch schema (null-filling columns old
        // rows predate) exactly as mergeUpsert's evolution rule does;
        // LIVE: touched partitions' DVs materialize in this restage
        val old = Versioned.readEntriesLive(s, corpusDir, v, oldEntries,
                                            Some(partCol))
        val aligned = cols.map { c =>
          if (old.columns.contains(c)) col(c)
          else lit(null).cast(upserts.schema(c).dataType).as(c)
        }
        old.select(aligned: _*)
          .join(changedKeys, Seq(keyCol), "left_anti")
          .selectExpr(cols: _*)
          .unionByName(upserts)
      }
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val stageRel = Versioned.newStageRel(nv, tok)
    merged.sortWithinPartitions(col(partCol), col(keyCol))
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$corpusDir/$stageRel")
    validateStaged(s, corpusDir, stageRel, persisted)
    val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel,
                                              partCol)
    val stagedNames = staged.map(_._1).toSet
    val newMan = man.filterNot(e => touchedNames.contains(e._1)) ++ staged
    require(newMan.nonEmpty,
      s"changelog would remove every row of $corpusDir — an empty " +
        "table cannot be read back; delete the table instead")
    val carried = Versioned.readStatsLines(s, corpusDir, v)
      .filterNot(l => touchedNames(Versioned.statsLinePart(l)))
    val fresh =
      if (statsKey.isEmpty && statsKeys.isEmpty) Seq.empty
      else freshStatsLinesStaged(s, corpusDir, stageRel, partCol,
                                 statsKey, statsKeys)
    if ((carried ++ fresh).nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok,
                                (carried ++ fresh).sorted)
    carryMorSidecars(s, corpusDir, v, nv, tok, touchedNames)
    ledgerId.foreach(id => Versioned.writeLedgerIds(s, corpusDir, nv, tok,
      Versioned.ledgerAdd(
        Versioned.appliedLedgerIds(s, corpusDir, v), id)))
    Versioned.writeTouchLines(s, corpusDir, nv, tok, touchedNames.toSeq)
    Versioned.publish(s, corpusDir, nv, tok, newMan)
  }

  /** CHANGE FEED between two committed versions — the READ side of CDC
    * (Delta's `table_changes`, computed from the version metadata
    * rather than logged at write time): the NET content difference from
    * `fromV` to `toV`, one row per changed key with `change_type` ∈
    * `insert` | `update` | `delete` (insert and update rows carry the
    * `toV` image, delete rows the `fromV` image). Metadata does the
    * heavy lifting: a partition whose manifest entry AND deletion-
    * vector refs are identical across the two versions cannot differ
    * and is NEVER read, so the diff costs ∝ changed-partition bytes on
    * both sides plus one key-shuffled full-outer join — never corpus
    * bytes. At 100 TB a CDC batch that touched 1% of partitions diffs
    * 2×1% of the data.
    *
    * Because the feed is a CONTENT diff, a rewrite that moved bytes
    * without changing rows (compaction, sorted rewrite, DV
    * materialization, a rollback to identical content) contributes
    * NOTHING, and an upsert that rewrote a key with identical values is
    * invisible — the feed answers "what changed", not "what did writers
    * do", which is the question downstream sync needs ([[syncMirror]]
    * builds on exactly this). Schema evolution: both sides align to the
    * union of their columns (missing columns null-fill), so a key whose
    * only difference is a later-added column's value classifies as
    * update. `fromV` must be at or above the retention floor (its data
    * dirs must still exist); a diff spanning N versions is ONE call —
    * intermediate versions are never materialized. */
  def changeFeed(s: SparkSession, corpusDir: String, fromV: Long,
                 toV: Long, keyCol: String, partCol: String): DataFrame = {
    require(fromV < toV,
      s"changeFeed needs fromV < toV, got $fromV -> $toV under $corpusDir")
    // tagged versions are exempt, as in readVersion/rollback: a mirror
    // whose high-water version is PINNED (data retained by vacuum) must
    // stay syncable below the floor — that retention-exempt pin is the
    // replication use case tags exist for (r11 advice)
    Versioned.retentionFloor(s, corpusDir).foreach(f => require(
      fromV >= f || Versioned.tags(s, corpusDir).values.exists(_ == fromV),
      s"version $fromV is below the retention floor $f under $corpusDir " +
        "— its data dirs may have been vacuumed (tagged versions are " +
        "exempt); sync mirrors or tag their high-water version before " +
        "vacuuming past it"))
    val manFrom = Versioned.manifest(s, corpusDir, fromV)
    val manTo = Versioned.manifest(s, corpusDir, toV)
    val dvFrom = Versioned.readDvRefs(s, corpusDir, fromV)
    val dvTo = Versioned.readDvRefs(s, corpusDir, toV)
    val uvFrom = Versioned.readUvRefs(s, corpusDir, fromV)
    val uvTo = Versioned.readUvRefs(s, corpusDir, toV)
    val fm = manFrom.toMap
    val tm = manTo.toMap
    // The pruning heart: same staged dir + same tombstone refs + same
    // image refs ⇒ the partition's LIVE content is byte-identical; only
    // the rest is read.
    val changed = (fm.keySet ++ tm.keySet).filter { n =>
      fm.get(n) != tm.get(n) ||
        dvFrom.getOrElse(n, Nil) != dvTo.getOrElse(n, Nil) ||
        uvFrom.getOrElse(n, Nil) != uvTo.getOrElse(n, Nil)
    }
    def side(v: Long, man: Seq[(String, String)]): DataFrame = {
      val es = man.filter(e => changed(e._1))
      if (es.nonEmpty)
        Versioned.readEntriesLive(s, corpusDir, v, es, Some(partCol))
      else {
        // no changed entries on this side (all-new or all-dropped
        // partitions live on the other) — an empty frame at this side's
        // schema, from its newest staged dir (the readCorpusPruned
        // all-pruned recovery idiom). A fully EMPTY manifest cannot
        // supply a schema: unreachable today (emptying a table fails
        // fast everywhere), guarded loudly for the day a MOR-emptied
        // table meets the feed (r11 verdict nit).
        require(man.nonEmpty,
          s"changeFeed: a side of the $fromV->$toV diff under $corpusDir " +
            "has an empty manifest — its schema cannot be recovered; an " +
            "emptied table cannot feed a diff")
        val newest = man.maxBy(e =>
          Versioned.stageDirVersion(e._2.split("/")(1)).getOrElse(0L))
        Versioned.readEntries(s, corpusDir, Seq(newest), Some(partCol))
          .limit(0)
      }
    }
    val o = side(fromV, manFrom)
    val n = side(toV, manTo)
    val cols = (o.columns ++ n.columns).distinct.toSeq
    def alignTo(df: DataFrame, other: DataFrame) = cols.map { c =>
      if (df.columns.contains(c)) col(c)
      else lit(null).cast(other.schema(c).dataType).as(c)
    }
    val os = o.select(alignTo(o, n): _*)
      .select(col(keyCol).as("__cf_k"),
              struct(cols.map(col): _*).as("__cf_old"))
    val ns = n.select(alignTo(n, o): _*)
      .select(col(keyCol).as("__cf_k"),
              struct(cols.map(col): _*).as("__cf_new"))
    // full-outer on the key: a side's struct is null exactly when the
    // key is absent from that version; <=> (null-safe struct equality)
    // kills the unchanged survivors a restage rewrote verbatim
    val ct = when(col("__cf_old").isNull, lit("insert"))
      .when(col("__cf_new").isNull, lit("delete"))
      .when(!(col("__cf_old") <=> col("__cf_new")), lit("update"))
    val img = when(col("__cf_new").isNull, col("__cf_old"))
      .otherwise(col("__cf_new"))
    os.join(ns, Seq("__cf_k"), "full_outer")
      .select(img.as("__cf_img"), ct.as("change_type"))
      .where(col("change_type").isNotNull)
      .select(cols.map(c => col("__cf_img").getField(c).as(c)) :+
        col("change_type"): _*)
  }

  /** Incremental REPLICATION of one versioned store into another — the
    * composition CDC exists for (Delta's `table_changes` + MERGE INTO,
    * as one idempotent call): advance `dstDir` to `srcDir`'s CURRENT
    * content by applying ONE net [[changeFeed]] from the last synced
    * source version, recording that source version in the destination's
    * applied-id ledger (`src:<v>`) inside the SAME committed version as
    * the data. Exactly-once by the incremental-rollup argument: the id
    * commits with the marker or not at all, a replayed sync finds the
    * id and no-ops, and a crash between feed and publish leaves only
    * orphaned (distrusted) sidecars. The first call bootstraps the
    * mirror as a full snapshot of the source's current version; later
    * calls collapse N source commits into ONE feed — the mirror's
    * history is sync-granular, not source-commit-granular (at 100 TB
    * you ship the NET change, not the churn), and a source that only
    * ran maintenance (compaction, retention ticks with equal content)
    * yields an empty feed that still advances the high-water mark via a
    * ledger-tick commit. Source rollbacks are safe by construction:
    * rollback publishes a HIGHER version restoring old content, so the
    * next feed diffs into it like any other change. Returns the source
    * version the mirror now reflects. */
  def syncMirror(s: SparkSession, srcDir: String, dstDir: String,
                 keyCol: String, partCol: String): Long = {
    val srcV = Versioned.currentVersion(s, srcDir).getOrElse(
      throw new IllegalStateException(
        s"no committed version under source $srcDir — nothing to mirror"))
    Versioned.currentVersion(s, dstDir) match {
      case None =>
        mergeUpsert(s, dstDir,
          Versioned.readVersion(s, srcDir, srcV, Some(partCol)),
          keyCol, partCol, ledgerId = Some(s"src:$srcV"))
        srcV
      case Some(dv) =>
        val last = Versioned.appliedLedgerIds(s, dstDir, dv)
          .collect { case id if id.startsWith("src:") => id.drop(4).toLong }
        require(last.nonEmpty,
          s"$dstDir has no src:<version> ledger id — it is not a mirror " +
            "(bootstrap by calling syncMirror against an empty dstDir)")
        val from = last.max
        if (from >= srcV) return from  // up to date; nothing to commit
        val feed = changeFeed(s, srcDir, from, srcV, keyCol, partCol)
        val changes = feed.withColumn("op",
            when(col("change_type") === "delete", lit("d"))
              .when(col("change_type") === "insert", lit("i"))
              .otherwise(lit("u")))
          .drop("change_type")
        mergeApplyChangelog(s, dstDir, changes, keyCol, partCol,
          ledgerId = Some(s"src:$srcV"))
        srcV
    }
  }

  /** INTERSECTION zone-map pruning over multi-column bounds
    * ([[Versioned.readStatsMulti]]): keep a manifest entry only if
    * EVERY predicate's range overlaps that partition's recorded bounds
    * for the predicate's column — a partition with no bounds for some
    * column is kept (stats are an optimization, never a correctness
    * gate). This is what per-column stats buy at 100 TB: the writer
    * clusters by ONE dimension, but a second predicate on a correlated
    * column (order keys within a customer range, timestamps within an
    * ingest day) still prunes — the reader needs no knowledge of the
    * clustering, only the bounds. The residual conjunction is applied
    * on the surviving rows, so the result is exactly the filtered
    * corpus regardless of how much pruning bit. */
  def readCorpusPruned(s: SparkSession, corpusDir: String, partCol: String,
                       ranges: Seq[(String, Long, Long)]): DataFrame = {
    require(ranges.nonEmpty, "readCorpusPruned needs at least one range")
    val v = Versioned.currentVersion(s, corpusDir)
      .getOrElse(sys.error(s"no committed version under $corpusDir"))
    val stats = Versioned.readStatsMulti(s, corpusDir, v)
    val man = Versioned.manifest(s, corpusDir, v)
    val entries = man.filter { case (n, _) =>
      stats.get(n).forall { cols =>
        ranges.forall { case (c, lo, hi) =>
          cols.get(c).forall { case (slo, shi) => shi >= lo && slo <= hi }
        }
      }
    }
    val residual = ranges.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi }.reduce(_ && _)
    // every partition pruned: recover the schema from the newest-staged
    // entry (same rationale as readCorpusKeyPruned's all-pruned case)
    if (entries.isEmpty) {
      val newest = man.maxBy(e =>
        Versioned.stageDirVersion(e._2.split("/")(1)).getOrElse(0L))
      Versioned.readEntries(s, corpusDir, Seq(newest), Some(partCol))
        .limit(0).where(residual)
    }
    else Versioned.readEntriesLive(s, corpusDir, v, entries, Some(partCol))
      .where(residual)
  }

  /** DICTIONARY pruning over per-partition distinct sets
    * ([[graft.engine.Versioned.readStatsDict]]): keep a manifest entry
    * only if, for EVERY predicate, some wanted value appears in that
    * partition's recorded dictionary for the column — the equality/IN
    * complement to [[readCorpusPruned]]'s range overlap. A partition
    * with no dictionary for some column is kept (over-cap or never
    * recorded — stats are an optimization, never a correctness gate),
    * and the residual IN-conjunction runs on the survivors, so the
    * result is exactly the filtered corpus however much pruning bit.
    * What it buys at 100 TB: the writer clusters by ONE dimension
    * (ingest year, hash bucket), and an equality predicate on a
    * correlated categorical column (status, lang, source) skips the
    * partitions that never saw the value — the case range bounds
    * cannot express because min ≤ v ≤ max is true for almost any
    * categorical once two distinct values exist. */
  def readCorpusDictPruned(s: SparkSession, corpusDir: String,
                           partCol: String,
                           preds: Seq[(String, Seq[String])]): DataFrame = {
    require(preds.nonEmpty, "readCorpusDictPruned needs at least one " +
      "(column, wanted-values) predicate")
    val v = Versioned.currentVersion(s, corpusDir)
      .getOrElse(sys.error(s"no committed version under $corpusDir"))
    val dicts = Versioned.readStatsDict(s, corpusDir, v)
    val man = Versioned.manifest(s, corpusDir, v)
    val entries = man.filter { case (n, _) =>
      dicts.get(n).forall { cols =>
        preds.forall { case (c, vals) =>
          cols.get(c).forall(set => vals.exists(set.contains))
        }
      }
    }
    // every partition pruned: recover the schema from the newest-staged
    // entry (the shared all-pruned idiom)
    val base =
      if (entries.isEmpty) {
        val newest = man.maxBy(e =>
          Versioned.stageDirVersion(e._2.split("/")(1)).getOrElse(0L))
        Versioned.readEntries(s, corpusDir, Seq(newest), Some(partCol))
          .limit(0)
      }
      else Versioned.readEntriesLive(s, corpusDir, v, entries, Some(partCol))
    base.where(preds.map { case (c, vals) =>
      typedInResidual(base, c, vals) }.reduce(_ && _))
  }

  /** Type-aware equality/IN residual for the pruned readers: cast the
    * literal VALUES to the column's type instead of casting the COLUMN
    * to string, so the predicate reaches parquet as a pushable
    * `In(col, …)` DataFilter and row-group stats skip inside the
    * partitions the sidecars kept — a cast-wrapped column is not a
    * pushable parquet filter, and at 100 TB that is the difference
    * between reading one row group and one partition. Values that
    * cannot cast to the column's type (checked driver-side with TRY
    * semantics, so an ANSI session never throws) can match no row of
    * that type and are dropped; if none survive the residual is
    * `false`. String columns keep the plain isin. The SIDECAR probes
    * are untouched: dictionaries store string renderings and blooms
    * hash `xxhash64(cast(col AS string))` on both sides, so prune
    * decisions are bit-identical — only the residual's shape changes. */
  private[graft] def typedInResidual(df: DataFrame, c: String,
                                     vals: Seq[String]): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
    import org.apache.spark.sql.types.StringType
    val dt = df.schema.fields.find(_.name.equalsIgnoreCase(c))
      .map(_.dataType).getOrElse(StringType)
    if (dt == StringType) col(c).isin(vals: _*)
    else {
      val castable = vals.filter { v =>
        Cast(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(v),
              StringType), dt, Some("UTC"), EvalMode.TRY)
          .eval(null) != null
      }
      if (castable.isEmpty) lit(false)
      else col(c).isin(castable.map(v => lit(v).cast(dt)): _*)
    }
  }

  /** The hash the bloom sidecar is keyed by, computed ON THE DRIVER for
    * the pruning probe: Spark's own `XxHash64` expression evaluated on
    * the string literal — bit-identical to the executor-side
    * `xxhash64(cast(col AS string))` the writer aggregated, because it
    * IS the same expression (default seed 42). */
  private[graft] def bloomProbeHash(v: String): Long =
    new org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(v),
        org.apache.spark.sql.types.StringType))).eval(null)
      .asInstanceOf[Long]

  /** BLOOM pruning over per-partition filters
    * ([[graft.engine.Versioned.readStatsBloom]]): keep a manifest entry
    * only if, for EVERY predicate, some wanted value MIGHT be in that
    * partition's recorded filter for the column — the high-cardinality
    * point-lookup complement to range ([[readCorpusPruned]]) and
    * dictionary ([[readCorpusDictPruned]]) skipping. A partition with
    * no filter for some column is kept (over-cap or never recorded —
    * stats are an optimization, never a correctness gate), a FALSE
    * POSITIVE merely reads a partition the residual IN-conjunction
    * then empties, and the residual runs on every survivor, so the
    * result is exactly the filtered corpus however much pruning bit.
    * What it buys at 100 TB: a `doc_id = X` lookup on a corpus
    * clustered by something else entirely (language, date, source)
    * reads the ONE partition whose filter admits X instead of all of
    * them — the case where range bounds span everything (hash-spread
    * high-cardinality keys) and dictionaries blew their cap long ago.
    * The driver probes #partitions × #values hashes against in-memory
    * sketches — bounded metadata work, no data read before the prune. */
  def readCorpusBloomPruned(s: SparkSession, corpusDir: String,
                            partCol: String,
                            preds: Seq[(String, Seq[String])]): DataFrame = {
    require(preds.nonEmpty, "readCorpusBloomPruned needs at least one " +
      "(column, wanted-values) predicate")
    val v = Versioned.currentVersion(s, corpusDir)
      .getOrElse(sys.error(s"no committed version under $corpusDir"))
    val blooms = Versioned.readStatsBloom(s, corpusDir, v,
      Some(preds.map(_._1).toSet))
    val man = Versioned.manifest(s, corpusDir, v)
    val hashed = preds.map { case (c, vals) =>
      (c, vals.map(bloomProbeHash)) }
    val entries = man.filter { case (n, _) =>
      blooms.get(n).forall { cols =>
        hashed.forall { case (c, hs) =>
          cols.get(c).forall(bf => hs.exists(bf.mightContainLong))
        }
      }
    }
    // every partition pruned: recover the schema from the newest-staged
    // entry (the shared all-pruned idiom)
    val base =
      if (entries.isEmpty) {
        val newest = man.maxBy(e =>
          Versioned.stageDirVersion(e._2.split("/")(1)).getOrElse(0L))
        Versioned.readEntries(s, corpusDir, Seq(newest), Some(partCol))
          .limit(0)
      }
      else Versioned.readEntriesLive(s, corpusDir, v, entries, Some(partCol))
    base.where(preds.map { case (c, vals) =>
      typedInResidual(base, c, vals) }.reduce(_ && _))
  }

  /** The shared three-tier PRUNING KERNEL: keep a manifest entry only
    * if every tier with an opinion admits it — range zone maps for the
    * `ranges` predicates, dictionary + bloom for each `values`
    * (equality/IN) predicate, plus (when `partCol` is given) the
    * manifest NAME itself for values on the partition column — the
    * zeroth tier every table format gets for free: `col=value` dir
    * names ARE the partition index, no sidecar needed. A partition
    * with no line in some tier is admitted by that tier (stats are an
    * optimization, never a correctness gate). Tiers short-circuit
    * cheapest-first, so a partition the name/range/dict tiers pruned
    * never deserializes its bloom bitset (the
    * [[graft.engine.LazyBloom]] contract — decoded driver heap is
    * O(survivors × probed columns), not O(all partitions)). Shared by
    * [[readCorpusSkipPruned]] and the SQL front door
    * ([[graft.sql.GraftCatalog]]), so DataFrame and SQL reads prune
    * through the ONE kernel. */
  private[graft] def skipEntries(s: SparkSession, corpusDir: String,
      v: Long, man: Seq[(String, String)],
      ranges: Seq[(String, Long, Long)],
      values: Seq[(String, Seq[String])],
      stats: Map[String, Map[String, (Long, Long)]],
      dicts: Map[String, Map[String, Set[String]]],
      blooms: Map[String, Map[String, graft.engine.LazyBloom]])
      : Seq[(String, String)] = {
    val hashed = values.map { case (c, vals) =>
      (c, vals.map(bloomProbeHash)) }
    // the name tier is LAYOUT-AWARE (metadata-tier partition
    // evolution): an entry's own `col=` prefix says which spec wrote
    // it, so a value predicate on THAT column prunes by dir name while
    // entries of other layouts pass to the sidecar tiers — per-layout
    // pruning over a mixed manifest, Iceberg's spec-evolution read
    // shape
    val nameWanted = values.map { case (c, vals) =>
      (c, vals.map(x =>
        Versioned.partDirName(c, x).drop(c.length + 1)).toSet) }
    man.filter { case (n, _) =>
      val layout = n.takeWhile(_ != '=')
      def nameOk = !n.contains('=') ||
        nameWanted.forall { case (c, wantedVals) =>
          !layout.equalsIgnoreCase(c) ||
            wantedVals.contains(n.drop(layout.length + 1)) }
      def rangeOk = stats.get(n).forall { cols =>
        ranges.forall { case (c, lo, hi) =>
          cols.get(c).forall { case (slo, shi) => shi >= lo && slo <= hi }
        }
      }
      def dictOk = dicts.get(n).forall { cols =>
        values.forall { case (c, vals) =>
          cols.get(c).forall(set => vals.exists(set.contains))
        }
      }
      def bloomOk = blooms.get(n).forall { cols =>
        hashed.forall { case (c, hs) =>
          cols.get(c).forall(bf => hs.exists(bf.mightContainLong))
        }
      }
      nameOk && rangeOk && dictOk && bloomOk
    }
  }

  /** COMPOSED data skipping — all three sidecar tiers in ONE pruning
    * pass: range zone maps for the `ranges` predicates, and BOTH the
    * dictionary and bloom tiers for each `values` (equality/IN)
    * predicate — a partition is kept only if EVERY tier that has an
    * opinion admits it (a recorded dictionary with none of the wanted
    * values prunes even when the bloom false-positives, and vice
    * versa; a partition with no line in some tier is admitted by that
    * tier — stats are never a correctness gate). The residual
    * conjunction runs on the survivors, so the result is exactly the
    * filtered corpus however much pruning bit. This is the entry point
    * a query planner would call: one manifest pass, driver-side
    * metadata probes only, then the minimal read. */
  def readCorpusSkipPruned(s: SparkSession, corpusDir: String,
                           partCol: String,
                           ranges: Seq[(String, Long, Long)] = Nil,
                           values: Seq[(String, Seq[String])] = Nil)
      : DataFrame = {
    require(ranges.nonEmpty || values.nonEmpty,
      "readCorpusSkipPruned needs at least one range or value predicate")
    val v = Versioned.currentVersion(s, corpusDir)
      .getOrElse(sys.error(s"no committed version under $corpusDir"))
    val stats = Versioned.readStatsMulti(s, corpusDir, v)
    val dicts = Versioned.readStatsDict(s, corpusDir, v)
    val blooms = Versioned.readStatsBloom(s, corpusDir, v,
      Some(values.map(_._1).toSet))
    val man = Versioned.manifest(s, corpusDir, v)
    val entries = skipEntries(s, corpusDir, v, man, ranges, values,
      stats, dicts, blooms)
    val base =
      if (entries.isEmpty) {
        val newest = man.maxBy(e =>
          Versioned.stageDirVersion(e._2.split("/")(1)).getOrElse(0L))
        Versioned.readEntries(s, corpusDir, Seq(newest), Some(partCol))
          .limit(0)
      }
      else Versioned.readEntriesLive(s, corpusDir, v, entries, Some(partCol))
    val preds =
      ranges.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi } ++
        values.map { case (c, vals) => typedInResidual(base, c, vals) }
    base.where(preds.reduce(_ && _))
  }

  /** Read the current committed corpus state (see [[Versioned]]). */
  def readCorpus(s: SparkSession, corpusDir: String,
                 partCol: String): DataFrame =
    Versioned.readCurrent(s, corpusDir, Some(partCol))

  /** Post-merge maintenance: restage every partition whose data-file
    * count exceeds `maxFilesPerPart` — repeated merges leave one file per
    * shuffle task per merge in the touched partitions, and at 100 TB the
    * per-file open/footer cost on later scans dominates short queries
    * long before data volume does (same rationale as
    * [[graft.engine.Pipeline.compact]], composed with the commit
    * protocol). One Spark job rewrites ALL fragmented partitions:
    * `repartition(partCol)` clusters each partition value into a single
    * task, so the partitionBy writer emits exactly one file per value,
    * and the new version's manifest points untouched partitions at their
    * existing dirs. Multiset-preserving by construction (pure
    * read→repartition→write); publish is atomic as ever. `sortCol`
    * re-clusters each compacted partition by that column during the
    * rewrite (the OPTIMIZE-with-sort idiom): compaction is the natural
    * moment to restore key order that interleaved merges eroded, so
    * parquet row-group skipping stays tight without a separate pass. */
  def compactPartitions(s: SparkSession, corpusDir: String, partCol: String,
                        maxFilesPerPart: Int = 4,
                        sortCol: Option[String] = None): Unit = {
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(return)
    val man = Versioned.manifest(s, corpusDir, v)
    val frag0 = man.filter(e =>
      Versioned.dataFileCount(s, corpusDir, e._2) > maxFilesPerPart)
    if (frag0.isEmpty) return
    // mixed layouts: a foreign-layout fragmented entry migrates to the
    // current spec in this restage — fold in collision entries
    val frag = expandForMigration(s, corpusDir, man, frag0, partCol)
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val stageRel = Versioned.newStageRel(nv, tok)
    // LIVE read: compaction is the natural materialization point for any
    // deletion vectors on the fragmented partitions (Delta's OPTIMIZE
    // does the same) — their tombstones fold into the rewrite and their
    // dv lines drop below.
    val clustered = stageable(Versioned.readEntriesLive(s, corpusDir, v,
        frag, Some(partCol)), partCol)
      .repartition(col(partCol))
    sortCol.fold(clustered)(c =>
        clustered.sortWithinPartitions(col(partCol), col(c)))
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$corpusDir/$stageRel")
    val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel, partCol)
    val stagedNames = staged.map(_._1).toSet
    val fragNames = frag.map(_._1).toSet
    // Compaction preserves each partition's multiset, so the previous
    // version's zone-map bounds stay exact — carry the lines forward
    // VERBATIM (format-preserving: single-key and multi-column sidecars
    // alike) instead of silently dropping pruning after every
    // maintenance pass (at 100 TB the whole point of compacting is to
    // make the NEXT scans cheaper; un-prunable next scans would defeat
    // it).
    val old = Versioned.readStatsLines(s, corpusDir, v)
    if (old.nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok, old)
    // A restaged partition's DVs just materialized — drop its lines (a
    // fragmented partition whose every live row was tombstoned restages
    // to nothing and leaves the manifest too); others carry verbatim.
    carryMorSidecars(s, corpusDir, v, nv, tok, fragNames)
    val newMan = man.filterNot(e => fragNames.contains(e._1)) ++ staged
    require(newMan.nonEmpty,
      s"compacting $corpusDir would leave no partition (every live row " +
        "was tombstoned) — a logically empty table cannot be " +
        "materialized; delete the table instead")
    Versioned.writeTouchLines(s, corpusDir, nv, tok, fragNames.toSeq)
    Versioned.publish(s, corpusDir, nv, tok, newMan)
  }

  /** OPTIMIZE ZORDER for the versioned store: restage every partition
    * with rows MORTON-ORDERED on two columns inside each partition
    * ([[graft.engine.Pipeline.mortonKey]] — global-bounds 16-bit ranks,
    * bit-interleaved), so parquet row-group min/max stats stay tight on
    * BOTH columns at once where a single-column sort keeps only its
    * leading column clustered. This completes the two-tier skipping
    * story the multi-column zone maps start: manifest pruning drops
    * whole partitions by per-partition bounds, and inside the surviving
    * partitions z-ordered row groups let EITHER column's residual
    * predicate skip at the row-group tier — at 100 TB the second tier
    * is what keeps a narrow two-column range from reading a whole
    * partition. One maintenance pass, three outcomes: layout restored,
    * outstanding deletion vectors materialized (live read, all dv lines
    * drop — it IS a full restage), and the requested stats forms
    * recomputed fresh from the staged files in the same commit (forms
    * not requested carry verbatim — multiset preservation keeps them
    * exact, the compaction rule). Content-invisible: the change feed
    * across a z-order compaction is empty. A fully-tombstoned partition
    * restages to nothing and leaves the manifest; emptying the table
    * fails fast as ever. */
  def compactZOrder(s: SparkSession, corpusDir: String, partCol: String,
                    zCols: (String, String),
                    statsKey: Option[String] = None,
                    statsKeys: Seq[String] = Nil,
                    dictKeys: Seq[String] = Nil,
                    bloomKeys: Seq[String] = Nil): Unit = {
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(return)
    val man = Versioned.manifest(s, corpusDir, v)
    val live = Versioned.readEntriesLive(s, corpusDir, v, man,
                                         Some(partCol))
    val (ca, cb) = zCols
    val mm = live.agg(min(col(ca)).cast("double"),
                      max(col(ca)).cast("double"),
                      min(col(cb)).cast("double"),
                      max(col(cb)).cast("double")).head()
    // all-null z-columns: nothing to cluster — keep the plain
    // partition-clustered rewrite (the sinkZOrder degenerate rule)
    val clustered = live.repartition(col(partCol))
    val sorted =
      if (mm.isNullAt(0) || mm.isNullAt(2))
        clustered.sortWithinPartitions(col(partCol))
      else clustered
        .withColumn("__z", graft.engine.Pipeline.mortonKey(col(ca), col(cb),
          mm.getDouble(0), mm.getDouble(1), mm.getDouble(2),
          mm.getDouble(3)))
        .sortWithinPartitions(col(partCol), col("__z"))
        .drop("__z")
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val stageRel = Versioned.newStageRel(nv, tok)
    sorted.write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$corpusDir/$stageRel")
    val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel,
                                              partCol)
    require(staged.nonEmpty,
      s"z-ordering $corpusDir would leave no partition (every live row " +
        "was tombstoned) — a logically empty table cannot be " +
        "materialized; delete the table instead")
    val wantStats = statsKey.isDefined || statsKeys.nonEmpty ||
      dictKeys.nonEmpty || bloomKeys.nonEmpty
    val fresh =
      if (wantStats)
        freshStatsLinesStaged(s, corpusDir, stageRel, partCol,
                              statsKey, statsKeys, dictKeys, bloomKeys)
      else Seq.empty
    val carried = Versioned.readStatsLines(s, corpusDir, v)
      .filterNot(statsLineReplaced(statsKey, statsKeys, dictKeys,
                                   bloomKeys))
    if ((carried ++ fresh).nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok,
        (carried ++ fresh).sorted)
    // no dv lines: the full live restage materialized every tombstone
    // (a FULL restage: every partition is declared touched)
    Versioned.writeTouchLines(s, corpusDir, nv, tok,
      (man.map(_._1) ++ staged.map(_._1)).distinct)
    Versioned.publish(s, corpusDir, nv, tok, staged)
  }

  /** PARTITION EVOLUTION, first tier (Iceberg evolves the spec as
    * metadata; the honest first tier on a dir-partitioned store is an
    * ATOMIC FULL REWRITE through the same versioned protocol): restage
    * the whole live table clustered and partitioned by `newPartCol`,
    * publish at snapshot+1 under the ordinary OCC claim. Everything
    * composes the way a maintenance commit must:
    *
    *  - CONTENT-INVISIBLE: the committed rows are byte-for-byte the
    *    live rows (tombstones and update vectors materialize in the
    *    rewrite), so [[changeFeed]] across the repartition classifies
    *    ZERO changes — layout moves, the feed stays silent, mirrors
    *    stream nothing (the zorder rule). Mixed-layout diff reads work
    *    because [[graft.engine.Versioned.readEntries]] re-derives each
    *    stage dir's partition column from its own dir structure. A feed
    *    WINDOW crossing the move passes the OLD partCol (only the
    *    from-side can carry tombstones — the rewrite materialized them
    *    all); sync mirrors up to the repartition version before taking
    *    new MOR deletes on the new layout, so no window ever holds
    *    tombstones of two layouts.
    *  - TIME-TRAVELABLE: older versions keep their manifests verbatim —
    *    `readVersion(v_old, Some(oldPartCol))` reads the old layout
    *    until retention sweeps it.
    *  - CONSTRAINT-SAFE: the staged read-back validates main's
    *    persisted CHECK set before anything publishes.
    *  - SIDECAR RULES: old stats/dict/bloom lines are keyed by OLD
    *    partition dir names — all drop; fresh ones are recorded for the
    *    new layout when requested. No dv/uv lines survive (the rewrite
    *    materialized them); the applied-ids ledger and the constraint
    *    set need no copy (readers walk back to the newest committed
    *    sidecar).
    *  - CONCURRENCY: deliberately NO touch declaration — an undeclared
    *    commit "touches everything", so a racing upsert that staged
    *    under the OLD layout re-derives loudly instead of rebasing a
    *    stale-layout manifest onto the new one.
    *
    * Cost: one full read + shuffle + write — at 100 TB this is a
    * scheduled maintenance job, not a hot-path operation; what the
    * protocol buys is that it is atomic, crash-safe, and invisible to
    * every downstream contract. Callers own the partCol parameter they
    * pass readers afterwards, as everywhere in this API. */
  /** INSERT OVERWRITE (the atomic full-table REPLACE — the backfill
    * rewrite): stage `batch` as the COMPLETE next version. Every old
    * manifest entry leaves; no stats/dv/uv line carries — all
    * partitions are replaced, so carried zone bounds or tombstone refs
    * would describe content that no longer exists; persisted CHECK
    * constraints validate on the staged read-back BEFORE publish; the
    * commit takes the ordinary OCC claim with deliberately NO touch
    * declaration (an undeclared commit "touches everything", so a
    * concurrent writer re-derives loudly instead of rebasing onto
    * vanished partitions). Key uniqueness is enforced loudly up front —
    * the store's upsert invariant; a duplicate key would silently
    * half-apply every later update. An empty batch fails fast
    * (emptying is table deletion). Time travel keeps reading the
    * replaced versions until retention sweeps them. */
  def replaceTable(s: SparkSession, corpusDir: String, batch: DataFrame,
                   keyCol: String, partCol: String): Unit = {
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(
      throw new IllegalStateException(
        s"no committed version under $corpusDir — INSERT OVERWRITE " +
          "replaces an existing table; create it first"))
    val shape = batch.agg(count(lit(1)), count_distinct(col(keyCol)))
      .head()
    require(shape.getLong(0) > 0L,
      s"INSERT OVERWRITE with an empty batch would empty $corpusDir — " +
        "that is table deletion, not a replace")
    require(shape.getLong(0) == shape.getLong(1),
      s"INSERT OVERWRITE batch carries duplicate or null '$keyCol' " +
        s"keys (${shape.getLong(0)} rows, ${shape.getLong(1)} distinct " +
        "keys) — the store is key-unique")
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val stageRel = Versioned.newStageRel(nv, tok)
    stageable(batch, partCol)
      .sortWithinPartitions(col(partCol), col(keyCol))
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$corpusDir/$stageRel")
    validateStaged(s, corpusDir, stageRel, persistedConstraintCols(
      tableConstraints(s, corpusDir, v), batch.columns.toSeq))
    val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel,
                                              partCol)
    Versioned.publish(s, corpusDir, nv, tok, staged)
  }

  def repartitionTable(s: SparkSession, corpusDir: String,
                       oldPartCol: String, newPartCol: String,
                       statsKey: Option[String] = None,
                       statsKeys: Seq[String] = Nil,
                       dictKeys: Seq[String] = Nil,
                       bloomKeys: Seq[String] = Nil): Unit = {
    require(oldPartCol != newPartCol,
      s"repartitionTable needs a NEW partition column, got '$oldPartCol' " +
        "twice — for a same-column re-clustering use compactSmallFiles " +
        "or compactZOrder")
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(return)
    val man = Versioned.manifest(s, corpusDir, v)
    val live = Versioned.readEntriesLive(s, corpusDir, v, man,
                                         Some(oldPartCol))
    require(live.columns.contains(newPartCol),
      s"new partition column '$newPartCol' is not a column of the " +
        s"table under $corpusDir: ${live.columns.mkString(", ")}")
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    val stageRel = Versioned.newStageRel(nv, tok)
    live.repartition(col(newPartCol))
      .sortWithinPartitions(col(newPartCol))
      .write.mode("overwrite").partitionBy(newPartCol)
      .parquet(s"$corpusDir/$stageRel")
    validateStaged(s, corpusDir, stageRel, persistedConstraintCols(
      tableConstraints(s, corpusDir, v), live.columns.toSeq))
    val staged = Versioned.listStagedPartDirs(s, corpusDir, stageRel,
                                              newPartCol)
    require(staged.nonEmpty,
      s"repartitioning $corpusDir would leave no partition (every live " +
        "row was tombstoned) — a logically empty table cannot be " +
        "materialized; delete the table instead")
    val wantStats = statsKey.isDefined || statsKeys.nonEmpty ||
      dictKeys.nonEmpty || bloomKeys.nonEmpty
    val fresh =
      if (wantStats)
        freshStatsLinesStaged(s, corpusDir, stageRel, newPartCol,
                              statsKey, statsKeys, dictKeys, bloomKeys)
      else Seq.empty
    if (fresh.nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok, fresh.sorted)
    Versioned.publish(s, corpusDir, nv, tok, staged)
  }

  private def fold(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
      .cast("long").mod(100)

  /** Declared merge_upsert query: build a corpus snapshot (orders with
    * fold < 90, partitioned by o_orderstatus), merge in a batch of
    * re-priced rows (fold ≥ 80: buckets 80-89 UPDATE existing keys,
    * 90-99 INSERT new ones), merge the SAME batch a second time —
    * idempotency is part of the checked contract — and return the corpus
    * read back. The oracle is pure SQL over the source table: every
    * order, re-priced iff its fold ≥ 80. */
  def mergeUpsertQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_merge_$key").getAbsolutePath
    // Fresh corpus each call: the query's output must be a function of
    // the INPUT dir, not of prior runs with other parameters.
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")
    val batch = base.where(fold(col("o_orderkey")) >= 80)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    mergeUpsert(s, dir, batch, "o_orderkey", "o_orderstatus")
    mergeUpsert(s, dir, batch, "o_orderkey", "o_orderstatus")
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_upsert_compact query: the full maintenance loop —
    * the same corpus/batch/double-merge as [[mergeUpsertQuery]], then
    * [[compactPartitions]] down to one file per partition and a
    * [[Versioned.vacuum]] of the dead version dirs — read back through
    * the committed view. Same oracle as merge_upsert: compaction and
    * vacuum are REQUIRED to be invisible in the data (multiset-
    * preserving, referenced-dirs-only), and running them inside the
    * oracle-checked path is what enforces that end-to-end. */
  def mergeUpsertCompactQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_mergec_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")
    val batch = base.where(fold(col("o_orderkey")) >= 80)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    mergeUpsert(s, dir, batch, "o_orderkey", "o_orderstatus")
    mergeUpsert(s, dir, batch, "o_orderkey", "o_orderstatus")
    compactPartitions(s, dir, "o_orderstatus", maxFilesPerPart = 1)
    graft.engine.Versioned.vacuum(s, dir)
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Type-2 slowly-changing-dimension merge: fold a change batch into a
    * versioned history table — open rows whose attributes CHANGED are
    * closed (`valid_to` = version) and a new open row is appended;
    * unchanged keys are left untouched, which is what makes re-applying
    * the same batch a no-op (idempotence falls out of the attribute
    * comparison, not a transaction log). `merge_upsert` keeps only the
    * latest truth; SCD2 keeps every version — the as-of-join side input
    * ([[Relational.joinAsof]]) every point-in-time feature pipeline needs.
    *
    * The one-open-row-per-key invariant is ENFORCED at the door: a batch
    * carrying two rows for one key would append two open rows, so
    * duplicate keys fail fast (one dimension-sized aggregate — cheap next
    * to the diff join) rather than silently corrupting the history that
    * joinAsof consumers trust.
    *
    * Scale: histories are dimension-sized (≪ facts); the change detection
    * is one key-equi join of batch × OPEN rows (open set ≤ |dimension|),
    * and the null-safe `<=>` comparison keeps NULL attribute transitions
    * honest. The rewrite stages the whole history under the next version
    * and publishes atomically ([[Versioned]]) — at warehouse scale,
    * partition it by a key hash and restage only touched partitions
    * exactly as [[mergeUpsert]] does. */
  def mergeScd2(s: SparkSession, historyDir: String, changes: DataFrame,
                keyCol: String, attrCols: Seq[String],
                version: Long): Unit = {
    val outCols = (keyCol +: attrCols) ++ Seq("valid_from", "valid_to")
    val dupKeys = changes.groupBy(keyCol).agg(count(lit(1)).as("n"))
      .where(col("n") > 1).limit(5).collect()
    require(dupKeys.isEmpty,
      s"mergeScd2: changes batch has duplicate $keyCol values " +
        s"(e.g. ${dupKeys.map(_.get(0)).mkString(", ")}) — one row per " +
        "key per batch, or the one-open-row invariant breaks")
    Versioned.currentVersion(s, historyDir) match {
      case None =>
        val nv = 1L  // OCC: snapshot+1, see mergeUpsert
        val stageRel = Versioned.newStageRel(nv)
        changes.withColumn("valid_from", lit(version))
          .withColumn("valid_to", lit(null).cast("long"))
          .selectExpr(outCols: _*)
          .write.mode("overwrite")
          .parquet(s"$historyDir/$stageRel")
        Versioned.publish(s, historyDir, nv,
          Versioned.wholeTableEntryAt(stageRel))
      case Some(v) =>
        // pinned to v (not re-read): the version this rewrite derives
        // from must be the version its claim contends at
        val hist = Versioned.readVersion(s, historyDir, v, None)
        val open = hist.where(col("valid_to").isNull)
        // keys whose open version differs on ANY attribute — or brand-new.
        // Materialized once (the withMaterialized rule): uncached, the
        // change⋈open diff join re-ran FOUR times — the isEmpty probe,
        // the two open-row semi/anti legs, and the new-version union leg.
        val diff = changes.alias("c")
          .join(open.alias("o"), col(s"c.$keyCol") === col(s"o.$keyCol"), "left")
          .where(col(s"o.$keyCol").isNull ||
                 attrCols.map(a => !(col(s"c.$a") <=> col(s"o.$a")))
                   .reduce(_ || _))
          .select(col(s"c.$keyCol").as(keyCol) +:
                  attrCols.map(a => col(s"c.$a").as(a)): _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (diff.isEmpty) return  // nothing changed: the no-op that
                                    // makes re-applying a batch idempotent
          val diffKeys = diff.select(keyCol)
          val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
          val stageRel = Versioned.newStageRel(nv)
          hist.where(col("valid_to").isNotNull)                        // closed: keep
            .unionByName(open.join(diffKeys, Seq(keyCol), "left_anti"))// open, unchanged
            .unionByName(open.join(diffKeys, Seq(keyCol), "left_semi") // open, changed:
                           .withColumn("valid_to", lit(version)))      //   close
            .unionByName(diff.withColumn("valid_from", lit(version))   // new version:
                           .withColumn("valid_to", lit(null).cast("long")))// open
            .selectExpr(outCols: _*)
            .write.mode("overwrite")
            .parquet(s"$historyDir/$stageRel")
          Versioned.publish(s, historyDir, nv,
            Versioned.wholeTableEntryAt(stageRel))
        } finally diff.unpersist(false)
    }
  }

  /** Read the current committed history state. */
  def readHistory(s: SparkSession, historyDir: String): DataFrame =
    Versioned.readCurrent(s, historyDir, None)

  /** Declared merge_upsert_timetravel query: corpus snapshot at version
    * 1, a re-pricing merge on top (version 2), then the corpus read AS
    * OF version 1 — the oracle is the PRE-merge snapshot, so equality
    * proves the merge left version 1's files untouched and the manifest
    * resolution is exact. Time travel is the versioned protocol's free
    * dividend: immutable data dirs + per-version manifests. */
  def mergeUpsertTimetravelQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_mergett_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")
    val batch = base.where(fold(col("o_orderkey")) >= 80)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    mergeUpsert(s, dir, batch, "o_orderkey", "o_orderstatus")
    Versioned.readVersion(s, dir, 1L, Some("o_orderstatus"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_upsert_rollback query: same pipeline, then an atomic
    * ROLLBACK to version 1 and a CURRENT read — same oracle as time
    * travel (the rollback publishes version 1's manifest as version 3;
    * nothing is deleted, so a bad rollback rolls forward the same way). */
  def mergeUpsertRollbackQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_mergerb_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")
    val batch = base.where(fold(col("o_orderkey")) >= 80)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    mergeUpsert(s, dir, batch, "o_orderkey", "o_orderstatus")
    Versioned.rollback(s, dir, toVersion = 1L)
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Row-level changelog (CDC) between two committed versions of a
    * versioned corpus: one `insert` / `update` / `delete` row per key
    * whose state differs, with old and new values of `valueCol`.
    * Downstream consumers (cache invalidation, index maintenance, the
    * ANN-store folds) subscribe to THIS instead of re-diffing snapshots.
    *
    * Manifest-pruned: a partition whose manifest entry is IDENTICAL in
    * both versions points at the same immutable dir — it cannot contain
    * a change and is never read. The diff cost is ∝ bytes of partitions
    * touched between the versions (at 100 TB: the day's merges), not
    * corpus size; the immutable-dir + manifest design gives CDC away for
    * free, which is exactly why lakehouse table formats do it this way.
    * Within touched partitions the diff is one full-outer hash join on
    * the key. */
  def changelog(s: SparkSession, corpusDir: String, fromV: Long, toV: Long,
                keyCol: String, partCol: String,
                valueCol: String): DataFrame = {
    val manA = Versioned.manifest(s, corpusDir, fromV).toMap
    val manB = Versioned.manifest(s, corpusDir, toV).toMap
    val changedParts =
      (manA.keySet ++ manB.keySet).filter(p => manA.get(p) != manB.get(p))
    val aEntries = manA.filter { case (p, _) => changedParts(p) }.toSeq
    val bEntries = manB.filter { case (p, _) => changedParts(p) }.toSeq
    def side(entries: Seq[(String, String)], tag: String): DataFrame =
      (if (entries.isEmpty)
         Versioned.readVersion(s, corpusDir, fromV, Some(partCol)).limit(0)
       else Versioned.readEntries(s, corpusDir, entries, Some(partCol)))
        .select(col(keyCol), col(valueCol).as(tag))
    side(aEntries, "old_value").join(side(bEntries, "new_value"),
        Seq(keyCol), "full_outer")
      .withColumn("change",
        when(col("old_value").isNull, "insert")
          .when(col("new_value").isNull, "delete")
          .otherwise("update"))
      .where(col("change") =!= "update" ||
             col("old_value") =!= col("new_value"))
  }

  /** Declared merge_cdc query: the merge_upsert pipeline (snapshot →
    * re-pricing merge), then the v1→v2 changelog. The oracle restates
    * the expected change rows straight from the source table and the
    * fold rule: buckets 80-89 are updates (old → ×2), 90-99 inserts.
    * Equality proves the diff finds exactly the merged keys — and the
    * manifest pruning drops only unchanged partitions. */
  def mergeCdcQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_mergecdc_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")
    val batch = base.where(fold(col("o_orderkey")) >= 80)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    mergeUpsert(s, dir, batch, "o_orderkey", "o_orderstatus")
    changelog(s, dir, 1L, 2L, "o_orderkey", "o_orderstatus", "o_totalprice")
      .select(col("o_orderkey"), col("change"),
              round(col("old_value"), 2).as("old_price_r"),
              round(col("new_value"), 2).as("new_price_r"))
      .orderBy("o_orderkey")
  }

  /** Retention enforcement as a MANIFEST-ONLY commit: partitions whose
    * encoded dir name fails `keep` are dropped from the next version's
    * manifest — no file is read, rewritten, or deleted, so expiring a
    * year of a 100 TB corpus costs one metadata write and is atomic,
    * auditable, and reversible (time travel still reaches the dropped
    * days until [[Versioned.vacuum]] reclaims their dirs — the
    * soft-delete / hard-delete split every retention policy wants).
    * No-op (no new version) when nothing expires.
    *
    * MIXED-LAYOUT caveat: the rule sees manifest NAMES, so on a table
    * carrying entries of an older partition spec a current-spec
    * predicate cannot reach rows living under foreign names (and a
    * rollback can resurrect such a manifest). Restore the layout first
    * ([[repartitionTable]]) when retention must be exhaustive — the
    * name rule stays the honest primitive either way. */
  def applyRetention(s: SparkSession, corpusDir: String,
                     keep: String => Boolean): Unit = {
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(return)
    val man = Versioned.manifest(s, corpusDir, v)
    val kept = man.filter { case (name, _) => keep(name) }
    if (kept.size == man.size) return
    // an empty manifest has no entry to recover a schema from, so the
    // committed read would fail — expiring EVERYTHING is table deletion,
    // not retention; fail fast instead of publishing an unreadable state
    require(kept.nonEmpty,
      s"retention would drop every partition of $corpusDir — an empty " +
        "table cannot be read back; delete the table instead")
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    // Bounds of surviving partitions are untouched by a manifest-only
    // drop — carry their lines VERBATIM (filtered to the kept names,
    // format-preserving) so retention does not cost the corpus its
    // zone-map pruning.
    val old = Versioned.readStatsLines(s, corpusDir, v)
    val keptNames = kept.map(_._1).toSet
    val keptStats = old.filter(l => keptNames(Versioned.statsLinePart(l)))
    if (keptStats.nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok, keptStats)
    // MOR refs (tombstones AND update images) of kept partitions carry
    // (correctness, not pruning); dropped partitions take theirs with
    // them. The uv half is the deep-fuzz seed-304 catch: retention
    // after a MOR update silently reverted the updated rows.
    carryMorSidecars(s, corpusDir, v, nv, tok, n => !keptNames(n))
    Versioned.publish(s, corpusDir, nv, tok, kept)
  }

  /** ANALYZE TABLE for the versioned store: recompute the stats sidecar
    * (range bounds and/or dictionaries) for EVERY current partition in
    * one LIVE scan and publish it as a MANIFEST-CARRY commit — no data
    * file is rewritten, so re-arming pruning costs one read pass plus
    * one metadata write, never a 100 TB rewrite. Two situations call
    * for it: (a) stats-shedding writes (a stats-less upsert restage, an
    * inherited store that never recorded a sidecar) left partitions
    * unprunable; (b) deletes left carried SUPERSETS that still read
    * partitions whose matching rows are gone — the live scan (tombstones
    * applied) tightens bounds and sets to the exact current content.
    * DV refs carry verbatim (content-invariant commit); a partition
    * logically emptied by tombstones yields no line and simply always
    * reads. No-op when no stats were requested (fail fast instead). */
  def refreshStats(s: SparkSession, corpusDir: String, partCol: String,
                   statsKey: Option[String] = None,
                   statsKeys: Seq[String] = Nil,
                   dictKeys: Seq[String] = Nil,
                   bloomKeys: Seq[String] = Nil): Unit = {
    require(statsKey.isDefined || statsKeys.nonEmpty ||
        dictKeys.nonEmpty || bloomKeys.nonEmpty,
      "refreshStats needs at least one of statsKey/statsKeys/dictKeys/" +
        "bloomKeys")
    require(statsKey.isEmpty || statsKeys.isEmpty,
      "pass statsKey (single legacy bound) or statsKeys (multi-column), " +
        "not both")
    val v = Versioned.currentVersion(s, corpusDir).getOrElse(return)
    val man = Versioned.manifest(s, corpusDir, v)
    val live = Versioned.readEntriesLive(s, corpusDir, v, man,
                                         Some(partCol))
    val lines = freshStatsLines(live, partCol, statsKey, statsKeys,
                                dictKeys, bloomKeys)
    // Refresh REPLACES only what it recomputed (the requested columns'
    // lines, in their form); everything else carries verbatim — an
    // ANALYZE of the dictionary must not cost the table its range
    // bounds (the same no-silent-stripping rule the upsert carry has).
    val carried = Versioned.readStatsLines(s, corpusDir, v)
      .filterNot(statsLineReplaced(statsKey, statsKeys, dictKeys,
                                   bloomKeys))
    val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
    val tok = Versioned.newToken()
    if ((carried ++ lines).nonEmpty)
      Versioned.writeStatsLines(s, corpusDir, nv, tok,
        (carried ++ lines).sorted)
    carryMorSidecars(s, corpusDir, v, nv, tok, _ => false)
    Versioned.publish(s, corpusDir, nv, tok, man)
  }

  /** Declared merge_schema_evolve query: a batch carrying a column the
    * corpus predates (`urgent`) merges into ONE partition (status F) —
    * the F partition restages under the widened schema, the other
    * partitions are untouched (their manifest entries still point at
    * version 1's narrow files), and the committed read unions the two
    * schemas with null-fill. The oracle restates the whole outcome from
    * the fold rule, so equality proves: the new column landed on exactly
    * the merged rows, survivors in the touched partition null-filled,
    * and untouched partitions neither rewrote nor grew the column
    * physically. Write-side schema evolution without a table rewrite —
    * the lakehouse ALTER TABLE ADD COLUMN. */
  def mergeSchemaEvolveQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_mergesev_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val o = orders(s, d)
    mergeUpsert(s, dir,
      o.select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .where(fold(col("o_orderkey")) < 90),
      "o_orderkey", "o_orderstatus")
    val batch = o
      .where(fold(col("o_orderkey")) >= 80 && col("o_orderstatus") === "F")
      .select(col("o_orderkey"),
              (col("o_totalprice") * 2).as("o_totalprice"),
              col("o_orderstatus"),
              (col("o_orderpriority") === "1-URGENT").cast("int")
                .as("urgent"))
    mergeUpsert(s, dir, batch, "o_orderkey", "o_orderstatus")
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price_r"),
              col("o_orderstatus"), col("urgent"))
      .orderBy("o_orderkey")
  }

  /** Commit-log audit (Delta's DESCRIBE HISTORY): one row per committed
    * version with its partition count and row count — the table a data
    * team reads before a rollback and an auditor reads after one. Row
    * counts come from manifest-resolved version reads (each version's
    * own partition-pruned scan), versions from one bounded `commits/`
    * listing. */
  def history(s: SparkSession, corpusDir: String,
              partCol: String): DataFrame = {
    // Below-floor versions refuse to read (their data may be vacuumed)
    // and may be missing entirely after a metadata sweep — the audit
    // covers the retained window, exactly what the floor promises.
    val floor = Versioned.retentionFloor(s, corpusDir).getOrElse(Long.MinValue)
    val versions = Versioned.committedVersions(s, corpusDir)
      .filter(_ >= floor)
    require(versions.nonEmpty, s"no committed version under $corpusDir")
    versions.map { v =>
      val man = Versioned.manifest(s, corpusDir, v)
      Versioned.readVersion(s, corpusDir, v, Some(partCol))
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(v).as("version"), lit(man.size.toLong).as("n_partitions"),
                col("n_rows"))
    }.reduce(_ unionByName _).orderBy("version")
  }

  /** Declared merge_history query: the standard snapshot → merge →
    * replayed-merge pipeline, then the commit log. Version 1 is the
    * fold<90 snapshot, version 2 the merged state, version 3 the
    * REPLAY — identical rows to v2 (idempotence made auditable: the
    * history row proves the replay changed nothing). */
  def mergeHistoryQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_mergehist_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")
    val batch = base.where(fold(col("o_orderkey")) >= 80)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    mergeUpsert(s, dir, batch, "o_orderkey", "o_orderstatus")
    mergeUpsert(s, dir, batch, "o_orderkey", "o_orderstatus")
    history(s, dir, "o_orderstatus")
  }

  /** Declared scan_manifest_pruned query: orders clustered into
    * key-range partitions (kb = o_orderkey DIV 2048 — a layout rule the
    * READER never sees), zone-map stats written through the merge, and
    * a key-range read that prunes by stats alone before touching any
    * file. Oracle = the plain filter on the source table; Wave16 pins
    * that pruned-out partitions never appear in the scan. */
  def scanManifestPrunedQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_zonemap_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val o = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
              (col("o_orderkey") / 2048).cast("long").as("kb"))
    mergeUpsert(s, dir, o, "o_orderkey", "kb",
                statsKey = Some("o_orderkey"))
    readCorpusKeyPruned(s, dir, "kb", "o_orderkey", 1000L, 2999L)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price_r"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_delete query: build the full orders corpus
    * (partitioned by status), row-level-DELETE the fold ≥ 70 keys
    * (~30%, spread across every partition), delete the SAME keys again
    * — idempotence is part of the checked contract (the second pass
    * must find no touched partition and publish nothing) — and read
    * the survivors back. The oracle is the plain complement filter
    * over the source table: equality proves the copy-on-write restage
    * removed exactly the doomed keys and nothing else. */
  def mergeDeleteQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_mergedel_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base, "o_orderkey", "o_orderstatus")
    val doomed = base.where(fold(col("o_orderkey")) >= 70)
      .select("o_orderkey")
    mergeDelete(s, dir, doomed, "o_orderkey", "o_orderstatus")
    mergeDelete(s, dir, doomed, "o_orderkey", "o_orderstatus")
    val vAfter = Versioned.currentVersion(s, dir).get
    require(vAfter == 2L,
      s"idempotent re-delete must publish nothing, at v$vAfter")
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price_r"),
              col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_apply_cdc query: one CDC batch — updates (fold
    * 80-84, re-priced ×2), deletes (85-89), inserts (90-94) — applied
    * ATOMICALLY to the fold<90 corpus snapshot in a single committed
    * version, then applied AGAIN (the replay must converge to the same
    * content). The oracle restates the end state from the source table
    * and the fold rule, so equality proves all three op kinds landed
    * together and exactly once. */
  def mergeApplyCdcQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_applycdc_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")
    val b = fold(col("o_orderkey"))
    val changes = base.where(b >= 80 && b <= 94)
      .withColumn("op",
        when(b <= 84, lit("u")).when(b <= 89, lit("d")).otherwise(lit("i")))
      .withColumn("o_totalprice",
        when(col("op") === "u", col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    mergeApplyChangelog(s, dir, changes, "o_orderkey", "o_orderstatus")
    mergeApplyChangelog(s, dir, changes, "o_orderkey", "o_orderstatus")
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_constrained query: write-side CHECK constraints —
    * the full corpus lands under two constraints that hold (positive
    * price, non-null key), then a VIOLATING batch (a negative price
    * among valid rows) must be rejected whole with nothing staged and
    * the version unmoved, and a NULL-predicate row must pass (SQL
    * three-valued CHECK). Round 12 extends the pin to the PERSISTED
    * path: ADD CONSTRAINT commits the predicate as table metadata, a
    * plain upsert passed NO constraints is rejected by it, NULL still
    * passes, and DROP CONSTRAINT releases the table. The read-back
    * equals the plain source restatement, proving the gate let exactly
    * the clean writes through and stopped the dirty ones cold. */
  def mergeConstrainedQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_constr_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val checks = Seq(
      "positive_price" -> (col("o_totalprice") > 0),
      "key_present" -> col("o_orderkey").isNotNull)
    mergeUpsert(s, dir, base, "o_orderkey", "o_orderstatus",
                constraints = checks)                               // v1
    // the dirty batch: one violating row hidden among valid ones —
    // rejected WHOLE, version unmoved. Deterministic slice (ordered
    // limit, the FitBpe rule): a bare limit could pick rows that miss
    // the flipped key on a different file layout.
    val k0 = base.orderBy("o_orderkey").limit(1)
      .collect()(0).getLong(0)
    val dirty = base.orderBy("o_orderkey").limit(3)
      .withColumn("o_totalprice",
        when(col("o_orderkey") === k0, lit(-5.0))
          .otherwise(col("o_totalprice")))
    val rejected = scala.util.Try(
      mergeUpsert(s, dir, dirty, "o_orderkey", "o_orderstatus",
                  constraints = checks))
    require(rejected.isFailure &&
      rejected.failed.get.getMessage.contains("positive_price"),
      "the violating batch must be rejected with the constraint named")
    require(Versioned.currentVersion(s, dir).contains(1L),
      "a rejected batch must not publish")
    // NULL predicate passes (SQL CHECK): a null price row is admitted
    mergeUpsert(s, dir,
      base.orderBy("o_orderkey").limit(1)
        .select(lit(-1L).as("o_orderkey"),
          lit(null).cast("double").as("o_totalprice"),
          lit("F").as("o_orderstatus")),
      "o_orderkey", "o_orderstatus", constraints = checks)          // v2
    // PERSISTED path (round 12): the constraint set committed as table
    // metadata binds writers that pass NOTHING — the contract lives
    // with the table, not the caller.
    addConstraint(s, dir, "t_positive_price", "o_totalprice > 0",
                  "o_orderstatus")                                  // v3
    def oneRow(k: Long, price: java.lang.Double) =
      base.orderBy("o_orderkey").limit(1)
        .select(lit(k).as("o_orderkey"),
          lit(price).cast("double").as("o_totalprice"),
          lit("F").as("o_orderstatus"))
    val rejectedPlain = scala.util.Try(
      mergeUpsert(s, dir, oneRow(-2L, -7.0), "o_orderkey",
                  "o_orderstatus"))  // NO per-call constraints
    require(rejectedPlain.isFailure && rejectedPlain.failed.get
        .getMessage.contains("t_positive_price"),
      "a plain upsert must be rejected by the persisted constraint")
    require(Versioned.currentVersion(s, dir).contains(3L),
      "a persisted-constraint rejection must not publish")
    mergeUpsert(s, dir, oneRow(-3L, null), "o_orderkey",
                "o_orderstatus")  // NULL passes the persisted path too, v4
    dropConstraint(s, dir, "t_positive_price")                      // v5
    mergeUpsert(s, dir, oneRow(-2L, -7.0), "o_orderkey",
                "o_orderstatus")  // released: the same write lands, v6
    readCorpus(s, dir, "o_orderstatus")
      .where(col("o_orderkey") >= 0)
      .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_concurrent_disjoint query: partition-disjoint
    * CONCURRENT writers — two real threads upsert slices confined to
    * different partitions (order statuses) at the same time, and BOTH
    * must commit: the round-12 rebase lets the claim loser re-publish
    * its already-staged dirs onto a fresh version (metadata-only) when
    * every intervening commit declares a disjoint touched set, with
    * [[graft.engine.Versioned.withCommitRetry]] as the fallback when
    * the interleaving does serialize. The final read-back is
    * deterministic whichever racer won: exactly the base plus both
    * slices — which is what the oracle restates. The query REQUIRES
    * two new versions (both writers committed; neither was lost or
    * collapsed into the other). */
  def mergeConcurrentDisjointQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_racer_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val b = fold(col("o_orderkey"))
    mergeUpsert(s, dir, base.where(b < 85),
                "o_orderkey", "o_orderstatus")                       // v1
    val feedF = base.where(b >= 85 && col("o_orderstatus") === "F")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val feedO = base.where(b >= 85 && col("o_orderstatus") === "O")
      .withColumn("o_totalprice", col("o_totalprice") * 3)
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    def racer(feed: DataFrame) = new Thread(() => {
      try {
        start.await()
        Versioned.withCommitRetry() {
          mergeUpsert(s, dir, feed, "o_orderkey", "o_orderstatus")
        }
      } catch { case t: Throwable => errs.compareAndSet(null, t) }
    })
    val (tf, to) = (racer(feedF), racer(feedO))
    tf.start(); to.start(); start.countDown()
    tf.join(300000); to.join(300000)
    require(errs.get() == null, s"racer failed: ${errs.get()}")
    require(Versioned.currentVersion(s, dir).contains(3L),
      "both disjoint racers must commit — two new versions")
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"),
              round(col("o_totalprice"), 2).as("price_r"),
              col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_tag_read query: version TAGS as provenance pins —
    * tag the fold<90 snapshot `baseline` (the corpus a model trained
    * on), advance the corpus with a CDC batch, then VACUUM with
    * keepVersions=1 so the floor rises PAST the tagged version — and
    * read the tag back. The oracle restates the pre-advance snapshot,
    * so equality proves the pin held end-to-end: the vacuum kept the
    * tagged version's dirs and metadata below the floor, and time
    * travel by name still reproduces the exact training corpus. The
    * query also REQUIRES that an untagged below-floor read still fails
    * fast (the exemption is the tag's, not the floor's). */
  def mergeTagReadQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_tagread_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")                      // v1
    Versioned.tagVersion(s, dir, "baseline", 1L)
    val b = fold(col("o_orderkey"))
    val changes = base.where(b >= 80 && b <= 94)
      .withColumn("op",
        when(b <= 84, lit("u")).when(b <= 89, lit("d")).otherwise(lit("i")))
    mergeApplyChangelog(s, dir, changes, "o_orderkey", "o_orderstatus") // v2
    mergeApplyChangelog(s, dir, changes, "o_orderkey", "o_orderstatus") // v3
    Versioned.vacuum(s, dir, keepVersions = 1)  // floor = 3 > tag's 1
    require(Versioned.retentionFloor(s, dir).exists(_ > 1L),
      "the vacuum must raise the floor past the tagged version")
    val e = scala.util.Try(
      Versioned.readVersion(s, dir, 2L, Some("o_orderstatus")).count())
    require(e.isFailure,
      "an untagged below-floor version must still fail fast")
    Versioned.readTag(s, dir, "baseline", Some("o_orderstatus"))
      .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_delete_where query: the PREDICATE delete — doom
    * every order above a price threshold across the status-partitioned
    * corpus, replay the identical DELETE (all matching rows are gone,
    * so the replay must publish NOTHING), read back. The oracle is the
    * plain complement filter. */
  def mergeDeleteWhereQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_delwhere_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base, "o_orderkey", "o_orderstatus")        // v1
    mergeDeleteWhere(s, dir, col("o_totalprice") > 250000,
      "o_orderstatus", sortCol = Some("o_orderkey"))                // v2
    mergeDeleteWhere(s, dir, col("o_totalprice") > 250000,
      "o_orderstatus", sortCol = Some("o_orderkey"))
    require(Versioned.currentVersion(s, dir).contains(2L),
      "a no-match DELETE WHERE replay must publish nothing")
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2)
        .as("price_r"),
        col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_update_where query: SQL UPDATE — double the price
    * of every fold<10 order in place (key and partition fixed), read
    * back. The oracle restates the transform as a CASE over the
    * source, so equality proves exactly the matching rows changed,
    * by exactly the SET expression, and nothing else moved. */
  def mergeUpdateWhereQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_updwhere_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base, "o_orderkey", "o_orderstatus")        // v1
    mergeUpdateWhere(s, dir, fold(col("o_orderkey")) < 10,
      Seq("o_totalprice" -> (col("o_totalprice") * 2)),
      "o_orderkey", "o_orderstatus")                                // v2
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_update_mor query: the MERGE-ON-READ twin of
    * [[mergeUpdateWhereQuery]] — same corpus, same UPDATE (fold<10
    * doubled in place), but via [[mergeUpdateMor]]: one image dir + a
    * uv sidecar, the MANIFEST REQUIRED UNCHANGED (write cost ∝ matched
    * rows, zero restage), then the substitution read, materialization
    * by [[compactDeletes]], and a vacuum sweeping the image dirs. The
    * oracle is merge_update_where's CASE restatement, so equality
    * proves the whole MOR-update lifecycle is content-identical to the
    * copy-on-write path. */
  def mergeUpdateMorQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_updmor_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base, "o_orderkey", "o_orderstatus")        // v1
    mergeUpdateMor(s, dir, fold(col("o_orderkey")) < 10,
      Seq("o_totalprice" -> (col("o_totalprice") * 2)),
      "o_orderkey", "o_orderstatus")                                // v2
    require(Versioned.manifest(s, dir, 2L) == Versioned.manifest(s, dir, 1L),
      "a MOR update must not restage any data partition")
    require(Versioned.readUvRefs(s, dir, 2L).nonEmpty,
      "the update must land as uv sidecar refs")
    compactDeletes(s, dir, "o_orderstatus",
                   sortCol = Some("o_orderkey"))                    // v3
    require(Versioned.readUvRefs(s, dir, 3L).isEmpty,
      "materialization must clear the uv refs")
    Versioned.vacuum(s, dir, keepVersions = 1)
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_change_feed query: build the fold<90 corpus (v1),
    * apply one CDC batch — updates 80-84 re-priced ×2, deletes 85-89,
    * inserts 90-94 — atomically (v2), then read `changeFeed(1, 2)`. The
    * oracle restates the change set straight from the source table and
    * the fold rule, so equality proves the computed feed returns
    * exactly the net content difference — every changed key, correctly
    * classified, with the right image (post for insert/update, pre for
    * delete) — and NOTHING for the restaged-but-identical survivor rows
    * that shared partitions with the changes. */
  def mergeChangeFeedQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_changefeed_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")
    val b = fold(col("o_orderkey"))
    val changes = base.where(b >= 80 && b <= 94)
      .withColumn("op",
        when(b <= 84, lit("u")).when(b <= 89, lit("d")).otherwise(lit("i")))
      .withColumn("o_totalprice",
        when(col("op") === "u", col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    mergeApplyChangelog(s, dir, changes, "o_orderkey", "o_orderstatus")
    changeFeed(s, dir, 1L, 2L, "o_orderkey", "o_orderstatus")
      .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderstatus").cast("string").as("o_orderstatus"),
              col("change_type"))
      .orderBy("o_orderkey")
  }

  /** Declared pipeline_cdc_mirror query: the REPLICATION composition —
    * source corpus at v1 (fold<90), first [[syncMirror]] bootstraps the
    * mirror as a snapshot, the CDC batch (same shape as merge_apply_cdc)
    * advances the source to v2, a second sync ships the net feed, and a
    * THIRD sync must no-op (exactly-once: the `src:2` ledger id is
    * already committed). The mirror's content is then read back; the
    * oracle is merge_apply_cdc's end-state restatement, so equality
    * proves the feed was complete (every insert/update/delete crossed)
    * and the replay guard held. */
  def pipelineCdcMirrorQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val tmp = sys.props("java.io.tmpdir")
    val src = new java.io.File(tmp, s"graft_cdcmirror_src_$key")
      .getAbsolutePath
    val dst = new java.io.File(tmp, s"graft_cdcmirror_dst_$key")
      .getAbsolutePath
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq(src, dst).foreach { dd =>
      val pp = new org.apache.hadoop.fs.Path(dd)
      if (fs.exists(pp)) fs.delete(pp, true)
    }
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, src, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")
    require(syncMirror(s, src, dst, "o_orderkey", "o_orderstatus") == 1L)
    val b = fold(col("o_orderkey"))
    val changes = base.where(b >= 80 && b <= 94)
      .withColumn("op",
        when(b <= 84, lit("u")).when(b <= 89, lit("d")).otherwise(lit("i")))
      .withColumn("o_totalprice",
        when(col("op") === "u", col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    mergeApplyChangelog(s, src, changes, "o_orderkey", "o_orderstatus")
    require(syncMirror(s, src, dst, "o_orderkey", "o_orderstatus") == 2L)
    val dstV = Versioned.currentVersion(s, dst).get
    syncMirror(s, src, dst, "o_orderkey", "o_orderstatus")
    require(Versioned.currentVersion(s, dst).contains(dstV),
      "an up-to-date sync must publish nothing")
    readCorpus(s, dst, "o_orderstatus")
      .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared pipeline_feed_stream query: the STREAMED replication
    * composition — the same source lifecycle as pipeline_cdc_mirror
    * (fold<90 snapshot, then the CDC batch), but the mirror is fed by
    * the [[graft.streaming.ChangeFeedStream]] STREAM: batch 0
    * bootstraps from version 0 (full snapshot as inserts), the next
    * micro-batch ships the net feed when the source advances, an idle
    * drain must commit nothing, and the mirror read-back must equal the
    * batch-path oracle — proving the offset-tracked stream delivers
    * exactly the computed CDC, end to end, exactly once. */
  def pipelineFeedStreamQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val tmp = sys.props("java.io.tmpdir")
    val src = new java.io.File(tmp, s"graft_feedq_src_$key").getAbsolutePath
    val dst = new java.io.File(tmp, s"graft_feedq_dst_$key").getAbsolutePath
    val ck = new java.io.File(tmp, s"graft_feedq_ck_$key").getAbsolutePath
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq(src, dst, ck).foreach { dd =>
      val pp = new org.apache.hadoop.fs.Path(dd)
      if (fs.exists(pp)) fs.delete(pp, true)
    }
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, src, base.where(fold(col("o_orderkey")) < 90),
                "o_orderkey", "o_orderstatus")                       // v1
    val q = graft.streaming.StreamOps.feedMirrorMaintenance(
        graft.streaming.StreamOps.feedStream(s, src, "o_orderkey",
          "o_orderstatus", Some(0L)),
        dst, "o_orderkey", "o_orderstatus")
      .option("checkpointLocation", ck)
      .start()
    try {
      q.processAllAvailable()   // batch 0: bootstrap snapshot
      val b = fold(col("o_orderkey"))
      val changes = base.where(b >= 80 && b <= 94)
        .withColumn("op",
          when(b <= 84, lit("u")).when(b <= 89, lit("d")).otherwise(lit("i")))
        .withColumn("o_totalprice",
          when(col("op") === "u", col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      mergeApplyChangelog(s, src, changes, "o_orderkey", "o_orderstatus")
      q.processAllAvailable()   // batch 1: the net feed
      val dstV = Versioned.currentVersion(s, dst).get
      q.processAllAvailable()   // idle drain
      require(Versioned.currentVersion(s, dst).contains(dstV),
        "an idle drain must publish nothing to the mirror")
    } finally q.stop()
    readCorpus(s, dst, "o_orderstatus")
      .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_delete_mor query: the MERGE-ON-READ twin of
    * [[mergeDeleteQuery]] — same corpus, same doomed keys (fold ≥ 70),
    * but deleted via [[mergeDeleteMor]] (one tombstone dir + a sidecar;
    * no partition restages), re-deleted (idempotence: the all-miss
    * replay must publish NOTHING — tombstoned keys read as absent),
    * then MATERIALIZED by [[compactDeletes]] and read back after a
    * vacuum reclaims the tombstone dirs. The oracle is the same plain
    * complement filter, so equality proves the whole MOR lifecycle —
    * tombstone write, anti-join read (compactDeletes' own restage read
    * is that anti-join), materialization, and sweep — is invisible in
    * the data. */
  def mergeDeleteMorQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_mergemor_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    mergeUpsert(s, dir, base, "o_orderkey", "o_orderstatus")
    val doomed = base.where(fold(col("o_orderkey")) >= 70)
      .select("o_orderkey")
    mergeDeleteMor(s, dir, doomed, "o_orderkey", "o_orderstatus")
    mergeDeleteMor(s, dir, doomed, "o_orderkey", "o_orderstatus")
    val vAfter = Versioned.currentVersion(s, dir).get
    require(vAfter == 2L,
      s"idempotent MOR re-delete must publish nothing, at v$vAfter")
    compactDeletes(s, dir, "o_orderstatus", sortCol = Some("o_orderkey"))
    require(Versioned.readDvRefs(s, dir, 3L).isEmpty,
      "compactDeletes must clear every dv ref")
    Versioned.vacuum(s, dir)
    readCorpus(s, dir, "o_orderstatus")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price_r"),
              col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** Declared pipeline_dedup_delete query: RETROACTIVE corpus dedup —
    * the composition a production training-data pipeline runs when a
    * dedup pass lands after a corpus is already ingested. The documents
    * table becomes a lang-partitioned versioned corpus; the doom set
    * is exact-dup non-canonicals (dedup_exact's keep-min-doc_id-per-
    * md5 rule) UNION a quality gate (n_chars < 200 — the testdata has
    * few exact dups at small SF, so the gate keeps the delete path
    * exercised at every scale); [[mergeDelete]] removes them
    * copy-on-write (only partitions holding a doomed id restage; the
    * pre-dedup corpus stays time-travelable for provenance). The
    * oracle restates the surviving set straight from the source, so
    * equality proves the delete removed exactly the doomed ids. */
  def pipelineDedupDeleteQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_deduppurge_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val docs = documents(s, d)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    mergeUpsert(s, dir, docs, "doc_id", "lang")
    val keep = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val doomed = docs.select("doc_id")
      .join(keep, Seq("doc_id"), "left_anti")
      .union(docs.where(col("n_chars") < 200).select("doc_id"))
    mergeDelete(s, dir, doomed, "doc_id", "lang")
    readCorpus(s, dir, "lang")
      .select(col("doc_id"), col("lang").cast("string").as("lang"),
              col("n_chars"))
      .orderBy("doc_id")
  }

  /** Declared scan_zonemap_multi query: orders clustered by CUSTOMER
    * bucket (o_custkey/512) with multi-column zone maps on BOTH
    * o_custkey and o_orderkey, read back through the intersection
    * pruner with one predicate per column. The custkey predicate is
    * the one the clustering makes prunable (tight per-partition custkey
    * bounds); the orderkey predicate rides the same bounds file and
    * prunes whatever the data's correlation allows — exactly the
    * two-predicate shape per-column stats exist for. The oracle is the
    * plain conjunctive filter over the source table, so equality proves
    * pruning dropped only partitions that contain NO qualifying row. */
  def scanZonemapMultiQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_zonemap2_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val o = orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              (col("o_custkey") / 512).cast("long").as("cb"))
    mergeUpsert(s, dir, o, "o_orderkey", "cb",
                statsKeys = Seq("o_custkey", "o_orderkey"))
    readCorpusPruned(s, dir, "cb",
        Seq(("o_custkey", 40L, 139L), ("o_orderkey", 0L, 1200L)))
      .select(col("o_orderkey"), col("o_custkey"),
              round(col("o_totalprice"), 2).as("price_r"))
      .orderBy("o_orderkey")
  }

  /** Declared scan_dictmap_pruned query: documents land partitioned by
    * coarse SOURCE GROUP (5 sources per partition — the cluster-coarse
    * shape a 100 TB corpus needs, since one partition per fine-grained
    * source is unmanageable at scale) with a dictionary recorded on the
    * fine SOURCE itself. The point lookup `source = 'src13'` then reads
    * ONE group instead of all of them — the dictionary recovers
    * entity-level pruning the coarse clustering gave up, which range
    * bounds cannot express on a string column. The query REQUIRES that
    * exactly one partition's recorded set contains the value (pruning
    * really bites, on every SF — 20 sources / 4 groups in the
    * testdata); the oracle is the plain equality filter, so equality
    * proves pruning is invisible in the data. */
  def scanDictmapPrunedQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_dictmap_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
              (substring(col("source"), 4, 10).cast("long") / 5)
                .cast("long").as("src_grp"))
    mergeUpsert(s, dir, docs, "doc_id", "src_grp",
                dictKeys = Seq("source"))
    require(Versioned.readStatsDict(s, dir, 1L)
        .count(_._2("source").contains("src13")) == 1,
      "exactly one source group's dictionary must hold src13 — " +
        "the point lookup must actually prune")
    readCorpusDictPruned(s, dir, "src_grp",
        Seq(("source", Seq("src13"))))
      .select(col("doc_id"), col("source").cast("string").as("source"),
              col("n_chars"))
      .orderBy("doc_id")
  }

  /** Declared scan_bloom_pruned query: the THIRD skipping tier on the
    * same coarse source-group layout — a point lookup on DOC_ID, the
    * high-cardinality key where the other two tiers are structurally
    * blind: per-group doc_id RANGE bounds span nearly the whole id
    * space (ids interleave round-robin across sources), and a
    * dictionary of thousands of ids blew [[DictCap]] long ago. The
    * per-partition bloom recorded at write time answers "definitely not
    * here" for the three probed ids on every group but the one that
    * holds them, so the lookup reads ONE group of four; a bloom false
    * positive merely reads a group the residual IN-filter then empties.
    * The query REQUIRES that pruning actually bit (kept < total, which
    * fails only if every other group false-positives simultaneously —
    * p ≈ fpp³); the oracle is the plain IN-filter, so equality proves
    * pruning is invisible in the data. */
  def scanBloomPrunedQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_bloompr_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
              (substring(col("source"), 4, 10).cast("long") / 5)
                .cast("long").as("src_grp"))
    mergeUpsert(s, dir, docs, "doc_id", "src_grp",
                bloomKeys = Seq("doc_id"))
    val probes = Seq("2", "23", "41")   // all land in source group 0
    val blooms = Versioned.readStatsBloom(s, dir, 1L)
    val kept = Versioned.manifest(s, dir, 1L).count { case (n, _) =>
      blooms.get(n).forall(cols => cols.get("doc_id").forall(bf =>
        probes.exists(v => bf.mightContainLong(bloomProbeHash(v)))))
    }
    require(kept < Versioned.manifest(s, dir, 1L).size,
      s"the doc_id blooms must prune at least one source group, kept $kept")
    readCorpusBloomPruned(s, dir, "src_grp",
        Seq(("doc_id", probes)))
      .select(col("doc_id"), col("source").cast("string").as("source"),
              col("n_chars"))
      .orderBy("doc_id")
  }

  /** Declared merge_zorder_compact query: the full OPTIMIZE ZORDER
    * lifecycle on the customer-bucketed corpus of
    * [[scanZonemapMultiQuery]] — build with two-column bounds, MOR-
    * delete a key band (tombstones outstanding), z-order compact on
    * (o_custkey, o_orderkey) with fresh bounds in the same commit
    * (REQUIRED: every dv ref materialized), then read back through the
    * two-range intersection pruner. The oracle is the plain conjunctive
    * filter over the source complement, so equality proves the whole
    * pass — Morton rewrite, tombstone fold-in, stats refresh, pruned
    * read — is invisible in the data. */
  /** Declared scan_skip_composed query: all THREE skipping tiers in one
    * pruning pass on the coarse source-group layout — range bounds on
    * doc_id, the dictionary on the fine source, and the doc_id bloom,
    * written in the ONE staged-read stats job and consulted together by
    * [[readCorpusSkipPruned]]. The dictionary pins the single group
    * holding src13; the range and bloom tiers ride along and the
    * residual conjunction runs on the survivors. The query REQUIRES the
    * intersection actually pruned; the oracle is the plain conjunctive
    * filter, so equality proves composed pruning is invisible. */
  def scanSkipComposedQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_skipcomp_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
              (substring(col("source"), 4, 10).cast("long") / 5)
                .cast("long").as("src_grp"))
    mergeUpsert(s, dir, docs, "doc_id", "src_grp",
                statsKeys = Seq("doc_id"), dictKeys = Seq("source"),
                bloomKeys = Seq("doc_id"))
    val dicts = Versioned.readStatsDict(s, dir, 1L)
    require(dicts.count(_._2("source").contains("src13")) == 1,
      "the dictionary tier must pin exactly one source group")
    readCorpusSkipPruned(s, dir, "src_grp",
        ranges = Seq(("doc_id", 0L, 300L)),
        values = Seq(("source", Seq("src13"))))
      .select(col("doc_id"), col("source").cast("string").as("source"),
              col("n_chars"))
      .orderBy("doc_id")
  }

  /** Declared merge_repartition query: PARTITION EVOLUTION end-to-end —
    * documents land under the coarse source-group layout, a MOR delete
    * leaves outstanding tombstones, then [[repartitionTable]] moves the
    * whole table to a BY-LANGUAGE layout in one atomic maintenance
    * commit. The query REQUIRES the composition contracts in-line: the
    * change feed across the repartition is EMPTY (layout moves are
    * content-invisible — mirrors stream nothing), the tombstones
    * materialized (no dv refs at the new version), and version 1 still
    * time-travels under the OLD layout. The oracle is the plain
    * restatement of the surviving rows, so equality proves the rewrite
    * changed nothing but the directory shape. */
  /** Declared merge_evolve_spec query: METADATA-TIER partition
    * evolution (the Iceberg trick, vs [[repartitionTable]]'s full-
    * rewrite tier) — three commits on one table:
    * v1 lands doc_id < 300 under the coarse source-group spec with
    * doc_id range stats; v2 EVOLVES by simply writing doc_id ≥ 300
    * under the by-language spec — the batch's key range is disjoint
    * from every old entry's recorded bounds, so the mixed-layout
    * candidate probe proves no old partition can hold a batch key and
    * the old dirs carry BYTE-IDENTICAL (REQUIRED: same rel dirs in the
    * v2 manifest, both layouts present); v3 upserts tripled n_chars
    * for doc_id < 50 under the new spec — those keys DO live under the
    * old layout, so the overlapping old partitions restage through the
    * merge and their survivors migrate to by-language dirs (REQUIRED:
    * the v3 manifest is pure new-layout — lazy migration completed
    * because every source group's id range overlaps [0,50)). The
    * oracle is the plain restatement with the CASE'd n_chars, so
    * equality proves the whole mixed-layout lifecycle — spec change,
    * union read over two layouts, cross-layout dedup — is invisible
    * in the data. */
  def mergeEvolveSpecQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_evolve_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"),
              (substring(col("source"), 4, 10).cast("long") / 5)
                .cast("long").as("src_grp"))
    mergeUpsert(s, dir, docs.where(col("doc_id") < 300),
                "doc_id", "src_grp", statsKeys = Seq("doc_id"))     // v1
    val man1 = Versioned.manifest(s, dir, 1L).toMap
    // v2: the spec EVOLVES — same table, new partition column; the
    // append's key range sits beyond every old bound, so this commit
    // is metadata-only for the old layout
    mergeUpsert(s, dir, docs.where(col("doc_id") >= 300),
                "doc_id", "lang", statsKeys = Seq("doc_id"))        // v2
    val man2 = Versioned.manifest(s, dir, 2L)
    val oldIn2 = man2.filter(_._1.startsWith("src_grp=")).toMap
    require(oldIn2 == man1,
      "a range-disjoint append under the new spec must carry every " +
        "old-layout entry verbatim (metadata-only evolution)")
    require(man2.exists(_._1.startsWith("lang=")),
      "the new layout must land beside the old one")
    // v3: a cross-layout upsert — its keys live under the OLD layout,
    // so the candidate probe restages those partitions and their
    // survivors migrate to the new spec through the merge itself
    mergeUpsert(s, dir,
      docs.where(col("doc_id") < 50)
        .withColumn("n_chars", col("n_chars") * 3),
      "doc_id", "lang", statsKeys = Seq("doc_id"))                  // v3
    require(Versioned.manifest(s, dir, 3L)
        .forall(_._1.startsWith("lang=")),
      "every source group overlaps [0,50), so the upsert must have " +
        "migrated the whole old layout")
    readCorpus(s, dir, "lang")
      .select(col("doc_id"), col("source").cast("string").as("source"),
              col("n_chars"), col("lang").cast("string").as("lang"))
      .orderBy("doc_id")
  }

  def mergeRepartitionQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_repart_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val docs = documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
              (substring(col("source"), 4, 10).cast("long") / 5)
                .cast("long").as("src_grp"))
    mergeUpsert(s, dir, docs, "doc_id", "src_grp")                   // v1
    mergeDeleteMor(s, dir,                                           // v2
      docs.where(fold(col("doc_id")) >= 90).select("doc_id"),
      "doc_id", "src_grp")
    repartitionTable(s, dir, "src_grp", "lang",                      // v3
                     statsKeys = Seq("doc_id"))
    require(Versioned.currentVersion(s, dir).contains(3L),
      "the repartition must land as one atomic version")
    require(Versioned.readDvRefs(s, dir, 3L).isEmpty,
      "the rewrite must materialize every outstanding tombstone")
    // the feed across the move is queried with the OLD partCol: the
    // from-side is the one still carrying old-layout tombstones (the
    // rewrite materialized them all, so the to-side has none)
    require(changeFeed(s, dir, 2L, 3L, "doc_id", "src_grp").isEmpty,
      "a layout move must be content-invisible to the change feed")
    require(Versioned.readVersion(s, dir, 1L, Some("src_grp")).count() ==
        docs.count(),
      "version 1 must still time-travel under the OLD layout")
    readCorpus(s, dir, "lang")
      .select(col("doc_id"), col("lang").cast("string").as("lang"),
              col("n_chars"))
      .orderBy("doc_id")
  }

  def mergeZorderCompactQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_zocompact_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val o = orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              (col("o_custkey") / 512).cast("long").as("cb"))
    mergeUpsert(s, dir, o, "o_orderkey", "cb",
                statsKeys = Seq("o_custkey", "o_orderkey"))         // v1
    mergeDeleteMor(s, dir,                                          // v2
      o.where(fold(col("o_orderkey")) >= 90).select("o_orderkey"),
      "o_orderkey", "cb")
    compactZOrder(s, dir, "cb", ("o_custkey", "o_orderkey"),        // v3
      statsKeys = Seq("o_custkey", "o_orderkey"))
    require(Versioned.readDvRefs(s, dir, 3L).isEmpty,
      "the z-order restage must materialize every deletion vector")
    readCorpusPruned(s, dir, "cb",
        Seq(("o_custkey", 40L, 139L), ("o_orderkey", 0L, 1200L)))
      .select(col("o_orderkey"), col("o_custkey"),
              round(col("o_totalprice"), 2).as("price_r"))
      .orderBy("o_orderkey")
  }

  /** Declared merge_refresh_stats query: the shed-then-re-arm
    * lifecycle. The source-group corpus of [[scanDictmapPrunedQuery]]
    * records a source dictionary; a dict-less upsert flips the LOWEST
    * doc_id's source to 'src13' in place (same key, same partition —
    * the stable key→partition rule — so a group whose NAME never saw
    * src13 now holds one), shedding that group's dictionary;
    * [[refreshStats]] recomputes the sidecar in one live scan and a
    * manifest-carry commit. The dictionary-pruned read for 'src13'
    * must equal the oracle's restatement (source rows plus the flipped
    * doc), proving the refreshed sidecar is exact for the CURRENT
    * content — dictionaries index what partitions HOLD, not what their
    * names suggest. */
  def mergeRefreshStatsQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_refstats_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
              (substring(col("source"), 4, 10).cast("long") / 5)
                .cast("long").as("src_grp"))
    mergeUpsert(s, dir, docs, "doc_id", "src_grp",
                dictKeys = Seq("source"))                           // v1
    val flipped = readCorpus(s, dir, "src_grp").orderBy("doc_id")
      .limit(1)
      .select(col("doc_id"), lit("src13").as("source"), col("n_chars"),
              col("src_grp").cast("long").as("src_grp"))
      .localCheckpoint() // pin the pre-merge snapshot the batch derives from
    val shedGrp = "src_grp=" + flipped.collect()(0).getAs[Long]("src_grp")
    mergeUpsert(s, dir, flipped, "doc_id", "src_grp")               // v2
    require(!Versioned.readStatsDict(s, dir, 2L).contains(shedGrp),
      s"the dict-less restage must shed $shedGrp's dictionary")
    refreshStats(s, dir, "src_grp", dictKeys = Seq("source"))      // v3
    require(Versioned.readStatsDict(s, dir, 3L)
        .get(shedGrp).exists(_("source").contains("src13")),
      s"the refresh must re-arm $shedGrp's dictionary with src13")
    readCorpusDictPruned(s, dir, "src_grp",
        Seq(("source", Seq("src13"))))
      .select(col("doc_id"), col("source").cast("string").as("source"),
              col("n_chars"))
      .orderBy("doc_id")
  }

  /** Declared merge_retention query: events land in a day-partitioned
    * versioned corpus, retention expires every day before the 15th of
    * the newest month (a mid-month cutoff so the drop is non-trivial on
    * the one-month testdata), and the surviving corpus is read back.
    * The oracle filters the source table by the same cutoff, so
    * equality proves the manifest drop removed exactly the expired days
    * and nothing else. */
  def mergeRetentionQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_mergeret_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val ev = events(s, d)
      .select(col("event_id"), col("user_id"),
              date_format(col("ts"), "yyyy-MM-dd").as("day_s"))
    mergeUpsert(s, dir, ev, "event_id", "day_s")
    val cutoff = ev.agg(max("day_s")).collect()(0).getString(0)
      .substring(0, 8) + "15" // mid-month of the newest month
    applyRetention(s, dir, name => name >= s"day_s=$cutoff")
    readCorpus(s, dir, "day_s")
      .select(col("event_id"), col("user_id"),
              col("day_s").cast("string").as("day_s"))
      .orderBy("event_id")
  }

  /** Key-hash bucket column for [[mergeScd2Bucketed]]: content-stable
    * (xxhash64 of the key), so a key's rows land in the same bucket in
    * every batch, session, and JVM — the property that makes
    * bucket-pruned restaging sound. */
  private def keyBucket(keyCol: String, buckets: Int): Column =
    pmod(xxhash64(col(keyCol)), lit(buckets))

  /** The warehouse-scale form of [[mergeScd2]] — the partitioned rewrite
    * the flat version's doc promises: the history is hash-bucketed on
    * the key into `buckets` partitions, change detection reads only the
    * buckets the batch's keys hash into (manifest-pruned, like
    * [[mergeUpsert]]), and only those buckets restage under the next
    * version — cost per merge ∝ touched-bucket bytes + batch bytes,
    * independent of history size. Same diff semantics, same fail-fast
    * key-uniqueness guard, same atomic publish; the bucket column is
    * internal bookkeeping and never reaches [[readBucketedHistory]]
    * output. A full-dimension batch touches every bucket (= the flat
    * rewrite); the win is the common case — small change batches. */
  def mergeScd2Bucketed(s: SparkSession, historyDir: String,
                        changes: DataFrame, keyCol: String,
                        attrCols: Seq[String], version: Long,
                        buckets: Int = 16): Unit = {
    val BCol = "kb"
    val outCols = (keyCol +: attrCols) ++ Seq("valid_from", "valid_to", BCol)
    val dupKeys = changes.groupBy(keyCol).agg(count(lit(1)).as("n"))
      .where(col("n") > 1).limit(5).collect()
    require(dupKeys.isEmpty,
      s"mergeScd2Bucketed: changes batch has duplicate $keyCol values " +
        s"(e.g. ${dupKeys.map(_.get(0)).mkString(", ")})")
    val batch = changes.withColumn(BCol, keyBucket(keyCol, buckets))
    Versioned.currentVersion(s, historyDir) match {
      case None =>
        val nv = 1L  // OCC: snapshot+1, see mergeUpsert
        val stageRel = Versioned.newStageRel(nv)
        batch.withColumn("valid_from", lit(version))
          .withColumn("valid_to", lit(null).cast("long"))
          .selectExpr(outCols: _*)
          .write.mode("overwrite").partitionBy(BCol)
          .parquet(s"$historyDir/$stageRel")
        Versioned.publish(s, historyDir, nv,
          Versioned.listStagedPartDirs(s, historyDir, stageRel, BCol))
      case Some(v) =>
        // Bounded driver-side list: ≤ `buckets` values, the manifest-
        // pruning predicate for both the diff read and the restage.
        val touched = batch.select(BCol).distinct().collect()
          .map(_.get(0)).toSeq
        if (touched.isEmpty) return
        val man = Versioned.manifest(s, historyDir, v)
        val names = touched.map(Versioned.partDirName(BCol, _)).toSet
        val entries = man.filter(e => names.contains(e._1))
        val slice =
          if (entries.isEmpty) {
            // brand-new buckets only: nothing to diff against
            batch.withColumn("valid_from", lit(version))
              .withColumn("valid_to", lit(null).cast("long"))
              .selectExpr(outCols: _*)
          } else {
            val hist = Versioned.readEntries(s, historyDir, entries, Some(BCol))
            val open = hist.where(col("valid_to").isNull)
            val diff = batch.alias("c")
              .join(open.alias("o"),
                    col(s"c.$keyCol") === col(s"o.$keyCol"), "left")
              .where(col(s"o.$keyCol").isNull ||
                     attrCols.map(a => !(col(s"c.$a") <=> col(s"o.$a")))
                       .reduce(_ || _))
              .select(col(s"c.$keyCol").as(keyCol) +:
                      (attrCols.map(a => col(s"c.$a").as(a)) :+
                       col(s"c.$BCol").as(BCol)): _*)
            if (diff.isEmpty) return
            val diffKeys = diff.select(keyCol)
            hist.where(col("valid_to").isNotNull)
              .unionByName(open.join(diffKeys, Seq(keyCol), "left_anti"))
              .unionByName(open.join(diffKeys, Seq(keyCol), "left_semi")
                             .withColumn("valid_to", lit(version)))
              .unionByName(diff.withColumn("valid_from", lit(version))
                             .withColumn("valid_to", lit(null).cast("long")))
              .selectExpr(outCols: _*)
          }
        val nv = v + 1  // OCC: snapshot+1, see mergeUpsert
        val stageRel = Versioned.newStageRel(nv)
        slice.write.mode("overwrite").partitionBy(BCol)
          .parquet(s"$historyDir/$stageRel")
        val staged = Versioned.listStagedPartDirs(s, historyDir, stageRel,
                                                  BCol)
        val stagedNames = staged.map(_._1).toSet
        Versioned.publish(s, historyDir, nv,
          man.filterNot(e => stagedNames.contains(e._1)) ++ staged)
    }
  }

  /** Read the bucketed history WITHOUT the internal bucket column. */
  def readBucketedHistory(s: SparkSession, historyDir: String,
                          keyCol: String, attrCols: Seq[String]): DataFrame =
    Versioned.readCurrent(s, historyDir, Some("kb"))
      .selectExpr((keyCol +: attrCols) ++ Seq("valid_from", "valid_to"): _*)

  /** Declared merge_scd2_bucketed query: the [[mergeScd2Query]] pipeline
    * run through the bucket-pruned merge — same versions, same double
    * apply, same oracle: hash-bucketing is REQUIRED to be invisible in
    * the history content, and sharing the flat oracle enforces it. */
  def mergeScd2BucketedQuery(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_scd2b_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = customer(s, d).select(
      col("c_custkey"), col("c_mktsegment"),
      round(col("c_acctbal"), 2).as("c_acctbal_r"))
    val attrs = Seq("c_mktsegment", "c_acctbal_r")
    mergeScd2Bucketed(s, dir, base, "c_custkey", attrs, version = 0L)
    val batch = base.withColumn("c_mktsegment",
        when(pmod(col("c_custkey"), lit(2)) === 1,
             concat(lit("V2_"), col("c_mktsegment")))
          .otherwise(col("c_mktsegment")))
      .withColumn("c_acctbal_r",
        when(pmod(col("c_custkey"), lit(2)) === 1,
             round(col("c_acctbal_r") + 100, 2))
          .otherwise(col("c_acctbal_r")))
    mergeScd2Bucketed(s, dir, batch, "c_custkey", attrs, version = 1L)
    mergeScd2Bucketed(s, dir, batch, "c_custkey", attrs, version = 1L)
    readBucketedHistory(s, dir, "c_custkey", attrs)
      .orderBy("c_custkey", "valid_from")
  }

  /** Declared merge_scd2 query: customer history at version 0, a change
    * batch at version 1 (odd keys move segment + balance), applied TWICE
    * — the second application must be a no-op — then the full history
    * read back. The oracle replays the same pure function of the source
    * table: every customer's v0 row (closed iff the key changed) plus a
    * v1 open row for the changed keys. */
  def mergeScd2Query(s: SparkSession, d: String): DataFrame = {
    val key = d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_scd2_$key").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = customer(s, d).select(
      col("c_custkey"), col("c_mktsegment"),
      round(col("c_acctbal"), 2).as("c_acctbal_r"))
    val attrs = Seq("c_mktsegment", "c_acctbal_r")
    mergeScd2(s, dir, base, "c_custkey", attrs, version = 0L)
    val batch = base.withColumn("c_mktsegment",
        when(pmod(col("c_custkey"), lit(2)) === 1,
             concat(lit("V2_"), col("c_mktsegment")))
          .otherwise(col("c_mktsegment")))
      .withColumn("c_acctbal_r",
        when(pmod(col("c_custkey"), lit(2)) === 1,
             round(col("c_acctbal_r") + 100, 2))
          .otherwise(col("c_acctbal_r")))
    mergeScd2(s, dir, batch, "c_custkey", attrs, version = 1L)
    mergeScd2(s, dir, batch, "c_custkey", attrs, version = 1L)
    readHistory(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal_r"),
              col("valid_from"), col("valid_to"))
      .orderBy("c_custkey", "valid_from")
  }
}
