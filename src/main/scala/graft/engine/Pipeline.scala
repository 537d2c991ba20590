package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thin map-reduce façade over DataFrame — the engine's public pipeline
  * API, mirroring the reference framework's verbs (map / filter / flatMap /
  * keyBy+reduce / join / sink) onto declarative Spark (SURVEY §3.2).
  *
  * Every verb only appends to the logical plan; nothing executes until a
  * sink/action. Catalyst therefore sees the whole pipeline and can push
  * filters into scans, prune columns, and choose join strategies — the
  * reason this is a façade and not an operator runtime. */
final case class Pipeline(df: DataFrame) {

  /** map: per-record projection (expressions, not lambdas — codegen). */
  def map(cols: Column*): Pipeline = Pipeline(df.select(cols: _*))

  /** filter: keep records matching the predicate. */
  def filter(cond: Column): Pipeline = Pipeline(df.where(cond))

  /** flatMap: one-to-many on an array expression; other columns kept. */
  def flatMap(arrayExpr: Column, as: String): Pipeline =
    Pipeline(df.withColumn(as, explode(arrayExpr)))

  /** reduceByKey: groupBy + aggregates (map-side partial combine free). */
  def reduceByKey(keys: Seq[String], aggs: Column*): Pipeline =
    Pipeline(df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*))

  /** join by key columns. */
  def join(other: Pipeline, on: Seq[String], how: String = "inner"): Pipeline =
    Pipeline(df.join(other.df, on, how))

  def sort(cols: Column*): Pipeline = Pipeline(df.orderBy(cols: _*))
  def limit(n: Int): Pipeline = Pipeline(df.limit(n))
  def distinct(): Pipeline = Pipeline(df.distinct())
  def union(other: Pipeline): Pipeline = Pipeline(df.unionAll(other.df))

  /** sample: content-stable hash fold on `key`, NOT RNG state — re-runs
    * and late-arriving shards keep identical membership (the same family
    * as TextOps.dataSplit / sampleSeeded). */
  def sample(key: Column, fraction: Double): Pipeline =
    Pipeline(df.where(
      pmod(xxhash64(key), lit(10000L)) < (fraction * 10000).toLong))

  /** cache: pin this pipeline stage for interactive re-query (SURVEY
    * §7.5). Spark's lazy MEMORY_AND_DISK cache — the first action
    * materializes, later queries over the same stage read the cached
    * columnar batches (InMemoryTableScan) instead of recomputing. */
  def cache(): Pipeline = Pipeline(df.cache())

  /** Drop this stage's cached data (no-op if never cached). */
  def unpersist(): Pipeline = Pipeline(df.unpersist())

  /** checkpoint: truncate the lineage by materializing to local disk —
    * the restart-safe variant of cache for long iterative pipelines
    * (a 100-stage plan re-optimized per action is itself a cost). */
  def localCheckpoint(): Pipeline = Pipeline(df.localCheckpoint())

  /** sink: parquet write (the default action).
    *
    * `partitionBy` produces Hive-style `col=value/` directories so later
    * reads with a predicate on those columns prune at PLANNING time
    * (`PartitionFilters` in the scan — no footers of skipped partitions
    * are even opened). At 100 TB the write layout is half the job: a
    * date/source-partitioned corpus turns "last day" queries from a full
    * scan into a single-directory read.
    *
    * `maxRecordsPerFile` bounds output file size so one skewed partition
    * cannot produce a multi-GB file (small-file/large-file balance is set
    * by the writer, not left to chance). */
  def sink(path: String, partitionBy: Seq[String] = Nil,
           maxRecordsPerFile: Long = 0L): Unit = {
    var w = df.write.mode("overwrite")
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    w.parquet(path)
  }

  /** sink to a bucketed catalog table: rows are hash-distributed into
    * `buckets` files per partition by `bucketCols`, so equi-joins and
    * aggregations on those columns skip the shuffle entirely (the read
    * side of this contract is proven by joinBucketed's no-Exchange plan).
    * Bucketed layout requires the catalog (bucket metadata lives in table
    * properties, not the parquet files), hence saveAsTable not parquet(). */
  def sinkBucketed(table: String, bucketCols: Seq[String], buckets: Int,
                   sortCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }
  /** sink with Z-order (Morton) layout: rows are range-distributed and
    * sorted by the bit-interleaved key of two columns before writing, so
    * parquet row-group min/max stats stay tight on BOTH columns at once —
    * a reader filtering on EITHER column skips most files/row groups,
    * where a plain sort keeps only its leading column clustered (the
    * trailing column's per-file range stays ≈ the full domain). This is
    * the multi-dimensional half of the layout story that `partitionBy`
    * (planning-time pruning) and `sinkBucketed` (shuffle-free joins)
    * don't cover.
    *
    * Each column is first scaled to a 16-bit rank using its global
    * min/max — one tiny 1-row aggregate up front (the same pre-pass a
    * table-layout OPTIMIZE job runs; it never touches the driver beyond
    * two scalars per column) — then the 32-bit Morton key interleaves the
    * bits via a codegen'd shift/or expression. `repartitionByRange` on
    * the key gives contiguous, balanced files (range exchange samples —
    * no global sort), and `sortWithinPartitions` orders rows inside each
    * file for row-group-level skipping. */
  def sinkZOrder(path: String, zCols: (String, String),
                 files: Int = 0): Unit = {
    val (ca, cb) = zCols
    val mm = df.agg(min(col(ca)).cast("double"), max(col(ca)).cast("double"),
                    min(col(cb)).cast("double"), max(col(cb)).cast("double"))
      .head()
    // Empty input / all-null z-columns: min/max are null — there is
    // nothing to cluster, so write as-is instead of NPE-ing on getDouble.
    if (mm.isNullAt(0) || mm.isNullAt(2)) {
      val plain = if (files > 0) df.repartition(files) else df
      plain.write.mode("overwrite").parquet(path)
      return
    }
    val z = Pipeline.mortonKey(col(ca), col(cb),
      mm.getDouble(0), mm.getDouble(1), mm.getDouble(2), mm.getDouble(3))
    val keyed = df.withColumn("__z", z)
    val parts = if (files > 0) files else df.sparkSession
      .conf.get("spark.sql.shuffle.partitions").toInt
    keyed.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  def sinkCsv(path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
  def sinkJson(path: String): Unit =
    df.write.mode("overwrite").json(path)
  def sinkOrc(path: String): Unit =
    df.write.mode("overwrite").orc(path)
}

object Pipeline {
  def source(s: SparkSession, path: String): Pipeline =
    Pipeline(s.read.parquet(path))

  /** The 32-bit Morton (Z-order) key of two columns, each scaled to a
    * 16-bit rank by its given GLOBAL bounds, interleaved with a pure
    * codegen'd shift/or chain — the layout key [[Pipeline!.sinkZOrder]]
    * sorts by, exposed so other writers (the versioned store's z-order
    * compaction) share the exact interleave. Callers supply the bounds
    * from their own one-row pre-aggregate; a degenerate span (hi ≤ lo)
    * collapses that column's rank to a constant, which is correct — a
    * single-valued column contributes nothing to clustering. */
  def mortonKey(a: Column, b: Column, aLo: Double, aHi: Double,
                bLo: Double, bHi: Double): Column = {
    def scaled(c: Column, lo: Double, hi: Double): Column = {
      val span = if (hi > lo) hi - lo else 1.0
      least(lit(65535),
        floor((c.cast("double") - lit(lo)) / lit(span) * 65536))
        .cast("int")
    }
    val ra = scaled(a, aLo, aHi)
    val rb = scaled(b, bLo, bHi)
    (0 until 16).map { i =>
      shiftleft(shiftright(ra, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(rb, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Compact a parquet directory: rewrite `path` into `outPath` with
    * ~`targetRecordsPerFile` rows per file. Long-running ingest leaves
    * thousands of small files per partition (one per micro-batch task);
    * every later scan then pays open/footer/seek costs per file and the
    * driver pays listing+planning per file — at 100 TB the metadata walk
    * alone can dominate short queries. Coalescing via `repartition`
    * (round-robin, no key) keeps sizes balanced without skew
    * sensitivity; row order is not preserved (parquet readers make no
    * order promise; layout-sensitive data should use
    * [[Pipeline!.sinkZOrder]]). Content equality under re-sort is the
    * unit-test contract. */
  def compact(s: SparkSession, path: String, outPath: String,
              targetRecordsPerFile: Long = 1000000L): Unit = {
    val in = s.read.parquet(path)
    val n = in.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRecordsPerFile).toInt)
    in.repartition(files).write.mode("overwrite").parquet(outPath)
  }
  def csv(s: SparkSession, path: String, header: Boolean = true): Pipeline =
    Pipeline(s.read.option("header", header.toString)
      .option("inferSchema", "true").csv(path))
  def json(s: SparkSession, path: String): Pipeline =
    Pipeline(s.read.json(path))
  def orc(s: SparkSession, path: String): Pipeline =
    Pipeline(s.read.orc(path))
}
