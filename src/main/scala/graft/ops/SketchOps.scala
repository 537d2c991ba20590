package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Sketch-based aggregates (SURVEY §2 extension, round 6): count-min
  * frequency estimation and Misra-Gries heavy hitters — the streaming-
  * summary tier for skewed event streams where an exact groupBy over the
  * full key space is the bottleneck. Both sketches are mergeable (map-side
  * partial aggregation compresses each partition to fixed-size state), so
  * the shuffle carries O(sketch) bytes per partition regardless of n.
  *
  * On the testdata both run in their EXACT regime (item cardinality below
  * sketch capacity: 5 event types vs w=2048 cells, 31 words vs m=64
  * counters), so the declared queries carry ordinary SQL count oracles;
  * the approximate/compression paths are property-tested in Wave8Spec on
  * synthetic skewed streams. */
object SketchOps {

  private[graft] val CmsD = 4     // count-min rows
  private[graft] val CmsW = 2048  // count-min cells per row

  /** The d per-row hashes for an item, as builtin xxhash64 calls — the
    * same expression serves build and probe, so the probe needs no custom
    * scalar function. */
  private[graft] def cmsHashes(x: Column, d: Int = CmsD): Column =
    array((0 until d).map(i => xxhash64(lit(i), x)): _*)

  /** Probe: min over rows of the item's cell — `least` over d
    * element_at lookups (1-based). */
  private[graft] def cmsEstimate(sk: Column, x: Column,
                                 d: Int = CmsD, w: Int = CmsW): Column = {
    val cells = (0 until d).map(i =>
      element_at(sk, (lit(i * w) + pmod(xxhash64(lit(i), x), lit(w)) +
                      lit(1)).cast("int")))
    least(cells: _*)
  }

  /** Count-min frequency per event type: ONE global d×w sketch over the
    * stream (a single-row aggregate, partials merged map-side), then each
    * distinct type probes the broadcast sketch. At 100 TB the sketch build
    * is a full scan but the shuffle is d·w longs per partition — the
    * groupBy(item) it replaces shuffles every distinct key. Exact on this
    * data (5 types, no cell collisions under the fixed hash draw), hence
    * the SQL count oracle. */
  def aggCmsFreq(s: SparkSession, d: String): DataFrame = {
    graft.functions.Sketches.register(s)
    graft.functions.KnnVote.raiseHashAggFallback(s)
    val ev = events(s, d)
    val sk = ev.select(cmsHashes(col("event_type")).as("hs"))
      .agg(expr(s"graft_cms(hs, $CmsD, $CmsW)").as("sk"))
    ev.select("event_type").distinct()
      .crossJoin(broadcast(sk))
      .select(col("event_type"),
              cmsEstimate(col("sk"), col("event_type")).as("est_count"))
      .orderBy("event_type")
  }

  /** Misra-Gries top-20 words over the corpus token stream with m=64
    * counters. m exceeds the corpus vocabulary here, so the summary is
    * exact (the oracle is plain count/order/limit SQL); at real scale the
    * same plan keeps every word with frequency > n/(m+1) while the
    * aggregation state stays m counters per partition instead of a cell
    * per distinct word. */
  def aggTopfreqWords(s: SparkSession, d: String): DataFrame = {
    graft.functions.Sketches.register(s)
    graft.functions.KnnVote.raiseHashAggFallback(s)
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(expr("graft_topfreq(token, 64)").as("tf"))
      .select(explode(col("tf")).as("e"))
      .select(col("e.item").as("token"), col("e.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(20)
  }

  /** Mergeable distinct-count sketches (Apache DataSketches HLL, built
    * into Spark 4): one HLL sketch PER SOURCE SHARD, then a sketch-union
    * roll-up to the corpus-wide distinct-token estimate. This is the
    * standing pattern for cardinality bookkeeping at 100 TB — each
    * ingest batch persists its own tiny sketch (here: per-source rows),
    * and any cross-slice distinct count is a union of sketches, never a
    * re-scan of the data. Binary-identical to sketching the whole corpus
    * in one pass (union is the SAME merge the partial aggregation runs
    * internally) — that associativity is the Wave9 property test. No SQL
    * oracle: DuckDB has no DataSketches HLL (the estimate differs from
    * exact COUNT DISTINCT by design), same no-oracle tier as
    * agg_approx_distinct. */
  /** Mergeable quantiles (DataSketches KLL): corpus-wide p50/p90/p99 of
    * document token length from ONE single-row aggregate whose partial
    * state is an O(k·log n) sketch per partition — the 100 TB replacement
    * for exact global percentiles (no sort, no value shuffle; each
    * ingest batch could persist its sketch and any slice's quantiles
    * union from sketches, like the HLL roll-up). No SQL oracle — the
    * estimate is approximate by design (same tier as
    * agg_approx_distinct); Wave10 pins the estimates inside the exact
    * ±3%-rank envelope and exercises merge across a forced repartition. */
  def aggKllQuantiles(s: SparkSession, d: String): DataFrame = {
    graft.functions.Sketches.register(s)
    graft.functions.KnnVote.raiseHashAggFallback(s)
    documents(s, d)
      .select(size(split(col("text"), " ")).cast("double").as("len"))
      .agg(expr("graft_kll(len, 200, array(0.5D, 0.9D, 0.99D))").as("q"))
      .select(round(element_at(col("q"), 1), 2).as("p50_est"),
              round(element_at(col("q"), 2), 2).as("p90_est"),
              round(element_at(col("q"), 3), 2).as("p99_est"))
  }

  /** Theta sketch set algebra (DataSketches): distinct-token counts of
    * two corpus slices AND their intersection / difference — the set
    * question HLL cannot answer (HLL unions only). Each slice compresses
    * to one mergeable sketch in the partial aggregation; the set algebra
    * runs on two sketch blobs in the final projection. At 100 TB each
    * ingest batch persists its sketch and any cross-slice overlap
    * question ("how many tokens does crawl B add over crawl A?") is
    * sketch algebra, never a re-scan. The corpus vocabulary sits far
    * below the 4096-entry nominal threshold, so the sketches are in
    * EXACT mode and the declared query carries an ordinary COUNT
    * DISTINCT / INTERSECT / EXCEPT oracle (the CMS/Misra-Gries
    * exact-regime pattern); the sampling regime is property-tested in
    * Wave11 on a synthetic high-cardinality stream. */
  def aggThetaSets(s: SparkSession, d: String): DataFrame = {
    graft.functions.Sketches.register(s)
    graft.functions.KnnVote.raiseHashAggFallback(s)
    val toks = documents(s, d)
      .select((col("doc_id") % 2 === 0).as("even_doc"),
              explode(split(col("text"), " ")).as("token"))
    toks.groupBy("even_doc")
      .agg(expr("graft_theta(token)").as("sk"))
      .agg(first(when(col("even_doc"), col("sk")), ignoreNulls = true)
             .as("ska"),
           first(when(!col("even_doc"), col("sk")), ignoreNulls = true)
             .as("skb"))
      .select(expr("graft_theta_est(ska)").as("n_even"),
              expr("graft_theta_est(skb)").as("n_odd"),
              expr("graft_theta_setop(ska, skb, 'intersect')").as("n_both"),
              expr("graft_theta_setop(ska, skb, 'anotb')").as("n_even_only"))
  }

  def aggHllUnion(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy("source")
      .agg(hll_sketch_agg(col("token")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
             .as("distinct_tokens_est"))

  /** Rolling 7-day distinct users per day — the mergeable-sketch answer
    * to overlapping-window distinct. Exact rolling distinct at 100 TB
    * recomputes each day's users 7× (overlapping frames defeat partial
    * aggregation); here the raw volume collapses ONCE into a per-day HLL
    * sketch and each output row merges 7 sketches (register-wise max —
    * commutative, so window merge order can't change the estimate).
    * Deterministic (DataSketches HLL has no random state), but no SQL
    * oracle: DuckDB's approx_count_distinct is a different HLL; the spec
    * bounds the estimate against the exact rolling distinct instead. */
  /** Exact oracle twin of [[winRollingDistinct]], calendar semantics:
    * distinct users over the trailing 7 CALENDAR days of each observed
    * day. The classic exact-rolling-distinct expansion — each (day,
    * user) row contributes to the 7 output days it can be seen from
    * (a fixed 7× blowup of the already-collapsed distinct table), then
    * one count-distinct per output day. That 7× is exactly what the
    * sketch twin deletes at 100 TB; here it is the hash-matchable
    * baseline. All integer/date math. */
  def winRollingDistinctExact(s: SparkSession, d: String): DataFrame = {
    val du = events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val obs = du.select("day").distinct().withColumnRenamed("day", "rday")
    du.select(explode(expr("sequence(day, date_add(day, 6), interval 1 day)"))
        .as("rday"), col("user_id"))
      .join(obs, Seq("rday"), "left_semi")
      .groupBy("rday")
      .agg(countDistinct("user_id").as("users_7d"))
      .select(col("rday").cast("timestamp_ntz").as("day"), col("users_7d"))
      .orderBy("day")
  }

  def winRollingDistinct(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
           count(lit(1)).as("n_events"))
      .select(col("day").cast("timestamp_ntz").as("day"), col("n_events"),
              hll_sketch_estimate(hll_union_agg(col("sk")).over(fr))
                .as("users_7d_est"))
      .orderBy("day")
  }

  /** EXACT rolling 7-calendar-day distinct users via per-day BITMAPS —
    * the third member of the rolling-distinct family, strictly dominating
    * the other two where its domain contract holds:
    * [[winRollingDistinctExact]] expands every (day, user) row 7× before
    * its count-distinct (the hash-matchable baseline; that 7× is the
    * scale cost), and [[winRollingDistinct]] merges HLL sketches (fixed
    * memory, any id space — but ±estimate error). Per-day bitmaps merge
    * over a RANGE frame on the day number (true calendar window, gap-
    * proof) with word-wise OR: raw volume collapses ONCE at the day agg,
    * each output day unions ≤7 bitmaps, and the count is exact. Same
    * oracle as the expansion form — the result contract is identical. */
  def winRollingDistinctBitmap(s: SparkSession, d: String): DataFrame = {
    graft.functions.Sketches.register(s)
    graft.functions.KnnVote.raiseHashAggFallback(s)
    import org.apache.spark.sql.expressions.Window
    val fr = Window.orderBy("dnum").rangeBetween(-6, 0)
    events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("graft_bitmap(user_id)").as("bm"))
      .withColumn("dnum", unix_date(col("day")))
      .select(col("day").cast("timestamp_ntz").as("day"),
              call_function("graft_bitmap_card",
                expr("graft_bitmap_union(bm)").over(fr)).as("users_7d"))
      .orderBy("day")
  }

  /** Exact distinct users per event type via the native dense-bitmap
    * aggregate (`graft_bitmap_distinct`, BitmapAgg.scala) — the
    * ClickHouse/Doris bitmap pattern. `count(DISTINCT user_id)` plans as
    * a two-phase expand: the fact table's (type, user_id) pairs are
    * shuffled BEFORE deduplication, so the wire cost scales with the raw
    * distinct-pair volume. The bitmap partial agg dedups inside each map
    * task and ships one |domain|/8-byte bitmap per (partition, group);
    * merge is word-wise OR (order-proof). Exact — unlike the HLL twin
    * (`agg_approx_distinct`) — whenever ids live in a dense bounded
    * domain, which dense surrogate user keys do by construction.
    * Cross-checked against the plain count-distinct oracle. */
  def aggBitmapDistinct(s: SparkSession, d: String): DataFrame = {
    graft.functions.Sketches.register(s)
    graft.functions.KnnVote.raiseHashAggFallback(s)
    events(s, d)
      .groupBy("event_type")
      .agg(expr("graft_bitmap_distinct(user_id)").as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }
}
