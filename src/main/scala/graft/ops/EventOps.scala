package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Event-time operators over `events` (SURVEY.md §2.H). Spark's window()
  * and session_window() aggregates run identically in batch mode, so the
  * declared queries here are batch (oracle-checkable); the streaming
  * machinery (watermarks, state) lives in graft.streaming and is unit-tested
  * with MemoryStream (T3, no oracle). */
object EventOps {

  /** 1-hour tumbling window: count + sum(value) per event_type.
    * Same plan in readStream mode; at scale this is one shuffle over
    * (window, event_type) with partial aggregation. */
  def streamTumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value_r"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("cnt"), col("sum_value_r"))
      .orderBy("win_start", "event_type")

  /** 1-hour window sliding every 30 minutes — each event lands in two
    * windows. Identical plan under readStream. */
  def streamSliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value_r"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("cnt"), col("sum_value_r"))
      .orderBy("win_start", "event_type")

  /** Per-event session ASSIGNMENT — the event→session-id mapping that
    * joins raw events onto [[streamSession]]'s per-session aggregates
    * downstream. Islands construction: an event opens a new session when
    * its gap from the previous event is >= 30 min (same comparison as
    * session_window's merge rule, SURVEY §7.4.2); the running count of
    * opens is the session ordinal. One shuffle on user_id, two window
    * passes over the same sort — Catalyst fuses them into a single
    * Window node. event_id tie-breaks equal timestamps so the running
    * sum is frame-deterministic. */
  def winSessionize(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("opens",
        when(col("prev_ts").isNull ||
               col("ts") >= col("prev_ts") + expr("INTERVAL 30 MINUTES"),
             1L).otherwise(0L))
      .withColumn("session_id",
        sum("opens").over(w.rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("ts"), col("session_id"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Interval×interval overlap join — the operator class join_theta_range
    * (point-in-range) doesn't cover. Left: per-user sessions (the
    * win_sessionize islands collapsed to [first_ts, last_ts]); right: the
    * 24 globally busiest hours (cnt DESC, hour tiebreak — a fixed-N
    * semantic that scales, where any fixed count threshold drifts with
    * corpus size). A session matches every busy hour it overlaps.
    * Instead of an inequality join (BNLJ at scale), each session explodes
    * to the hour buckets it covers — bounded by ceil(span/bucket) — and
    * the join is plain hash-equi on the bucket; busy hours are
    * bucket-aligned, so bucket equality IS the overlap predicate: no
    * residual condition, no duplicate pairs. Both sides collapse before
    * the join (sessions to one row per island, hours to a 24-row
    * TakeOrdered that broadcasts). */
  def joinIntervalOverlap(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("opens",
        when(col("prev_ts").isNull ||
               col("ts") >= col("prev_ts") + expr("INTERVAL 30 MINUTES"),
             1L).otherwise(0L))
      .withColumn("session_id",
        sum("opens").over(w.rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("s_start"), max("ts").as("s_end"))
    val busy = events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("hour_cnt"))
      .orderBy(col("hour_cnt").desc, col("hour"))
      .limit(24)
    sessions
      .select(col("user_id"), col("session_id"), col("s_start"),
        explode(expr("""sequence(date_trunc('hour', s_start),
                                 date_trunc('hour', s_end),
                                 interval 1 hour)""")).as("hour"))
      .join(broadcast(busy), Seq("hour"))
      .select(col("user_id"), col("session_id"),
              col("s_start").cast("timestamp_ntz").as("s_start"),
              col("hour").cast("timestamp_ntz").as("hour"),
              col("hour_cnt"))
      .orderBy("user_id", "session_id", "hour")
  }

  /** Self interval-overlap within a partition key: pairs of the SAME
    * customer's orders whose fulfillment intervals [orderdate, last
    * shipdate] overlap — concurrent-order detection. This is the
    * PARTITIONED form of the interval-join family (complementing
    * [[joinIntervalOverlap]]'s bucket-expanded global form): the join is
    * plain hash-equi on the customer key and the overlap predicate is a
    * cheap post-shuffle residual, so pair fan-out is bounded by each
    * customer's own order count, never corpus-wide. okey_a < okey_b
    * canonicalizes pairs; date/int arithmetic only. Skewed mega-customers
    * at scale → the AQE skew-join split pinned in Wave8Spec. */
  def joinOverlapSelf(s: SparkSession, d: String): DataFrame = {
    val iv = graft.engine.Tables.orders(s, d)
      .join(graft.engine.Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("o_orderkey").as("okey"))
      .agg(min("o_orderdate").as("d0"), max("l_shipdate").as("d1"))
    iv.as("a").join(iv.as("b"),
        col("a.cust") === col("b.cust") &&
        col("a.okey") < col("b.okey") &&
        col("a.d0") <= col("b.d1") && col("b.d0") <= col("a.d1"))
      .select(col("a.cust").as("custkey"),
              col("a.okey").as("okey_a"), col("b.okey").as("okey_b"),
              greatest(col("a.d0"), col("b.d0")).cast("timestamp_ntz")
                .as("ov_start"),
              least(col("a.d1"), col("b.d1")).cast("timestamp_ntz")
                .as("ov_end"))
      .orderBy("custkey", "okey_a", "okey_b")
  }

  /** Event-sequence (funnel) detection: click→purchase conversions per
    * user, where the purchase follows the click within 30 minutes — the
    * MATCH_RECOGNIZE-style pattern query expressed with lead() over the
    * per-user event order (Spark has no MATCH_RECOGNIZE; adjacent-pair
    * windows cover the two-step funnel with one user_id shuffle). Output
    * keeps only converting users, with their click and conversion
    * counts. */
  def winFunnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .withColumn("next_ts", lead("ts", 1).over(w))
      .groupBy("user_id")
      .agg(count(when(col("event_type") === "click", 1)).as("n_clicks"),
           count(when(col("event_type") === "click" &&
                        col("next_type") === "purchase" &&
                        col("next_ts") <=
                          col("ts") + expr("INTERVAL 30 MINUTES"),
                      1)).as("n_conversions"))
      .where(col("n_conversions") > 0)
      .orderBy("user_id")
  }

  /** Cohort retention: users are cohorted by their first active day; each
    * (cohort_day, day_offset) cell counts the distinct cohort members
    * active that many days later — the classic retention triangle. One
    * user_id shuffle folds each user to their distinct-day set (map-side
    * partial collect_set bounds state at the corpus day span), cohort =
    * array_min — no window sort, no events self-join. Exploding that set
    * makes every (cohort, offset, user) row unique BY CONSTRUCTION, so
    * the distinct-actives count is a plain count: the count_distinct
    * two-phase expansion never appears and the whole triangle costs
    * 3 exchanges (user fold, cell agg, determinism sort). At 100 TB
    * nothing after the first partial agg touches raw-event volume. */
  def winRetention(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id")
      .agg(collect_set(to_date(col("ts"))).as("days"))
      .select(array_min(col("days")).as("cohort_day"),
              explode(col("days")).as("day"))
      .groupBy(col("cohort_day"),
               datediff(col("day"), col("cohort_day")).as("offset_days"))
      .agg(count(lit(1)).as("n_active"))
      // timestamp_ntz, not date: the comparator's pandas read path turns a
      // date32 column into python-date objects (and a zoned timestamp into
      // tz-aware ones) and hash-mismatches the oracle's naive datetime64.
      .select(col("cohort_day").cast("timestamp_ntz").as("cohort_day"),
              col("offset_days"), col("n_active"))
      .orderBy("cohort_day", "offset_days")

  /** Gap-based sessionization (30-min gap) per user. session_window end =
    * last event + gap; a new session starts when ts >= prev + gap (merge
    * requires strict overlap) — the oracle's island emulation uses the same
    * comparison (SURVEY §7.4.2). Runs identically over a stream with
    * watermark + mergeable session state. */
  def streamSession(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value_r"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"), col("n_events"),
              col("sum_value_r"))
      .orderBy("user_id", "session_start")

  /** Time-series resample + gap-fill: per-user daily purchase totals
    * re-gridded onto a dense min→max day axis, missing days forward-
    * filled from the last observed value (`is_observed` keeps the real/
    * imputed distinction). The raw event scan collapses to (user, day)
    * cardinality in the FIRST shuffle's partial agg; the dense grid is a
    * narrow per-user `sequence` explode off the span aggregate, and the
    * grid⋈daily join plus the fill window both reuse user_id keys — at
    * 100 TB the grid side is tiny (users × span days) and nothing after
    * the first agg touches raw-event volume. */
  def tsGapfill(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (grid, daily) = denseDailyGrid(s, d)
    val fill = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"),
              col("day").cast("timestamp_ntz").as("day"),
              last(col("day_value"), ignoreNulls = true).over(fill)
                .as("value_ff"),
              col("day_value").isNotNull.as("is_observed"))
      .orderBy("user_id", "day")
  }

  /** (dense per-user day grid, observed daily purchase sums) — the shared
    * regrid substrate for [[tsGapfill]] and [[tsInterpolate]]. */
  private def denseDailyGrid(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val daily = events(s, d)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("day_value"))
    val grid = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
              explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    (grid, daily)
  }

  /** Exponentially-weighted moving average (α=0.2, adjust=false: y₀=x₀,
    * yᵢ = αxᵢ + (1−α)yᵢ₋₁) over each user's observed daily purchase sums.
    * The recursion is evaluated as a LEFT FOLD over the per-user value
    * array — Spark's `aggregate` HOF and DuckDB's `list_reduce` both fold
    * left with the same multiply-add order, so the doubles agree
    * bit-for-bit (a closed-form Σα(1−α)^(i-j)xⱼ restatement would hang
    * cross-engine identity on libm pow ulps instead). Per-day prefix
    * folds are O(span²) per user, but the span is bounded by corpus age
    * and the work is embarrassingly parallel per user — the plan is the
    * daily partial agg, one user fold shuffle, and the determinism sort;
    * state per user is one bounded array. */
  def tsEwma(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("day_value"))
    daily
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("day"), col("day_value"))))
        .as("arr"))
      .select(col("user_id"),
              expr("transform(arr, p -> p.day)").as("days"),
              expr("transform(arr, p -> p.day_value)").as("vals"))
      .select(col("user_id"), col("days"), col("vals"),
              posexplode(col("days")).as(Seq("pos", "day")))
      .select(col("user_id"),
              col("day").cast("timestamp_ntz").as("day"),
              // CAST(FLOOR(..) AS DOUBLE): in SQL-expr form Spark's FLOOR
              // of a double yields LONG and bare 10000.0 parses as
              // DECIMAL, so the undecorated division would produce a
              // DECIMAL column (the DSL floor()/lit() path used by the
              // other ts ops sidesteps this)
              expr("""CAST(FLOOR(aggregate(slice(vals, 2, pos),
                              element_at(vals, 1),
                              (acc, x) -> double(0.2) * x + double(0.8) * acc)
                        * double(10000.0) + double(0.5)) AS DOUBLE)
                      / double(10000.0)""").as("ewma_r"))
      .orderBy("user_id", "day")
  }

  /** Rolling z-score anomaly flags over each user's observed daily
    * purchase sums: each day is scored against its trailing window of up
    * to 7 observations (6 preceding + current). The window moments (Σx,
    * Σx², n) are summed in DECIMAL — exact, order-independent integers —
    * because the two engines disagree on window-aggregate mechanics
    * (Spark re-scans each frame; DuckDB combines a segment tree) and a
    * double Σ would differ in ulps between those addition orders. The z
    * formula then runs ONCE in double with the identical op sequence on
    * both sides and is floor-quantized to 4dp. Days with fewer than 5
    * trailing observations, or a zero-variance window, score NULL (flag
    * false). Plan: daily partial agg, one user_id exchange shared by the
    * window sort, determinism sort — per-row state is the 7-row frame,
    * so the op scales with user count like the other ts queries. */
  def tsAnomaly(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(-6, Window.currentRow)
    val dec = col("day_value").cast("decimal(18,2)")
    val nd = col("n").cast("double")
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    val variance = (s2d - s1d * s1d / nd) / (nd - lit(1.0))
    val z = (col("day_value") - s1d / nd) / sqrt(variance)
    events(s, d)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("day_value"))
      .select(col("user_id"), col("day"), col("day_value"),
              sum(dec).over(fr).as("s1"),
              sum(dec * dec).over(fr).as("s2"),
              count(lit(1)).over(fr).as("n"))
      .select(col("user_id"),
              col("day").cast("timestamp_ntz").as("day"),
              col("day_value"),
              when(col("n") >= 5 && variance > lit(0.0),
                   floor(z * lit(10000.0) + lit(0.5)).cast("double")
                     / lit(10000.0)).as("z_r"))
      .select(col("user_id"), col("day"), col("day_value"), col("z_r"),
              coalesce(abs(col("z_r")) > lit(2.0), lit(false))
                .as("is_anomaly"))
      .orderBy("user_id", "day")
  }

  /** Longest consecutive-day activity streak per user (gaps-and-islands):
    * day − row_number collapses each run of consecutive days to a
    * constant anchor date, runs are counted per (user, anchor), and the
    * per-user best takes the longest run (ties → latest start, via the
    * same max-struct argmax as [[Relational.joinAsof]]). Integer/date
    * arithmetic only — no float surface. The raw event volume collapses
    * at the first distinct's partial agg; everything after is per-user
    * day counts on one user_id exchange. */
  def winStreak(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("day")
    events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
      .groupBy("user_id")
      .agg(max(struct(col("len"), col("start_day"))).as("t"))
      .select(col("user_id"), col("t.len").as("best_streak"),
              col("t.start_day").cast("timestamp_ntz").as("streak_start"))
      .orderBy("user_id")
  }

  /** Weekly OHLC downsample of each user's daily purchase sums: open =
    * first observed day's value in the ISO week, close = last, plus
    * lo/hi/count/total. open/close use min_by/max_by on the unique day
    * key — deterministic, no window sort — and the week total is summed
    * in decimal (partial-agg addition order is partition-dependent, a
    * double Σ could ulp-diverge from the oracle's). One extra partial
    * agg above the daily rollup; grouping key count shrinks ~7×, so the
    * op costs less than the daily agg it feeds on at any scale. */
  def tsResample(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("day_value"))
      .groupBy(col("user_id"),
               date_trunc("week", col("day")).cast("timestamp_ntz")
                 .as("week"))
      .agg(count(lit(1)).as("n_days"),
           min_by(col("day_value"), col("day")).as("open_v"),
           max_by(col("day_value"), col("day")).as("close_v"),
           min("day_value").as("lo_v"),
           max("day_value").as("hi_v"),
           sum(col("day_value").cast("decimal(18,2)")).cast("double")
             .as("total_v"))
      .orderBy("user_id", "week")

  /** Linear interpolation on the same dense grid: each unobserved day is
    * the distance-weighted blend of its surrounding observations (the
    * span's edges are observed by construction, so both neighbors always
    * exist). Two IGNORE-NULLS running extremes over ONE user_id sort —
    * forward last for the previous observation, backward first for the
    * next — replace any self-join of the grid against the observations;
    * same 3-exchange shape as [[tsGapfill]] at any scale. */
  def tsInterpolate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (grid, daily) = denseDailyGrid(s, d)
    val back = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("day_value"),
              last(col("day_value"), ignoreNulls = true).over(back).as("v0"),
              last(when(col("day_value").isNotNull, col("day")),
                   ignoreNulls = true).over(back).as("day0"),
              first(col("day_value"), ignoreNulls = true).over(fwd).as("v1"),
              first(when(col("day_value").isNotNull, col("day")),
                    ignoreNulls = true).over(fwd).as("day1"))
      .select(col("user_id"),
              col("day").cast("timestamp_ntz").as("day"),
              // floor(x·1e4 + 0.5)/1e4, NOT round(x, 4): Spark's round
              // re-reads the double through BigDecimal's shortest decimal
              // repr (5.216249999…→"5.21625"→5.2163) while DuckDB rounds
              // the true binary value — this formulation is the same IEEE
              // op sequence in both engines, so it cannot diverge.
              (floor((when(col("day_value").isNotNull, col("day_value"))
                .otherwise(col("v0") + (col("v1") - col("v0")) *
                  (datediff(col("day"), col("day0")).cast("double") /
                   datediff(col("day1"), col("day0")).cast("double"))))
                * lit(10000.0) + lit(0.5)).cast("double") / lit(10000.0))
                .as("value_li"),
              col("day_value").isNotNull.as("is_observed"))
      .orderBy("user_id", "day")
  }

  /** Event-transition matrix (first-order Markov view of the user
    * journey): P(next = b | current = a) over each user's time-ordered
    * event stream — the "what do users do after X" read-out behind
    * funnel design and anomaly baselines. One user-partitioned lag
    * window produces (cur, next) pairs; counts collapse to the
    * |types|² transition table, and the row-normalization runs as a
    * window sum over THAT table (the [[graft.ops.StatsOps.aggChisq]]
    * margin trick — never a second pass over events). The probability
    * is one count/count division of identical integers on both
    * engines, floor-quantized at 4dp.
    *
    * Scale: the only event-sized operation is the lag window's single
    * user_id shuffle (shared shape with win_sessionize/win_funnel);
    * everything after is O(|types|²). */
  def winTransitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
              col("event_type").as("cur"))
      .withColumn("next", lead("cur", 1).over(w))
      .where(col("next").isNotNull)
      .groupBy("cur", "next").agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum("n").over(Window.partitionBy("cur")))
      .select(col("cur"), col("next"), col("n"),
        (expr("FLOOR(CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE)" +
              " * 10000.0 + 0.5)").cast("double") / 10000.0).as("p_r"))
      .orderBy("cur", "next")
  }
}
