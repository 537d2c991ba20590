package graft

/** DuckDB 1.0.0 oracle SQL, one entry per key in SparkEntry.queries
  * (SURVEY.md §2 "oracle=yes" rows). Table names are the bare parquet table
  * names; the driver binds them to the same sf directory Verify ran on.
  *
  * Cross-engine hash-match rules applied throughout (SURVEY.md §7.3):
  * identical column aliases, total ORDER BY over unique keys, ROUND on every
  * floating column, CAST(SUM(int) AS BIGINT), no TIMESTAMPTZ. */
object OracleSql {
  /** Declared keys whose oracle is another key's SQL, verbatim.
    *
    * The auto-dispatch entries (r7 verdict item 6) route to their EXACT
    * kernel below the measured n≈5000 crossover; the Verify corpus
    * (sf0.01, n=500) is below it, so the exact oracle applies — and
    * doubles as a mis-route detector: the ANN kernels produce different
    * row sets (e.g. dedup_embedding_ann found 13 of the 14 exact pairs
    * in CORRECTNESS_r07), so a dispatcher bug would hash-mismatch, not
    * silently pass. merge_upsert_compact runs compaction + vacuum inside
    * the merge_upsert pipeline; sharing that oracle asserts both are
    * data-invisible (multiset-preserving, referenced-dirs-only). */
  private val aliased = Map(
    "sim_cosine_topk_auto" -> "sim_cosine_topk",
    "sim_knn_label_auto" -> "sim_knn_label",
    "dedup_embedding_auto" -> "dedup_embedding",
    "dedup_clusters_auto" -> "dedup_clusters",
    "merge_upsert_compact" -> "merge_upsert",
    // hash-bucketing the history is content-invisible by contract
    "merge_scd2_bucketed" -> "merge_scd2",
    // rollback-to-v1 must equal the as-of-v1 read, which must equal the
    // pre-merge snapshot
    "merge_upsert_rollback" -> "merge_upsert_timetravel",
    // the bloom prefilter is exact by construction (false positives die
    // in the confirm join), so the screening path must reproduce
    // text_decontaminate's result verbatim
    "text_decontaminate_bloom" -> "text_decontaminate",
    // a bootstrapped-then-incrementally-synced mirror must equal the
    // atomically-applied CDC end state — the feed was complete and the
    // replay guard held
    "pipeline_cdc_mirror" -> "merge_apply_cdc",
    // the STREAMED mirror (change-feed source + exactly-once sink) must
    // land on the identical end state the polled sync does
    "pipeline_feed_stream" -> "merge_apply_cdc",
    // the MOR update lifecycle (image sidecar -> substitution read ->
    // materialize -> vacuum) is content-identical to the CoW UPDATE
    "merge_update_mor" -> "merge_update_where",
    // a tagged version read back after a floor-raising vacuum must be
    // the exact pre-advance snapshot — the pin held through retention
    "merge_tag_read" -> "merge_upsert_timetravel")

  lazy val sql: Map[String, String] =
    base ++ aliased.map { case (k, src) => k -> base(src) }

  private lazy val base: Map[String, String] = Map(

    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",

    "scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // scan_csv: both engines read the same committed fixture file; ints are
    // cast to BIGINT (each CSV sniffer picks its own integer width).
    "scan_csv" ->
      s"""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
         |  CAST(n_regionkey AS BIGINT) AS n_regionkey
         |FROM read_csv('${graft.ops.Relational.fixturesDir}/nation.csv')
         |ORDER BY n_nationkey""".stripMargin,

    "scan_range" ->
      """SELECT CAST(i AS BIGINT) AS id,
        |  CAST(i * i AS BIGINT) AS sq,
        |  CAST(i % 7 AS BIGINT) AS m7
        |FROM generate_series(0, 999) t(i)
        |ORDER BY id""".stripMargin,

    "scan_json" ->
      s"""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
         |  CAST(n_regionkey AS BIGINT) AS n_regionkey
         |FROM read_json_auto('${graft.ops.Relational.fixturesDir}/nation.jsonl')
         |ORDER BY n_nationkey""".stripMargin,

    // scan_orc: the Spark side reads its own one-time ORC export of the
    // supplier dim; the oracle reads the ORIGINAL parquet — equality IS
    // the assertion that the ORC roundtrip preserved every value.
    "scan_orc" ->
      """SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey,
        |  ROUND(s_acctbal, 2) AS s_acctbal_r
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    // scan_partitioned: the oracle replays the partition slice from the
    // original table — equality proves the hive-partitioned write
    // round-trip (values AND the re-attached partition column).
    "scan_partitioned" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS price_r, o_orderstatus
        |FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,

    // scan_evolved: the oracle replays the union-by-name semantics from
    // the ORIGINAL orders table via the same content-stable even/odd
    // split — even keys predate the priority column, so they null-fill.
    // Equality asserts both batch contents AND the mergeSchema fill.
    "scan_evolved" ->
      """SELECT o_orderkey,
        |  ROUND(o_totalprice, 2) AS o_totalprice_r,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
        |       ELSE '<pre-schema>' END AS priority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // graph_sssp: DuckDB recursive CTE replays the identical BFS — the
    // UNION fixpoint accumulates (node, hop) rows, MIN(hop) per node is
    // the shortest-path reduction; edge build is textually the same
    // undirected distinct trade projection as the Spark substrate.
    "graph_sssp" ->
      """WITH RECURSIVE cs AS (
        |  SELECT DISTINCT o_custkey AS src,
        |                  l_suppkey + 1000000000 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM cs
        |      UNION ALL SELECT dst, src FROM cs),
        |bfs(node, hop) AS (
        |  SELECT MIN(o_custkey), 0 FROM orders
        |  UNION
        |  SELECT e.dst, bfs.hop + 1
        |  FROM bfs JOIN e ON e.src = bfs.node
        |  WHERE bfs.hop < 6)
        |SELECT
        |  CASE WHEN node >= 1000000000 THEN node - 1000000000
        |       ELSE node END AS node_id,
        |  node >= 1000000000 AS is_supplier,
        |  CAST(MIN(hop) AS BIGINT) AS hops
        |FROM bfs
        |GROUP BY node
        |ORDER BY hops, is_supplier, node_id""".stripMargin,

    // scan_binaryfile: DuckDB read_blob over the same committed fixture
    // files. decode(blob), not CAST(blob AS VARCHAR): the cast emits the
    // \xNN-escaped literal form and would hash different bytes; decode
    // yields the raw text, so md5 matches Spark's md5(binary) exactly.
    "scan_binaryfile" ->
      s"""SELECT parse_filename(filename) AS fname, size,
         |  md5(decode(content)) AS content_md5
         |FROM read_blob('${graft.ops.Relational.fixturesDir}/*')
         |ORDER BY fname""".stripMargin,

    // agg_theta_sets: sketches are in exact mode (vocabulary << 4096
    // nominal entries), so plain set SQL is the oracle — the same
    // exact-regime pattern as the CMS/Misra-Gries queries.
    "agg_theta_sets" ->
      """WITH t AS (
        |  SELECT doc_id % 2 = 0 AS even_doc,
        |         unnest(string_split(text, ' ')) AS token
        |  FROM documents
        |), a AS (SELECT DISTINCT token FROM t WHERE even_doc),
        |   b AS (SELECT DISTINCT token FROM t WHERE NOT even_doc)
        |SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_even,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_odd,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |     (SELECT token FROM a INTERSECT SELECT token FROM b)) AS n_both,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |     (SELECT token FROM a EXCEPT SELECT token FROM b)) AS n_even_only
        |""".stripMargin,

    "sql_cte_pipeline" ->
      """WITH seg_orders AS (
        |  SELECT c.c_mktsegment AS seg, o.o_orderkey, o.o_totalprice
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |), ranked AS (
        |  SELECT seg, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY seg
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM seg_orders
        |)
        |SELECT seg, o_orderkey, ROUND(o_totalprice, 2) AS price_r,
        |       CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 5
        |ORDER BY seg, rn""".stripMargin,

    // agg_argmax: ties on (priority, price) exist, so both engines argmax
    // over the same composite integer key (exact cents scaled past the key
    // range + key) — DuckDB's arg_max accepts scalar ordering values only.
    "agg_argmax" ->
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
        |          * 1000000000 + o_orderkey) AS max_price_key,
        |  arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
        |          * 1000000000 + o_orderkey) AS min_price_key,
        |  ROUND(MAX(o_totalprice), 2) AS max_price,
        |  ROUND(MIN(o_totalprice), 2) AS min_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // fn_map: the oracle states each lookup's engine-independent result
    // directly (DuckDB 1.0 map subscripts return LIST, not the value —
    // the equivalent scalar computation is the stable cross-engine form,
    // same style as the sorted set-op outputs).
    "fn_map" ->
      """SELECT p_partkey, p_brand AS brand, CAST(NULL AS VARCHAR) AS absent,
        |  CAST(3 AS BIGINT) AS nkeys, TRUE AS has_type,
        |  upper(p_name) AS name_up
        |FROM part ORDER BY p_partkey""".stripMargin,

    // fn_struct: DuckDB ROW comparison is positional-lexicographic like
    // Spark struct ordering, so over_5k is a genuine cross-engine check.
    "fn_struct" ->
      """SELECT c_custkey, c_acctbal AS bal,
        |  (c_acctbal, c_custkey) > (5000.0, 0) AS over_5k,
        |  c_mktsegment AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // win_funnel: identical lead()-over-(ts, event_id) adjacency.
    "win_funnel" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS next_type,
        |    LEAD(ts) OVER (PARTITION BY user_id
        |                   ORDER BY ts, event_id) AS next_ts
        |  FROM events
        |)
        |SELECT user_id,
        |  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
        |    AS n_clicks,
        |  CAST(COUNT(CASE WHEN event_type = 'click'
        |                   AND next_type = 'purchase'
        |                   AND next_ts <= ts + INTERVAL 30 MINUTE
        |             THEN 1 END) AS BIGINT) AS n_conversions
        |FROM o GROUP BY user_id
        |HAVING n_conversions > 0
        |ORDER BY user_id""".stripMargin,

    // win_retention: same cohort construction — per-user min day over the
    // deduped (user, day) pairs, then distinct actives per cell.
    "win_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), c AS (
        |  SELECT user_id, day,
        |    MIN(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM ud
        |)
        |SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS INTEGER) AS offset_days,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM c GROUP BY cohort_day, offset_days
        |ORDER BY cohort_day, offset_days""".stripMargin,

    // ts_gapfill: same dense-grid construction — generate_series over the
    // per-user [min, max] day span, left join of observed daily sums,
    // IGNORE NULLS running last_value as the forward fill.
    "ts_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         ROUND(SUM(value), 2) AS day_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT user_id,
        |         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |           AS day
        |  FROM span
        |)
        |SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day,
        |  last_value(d.day_value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff,
        |  d.day_value IS NOT NULL AS is_observed
        |FROM grid g LEFT JOIN daily d USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,

    // ts_ewma: the same left fold — list_reduce inits from the first
    // element exactly like aggregate(slice(...,2,...), element_at(...,1));
    // identical multiply-add order keeps the doubles bit-equal, and the
    // floor quantization matches ts_interpolate's rationale.
    "ts_ewma" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         ROUND(SUM(value), 2) AS day_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), g AS (
        |  SELECT user_id,
        |         list(day ORDER BY day) AS days,
        |         list(day_value ORDER BY day) AS vals
        |  FROM daily GROUP BY user_id
        |), e AS (
        |  SELECT user_id, days, vals,
        |         unnest(generate_series(1, len(vals))) AS i
        |  FROM g
        |)
        |SELECT user_id, CAST(days[i] AS TIMESTAMP) AS day,
        |  FLOOR(list_reduce(vals[1:i],
        |          (acc, x) -> CAST(0.2 AS DOUBLE) * x
        |                      + CAST(0.8 AS DOUBLE) * acc)
        |        * 10000.0 + 0.5) / 10000.0 AS ewma_r
        |FROM e ORDER BY user_id, day""".stripMargin,

    // win_rolling_distinct_exact: identical contribution expansion —
    // each (day, user) is visible from the 7 calendar days day..day+6;
    // only observed days emit output rows. Integer counts.
    "win_rolling_distinct_exact" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |), contrib AS (
        |  SELECT CAST(g AS DATE) AS rday, user_id
        |  FROM du,
        |       unnest(generate_series(CAST(day AS TIMESTAMP),
        |                              CAST(day AS TIMESTAMP)
        |                                + INTERVAL 6 DAY,
        |                              INTERVAL 1 DAY)) AS t(g)
        |)
        |SELECT CAST(rday AS TIMESTAMP) AS day,
        |       COUNT(DISTINCT user_id) AS users_7d
        |FROM contrib
        |WHERE rday IN (SELECT day FROM du)
        |GROUP BY rday ORDER BY day""".stripMargin,

    // win_rolling_distinct_bitmap: the bitmap form is EXACT with the same
    // calendar-window semantics, so its oracle is the identical
    // contribution-expansion SQL as win_rolling_distinct_exact.
    "win_rolling_distinct_bitmap" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |), contrib AS (
        |  SELECT CAST(g AS DATE) AS rday, user_id
        |  FROM du,
        |       unnest(generate_series(CAST(day AS TIMESTAMP),
        |                              CAST(day AS TIMESTAMP)
        |                                + INTERVAL 6 DAY,
        |                              INTERVAL 1 DAY)) AS t(g)
        |)
        |SELECT CAST(rday AS TIMESTAMP) AS day,
        |       COUNT(DISTINCT user_id) AS users_7d
        |FROM contrib
        |WHERE rday IN (SELECT day FROM du)
        |GROUP BY rday ORDER BY day""".stripMargin,

    // join_overlap_self: identical interval build + canonical a<b pairs;
    // closed-interval overlap, all date/int arithmetic.
    "join_overlap_self" ->
      """WITH iv AS (
        |  SELECT o_custkey AS cust, o_orderkey AS okey,
        |         MIN(o_orderdate) AS d0, MAX(l_shipdate) AS d1
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2
        |)
        |SELECT a.cust AS custkey, a.okey AS okey_a, b.okey AS okey_b,
        |       CAST(GREATEST(a.d0, b.d0) AS TIMESTAMP) AS ov_start,
        |       CAST(LEAST(a.d1, b.d1) AS TIMESTAMP) AS ov_end
        |FROM iv a JOIN iv b
        |  ON a.cust = b.cust AND a.okey < b.okey
        | AND a.d0 <= b.d1 AND b.d0 <= a.d1
        |ORDER BY custkey, okey_a, okey_b""".stripMargin,

    // join_interval_overlap: identical islands → intervals, same top-24
    // busiest hours (total order on cnt DESC, hour), and the same
    // hour-bucket expansion — bucket equality is the overlap predicate.
    "join_interval_overlap" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS opens
        |  FROM (SELECT user_id, event_id, ts,
        |          LAG(ts) OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id) AS prev
        |        FROM events) t
        |), sess AS (
        |  SELECT user_id,
        |    CAST(SUM(opens) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_id,
        |    ts
        |  FROM o
        |), iv AS (
        |  SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
        |  FROM sess GROUP BY 1, 2
        |), busy AS (
        |  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS hour_cnt
        |  FROM events GROUP BY 1
        |  ORDER BY hour_cnt DESC, hour LIMIT 24
        |), cov AS (
        |  SELECT user_id, session_id, s_start,
        |    unnest(generate_series(date_trunc('hour', s_start),
        |                           date_trunc('hour', s_end),
        |                           INTERVAL 1 HOUR)) AS hour
        |  FROM iv
        |)
        |SELECT c.user_id, c.session_id,
        |       CAST(c.s_start AS TIMESTAMP) AS s_start,
        |       CAST(c.hour AS TIMESTAMP) AS hour, b.hour_cnt
        |FROM cov c JOIN busy b USING (hour)
        |ORDER BY user_id, session_id, hour""".stripMargin,

    // scan_text: the oracle reads the ORIGINAL parquet table — the
    // line-file roundtrip must preserve every character (texts are
    // verified newline-free at export time by construction).
    "scan_text" ->
      """SELECT text, LENGTH(text) AS n_chars
        |FROM documents ORDER BY text""".stripMargin,

    // win_streak: identical islands construction; the (len DESC,
    // start_day DESC) row_number restates the max-struct argmax tiebreak.
    "win_streak" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), isl AS (
        |  SELECT user_id, day,
        |    day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |                                  ORDER BY day) AS INTEGER)
        |      AS anchor
        |  FROM days
        |), runs AS (
        |  SELECT user_id, anchor, COUNT(*) AS len, MIN(day) AS start_day
        |  FROM isl GROUP BY 1, 2
        |), best AS (
        |  SELECT user_id, len AS best_streak, start_day,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY len DESC, start_day DESC) AS rn
        |  FROM runs
        |)
        |SELECT user_id, best_streak,
        |       CAST(start_day AS TIMESTAMP) AS streak_start
        |FROM best WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // ts_resample: arg_min/arg_max on the scalar day key restate
    // min_by/max_by; the week total re-sums the same exact decimals.
    // Both engines' date_trunc('week') snap to Monday.
    "ts_resample" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         ROUND(SUM(value), 2) AS day_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT user_id,
        |       CAST(date_trunc('week', day) AS TIMESTAMP) AS week,
        |       COUNT(*) AS n_days,
        |       arg_min(day_value, day) AS open_v,
        |       arg_max(day_value, day) AS close_v,
        |       MIN(day_value) AS lo_v,
        |       MAX(day_value) AS hi_v,
        |       CAST(SUM(CAST(day_value AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_v
        |FROM daily GROUP BY 1, 2 ORDER BY user_id, week""".stripMargin,

    // dq_audit: same fused conditional counts + NOT-EXISTS restatements
    // of the anti-joins; all-integer outputs.
    // dq_skew: identical per-key count distributions; percentile ↔
    // quantile_cont interpolate bit-equally (the agg_percentiles
    // contract) and the ratio is one integer-derived division.
    "dq_skew" ->
      """WITH s AS (
        |  SELECT 'orders.o_custkey' AS tbl, CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY o_custkey
        |  UNION ALL
        |  SELECT 'events.user_id', CAST(count(*) AS BIGINT)
        |  FROM events GROUP BY user_id
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey', CAST(count(*) AS BIGINT)
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT tbl, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(MAX(cnt) AS BIGINT) AS max_cnt,
        |  ROUND(CAST(MAX(cnt) * COUNT(*) AS DOUBLE) / SUM(cnt), 4)
        |    AS top_to_mean_r,
        |  ROUND(quantile_cont(cnt, 0.99), 4) AS p99_cnt_r
        |FROM s GROUP BY tbl ORDER BY tbl""".stripMargin,

    "dq_audit" ->
      """WITH checks AS (
        |  SELECT 'lineitem_bad_discount' AS chk,
        |         COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS n_bad
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_nonpos_qty',
        |         COUNT(*) FILTER (WHERE l_quantity <= 0) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_null_shipdate',
        |         COUNT(*) FILTER (WHERE l_shipdate IS NULL) FROM lineitem
        |  UNION ALL
        |  SELECT 'events_null_user',
        |         COUNT(*) FILTER (WHERE user_id IS NULL) FROM events
        |  UNION ALL
        |  SELECT 'events_negative_value',
        |         COUNT(*) FILTER (WHERE value < 0) FROM events
        |  UNION ALL
        |  SELECT 'documents_empty_text',
        |         COUNT(*) FILTER (WHERE text IS NULL OR LENGTH(text) = 0)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'documents_dup_text',
        |         COUNT(*) - COUNT(DISTINCT text) FROM documents
        |  UNION ALL
        |  SELECT 'lineitem_orphan_order', COUNT(*) FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'orders_orphan_customer', COUNT(*) FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                    WHERE c.c_custkey = o.o_custkey)
        |)
        |SELECT chk, n_bad FROM checks ORDER BY chk""".stripMargin,

    // sim_label_centroids: same decimal component sums; the cosine folds
    // restate Spark's aggregate-with-0-init as list_reduce (first-element
    // init) — identical in IEEE since 0+x ≡ x. generate_series indexes the
    // product list so its fold order is the component order.
    "sim_label_centroids" ->
      """WITH comp AS (
        |  SELECT label, i AS pos,
        |    CAST(SUM(CAST(embedding[i] AS DECIMAL(18,9))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS c
        |  FROM embeddings,
        |       unnest(generate_series(1, len(embedding))) AS t(i)
        |  GROUP BY 1, 2
        |), vecs AS (
        |  SELECT label, list(c ORDER BY pos) AS vec FROM comp GROUP BY 1
        |)
        |SELECT a.label AS la, b.label AS lb,
        |  FLOOR(list_reduce(list_transform(generate_series(1, len(a.vec)),
        |                                   i -> a.vec[i] * b.vec[i]),
        |                    (acc, t) -> acc + t)
        |        / SQRT(list_reduce(list_transform(
        |                 generate_series(1, len(a.vec)),
        |                 i -> a.vec[i] * a.vec[i]), (acc, t) -> acc + t)
        |             * list_reduce(list_transform(
        |                 generate_series(1, len(b.vec)),
        |                 i -> b.vec[i] * b.vec[i]), (acc, t) -> acc + t))
        |        * 1000000.0 + 0.5) / 1000000.0 AS cos_r
        |FROM vecs a JOIN vecs b ON a.label <= b.label
        |ORDER BY la, lb""".stripMargin,

    // graph_triangles: integer-only restatement of the same projection →
    // top-3 → canonical-edge → ordered triangle join; the (w DESC, b)
    // ranking is total, so both engines keep identical edge sets.
    "graph_triangles" ->
      """WITH cs AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), pc AS (
        |  SELECT x.supp AS a, y.supp AS b, COUNT(*) AS w
        |  FROM cs x JOIN cs y ON x.cust = y.cust AND x.supp <> y.supp
        |  GROUP BY 1, 2
        |), tk AS (
        |  SELECT a, b FROM (
        |    SELECT a, b,
        |           ROW_NUMBER() OVER (PARTITION BY a
        |                              ORDER BY w DESC, b) AS rn
        |    FROM pc) WHERE rn <= 3
        |), e AS (
        |  SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b FROM tk
        |), tri AS (
        |  SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
        |  FROM e e1
        |  JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
        |), corners AS (
        |  SELECT ta AS supp FROM tri
        |  UNION ALL SELECT tb FROM tri
        |  UNION ALL SELECT tc FROM tri
        |)
        |SELECT supp, COUNT(*) AS n_tri FROM corners
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // ts_anomaly: window moments restated with the same DECIMAL sums
    // (exact regardless of DuckDB's segment-tree combine order) and the
    // z formula written in the identical double op sequence; 4dp floor
    // quantization as in the sibling ts ops.
    "ts_anomaly" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         ROUND(SUM(value), 2) AS day_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), m AS (
        |  SELECT user_id, day, day_value,
        |    CAST(SUM(CAST(day_value AS DECIMAL(18,2))) OVER fr AS DOUBLE)
        |      AS s1,
        |    CAST(SUM(CAST(day_value AS DECIMAL(18,2))
        |             * CAST(day_value AS DECIMAL(18,2))) OVER fr AS DOUBLE)
        |      AS s2,
        |    CAST(COUNT(*) OVER fr AS DOUBLE) AS n
        |  FROM daily
        |  WINDOW fr AS (PARTITION BY user_id ORDER BY day
        |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |), z AS (
        |  SELECT user_id, day, day_value,
        |    CASE WHEN n >= 5.0 AND (s2 - s1*s1/n) / (n - 1.0) > 0.0
        |         THEN FLOOR((day_value - s1/n)
        |                    / SQRT((s2 - s1*s1/n) / (n - 1.0))
        |                    * 10000.0 + 0.5) / 10000.0
        |    END AS z_r
        |  FROM m
        |)
        |SELECT user_id, CAST(day AS TIMESTAMP) AS day, day_value, z_r,
        |       COALESCE(ABS(z_r) > 2.0, FALSE) AS is_anomaly
        |FROM z ORDER BY user_id, day""".stripMargin,

    // ts_interpolate: same grid; both neighbor scans restated as IGNORE
    // NULLS running extremes, the blend arithmetic written in the
    // identical operation order (v0 + (v1-v0) * (d-d0)/(d1-d0)), and the
    // quantization as floor(x*1e4 + 0.5)/1e4 — pure IEEE ops that agree
    // bit-for-bit (ROUND would not: the engines disagree on shortest-
    // repr half-boundary doubles).
    "ts_interpolate" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         ROUND(SUM(value), 2) AS day_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT user_id,
        |         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |           AS day
        |  FROM span
        |), n AS (
        |  SELECT g.user_id, g.day, d.day_value,
        |    last_value(d.day_value IGNORE NULLS) OVER wb AS v0,
        |    last_value(CASE WHEN d.day_value IS NOT NULL THEN g.day END
        |               IGNORE NULLS) OVER wb AS day0,
        |    first_value(d.day_value IGNORE NULLS) OVER wf AS v1,
        |    first_value(CASE WHEN d.day_value IS NOT NULL THEN g.day END
        |                IGNORE NULLS) OVER wf AS day1
        |  FROM grid g LEFT JOIN daily d USING (user_id, day)
        |  WINDOW
        |    wb AS (PARTITION BY g.user_id ORDER BY g.day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY g.user_id ORDER BY g.day
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, CAST(day AS TIMESTAMP) AS day,
        |  FLOOR((CASE WHEN day_value IS NOT NULL THEN day_value
        |        ELSE v0 + (v1 - v0) *
        |          (CAST(date_diff('day', day0, day) AS DOUBLE) /
        |           CAST(date_diff('day', day0, day1) AS DOUBLE)) END)
        |        * 10000.0 + 0.5) / 10000.0
        |    AS value_li,
        |  day_value IS NOT NULL AS is_observed
        |FROM n ORDER BY user_id, day""".stripMargin,

    // agg_gini: identical rank formulation — exact decimal spend and
    // rank-weighted sums, total (spend, key) tie order, one double
    // formula per nation, floor-quantized.
    "agg_gini" ->
      """WITH sp AS (
        |  SELECT n_name, c_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, c_custkey),
        |r AS (
        |  SELECT n_name, spend,
        |    row_number() OVER
        |      (PARTITION BY n_name ORDER BY spend ASC, c_custkey ASC) AS rn
        |  FROM sp),
        |g AS (
        |  SELECT n_name,
        |    CAST(COUNT(*) AS BIGINT) AS n_cust,
        |    CAST(SUM(spend) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(rn AS DECIMAL(10,0)) * spend) AS DOUBLE) AS six
        |  FROM r GROUP BY n_name)
        |SELECT n_name, n_cust,
        |  FLOOR((2.0 * six / (CAST(n_cust AS DOUBLE) * sx)
        |    - (CAST(n_cust AS DOUBLE) + 1.0) / CAST(n_cust AS DOUBLE))
        |    * 10000.0 + 0.5) / 10000.0 AS gini_r
        |FROM g ORDER BY n_name""".stripMargin,

    // ml_fpgrowth: FP-Growth counts exactly, so the size<=2 slice is
    // SQL-replayable — singles + unordered pairs over distinct
    // (order, brand) rows, same ceil(1% of baskets) integer threshold.
    "ml_fpgrowth" ->
      """WITH ob AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |nb AS (SELECT COUNT(DISTINCT ok) AS n FROM ob),
        |singles AS (
        |  SELECT b AS itemset, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM ob GROUP BY b),
        |pairs AS (
        |  SELECT x.b || ',' || y.b AS itemset,
        |         CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
        |  GROUP BY x.b, y.b),
        |u AS (SELECT * FROM singles UNION ALL SELECT * FROM pairs)
        |SELECT itemset, freq FROM u, nb
        |WHERE freq >= CEIL(0.01 * n)
        |ORDER BY itemset""".stripMargin,

    // win_transitions: identical lead window + count + row-window
    // normalization; the probability divides the same two integers on
    // both engines, floor-quantized.
    "win_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS next
        |  FROM events),
        |t AS (
        |  SELECT cur, next, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE next IS NOT NULL GROUP BY cur, next)
        |SELECT cur, next, n,
        |  FLOOR(CAST(n AS DOUBLE)
        |        / CAST(SUM(n) OVER (PARTITION BY cur) AS DOUBLE)
        |        * 10000.0 + 0.5) / 10000.0 AS p_r
        |FROM t ORDER BY cur, next""".stripMargin,

    // win_sessionize: same islands construction (lag-gap opens + running
    // count), same >= gap comparison as stream_session's oracle.
    "win_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS opens
        |  FROM (SELECT user_id, event_id, ts,
        |          LAG(ts) OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id) AS prev
        |        FROM events) t
        |)
        |SELECT user_id, event_id, ts,
        |  CAST(SUM(opens) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS session_id
        |FROM o ORDER BY user_id, ts, event_id""".stripMargin,

    "fn_encode" ->
      """SELECT doc_id,
        |  to_base64(CAST(substr(text, 1, 12) AS BLOB)) AS b64,
        |  hex(substr(text, 1, 12)) AS hx,
        |  CAST(from_base64(to_base64(CAST(substr(text, 1, 12) AS BLOB)))
        |       AS VARCHAR) = substr(text, 1, 12) AS rt_ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_null" ->
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS st_or_null,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st_filled,
        |  ifnull(nullif(o_orderpriority, o_orderpriority), 'none')
        |    AS always_none,
        |  nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL AS was_open
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "agg_stringagg" ->
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
        |    AS priorities
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // agg_cms_freq: the count-min sketch runs in its exact regime on this
    // data (5 event types vs 2048 cells/row, min over 4 independent rows),
    // so the estimate equals the plain count.
    "agg_cms_freq" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS est_count
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // agg_bitmap_distinct: the dense-bitmap aggregate is EXACT by
    // construction, so the oracle is the plain count-distinct.
    "agg_bitmap_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // join_star_schema: identical six-relation join + residual + exact
    // decimal revenue product (order-proof), one textual formula.
    "join_star_schema" ->
      """SELECT n_name,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE), 2) AS revenue_r,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |  AND r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n_name
        |ORDER BY revenue_r DESC, n_name""".stripMargin,

    // agg_ttest: Welch t + Satterthwaite df from the same exact conditional
    // decimal sums; the double formula text is identical to the Spark side
    // (op-order-sensitive — do not "simplify" one side only).
    "agg_ttest" ->
      """WITH t AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s1,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s2,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS q1,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS q2
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')
        |  GROUP BY o_orderpriority)
        |SELECT o_orderpriority,
        |  CAST(n1 AS BIGINT) AS n_f,
        |  CAST(n2 AS BIGINT) AS n_o,
        |  FLOOR((s1 / n1 - s2 / n2)
        |    / SQRT((q1 - s1 * s1 / n1) / (n1 - 1.0) / n1
        |         + (q2 - s2 * s2 / n2) / (n2 - 1.0) / n2)
        |    * 10000.0 + 0.5) / 10000.0 AS t_r,
        |  FLOOR(((q1 - s1 * s1 / n1) / (n1 - 1.0) / n1
        |       + (q2 - s2 * s2 / n2) / (n2 - 1.0) / n2)
        |    * ((q1 - s1 * s1 / n1) / (n1 - 1.0) / n1
        |     + (q2 - s2 * s2 / n2) / (n2 - 1.0) / n2)
        |    / ((q1 - s1 * s1 / n1) / (n1 - 1.0) / n1
        |       * ((q1 - s1 * s1 / n1) / (n1 - 1.0) / n1) / (n1 - 1.0)
        |     + (q2 - s2 * s2 / n2) / (n2 - 1.0) / n2
        |       * ((q2 - s2 * s2 / n2) / (n2 - 1.0) / n2) / (n2 - 1.0))
        |    * 100.0 + 0.5) / 100.0 AS df_r
        |FROM t ORDER BY o_orderpriority""".stripMargin,

    // agg_chisq: identical integer contingency algebra; the cell-term sum
    // is an ORDER BY (t,b) list fold on both engines (sequential, 0-init ≡
    // first-init since 0+x is exact), so no parallel double reduction.
    "agg_chisq" ->
      """WITH ev AS (
        |  SELECT event_type AS t,
        |    CASE WHEN value >= 50 THEN 'hi' ELSE 'lo' END AS b
        |  FROM events),
        |cells AS (
        |  SELECT t, b, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY t, b),
        |rt AS (SELECT t, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY t),
        |kb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS k FROM cells GROUP BY b),
        |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
        |terms AS (
        |  SELECT cells.t, cells.b, nn.n,
        |    CAST(c * n - r * k AS DOUBLE) * CAST(c * n - r * k AS DOUBLE)
        |      / CAST(n AS DOUBLE) / CAST(r AS DOUBLE) / CAST(k AS DOUBLE)
        |      AS term
        |  FROM cells JOIN rt USING (t) JOIN kb USING (b) CROSS JOIN nn)
        |SELECT
        |  CAST(MIN(n) AS BIGINT) AS n,
        |  CAST((COUNT(DISTINCT t) - 1) * (COUNT(DISTINCT b) - 1) AS BIGINT)
        |    AS dof,
        |  FLOOR(list_reduce(list(term ORDER BY t, b), (acc, v) -> acc + v)
        |        * 10000.0 + 0.5) / 10000.0 AS chi2_r
        |FROM terms""".stripMargin,

    // fn_fuzzy_match: DuckDB's levenshtein is the same unit-cost DP as
    // Spark's; the argmin tie-break (min distance, then min name) is
    // restated as a two-level min.
    "fn_fuzzy_match" ->
      """WITH p AS (
        |  SELECT a.n_name AS name, b.n_name AS other,
        |         levenshtein(a.n_name, b.n_name) AS dist
        |  FROM nation a JOIN nation b ON a.n_name <> b.n_name),
        |m AS (SELECT name, MIN(dist) AS dist FROM p GROUP BY name)
        |SELECT p.name, CAST(p.dist AS BIGINT) AS dist,
        |  MIN(p.other) AS closest
        |FROM p JOIN m ON p.name = m.name AND p.dist = m.dist
        |GROUP BY p.name, p.dist
        |ORDER BY p.name""".stripMargin,

    // join_point_in_range: same literal band dimension; the decimal sum is
    // exact (integer cents < 2^53), so the 2dp round is an identity on
    // both engines.
    "join_point_in_range" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('T1_budget',        0.0, 100000.0),
        |  ('T2_mid',      100000.0, 250000.0),
        |  ('T3_high',     250000.0, 400000.0),
        |  ('T4_premium',  400000.0, 1000000.0))
        |SELECT band,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS total_value_r
        |FROM orders JOIN bands
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    // agg_topfreq: Misra-Gries with m=64 counters over a 31-word
    // vocabulary never decrements — exact top-20 by (count, word).
    "agg_topfreq" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin,

    // agg_regression: slope/intercept/r2 from exact decimal moment sums,
    // final algebra textually identical to the Spark side (see agg_stats).
    "agg_regression" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) + 0.0 AS slope_r,
        |  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) + 0.0 AS intercept_r,
        |  ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0 AS r2_r
        |FROM t ORDER BY l_returnflag""".stripMargin,

    "agg_unpivot" ->
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, val FROM agg
        |UNPIVOT (val FOR metric IN (sum_qty, sum_price, sum_disc))
        |ORDER BY l_returnflag, metric""".stripMargin,

    "set_except_all" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY k""".stripMargin,

    "set_intersect_all" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY k""".stripMargin,

    "typed_cogroup" ->
      """SELECT c_custkey AS k,
        |  CAST(COALESCE(n, 0) AS BIGINT) AS n_orders,
        |  c_mktsegment AS seg,
        |  CAST(COALESCE(tot, 0) AS DOUBLE) AS total_price
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS n,
        |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS tot
        |  FROM orders GROUP BY o_custkey) o ON c_custkey = o.o_custkey
        |ORDER BY k""".stripMargin,

    "flatmap_posexplode" ->
      """SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, toks[u.i] AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
        |     unnest(generate_series(1, len(toks))) AS u(i)
        |ORDER BY doc_id, pos""".stripMargin,

    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |  AS DECIMAL(38,2)) AS VARCHAR) AS sum30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    // join_salted: oracle is the PLAIN join — the salted rewrite must be
    // row-identical to it.
    "join_salted" ->
      """SELECT o_orderpriority,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
        |            AS DECIMAL(38,2)) AS VARCHAR) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i + 1] || ' ' ||
        |           string_split(text, ' ')[i + 2]) AS g3
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(g3) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(g3)) AS BIGINT) AS n_distinct,
        |  ROUND(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 4)
        |    AS rep_ratio_r
        |FROM t WHERE len(g3) > 0 ORDER BY doc_id""".stripMargin,

    "text_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |c AS (SELECT doc_id, t, COUNT(*) AS cnt FROM tok GROUP BY doc_id, t),
        |a AS (SELECT doc_id, CAST(SUM(cnt) AS DOUBLE) AS n,
        |        SUM(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS sclc
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, ROUND(ln(n) - sclc / n, 4) + 0.0 AS entropy_r
        |FROM a ORDER BY doc_id""".stripMargin,

    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g')) AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_regex" ->
      """SELECT doc_id,
        |  regexp_extract(text, '^([a-z]+)', 1) AS first_tok,
        |  CAST(len(regexp_extract_all(text, 'table')) AS BIGINT) AS n_table,
        |  regexp_matches(text, 'fast (spark|scan)') AS has_fast_pair,
        |  substr(regexp_replace(text, 'customer', '<ENT>', 'g'), 1, 40)
        |    AS masked40
        |FROM documents ORDER BY doc_id""".stripMargin,

    // sample_stratified: same engine-portable md5 fold as data_split,
    // per-stratum keep rates via a VALUES dim.
    "sample_stratified" ->
      """WITH r(lang, keep_pct) AS (VALUES ('de', 50), ('en', 20),
        |  ('es', 75), ('fr', 100), ('zh', 10)),
        |b AS (SELECT doc_id, lang,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS bucket
        |      FROM documents)
        |SELECT b.doc_id, b.lang, b.bucket
        |FROM b JOIN r ON b.lang = r.lang
        |WHERE b.bucket < r.keep_pct ORDER BY b.doc_id""".stripMargin,

    // text_decontaminate: distinct 5-gram overlap of train docs
    // (doc_id % 50 <> 0) against the benchmark set (doc_id % 50 = 0).
    "text_decontaminate" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 4, 0)),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i + 1] || ' ' ||
        |           string_split(text, ' ')[i + 2] || ' ' ||
        |           string_split(text, ' ')[i + 3] || ' ' ||
        |           string_split(text, ' ')[i + 4])) AS g
        |    FROM documents)),
        |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0)
        |SELECT t.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overlap,
        |  ROUND(CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
        |             AS DOUBLE) / COUNT(*), 4) AS overlap_ratio_r,
        |  CASE WHEN SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) > 0
        |       THEN 1 ELSE 0 END AS contaminated
        |FROM g t LEFT JOIN bench b ON t.g = b.g
        |WHERE t.doc_id % 50 <> 0
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // text_perplexity: unigram MLE fit on the corpus, per-doc average
    // negative log-likelihood.
    "text_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents
        |), v AS (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t),
        |n AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM v)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  ROUND(AVG(-ln(CAST(cnt AS DOUBLE) / n)), 4) AS anll_r
        |FROM tok JOIN v USING (t), n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // text_bpe_tokencount: the oracle replays the identical merge-replace
    // chain, generated from the same merges constant (see BpeOps.oracle).
    "text_bpe_tokencount" -> graft.ops.BpeOps.oracle,

    // text_pii_scrub: the pseudo-PII injection is replayed verbatim (same
    // residue rules), then the same RE2/Java-compatible patterns are counted
    // and masked; md5 digests the scrubbed text on both engines.
    "text_pii_scrub" ->
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    text || ' contact user' || doc_id || '@example.com' ||
         |    CASE WHEN doc_id % 5 = 0
         |         THEN ' cc admin' || doc_id || '@corp.example.org'
         |         ELSE '' END ||
         |    CASE WHEN doc_id % 3 = 0
         |         THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |         ELSE '' END AS raw
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(raw, '${graft.ops.TextOps.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(raw, '${graft.ops.TextOps.PhoneRe}')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(raw, '${graft.ops.TextOps.EmailRe}', '<EMAIL>', 'g'),
         |      '${graft.ops.TextOps.PhoneRe}', '<PHONE>', 'g')) AS scrub_md5
         |FROM raw
         |ORDER BY doc_id""".stripMargin,

    // text_url_domains: DuckDB has no parse_url — the host is the regexp
    // capture between the scheme and the first path slash, which is exactly
    // what parse_url(url,'HOST') returns for these synthesized URLs.
    "text_url_domains" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract('https://' || source || '.example.com/doc/' || doc_id,
        |                   'https://([^/]+)/', 1) AS host
        |  FROM documents)
        |SELECT host,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM u
        |WHERE host NOT IN ('src0.example.com', 'src7.example.com')
        |GROUP BY host
        |ORDER BY host""".stripMargin,

    // merge_schema_evolve: the widened-schema outcome restated from the
    // fold rule — merged F rows carry the new column, everything else
    // (survivors in F, untouched partitions) reads it as NULL.
    "merge_schema_evolve" ->
      """WITH b AS (SELECT o_orderkey, o_totalprice, o_orderstatus,
        |    o_orderpriority,
        |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |         AS BIGINT) % 100 AS bucket
        |  FROM orders)
        |SELECT o_orderkey,
        |  ROUND(CASE WHEN o_orderstatus = 'F' AND bucket >= 80
        |             THEN o_totalprice * 2 ELSE o_totalprice END, 2)
        |    AS price_r,
        |  o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F' AND bucket >= 80
        |       THEN CASE WHEN o_orderpriority = '1-URGENT'
        |                 THEN 1 ELSE 0 END
        |       ELSE NULL END AS urgent
        |FROM b
        |WHERE (o_orderstatus = 'F' AND bucket >= 80) OR bucket < 90
        |ORDER BY o_orderkey""".stripMargin,

    // merge_history: the commit log restated from the fold rule —
    // v1 = the fold<90 snapshot, v2 = merged, v3 = the no-op replay.
    "merge_history" ->
      """WITH b AS (SELECT o_orderstatus,
        |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |         AS BIGINT) % 100 AS bucket
        |  FROM orders),
        |v1 AS (SELECT CAST(1 AS BIGINT) AS version,
        |         CAST(count(DISTINCT o_orderstatus) AS BIGINT)
        |           AS n_partitions,
        |         CAST(count(*) AS BIGINT) AS n_rows
        |       FROM b WHERE bucket < 90),
        |v23 AS (SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT)
        |          AS n_partitions,
        |          CAST(count(*) AS BIGINT) AS n_rows FROM b)
        |SELECT * FROM v1
        |UNION ALL SELECT CAST(2 AS BIGINT), n_partitions, n_rows FROM v23
        |UNION ALL SELECT CAST(3 AS BIGINT), n_partitions, n_rows FROM v23
        |ORDER BY version""".stripMargin,

    // scan_manifest_pruned: zone-map pruning must be invisible in the
    // data — the oracle is the plain key-range filter.
    "scan_manifest_pruned" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS price_r
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999
        |ORDER BY o_orderkey""".stripMargin,

    // pipeline_dedup_delete: retroactive dedup-by-delete must leave
    // exactly the canonical (min doc_id per text hash) documents.
    "pipeline_dedup_delete" ->
      """SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d
        |JOIN (SELECT MIN(doc_id) AS doc_id
        |      FROM documents GROUP BY md5(text)) k USING (doc_id)
        |WHERE d.n_chars >= 200
        |ORDER BY d.doc_id""".stripMargin,

    // merge_apply_cdc: the atomically-applied changelog must equal the
    // fold-rule restatement — updates re-priced, deletes gone, inserts
    // present — and the double-apply must be content-invisible.
    "merge_apply_cdc" ->
      """SELECT o_orderkey,
        |  CASE WHEN bucket BETWEEN 80 AND 84 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderstatus
        |FROM (SELECT o_orderkey, o_totalprice, o_orderstatus,
        |        CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS bucket
        |      FROM orders)
        |WHERE bucket < 85 OR bucket BETWEEN 90 AND 94
        |ORDER BY o_orderkey""".stripMargin,

    // merge_delete: the copy-on-write delete must equal the plain
    // complement filter — removed exactly the doomed keys, nothing else.
    "merge_delete" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS price_r,
        |  o_orderstatus
        |FROM orders
        |WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 100 < 70
        |ORDER BY o_orderkey""".stripMargin,

    // merge_constrained: the constraint gate must admit exactly the
    // clean writes — the read-back (minus the null-price probe row) is
    // the plain source.
    "merge_constrained" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // merge_branch_wap: the write-audit-publish loop — main exposes the
    // base then exactly the audited branch content; the dirty
    // intermediate (poisoned prices) never lands, so the read-back is
    // the plain bucket<95 restatement.
    "merge_branch_wap" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM (SELECT o_orderkey, o_totalprice, o_orderstatus,
        |        CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS bucket
        |      FROM orders)
        |WHERE bucket < 95
        |ORDER BY o_orderkey""".stripMargin,

    // merge_concurrent_disjoint: two racing partition-disjoint writers
    // must BOTH land — the read-back is the base plus both slices,
    // independent of which racer won the first claim.
    "merge_concurrent_disjoint" ->
      """SELECT o_orderkey,
        |  ROUND(CASE WHEN bucket >= 85 AND o_orderstatus = 'F'
        |               THEN o_totalprice * 2
        |             WHEN bucket >= 85 AND o_orderstatus = 'O'
        |               THEN o_totalprice * 3
        |             ELSE o_totalprice END, 2) AS price_r,
        |  o_orderstatus
        |FROM (SELECT o_orderkey, o_totalprice, o_orderstatus,
        |        CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS bucket
        |      FROM orders)
        |WHERE bucket < 85 OR o_orderstatus IN ('F', 'O')
        |ORDER BY o_orderkey""".stripMargin,

    // merge_delete_where: the predicate delete must equal the plain
    // complement filter (NULL-predicate rows survive per SQL).
    "merge_delete_where" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS price_r,
        |  o_orderstatus
        |FROM orders
        |WHERE NOT (o_totalprice > 250000)
        |ORDER BY o_orderkey""".stripMargin,

    // merge_update_where: the in-place UPDATE must equal the CASE
    // restatement — exactly the matching rows, exactly the SET.
    "merge_update_where" ->
      """SELECT o_orderkey,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
        |                  1, 8)) AS BIGINT) % 100 < 10
        |       THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
        |  o_orderstatus
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // merge_change_feed: the computed CDC read must equal the change
    // set restated from the source and the fold rule — every changed
    // key, correctly classified, right image, and nothing else.
    "merge_change_feed" ->
      """SELECT o_orderkey,
        |  CASE WHEN bucket BETWEEN 80 AND 84 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderstatus,
        |  CASE WHEN bucket <= 84 THEN 'update'
        |       WHEN bucket <= 89 THEN 'delete'
        |       ELSE 'insert' END AS change_type
        |FROM (SELECT o_orderkey, o_totalprice, o_orderstatus,
        |        CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS bucket
        |      FROM orders)
        |WHERE bucket BETWEEN 80 AND 94
        |ORDER BY o_orderkey""".stripMargin,

    // merge_delete_mor: the merge-on-read delete lifecycle (tombstone →
    // anti-join read → materialize → vacuum) must equal the same plain
    // complement filter the copy-on-write delete does.
    "merge_delete_mor" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS price_r,
        |  o_orderstatus
        |FROM orders
        |WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 100 < 70
        |ORDER BY o_orderkey""".stripMargin,

    // scan_dictmap_pruned: dictionary (distinct-set) point-lookup
    // pruning — a fine-grained source inside a coarse source-group
    // partitioning — must be invisible in the data; the oracle is the
    // plain equality filter.
    "scan_dictmap_pruned" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE source = 'src13'
        |ORDER BY doc_id""".stripMargin,

    // scan_bloom_pruned: per-partition bloom point-lookup pruning on
    // the high-cardinality doc_id inside the coarse source-group
    // partitioning — false positives read-and-filter, so the oracle is
    // the plain IN-filter.
    "scan_bloom_pruned" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE doc_id IN (2, 23, 41)
        |ORDER BY doc_id""".stripMargin,

    // sql_store_read: the bloom point lookup issued through the SQL
    // front door (graft catalog) — same plain IN-filter oracle as
    // scan_bloom_pruned, so equality proves the catalog path is
    // invisible in the data.
    "sql_store_read" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE doc_id IN (2, 23, 41)
        |ORDER BY doc_id""".stripMargin,

    // sql_timetravel: TIMESTAMP AS OF through the SQL catalog reads
    // exactly version 1's snapshot (REQUIRE-pinned equal to VERSION AS
    // OF 1, strictly behind current) — the oracle is the pre-update
    // filter.
    "sql_timetravel" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE doc_id < 300
        |ORDER BY doc_id""".stripMargin,

    // sql_delete: DELETE FROM … WHERE through the SQL catalog (the
    // store's predicate delete, CoW) — the oracle is the complement
    // filter; a REQUIRE-pinned failed untranslatable delete must be
    // invisible here.
    "sql_delete" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE NOT (n_chars < 500 OR source = 'src3')
        |ORDER BY doc_id""".stripMargin,

    // sql_insert: INSERT INTO … SELECT through the SQL catalog is the
    // store's upsert (merge key from the persisted keyCol table
    // property), so the oracle is the replayed-union semantics over
    // the three key bands; the REQUIRE-pinned constraint-violating
    // insert published nothing.
    "sql_insert" ->
      """SELECT doc_id, source,
        |       CASE WHEN doc_id < 50 THEN n_chars + 1000
        |            ELSE n_chars END AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // sql_maintenance: SQL DELETE leaves MOR tombstones, CALL
    // graft.system.optimize z-orders them away with fresh bounds, and
    // the pruned range read-back equals the plain conjunctive filter
    // over the delete's complement.
    "sql_maintenance" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE NOT (n_chars >= 300)
        |  AND doc_id <= 4 AND n_chars BETWEEN 50 AND 1500
        |ORDER BY doc_id""".stripMargin,

    // sql_ctas: CREATE TABLE AS SELECT materializes the store, a later
    // INSERT INTO upserts through the persisted keyCol property — the
    // oracle is the replayed-union semantics over the three key bands.
    "sql_ctas" ->
      """SELECT doc_id, source,
        |       CASE WHEN doc_id < 50 THEN n_chars + 1000
        |            ELSE n_chars END AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // sql_overwrite: INSERT OVERWRITE replaces the whole table with
    // the batch in one atomic version — the oracle IS the replacement
    // select, so equality proves the replace is total and exact.
    "sql_overwrite" ->
      """SELECT doc_id, source, n_chars * 2 AS n_chars
        |FROM documents
        |WHERE n_chars < 400
        |ORDER BY doc_id""".stripMargin,

    // sql_update: row-level UPDATE through the SQL door (planner
    // strategy → mergeUpdateWhere CoW) — the oracle replays the SET
    // arithmetic as a CASE, so equality proves exactly the asked rows
    // and columns changed (and the REQUIRE-pinned illegal forms
    // published nothing).
    "sql_update" ->
      """SELECT doc_id, source,
        |       CASE WHEN doc_id % 7 = 0 AND n_chars < 800
        |            THEN n_chars +
        |                 (CASE WHEN source = 'src1' THEN 10 ELSE 1 END)
        |            ELSE n_chars END AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // sql_merge: MERGE INTO through the SQL door — one changelog
    // commit carrying matched updates (doc_id < 40), matched deletes
    // (40–59), not-matched inserts (>= 300, verbatim), and the NOT
    // MATCHED BY SOURCE update (280–299 zeroed: in the store, absent
    // from the source); 60–279 untouched. The oracle replays the four
    // bands.
    "sql_merge" ->
      """SELECT doc_id, source,
        |       CASE WHEN doc_id < 40 THEN n_chars + 500
        |            WHEN doc_id >= 280 AND doc_id < 300 THEN 0
        |            ELSE n_chars END AS n_chars
        |FROM documents
        |WHERE NOT (doc_id >= 40 AND doc_id < 60)
        |ORDER BY doc_id""".stripMargin,

    // sql_evolve: ALTER TABLE ADD COLUMNS declares lang as metadata,
    // reads null-fill it, and the carrying INSERT (doc_id < 100)
    // materializes 'en' for that band through upsert evolution — the
    // oracle replays the band with NULL elsewhere.
    "sql_evolve" ->
      """SELECT doc_id, source, n_chars,
        |       CASE WHEN doc_id < 100 THEN 'en' ELSE NULL END AS lang
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // sql_constraint: ADD CONSTRAINT gates writes (the violating
    // band only lands AFTER DROP CONSTRAINT), so the oracle is the
    // store band (doc_id >= 10, verbatim) plus the formerly violating
    // band (doc_id < 10 at n_chars = -1 - doc_id).
    "sql_constraint" ->
      """SELECT doc_id, source,
        |       CASE WHEN doc_id < 10 THEN -1 - doc_id
        |            ELSE n_chars END AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // sql_drop_column: the mask half of schema evolution — the
    // dropped column vanishes from the schema in one metadata commit
    // and the post-drop INSERT aligns to the narrowed schema; the
    // oracle is the replayed content WITHOUT the column.
    "sql_drop_column" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // sql_show_partitions: SHOW PARTITIONS renders the manifest
    // names; DROP PARTITION removes one band — the oracle is the
    // distinct renderings minus the dropped band.
    "sql_show_partitions" ->
      """SELECT DISTINCT 'src_grp=' || CAST(doc_id % 4 AS VARCHAR)
        |  AS partition
        |FROM documents
        |WHERE doc_id % 4 <> 3
        |ORDER BY partition""".stripMargin,

    // sql_branch_wap: write-audit-publish entirely in SQL — the
    // published union is the only content that ever reached main (the
    // risky branch's publish failed its audit and was abandoned).
    "sql_branch_wap" ->
      """SELECT doc_id, source,
        |       CASE WHEN doc_id < 50 THEN n_chars + 1000
        |            ELSE n_chars END AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // stream_table_read: the plain table streamed as row images
    // (readStream.table): an append sink accumulates the bootstrap
    // snapshot plus exactly one image per later insert/update — the
    // oracle is the UNION ALL of the three phases.
    "stream_table_read" ->
      """SELECT doc_id, n_chars FROM documents WHERE doc_id < 300
        |UNION ALL
        |SELECT doc_id, n_chars + 1000 AS n_chars FROM documents
        |WHERE doc_id < 50
        |UNION ALL
        |SELECT doc_id, n_chars FROM documents WHERE doc_id >= 300
        |ORDER BY doc_id, n_chars""".stripMargin,

    // stream_table_write: writeStream.toTable INTO the versioned store
    // (one upsert-committed version per micro-batch, exactly-once by
    // the applied-batch ledger): v1 = docs < 300; trigger 1 inserts
    // the rest; trigger 2 upserts docs < 50 with n_chars + 1000 — the
    // final table is every doc at its LATEST image.
    "stream_table_write" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id < 50 THEN n_chars + 1000
        |            ELSE n_chars END AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // sql_store_agg: COUNT(*)/MIN/MAX through the SQL catalog answered
    // from parquet footers + manifest names (REQUIRE-pinned: zero data
    // files in the plan) — the oracle proves the metadata numbers are
    // exactly the table's.
    "sql_store_agg" ->
      """SELECT count(*) AS cnt, min(doc_id) AS mn, max(doc_id) AS mx
        |FROM documents""".stripMargin,

    // scan_skip_composed: all three skipping tiers (range + dict +
    // bloom) intersected in one pruning pass — the oracle is the plain
    // conjunctive filter.
    "scan_skip_composed" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE doc_id BETWEEN 0 AND 300
        |  AND source = 'src13'
        |ORDER BY doc_id""".stripMargin,

    // merge_evolve_spec: METADATA-TIER partition evolution — old
    // layout carried byte-identical under a range-disjoint append,
    // then lazily migrated by a cross-layout upsert; the oracle is the
    // plain restatement with the upsert's CASE'd n_chars.
    "merge_evolve_spec" ->
      """SELECT doc_id, source,
        |  CASE WHEN doc_id < 50 THEN n_chars * 3 ELSE n_chars END
        |    AS n_chars,
        |  lang
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // merge_repartition: partition evolution (source-group layout →
    // by-language layout) as one atomic full-rewrite commit with MOR
    // tombstones folding in — the oracle is the plain restatement of
    // the surviving rows, so equality proves the rewrite changed
    // nothing but the directory shape.
    "merge_repartition" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 100 < 90
        |ORDER BY doc_id""".stripMargin,

    // merge_zorder_compact: the Morton rewrite + tombstone fold-in +
    // stats refresh + two-range pruned read must equal the plain
    // conjunctive filter over the undeleted complement.
    "merge_zorder_compact" ->
      """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price_r
        |FROM orders
        |WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 100 < 90
        |  AND o_custkey BETWEEN 40 AND 139
        |  AND o_orderkey BETWEEN 0 AND 1200
        |ORDER BY o_orderkey""".stripMargin,

    // merge_refresh_stats: after a dictionary shed and a one-scan
    // re-analyze, dict pruning must see exactly the current content —
    // the src13 rows plus the doc the query flipped to src13.
    "merge_refresh_stats" ->
      """WITH m AS (SELECT min(doc_id) AS mk FROM documents)
        |SELECT doc_id,
        |  CASE WHEN doc_id = (SELECT mk FROM m) THEN 'src13'
        |       ELSE source END AS source,
        |  n_chars
        |FROM documents
        |WHERE source = 'src13' OR doc_id = (SELECT mk FROM m)
        |ORDER BY doc_id""".stripMargin,

    // scan_zonemap_multi: intersection pruning over per-column bounds
    // must be invisible in the data — the oracle is the plain
    // conjunctive filter.
    "scan_zonemap_multi" ->
      """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price_r
        |FROM orders
        |WHERE o_custkey BETWEEN 40 AND 139
        |  AND o_orderkey BETWEEN 0 AND 1200
        |ORDER BY o_orderkey""".stripMargin,

    // scan_zorder: the oracle replays the two-dimensional slice from
    // the ORIGINAL table — equality proves the Morton-clustered export
    // is content-complete.
    "scan_zorder" ->
      """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price_r
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 200
        |  AND o_totalprice BETWEEN 50000 AND 150000
        |ORDER BY o_orderkey""".stripMargin,

    // merge_retention: the manifest drop must equal a plain filter on
    // the source — keep the newest month's days from the 15th on.
    "merge_retention" ->
      """WITH mx AS (
        |  SELECT strftime(MAX(ts), '%Y-%m-') || '15' AS cut
        |  FROM events)
        |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS day_s
        |FROM events CROSS JOIN mx
        |WHERE strftime(ts, '%Y-%m-%d') >= cut
        |ORDER BY event_id""".stripMargin,

    // merge_cdc: the expected v1→v2 changelog restated from the source
    // table and the fold rule (80-89 update, 90-99 insert).
    "merge_cdc" ->
      """WITH b AS (SELECT o_orderkey, o_totalprice,
        |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |         AS BIGINT) % 100 AS bucket
        |  FROM orders)
        |SELECT o_orderkey,
        |  CASE WHEN bucket >= 90 THEN 'insert' ELSE 'update' END AS change,
        |  CASE WHEN bucket >= 90 THEN NULL
        |       ELSE ROUND(o_totalprice, 2) END AS old_price_r,
        |  ROUND(o_totalprice * 2, 2) AS new_price_r
        |FROM b WHERE bucket >= 80 ORDER BY o_orderkey""".stripMargin,

    // scan_dpp: the oracle replays the dim slice from the ORIGINAL
    // table with an inline VALUES dim — equality proves the partitioned
    // round-trip AND that dynamic pruning dropped no rows.
    "scan_dpp" ->
      """WITH dim AS (SELECT * FROM (VALUES
        |    ('F', 'terminal'), ('O', 'open'), ('P', 'terminal'))
        |  t(o_orderstatus, status_class))
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
        |            AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
        |FROM orders JOIN dim USING (o_orderstatus)
        |WHERE status_class = 'terminal'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // agg_incremental: one flat GROUP BY over ALL events — the Spark
    // side reaches the same rows through base + two incremental folds
    // (plus a replayed fold that must no-op), so equality proves
    // partial-merge associativity and the exactly-once ledger at once.
    "agg_incremental" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day_s,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2)))
        |            AS DECIMAL(38,2)) AS VARCHAR) AS sum_value,
        |  ROUND(MIN(value), 4) AS min_value_r,
        |  ROUND(MAX(value), 4) AS max_value_r
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // pipeline_pretrain_corpus: the whole preparation chain replayed as
    // one CTE pipeline — gate, md5-keeper dedup, 5-gram eval-split
    // decontamination, the HUGEINT mixture keep rule, final accounting.
    "pipeline_pretrain_corpus" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS ttr
        |  FROM documents),
        |gated AS (SELECT * FROM base
        |          WHERE n_tokens BETWEEN 10 AND 200 AND ttr >= 0.2),
        |kept AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
        |dd AS (SELECT b.* FROM base b JOIN kept USING (doc_id)),
        |g AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 4, 0)),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i + 1] || ' ' ||
        |           string_split(text, ' ')[i + 2] || ' ' ||
        |           string_split(text, ' ')[i + 3] || ' ' ||
        |           string_split(text, ' ')[i + 4])) AS g
        |    FROM documents)),
        |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
        |contam AS (SELECT DISTINCT t.doc_id FROM g t JOIN bench USING (g)
        |           WHERE t.doc_id % 50 <> 0),
        |clean AS (SELECT * FROM dd
        |          WHERE doc_id % 50 <> 0
        |            AND doc_id NOT IN (SELECT doc_id FROM contam)),
        |c0 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
        |       FROM clean GROUP BY lang),
        |c AS (SELECT lang, n_lang,
        |        CAST(floor(sqrt(n_lang) * 1000000.0) AS HUGEINT) AS w
        |      FROM c0),
        |st AS (SELECT CAST(SUM(w) AS HUGEINT) AS s,
        |         CAST(floor(SUM(n_lang) * 0.5) AS HUGEINT) AS t_target
        |       FROM c),
        |sampled AS (
        |  SELECT cl.* FROM clean cl JOIN c USING (lang) CROSS JOIN st
        |  WHERE CAST(CAST('0x' || substr(md5(CAST(cl.doc_id AS VARCHAR)), 1, 8)
        |               AS BIGINT) AS HUGEINT) * s * CAST(n_lang AS HUGEINT)
        |      < t_target * w * CAST(4294967296 AS HUGEINT))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM sampled GROUP BY lang ORDER BY lang""".stripMargin,

    // dedup_substring: identical 16-token slice arithmetic (1-based
    // inclusive), md5 fingerprints, and the same 2..10 rarity band.
    "dedup_substring" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, fp FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, greatest(len(string_split(text, ' ')) - 15, 0)),
        |      i -> md5(array_to_string(string_split(text, ' ')[i:i+15], ' '))))
        |      AS fp
        |    FROM documents)),
        |r AS (SELECT fp FROM g GROUP BY fp
        |      HAVING count(*) >= 2 AND count(*) <= 10)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM g a JOIN r USING (fp) JOIN g b USING (fp)
        |WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // text_bm25_topk: every double subexpression (idf, length norm,
    // contribution) is written in the same tree shape as the Spark side,
    // then rounded to 6 dp and summed as exact DECIMAL(18,6) — the
    // ranking compares decimals, so float addition order cannot differ.
    "text_bm25_topk" ->
      """WITH dl AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |              CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
        |st2 AS (SELECT n_docs,
        |               CAST(total_len AS DOUBLE) / n_docs AS avgdl FROM st),
        |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM (
        |         SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |         FROM documents)
        |       WHERE t IN ('dup', 'vector', 'merge')
        |       GROUP BY doc_id, t),
        |dft AS (SELECT t, CAST(count(*) AS BIGINT) AS dft
        |        FROM tf GROUP BY t),
        |c AS (SELECT tf.doc_id,
        |        CAST(round(
        |          (ln(((n_docs - dft) + 0.5) / (dft + 0.5) + 1.0)
        |             * (tf * 2.2))
        |          / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)),
        |          6) AS DECIMAL(18,6)) AS c
        |      FROM tf JOIN dft USING (t) JOIN dl USING (doc_id)
        |      CROSS JOIN st2),
        |sc AS (SELECT doc_id, SUM(c) AS score,
        |         CAST(COUNT(*) AS BIGINT) AS n_terms FROM c GROUP BY doc_id)
        |SELECT rnk, doc_id, n_terms, bm25_r FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |           AS BIGINT) AS rnk,
        |    doc_id, n_terms, ROUND(CAST(score AS DOUBLE), 4) AS bm25_r
        |  FROM sc)
        |WHERE rnk <= 20 ORDER BY rnk""".stripMargin,

    // sample_mixture: the keep rule is all-integer (w_d = floor of an
    // IEEE-exact sqrt product, S and the comparison in HUGEINT), so both
    // engines keep bit-identical row sets.
    "sample_mixture" ->
      """WITH c0 AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
        |  FROM documents GROUP BY lang),
        |c AS (SELECT lang, n_lang,
        |        CAST(floor(sqrt(n_lang) * 1000000.0) AS HUGEINT) AS w
        |      FROM c0),
        |st AS (SELECT CAST(SUM(w) AS HUGEINT) AS s,
        |         CAST(floor(SUM(n_lang) * 0.5) AS HUGEINT) AS t_target
        |       FROM c)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN c USING (lang) CROSS JOIN st
        |WHERE CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
        |             AS BIGINT) AS HUGEINT) * s * CAST(n_lang AS HUGEINT)
        |    < t_target * w * CAST(4294967296 AS HUGEINT)
        |ORDER BY d.doc_id""".stripMargin,

    // sample_token_budget: identical all-integer rule — hash-ordered
    // running token prefix sum per language, keep while cum <= DIV-2
    // budget (explicit ROWS frame on both engines).
    "sample_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) AS h
        |  FROM documents),
        |b AS (SELECT lang, CAST(SUM(n_tokens) // 2 AS BIGINT) AS budget
        |      FROM t GROUP BY lang),
        |c AS (SELECT doc_id, lang, n_tokens,
        |        SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t)
        |SELECT doc_id, lang, n_tokens
        |FROM c JOIN b USING (lang)
        |WHERE cum <= budget
        |ORDER BY doc_id""".stripMargin,

    // sample_rebalance: identical all-integer keep rule — md5-prefix int
    // (DuckDB parses '0x…', Spark uses conv(…,16,10)) scaled by the class
    // histogram; both engines therefore keep exactly the same rows.
    "sample_rebalance" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
        |f AS (SELECT min(n_lang) AS n_min FROM c)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN c USING (lang) CROSS JOIN f
        |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      * c.n_lang < f.n_min * 4294967296
        |ORDER BY d.doc_id""".stripMargin,

    // dedup_paragraph: identical non-overlapping chunk arithmetic
    // (1-based inclusive list slices), md5 fingerprints, and the same
    // (doc, chunk) min-tuple keeper rule.
    "dedup_paragraph" ->
      """WITH p AS (
        |  SELECT doc_id, cid,
        |    md5(array_to_string(
        |      string_split(text, ' ')[(cid * 64 + 1):(cid * 64 + 64)],
        |      ' ')) AS fp
        |  FROM documents,
        |    unnest(generate_series(0,
        |      ((len(string_split(text, ' ')) + 63) // 64) - 1))
        |      AS t(cid)),
        |f AS (
        |  SELECT fp, MIN(ROW(doc_id, cid)) AS keeper,
        |    CAST(COUNT(*) AS BIGINT) AS n_copies
        |  FROM p GROUP BY fp)
        |SELECT p.doc_id, CAST(p.cid AS BIGINT) AS chunk_id,
        |  (p.doc_id = (f.keeper)[1] AND p.cid = (f.keeper)[2]) AS keep,
        |  f.n_copies
        |FROM p JOIN f USING (fp)
        |ORDER BY p.doc_id, chunk_id""".stripMargin,

    // text_quality_pctl: percentile ↔ quantile_cont produce bit-equal
    // interpolated doubles (the agg_percentiles contract), so the strict
    // comparison keeps identical rows.
    "text_quality_pctl" ->
      """WITH thr AS (
        |  SELECT lang, quantile_cont(n_chars, 0.9) AS thr
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars
        |FROM documents d JOIN thr USING (lang)
        |WHERE n_chars > thr
        |ORDER BY doc_id""".stripMargin,

    // text_vocab_topp: identical exclusive-prefix window; the 90% rule is
    // cross-multiplied to integers on both sides (no float division).
    "text_vocab_topp" ->
      """WITH freq AS (
        |  SELECT lang, u.token AS token, count(*) AS cnt
        |  FROM documents, unnest(string_split(text, ' ')) AS u(token)
        |  GROUP BY lang, u.token),
        |w AS (
        |  SELECT lang, token, cnt,
        |    row_number() OVER
        |      (PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rank,
        |    coalesce(sum(cnt) OVER
        |      (PARTITION BY lang ORDER BY cnt DESC, token ASC
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
        |    sum(cnt) OVER (PARTITION BY lang) AS total
        |  FROM freq)
        |SELECT lang, token, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(rank AS BIGINT) AS rank
        |FROM w
        |WHERE cum_before * 10 < total * 9
        |ORDER BY lang, rank""".stripMargin,

    // text_pack_sequences: the Spark side computes the running token
    // count as a distributed prefix sum; the oracle is the equivalent
    // single-window formulation.
    "text_pack_sequences" ->
      """SELECT doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
        |  CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_offset
        |FROM (
        |  SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY doc_id) AS cum
        |  FROM (SELECT doc_id,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,

    // text_chunk: identical window arithmetic — K = ceil((n-64)/48)+1
    // (min 1), chunk i = 1-based words[i*48+1 .. i*48+64]. DuckDB list
    // slices are 1-based with INCLUSIVE end and clamp at the list end,
    // matching Spark's slice(words, start, 64) exactly.
    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS words,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, words,
        |    CASE WHEN n <= 64 THEN 1 ELSE (n - 17) // 48 + 1 END AS k
        |  FROM t
        |), u AS (
        |  SELECT doc_id, words, unnest(range(0, k)) AS i FROM s
        |)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
        |  array_to_string(words[i*48+1 : i*48+64], ' ') AS chunk,
        |  CAST(len(words[i*48+1 : i*48+64]) AS INTEGER) AS n_words
        |FROM u
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // join_cbo_reorder: oracle is the same star chain in natural order —
    // CBO join reordering is a physical choice and must not change the
    // aggregate.
    "join_cbo_reorder" ->
      """SELECT n_name,
        |       count(*) AS n_items,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // join_bucketed: oracle is the PLAIN join — bucketing is a physical
    // layout choice and must not change the result.
    "join_bucketed" ->
      """SELECT l_orderkey, l_linenumber, o_orderpriority, l_quantity
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // data_split: engine-portable deterministic fold — first 8 hex chars
    // of md5(doc_id) mod 100 (identical md5 both sides).
    "data_split" ->
      """SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS fold
        |FROM (SELECT doc_id,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS bucket
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // agg_decimal: exact integer-scaled arithmetic, every intermediate
    // pinned to an explicit (precision, scale) — matches Spark's casts.
    "agg_decimal" ->
      """SELECT l_returnflag,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
        |            AS DECIMAL(38,2)) AS VARCHAR) AS sum_base,
        |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    AS DECIMAL(18,4))
        |    * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))
        |    AS DECIMAL(24,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "sub_exists" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '5-LOW')
        |ORDER BY c_custkey""".stripMargin,

    "join_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin,

    "sub_scalar" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "sub_in" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderstatus = 'F'
        |                          AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "map_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (1 - CAST(l_discount AS DECIMAL(12,2)))
        |    * (1 + CAST(l_tax AS DECIMAL(12,2))), 2) AS DOUBLE) AS charge_r,
        |  l_returnflag || '-' || l_linestatus AS flag_status
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "filter_pred" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'P')
        |  AND o_totalprice BETWEEN 10000 AND 200000
        |  AND (o_orderpriority LIKE '%URGENT%' OR o_orderpriority LIKE '5-%')
        |  AND NOT (o_custkey % 10 = 3)
        |ORDER BY o_orderkey""".stripMargin,

    "flatmap_explode" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |FROM documents ORDER BY doc_id, token""".stripMargin,

    "join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "join_broadcast" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue_r
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty_r,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_r,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_r,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge_r,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty_r,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price_r,
        |  ROUND(AVG(l_discount), 4) AS avg_disc_r,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_count_distinct" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS d_part,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS d_supp
        |FROM lineitem""".stripMargin,

    "win_rownum_topk" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "sort_multi" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
        |ORDER BY c_nationkey ASC, c_acctbal DESC, c_custkey ASC""".stripMargin,

    "topk_global" ->
      """SELECT l_orderkey,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue_r
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY revenue_r DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  ROUND(SUM(value), 2) AS sum_value_r
        |FROM events GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin,

    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, md5(text) AS h
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,

    "sim_cosine_topk" ->
      """WITH n AS (
        |  SELECT vec_id, vd, sqrt(list_sum(list_transform(vd, x -> x * x))) AS nrm
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings) v
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_sum(list_transform(list_zip(a.vd, b.vd),
        |                                p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) AS cos_r
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |ORDER BY cos_r DESC, id_a ASC, id_b ASC LIMIT 10""".stripMargin,

    "text_wordcount" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin,

    "text_stats" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  ROUND(AVG(n_chars), 2) AS avg_chars_r,
        |  ROUND(AVG(len(string_split(text, ' '))), 2) AS avg_tokens_r
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // ---- wave 2: joins ----

    "join_left_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,

    "join_full_outer" ->
      """SELECT c_custkey, c_name, o_custkey, n_orders, total_r
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    ROUND(SUM(o_totalprice), 2) AS total_r
        |  FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey) o
        |ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_custkey ASC NULLS FIRST""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,

    "join_cross" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin,

    "join_theta_range" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.ts < b.ts
        |  AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |ORDER BY 1, 2, 3""".stripMargin,

    "join_asof" ->
      """SELECT user_id, p_id, p_ts, c_id, c_ts FROM (
        |  SELECT p.user_id, p.event_id AS p_id, p.ts AS p_ts,
        |    c.event_id AS c_id, c.ts AS c_ts,
        |    ROW_NUMBER() OVER (PARTITION BY p.event_id
        |                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts < p.ts) t
        |WHERE rn = 1 ORDER BY p_id""".stripMargin,

    // join_asof_tolerance: the same as-of argmax with the 1-hour
    // attribution window on the click side.
    "join_asof_tolerance" ->
      """SELECT user_id, p_id, p_ts, c_id, c_ts FROM (
        |  SELECT p.user_id, p.event_id AS p_id, p.ts AS p_ts,
        |    c.event_id AS c_id, c.ts AS c_ts,
        |    ROW_NUMBER() OVER (PARTITION BY p.event_id
        |                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts < p.ts
        |   AND c.ts >= p.ts - INTERVAL 1 HOUR) t
        |WHERE rn = 1 ORDER BY p_id""".stripMargin,

    // join_asof_sorted: identical semantics to join_asof (the Spark side
    // replaces the inequality join with a sort + running window; the
    // result contract is unchanged), so the oracle is the same SQL.
    "join_asof_sorted" ->
      """SELECT user_id, p_id, p_ts, c_id, c_ts FROM (
        |  SELECT p.user_id, p.event_id AS p_id, p.ts AS p_ts,
        |    c.event_id AS c_id, c.ts AS c_ts,
        |    ROW_NUMBER() OVER (PARTITION BY p.event_id
        |                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts < p.ts) t
        |WHERE rn = 1 ORDER BY p_id""".stripMargin,

    // ---- wave 2: aggregations ----

    "agg_multikey_having" ->
      """SELECT n_name, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  ROUND(AVG(o_totalprice), 2) AS avg_price_r
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, o_orderstatus
        |HAVING COUNT(*) > 20
        |ORDER BY n_name, o_orderstatus""".stripMargin,

    "agg_conditional" ->
      """SELECT user_id,
        |  ROUND(SUM(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 2) AS click_value_r,
        |  ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value_r,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty_r
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "agg_rollup" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  ROUND(SUM(c_acctbal), 2) AS sum_bal_r
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_price_r
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_r,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_r
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // agg_stats: moments as exact decimal sums, final algebra in double with
    // the formula textually identical to the Spark side — bitwise match.
    "agg_stats" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
        |    CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS st,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sdt
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND(sqrt((spp - sp * sp / n) / (n - 1)), 4) + 0.0 AS sd_price_r,
        |  ROUND((sqq - sq * sq / n) / (n - 1), 4) + 0.0 AS var_qty_r,
        |  ROUND((sqp - sq * sp / n) / sqrt((sqq - sq * sq / n) * (spp - sp * sp / n)), 4) + 0.0 AS corr_qp_r,
        |  ROUND((sdt - sd * st / n) / (n - 1), 6) + 0.0 AS cov_dt_r
        |FROM t ORDER BY l_returnflag""".stripMargin,

    // agg_skew_kurt: same exact decimal power sums, same raw-moment
    // algebra in textually identical double arithmetic. The intermediate
    // products are explicitly widened to int128-backed decimals — DuckDB
    // multiplies int64-backed DECIMAL(≤18) physically and raises a runtime
    // overflow on price³ otherwise. The widening casts are exact, so the
    // sums still equal Spark's bit-for-bit after the double cast.
    "agg_skew_kurt" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2)) AS DECIMAL(24,4)) * CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE) AS s3,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2)) AS DECIMAL(20,4)) * CAST(CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2)) AS DECIMAL(18,4))) AS DOUBLE) AS s4,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS p1,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS p2,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2)) AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS p3
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n)) / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 4) + 0.0 AS skew_qty_r,
        |  ROUND((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n) - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3, 4) + 0.0 AS kurt_qty_r,
        |  ROUND((p3 / n - 3 * (p1 / n) * (p2 / n) + 2 * (p1 / n) * (p1 / n) * (p1 / n)) / pow(p2 / n - (p1 / n) * (p1 / n), 1.5), 4) + 0.0 AS skew_price_r
        |FROM t ORDER BY l_returnflag""".stripMargin,

    // agg_corr: same exact-decimal cross sums (q×p → DECIMAL(17,4), under
    // both engines' 38-digit caps with room), same double formula text.
    "agg_corr" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  FLOOR((sxy - sx * sy / n)
        |        / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n))
        |        * 1000000.0 + 0.5) / 1000000.0 AS corr_r,
        |  FLOOR((sxy - sx * sy / n) / (n - 1.0)
        |        * 10000.0 + 0.5) / 10000.0 AS covs_r,
        |  FLOOR((sxy - sx * sy / n) / n
        |        * 10000.0 + 0.5) / 10000.0 AS covp_r
        |FROM t ORDER BY l_returnflag""".stripMargin,

    "agg_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY count(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY 1, 2
        |) WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "agg_bool" ->
      """SELECT o_orderstatus,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_totalprice > 400000) AS any_over_400k,
        |  count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "win_cume_dist" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  ROUND(cume_dist() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal), 6) AS cd_r
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 4096 AS bor,
        |  xor(o_orderkey, o_custkey) AS bxor,
        |  (o_orderkey & 15) << 3 AS shl,
        |  o_orderkey >> 4 AS shr,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS bcnt
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "agg_collect_sorted" ->
      """SELECT o_custkey,
        |  array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // ---- wave 2: windows ----

    "win_rank_dense" ->
      """SELECT p_brand, p_partkey, p_retailprice, rnk, drnk FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
        |    DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
        |  FROM part) t
        |WHERE rnk <= 5 ORDER BY p_brand, p_partkey""".stripMargin,

    "win_lag_lead" ->
      """SELECT user_id, event_id,
        |  ROUND(value - LAG(value, 1) OVER w, 2) AS delta_prev_r,
        |  LEAD(event_id, 1) OVER w AS next_event_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total_r
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mavg_r
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_ntile_pctrank" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
        |  ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal), 4) AS pct_r
        |FROM customer ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_key,
        |  LAST_VALUE(o_orderkey) OVER w AS last_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_dist_nth" ->
      """SELECT c_mktsegment, c_custkey,
        |  ROUND(cume_dist() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal), 4) AS cdist_r,
        |  nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_key
        |FROM customer ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "agg_pivot" ->
      """SELECT user_id,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0)
        |    AS BIGINT) AS click,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
        |    AS BIGINT) AS purchase,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0)
        |    AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "sort_pagination" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 100""".stripMargin,

    "fn_hash" ->
      """SELECT p_partkey, md5(p_name) AS md5_name,
        |  sha256(p_name) AS sha256_name
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_datetime_fmt" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M') AS fmt_minute,
        |  strftime(ts, '%Y-%m') AS fmt_month,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
        |FROM events ORDER BY event_id""".stripMargin,

    // ---- wave 2: set ops ----

    "set_union_all" ->
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY k""".stripMargin,

    "set_union_distinct" ->
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY k""".stripMargin,

    "set_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY k""".stripMargin,

    "set_except" ->
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY k""".stripMargin,

    // ---- wave 2: scalar function families ----

    "fn_string" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  lower(p_type) AS low,
        |  trim('  ' || p_name || '  ') AS trimmed,
        |  substring(p_name, 1, 4) AS pre4,
        |  length(p_name) AS len,
        |  replace(p_name, ' ', '_') AS snake,
        |  regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        |  p_type || ':' || p_brand AS type_brand,
        |  string_split(p_name, ' ')[2] AS tok2
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_datetime" ->
      """SELECT event_id,
        |  year(ts) AS yr, month(ts) AS mo, day(ts) AS dom,
        |  hour(ts) AS hr, minute(ts) AS mi,
        |  date_trunc('day', ts) AS day_start,
        |  ts + INTERVAL 90 MINUTE AS plus90m,
        |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_in
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(sqrt(l_extendedprice), 4) AS sqrt_r,
        |  ROUND(ln(l_extendedprice), 4) AS ln_r,
        |  ROUND(exp(l_discount), 4) AS exp_r,
        |  ROUND(pow(l_quantity, 2), 2) AS pow_r,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        |  ROUND(abs(l_extendedprice - 1000.0), 2) AS absdiff_r,
        |  l_orderkey % 7 AS mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
        |  least(o_totalprice, 150000.0) AS least_p,
        |  greatest(o_totalprice, 150000.0) AS greatest_p
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_array" ->
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  ROUND(vd[1], 4) + 0.0 AS first_r,
        |  ROUND(list_sum(list_transform(vd, x -> x * x)), 4) + 0.0 AS ssq_r,
        |  ROUND(list_max(vd), 4) + 0.0 AS max_r,
        |  array_to_string(list_transform(vd[1:3],
        |    x -> printf('%.4f', ROUND(x, 4) + 0.0)), ',') AS head3_r
        |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd, embedding
        |      FROM embeddings) t
        |ORDER BY vec_id""".stripMargin,

    "fn_array_setops" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(string_split(text, ' ')) AS ta,
        |    ['fast', 'slow', 'join', 'table'] AS tb,
        |    string_split(text, ' ') AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  COALESCE(array_to_string(list_sort(list_intersect(ta, tb)), ','), '') AS inter,
        |  COALESCE(array_to_string(list_sort(list_filter(ta, x -> NOT list_contains(tb, x))), ','), '')
        |    AS minus,
        |  len(list_intersect(ta, tb)) > 0 AS overlaps,
        |  CAST(list_position(raw, 'fast') AS BIGINT) AS first_fast
        |FROM t ORDER BY doc_id""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  ROUND(AVG(o_totalprice), 2) AS avg_price_r
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "fn_string2" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS lp,
        |  rpad(p_brand, 12, '*') AS rp,
        |  repeat(p_type, 2) AS rep,
        |  reverse(p_name) AS rev,
        |  CAST(strpos(p_name, ' ') AS BIGINT) AS space_at,
        |  translate(p_name, 'aeiou', 'AEIOU') AS tr
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_json" ->
      """SELECT k, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  ROUND(SUM(value), 2) AS sum_value_r
        |FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, value
        |      FROM events) t
        |GROUP BY k ORDER BY k""".stripMargin,

    // ---- wave 3: event-time windows ----

    "stream_sliding" ->
      """WITH slotted AS (
        |  SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP) AS slot,
        |    event_type, value
        |  FROM events
        |), ex AS (
        |  SELECT unnest([slot, slot - INTERVAL 30 MINUTE]) AS win_start,
        |    event_type, value
        |  FROM slotted
        |)
        |SELECT win_start, event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  ROUND(SUM(value), 2) AS sum_value_r
        |FROM ex GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,

    "stream_session" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM (SELECT user_id, ts, value,
        |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |        FROM events) t
        |), s AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  ROUND(SUM(value), 2) AS sum_value_r
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // ---- wave 3: similarity / text ----

    "sim_knn_label" ->
      """WITH n AS (
        |  SELECT vec_id, label, vd,
        |    sqrt(list_sum(list_transform(vd, x -> x * x))) AS nrm
        |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vd
        |        FROM embeddings) v
        |), pairs AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid, b.label AS nlabel,
        |    ROUND(list_sum(list_transform(list_zip(a.vd, b.vd),
        |          p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) AS cos_r
        |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
        |), top5 AS (
        |  SELECT qid, nlabel FROM (
        |    SELECT qid, nlabel,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |                         ORDER BY cos_r DESC, nid ASC) AS rn
        |    FROM pairs) t
        |  WHERE rn <= 5
        |), votes AS (
        |  SELECT qid, nlabel, CAST(COUNT(*) AS BIGINT) AS votes
        |  FROM top5 GROUP BY qid, nlabel
        |)
        |SELECT qid AS vec_id, nlabel AS pred_label, votes FROM (
        |  SELECT qid, nlabel, votes,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |                       ORDER BY votes DESC, nlabel ASC) AS r
        |  FROM votes) t
        |WHERE r = 1 ORDER BY vec_id""".stripMargin,

    "text_ngrams" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |b AS (
        |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        |  FROM t
        |)
        |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM b GROUP BY bigram
        |ORDER BY cnt DESC, bigram ASC LIMIT 30""".stripMargin,

    "text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
        |), n AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT doc_id, term,
        |  ROUND(tf * ln(CAST(n AS DOUBLE) / df), 4) AS tfidf_r
        |FROM tf JOIN df USING (term) CROSS JOIN n
        |ORDER BY tfidf_r DESC, doc_id ASC, term ASC LIMIT 50""".stripMargin,

    "text_sentiment" ->
      """SELECT doc_id,
        |  CAST(SUM(CASE WHEN term IN ('fast', 'big') THEN 1
        |                WHEN term IN ('slow', 'small') THEN -1
        |                ELSE 0 END) AS BIGINT) AS sentiment
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |      FROM documents) t
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // ---- wave 3: UDF / UDAF ----

    "udf_scalar" ->
      """SELECT p_partkey,
        |  regexp_replace(lower(p_name), '[^a-z0-9]', '', 'g') AS norm_name
        |FROM part ORDER BY p_partkey""".stripMargin,

    "udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |  ROUND(SUM(l_extendedprice * l_discount) / SUM(l_discount), 4) AS wavg_r
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "udaf_topk_acc" ->
      """SELECT o_custkey,
        |  array_to_string(
        |    (list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey ASC))[1:5], ',')
        |    AS top_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "typed_mapgroups" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    date_diff('day', CAST(LAG(o_orderdate) OVER w AS DATE),
        |              CAST(o_orderdate AS DATE)) AS gap
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |)
        |SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_days
        |FROM g GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // ---- wave 4: training-data pipeline text analysis ----

    "text_langid" ->
      """SELECT doc_id,
        |  CASE WHEN list_contains(toks, 'the') OR list_contains(toks, 'a') THEN 'en'
        |       WHEN list_contains(toks, 'le') OR list_contains(toks, 'la') THEN 'fr'
        |       WHEN list_contains(toks, 'der') OR list_contains(toks, 'und') THEN 'de'
        |       WHEN list_contains(toks, 'el') OR list_contains(toks, 'los') THEN 'es'
        |       ELSE 'und' END AS pred_lang
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
        |), q AS (
        |  SELECT doc_id, n_chars, len(toks) AS n_tokens,
        |    len(list_distinct(toks)) AS n_distinct,
        |    len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS n_stop
        |  FROM t
        |)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS avg_token_len_r,
        |  ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS ttr_r,
        |  ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio_r,
        |  CASE WHEN n_tokens BETWEEN 10 AND 200
        |        AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.2
        |       THEN 1 ELSE 0 END AS quality_flag
        |FROM q ORDER BY doc_id""".stripMargin,

    "text_tokencount" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pipeline_corpus_clean" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars, text,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS ttr
        |  FROM documents
        |), kept AS (
        |  SELECT MIN(doc_id) AS doc_id FROM d
        |  WHERE n_tokens BETWEEN 10 AND 200 AND ttr >= 0.2
        |  GROUP BY md5(text)
        |)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  ROUND(AVG(n_chars), 2) AS avg_chars_r,
        |  ROUND(AVG(n_tokens), 2) AS avg_tokens_r
        |FROM d JOIN kept USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // ---- wave 4: near-dup detection ----

    "dedup_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(toks) - 2, 0)),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh
        |  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
        |        FROM documents) t
        |)
        |SELECT doc_a, doc_b, jaccard_r FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard_r
        |  FROM d a JOIN d b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id) p
        |WHERE jaccard_r >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,

    // dedup_containment: identical shingle sets and blocking; the
    // intersection count is over distinct string shingles (the Spark
    // side counts distinct xxhash64 values — collision-free at these
    // set sizes, the dedup_ngram_jaccard precedent).
    "dedup_containment" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(toks) - 2, 0)),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh
        |  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
        |        FROM documents) t
        |)
        |SELECT doc_a, doc_b, cont_a_r, cont_b_r FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / len(a.sh), 4) AS cont_a_r,
        |    ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / len(b.sh), 4) AS cont_b_r
        |  FROM d a JOIN d b
        |    ON a.lang = b.lang AND a.source = b.source
        |   AND a.doc_id < b.doc_id) p
        |WHERE cont_a_r >= 0.8 OR cont_b_r >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_embedding" ->
      """WITH n AS (
        |  SELECT vec_id, vd, sqrt(list_sum(list_transform(vd, x -> x * x))) AS nrm
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings) v
        |)
        |SELECT id_a, id_b, cos_r FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    ROUND(list_sum(list_transform(list_zip(a.vd, b.vd),
        |          p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) AS cos_r
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id) p
        |WHERE cos_r >= 0.45 ORDER BY id_a, id_b""".stripMargin,

    // dedup_clusters: transitive closure of the cos>=0.40 pair graph;
    // per node, the smallest reachable vec_id is its cluster label.
    "dedup_clusters" ->
      """WITH RECURSIVE n AS (
        |  SELECT vec_id, vd,
        |    sqrt(list_sum(list_transform(vd, x -> x * x))) AS nrm
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd
        |        FROM embeddings) v
        |), p AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |      ROUND(list_sum(list_transform(list_zip(a.vd, b.vd),
        |            q -> q[1] * q[2])) / (a.nrm * b.nrm), 4) AS cos_r
        |    FROM n a JOIN n b ON a.vec_id < b.vec_id) t
        |  WHERE cos_r >= 0.40
        |), e AS (
        |  SELECT id_a AS u, id_b AS v FROM p
        |  UNION SELECT id_b, id_a FROM p
        |), reach(u, v) AS (
        |  SELECT u, v FROM e
        |  UNION
        |  SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u
        |)
        |SELECT u AS vec_id, LEAST(u, MIN(v)) AS cluster_rep,
        |       u = LEAST(u, MIN(v)) AS keep
        |FROM reach GROUP BY u ORDER BY vec_id""".stripMargin,

    // ---- wave 4: multimodal metadata scan ----

    // mm_shard_pack: the per-kind exclusive byte prefix sum restated as
    // one window (the distributed machinery is plan shape, not
    // semantics); 65536-byte greedy whole-asset shard rule.
    "mm_shard_pack" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS kind,
        |    CAST(strlen(text) AS BIGINT) AS n_bytes
        |  FROM documents),
        |c AS (SELECT asset_id, kind, n_bytes,
        |        SUM(n_bytes) OVER (PARTITION BY kind ORDER BY asset_id)
        |          - n_bytes AS start_byte
        |      FROM a)
        |SELECT asset_id, kind, n_bytes,
        |  CAST(start_byte // 65536 AS BIGINT) AS shard_id,
        |  CAST(start_byte AS BIGINT) AS start_byte
        |FROM c ORDER BY asset_id""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest,
        |  CAST(n_chars % 640 + 1 AS INT) AS width,
        |  CAST(n_chars % 480 + 1 AS INT) AS height
        |FROM documents ORDER BY asset_id""".stripMargin,

    "mm_resize" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CAST(strlen(substr(text, 1, 256)) AS BIGINT) AS n_bytes,
        |  CAST(LEAST(n_chars % 640 + 1, 256) AS INT) AS width,
        |  CAST(LEAST(n_chars % 480 + 1, 256) AS INT) AS height
        |FROM documents ORDER BY asset_id""".stripMargin,

    "mm_frames" ->
      """SELECT doc_id AS asset_id,
        |  CAST(u.i - 1 AS BIGINT) AS frame_no,
        |  CAST(strlen(substr(text, (u.i - 1) * 64 + 1, 64)) AS BIGINT)
        |    AS n_bytes
        |FROM documents,
        |     unnest(generate_series(1, greatest(strlen(text) // 64, 1))) u(i)
        |WHERE doc_id % 3 = 2
        |ORDER BY asset_id, frame_no""".stripMargin,

    // merge_upsert: the merged corpus is pure SQL over the source table —
    // fold < 90 keeps the original row unless the batch (fold >= 80)
    // replaced it; fold >= 90 rows exist only via the batch insert. Net:
    // every order, re-priced iff fold >= 80. Same engine-portable md5
    // fold as data_split. Doubling a double is exact (exponent bump), so
    // no ROUND is needed on o_totalprice.
    // merge_upsert_timetravel: the AS-OF-version-1 read must equal the
    // PRE-merge snapshot — orders in the fold<90 corpus slice at their
    // original prices, untouched by the later merge.
    "merge_upsert_timetravel" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM (SELECT o_orderkey, o_totalprice, o_orderstatus,
        |        CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS bucket
        |      FROM orders)
        |WHERE bucket < 90
        |ORDER BY o_orderkey""".stripMargin,

    "merge_upsert" ->
      """SELECT o_orderkey,
        |  CASE WHEN bucket >= 80 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderstatus
        |FROM (SELECT o_orderkey, o_totalprice, o_orderstatus,
        |        CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS bucket
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    // merge_scd2: the history is a pure function of the source table —
    // v0 row per customer (closed at version 1 iff the key changed, i.e.
    // odd) plus a v1 open row per changed key. The double-apply in the
    // Spark query must be a no-op, so equality also proves idempotence.
    "merge_scd2" ->
      """SELECT c_custkey, c_mktsegment,
        |  ROUND(c_acctbal, 2) AS c_acctbal_r,
        |  CAST(0 AS BIGINT) AS valid_from,
        |  CASE WHEN c_custkey % 2 = 1 THEN CAST(1 AS BIGINT) END AS valid_to
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, 'V2_' || c_mktsegment,
        |  ROUND(ROUND(c_acctbal, 2) + 100, 2),
        |  CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
        |FROM customer WHERE c_custkey % 2 = 1
        |ORDER BY c_custkey, valid_from""".stripMargin
  )
}
