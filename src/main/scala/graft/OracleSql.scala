package graft

/** DuckDB 1.0.0 oracle SQL, one entry per key in SparkEntry.queries
  * (SURVEY.md §2 "oracle=yes" rows). Table names are the bare parquet table
  * names; the driver binds them to the same sf directory Verify ran on.
  *
  * Cross-engine hash-match rules applied throughout (SURVEY.md §7.3):
  * identical column aliases, total ORDER BY over unique keys, ROUND on every
  * floating column, CAST(SUM(int) AS BIGINT), no TIMESTAMPTZ. */
object OracleSql {
  val sql: Map[String, String] = Map(

    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",

    "scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

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
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin
  )
}
