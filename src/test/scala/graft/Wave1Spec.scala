package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** sf0.001 goldens for the T1 slice, computed by independent naive Scala
  * on the driver (SURVEY §5.1) — never by the operator under test. */
class Wave1Spec extends SparkTestBase {

  private lazy val docs: Seq[(Long, String)] = {
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
  }

  test("text_wordcount matches naive driver-side count") {
    val naive = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(20)
    val got = TextOps.textWordcount(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == naive)
  }

  test("flatmap_explode row count = total token count") {
    val naive = docs.map(_._2.split(" ").length.toLong).sum
    assert(TextOps.flatmapExplode(spark, sf).count() == naive)
  }

  test("agg_pricing_summary groups and counts match naive") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity")
      .collect()
      .filter(!_.getAs[java.time.LocalDateTime](2)
        .isAfter(java.time.LocalDateTime.parse("1998-09-02T00:00:00")))
    val naive = rows.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rs) => (k._1, k._2, rs.length.toLong,
        BigDecimal(rs.map(_.getDouble(3)).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = Relational.aggPricingSummary(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("count_order"), r.getAs[Double]("sum_qty_r"))).toSeq
    assert(got == naive)
  }

  test("win_rownum_topk: every customer group has <= 3 rows, rn in 1..3") {
    val got = Relational.winRownumTopk(spark, sf).collect()
    val byCust = got.groupBy(_.getLong(0))
    assert(byCust.values.forall(g => g.length <= 3))
    assert(got.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 3))
  }

  test("dedup_exact is idempotent and keeps min doc_id per text") {
    val naive = docs.groupBy(_._2).map { case (_, ds) => ds.map(_._1).min }
      .toSeq.sorted
    val got = SimOps.dedupExact(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSeq
    assert(got == naive)
  }

  test("sim_cosine_topk matches naive O(n^2) cosine") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val naive = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      na = math.sqrt(va.map(x => x * x).sum)
      nb = math.sqrt(vb.map(x => x * x).sum)
    } yield (ia, ib, BigDecimal(dot / (na * nb)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (a, b, c) => (-c, a, b) }.take(10).toSeq
    val got = SimOps.simCosineTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == naive)
  }

  test("join_inner row count = orders rows (FK always resolves)") {
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(Relational.joinInner(spark, sf).count() == nOrders)
  }

  test("scan_pruned pushes filters into the parquet scan") {
    val plan = Relational.scanPruned(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("l_quantity"), "quantity filter should be pushed")
    // Column pruning: ReadSchema carries only the 4 selected columns.
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_extendedprice"))
  }

  test("join_broadcast plan uses broadcast joins (no shuffle of dims)") {
    val plan = Relational.joinBroadcast(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("determinism: running twice yields identical ordered rows") {
    for (q <- Seq("topk_global", "stream_tumbling", "text_stats")) {
      val f = SparkEntry.queries(q)
      assert(f(spark, sf).collect().toSeq == f(spark, sf).collect().toSeq, q)
    }
  }

  test("every oracleSql key has a queries entry and vice versa (no-oracle allowlist)") {
    // T3 / approx ops: no SQL oracle (SURVEY §2) — xxhash64 is
    // Spark-specific, HLL sketches and ANN results are engine-dependent
    val noOracle = Set("dedup_minhash", "agg_approx_distinct",
                       "dedup_simhash", "sim_ann_bucket",
                       "agg_approx_percentile", "dedup_embedding_ann",
                       "mm_features", "sample_seeded", "sim_ann_ivf",
                       "sim_knn_label_ann", "sim_cosine_topk_ann",
                       "dedup_incremental", "agg_hll_union",
                       "text_quality_ml", "sim_kmeans_cluster",
                       "dedup_clusters_ann", "sim_incremental_ann",
                       "agg_kll_quantiles", "sim_pca_reduce",
                       "graph_pagerank", "win_rolling_distinct",
                       "sim_ann_pq", "agg_incremental_hll")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet) == noOracle)
  }

  test("entry returns >0 rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
