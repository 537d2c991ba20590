package graft

/** Partitioning invariance: declared results must be identical under
  * different shuffle-partition counts — i.e. independent of partial-merge
  * order. This is the property that makes a plan trustworthy on a cluster
  * whose partitioning you don't control (the whole point of the exact-sum
  * / bounded-heap / commutative-sketch designs). */
class InvarianceSpec extends SparkTestBase {

  private val sensitive = Seq(
    "agg_stats",        // exact decimal moment sums
    "agg_regression",   // same pattern
    "udaf_topk_acc",    // bounded-heap UDAF merge
    "dedup_minhash",    // min-sketch merge
    "dedup_simhash",    // simhash sketch aggregate
    "sim_ann_bucket",   // LSH candidates + argmax rerank
    "sim_ann_ivf",      // IVF assignment + argmax rerank
    "text_entropy",     // float-sum rounding exposure
    "agg_skew_kurt",    // exact decimal power sums
    "agg_corr",         // exact decimal cross sums
    "ts_anomaly",       // decimal window moments
    "ts_resample",      // decimal week totals + min_by/max_by argmax
    "ts_ewma",          // per-user sequential fold
    "sim_label_centroids", // decimal component sums + sequential folds
    "agg_ttest",           // exact conditional decimal moments
    "agg_chisq",           // integer contingency + sorted sequential fold
    "agg_bitmap_distinct", // bitmap OR merge (order-proof by construction)
    "sample_rebalance")    // row-local hash threshold, no merge state

  test("results are invariant to shuffle partition count") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    def runAll(n: String): Map[String, Seq[String]] = {
      conf.set("spark.sql.shuffle.partitions", n)
      sensitive.map { q =>
        q -> SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
      }.toMap
    }
    try {
      val a = runAll("2")
      val b = runAll("7")
      sensitive.foreach { q =>
        assert(a(q) == b(q), s"$q differs across partition counts")
      }
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }
}
