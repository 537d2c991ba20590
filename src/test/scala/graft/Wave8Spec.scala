package graft

import org.apache.spark.sql.functions._
import graft.engine.Pipeline
import graft.ops._

/** Wave-8 tests (round 6): incremental dedup vs the whole-corpus operator,
  * partitioned/bucketed sink round-trips, and top-k window plan pins. */
class Wave8Spec extends SparkTestBase {

  private def fold(id: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = h.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 100
  }

  test("dedup_incremental equals whole-corpus dedup restricted to new-old pairs") {
    val inc = SimOps.dedupIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // whole-corpus pairs, reoriented to (new_doc, old_doc)
    val whole = SimOps.dedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = whole.flatMap { case (a, b, est) =>
      (fold(a) >= 90, fold(b) >= 90) match {
        case (true, false) => Some((a, b, est))
        case (false, true) => Some((b, a, est))
        case _             => None // old-old or new-new: out of scope
      }
    }.toSet
    assert(inc == expected,
      s"incremental=${inc.size} pairs, expected=${expected.size}")
  }

  test("dedup_incremental signature store is built once and reused") {
    val path = SimOps.ensureSignatureStore(spark, sf)
    val t0 = new java.io.File(path, "_SUCCESS").lastModified()
    SimOps.dedupIncremental(spark, sf).collect()
    assert(new java.io.File(path, "_SUCCESS").lastModified() == t0,
      "store was rewritten on re-evaluation")
    // store holds only the existing corpus (fold < 90)
    val ids = spark.read.parquet(path).select("doc_id").collect()
      .map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(fold(_) < 90))
  }

  test("sink partitionBy round-trip prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "source")
    Pipeline(docs).sink(dir, partitionBy = Seq("lang"))
    // Hive-style layout on disk
    assert(new java.io.File(dir, "lang=en").isDirectory)
    val back = spark.read.parquet(dir).where(col("lang") === "en")
    val expected = docs.where(col("lang") === "en").count()
    assert(back.count() == expected)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in:\n$plan")
    // the data filter must NOT be a post-scan Filter over all partitions
    assert(!plan.contains("PushedFilters: [IsNotNull(lang)"),
      "lang should prune partitions, not act as a row-group filter")
  }

  test("sinkBucketed table aggregates on the bucket column without a shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Pipeline(li).sinkBucketed("graft_sink_bkt_test", Seq("l_orderkey"), 4,
                              sortCols = Seq("l_orderkey"))
    val agg = spark.table("graft_sink_bkt_test")
      .groupBy("l_orderkey").agg(sum(col("l_quantity")).as("qty"))
    val expected = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("qty"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = agg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation must not shuffle:\n$plan")
    spark.sql("DROP TABLE graft_sink_bkt_test")
  }

  test("agg_cms_freq / agg_topfreq match exact counts in their exact regime") {
    val cms = SketchOps.aggCmsFreq(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.engine.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cms == exact)
    val tf = SketchOps.aggTopfreqWords(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count()
      .orderBy(col("count").desc, col("token").asc).limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tf == words)
  }

  test("count-min bounds hold on a skewed stream with forced collisions") {
    graft.functions.Sketches.register(spark)
    import spark.implicits._
    // Zipf-ish: item i appears ~ n/(i+1) times; 200 distinct >> w=16 cells
    val rows = (0 until 200).flatMap(i =>
      Seq.fill(2000 / (i + 1) + 1)(s"item_$i"))
    val df = rows.toDF("x")
    val (d, w) = (4, 16)
    val sk = df.select(SketchOps.cmsHashes(col("x"), d).as("hs"))
      .agg(expr(s"graft_cms(hs, $d, $w)").as("sk"))
    val est = df.select(col("x")).distinct()
      .crossJoin(broadcast(sk))
      .select(col("x"), SketchOps.cmsEstimate(col("sk"), col("x"), d, w)
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = rows.size.toLong
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"CMS must never underestimate ($k)")
      assert(est(k) <= c + 2 * n / w + 1,
        s"$k est ${est(k)} vs $c exceeds the e*n/w-style bound")
    }
  }

  test("misra-gries guarantees hold under compression and merges") {
    graft.functions.Sketches.register(spark)
    import spark.implicits._
    val m = 8
    // 4 heavy items (>n/(m+1) each) over a long uniform tail, shuffled
    // deterministically across 8 partitions to exercise partial merges
    val heavy = (0 until 4).flatMap(i => Seq.fill(500)(s"hh_$i"))
    val tail = (0 until 400).flatMap(i => Seq.fill(3)(s"t_$i"))
    val rows = new scala.util.Random(13).shuffle(heavy ++ tail)
    val df = spark.sparkContext.parallelize(rows, 8).toDF("x")
    val out = df.agg(expr(s"graft_topfreq(x, $m)").as("tf"))
      .select(explode(col("tf")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = rows.size.toLong
    assert(out.size <= m)
    out.foreach { case (k, c) =>
      assert(c <= exact(k), s"MG must never overestimate ($k)")
      assert(exact(k) - c <= n / (m + 1), s"$k error exceeds n/(m+1)")
    }
    // every true heavy hitter (count > n/(m+1)) survives
    (0 until 4).foreach(i => assert(out.contains(s"hh_$i"),
      s"heavy hitter hh_$i evicted"))
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // Own SQLConf (shared SparkContext): AQE thresholds shrunk so the
    // skew logic that fires at 256MB-partition scale engages on a local
    // fixture; proves OptimizeSkewedJoin handles what join_salted handles
    // manually, without touching the shared test session's conf.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    import s2.implicits._
    // key 0 carries ~100x the bytes of any other key (padded payload)
    val left = s2.range(0, 60000)
      .select(when(col("id") < 50000, lit(0L)).otherwise(pmod(col("id"),
        lit(1000L))).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("pay"))
    val right = s2.range(0, 1000).select(col("id").as("k"),
      col("id").as("rv"))
    val j = left.join(right, "k")
    assert(j.collect().length == 60000) // collect: finalizes j's own AQE plan
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"),
      s"expected AQE skew-split SMJ in:\n$plan")
  }

  test("win_rownum_topk pushes the rank filter into WindowGroupLimit") {
    val df = Relational.winRownumTopk(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rn <= 3 should prune per-group before the full window sort:\n$plan")
  }

  test("win_rank_dense pushes the rank filter into WindowGroupLimit") {
    val df = Relational.winRankDense(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rnk <= 5 should prune per-group before the full window sort:\n$plan")
  }
}
