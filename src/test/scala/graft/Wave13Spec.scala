package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Round-7 wave (cont.): PII scrub, URL hygiene, hash rebalance, vocab
  * nucleus truncation. Each test replays the operator's rule in memory
  * (independent derivation) and the shuffle-sensitive ones pin plan shape. */
class Wave13Spec extends SparkTestBase {

  test("text_pii_scrub: entity counts follow the residue rules; digests scrubbed") {
    val rows = TextOps.textPiiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val wantEmails = 1L + (if (id % 5 == 0) 1L else 0L)
      val wantPhones = if (id % 3 == 0) 1L else 0L
      assert(r.getLong(1) == wantEmails, s"doc $id emails")
      assert(r.getLong(2) == wantPhones, s"doc $id phones")
      assert(r.getString(3).matches("[0-9a-f]{32}"), s"doc $id digest")
    }
    // Masking really removed every injected entity: re-scan the scrubbed
    // text of a few docs for residual matches.
    val scrubbed = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("raw", concat(
        col("text"), lit(" contact user"), col("doc_id"), lit("@example.com")))
      .select(regexp_replace(col("raw"), TextOps.EmailRe, "<EMAIL>").as("s"))
      .where(col("s").rlike(TextOps.EmailRe))
    assert(scrubbed.count() == 0, "residual email after masking")
  }

  test("text_url_domains: blocklist enforced, counts partition the corpus") {
    val rows = TextOps.textUrlDomains(spark, sf).collect()
    val hosts = rows.map(_.getString(0)).toSet
    assert(!hosts.contains("src0.example.com") &&
           !hosts.contains("src7.example.com"), "blocked host leaked")
    assert(hosts.forall(_.endsWith(".example.com")), "parse_url host shape")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val wantDocs = docs.where(!col("source").isin("src0", "src7")).count()
    assert(rows.map(_.getLong(1)).sum == wantDocs, "doc counts don't partition")
    // Blocklist gate must be a broadcast anti-join, never a shuffle.
    val plan = TextOps.textUrlDomains(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join, got:\n$plan")
  }

  test("sample_rebalance: near-quota per class, deterministic, no window") {
    val kept = TextOps.sampleRebalance(spark, sf)
    val rows = kept.collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = byLang.values.min
    val keptByLang = rows.groupBy(_.getString(1)).map { case (l, g) => l -> g.size }
    // Binomial jitter bound: |kept - n_min| <= 4 * sqrt(n_min) per class.
    byLang.keys.foreach { l =>
      val k = keptByLang.getOrElse(l, 0)
      assert(math.abs(k - nMin.toDouble) <= 4 * math.sqrt(nMin.toDouble) + 1,
        s"class $l kept $k vs quota $nMin")
    }
    // Deterministic: a second evaluation keeps the identical row set.
    val again = TextOps.sampleRebalance(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet)
    // The scalable shape: no Window operator anywhere in the plan.
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rebalance must not rank per class:\n$plan")
  }

  test("text_vocab_topp: kept prefix is the minimal 90% nucleus per lang") {
    val rows = TextOps.textVocabTopp(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val freq = docs.groupBy(identity).map { case ((l, t), g) => (l, t, g.size.toLong) }
    freq.map(_._1).toSet.foreach { (lang: String) =>
      val sorted = freq.filter(_._1 == lang).toSeq
        .sortBy { case (_, t, c) => (-c, t) }
      val total = sorted.map(_._3).sum
      // minimal prefix whose mass reaches 90% (strict-before rule)
      var cum = 0L
      val want = sorted.takeWhile { case (_, _, c) =>
        val keep = cum * 10 < total * 9; cum += c; keep
      }
      val got = rows.filter(_._1 == lang).sortBy(_._4)
      assert(got.map(t => (t._2, t._3)).toSeq == want.map(t => (t._2, t._3)),
        s"nucleus mismatch for $lang")
      // the nucleus really covers >= 90% and is minimal
      val mass = got.map(_._3).sum
      assert(mass * 10 >= total * 9, s"$lang nucleus < 90%")
      assert((mass - got.last._3) * 10 < total * 9, s"$lang nucleus not minimal")
      // ranks are contiguous 1..k
      assert(got.map(_._4).toSeq == (1L to got.size).toSeq)
    }
  }

  test("graft_bitmap_distinct: exact across partitionings; domain enforced") {
    graft.functions.Sketches.register(spark)
    val ev = graft.engine.Tables.events(spark, sf)
    val want = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Different partition counts force the serialize/merge (word-wise OR)
    // path with different partial groupings — result must be invariant.
    Seq(1, 2, 7).foreach { p =>
      val got = ev.repartition(p).groupBy("event_type")
        .agg(expr("graft_bitmap_distinct(user_id)").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"mismatch at $p partitions")
    }
    // Out-of-domain ids throw rather than silently degrade.
    val bad = intercept[Exception] {
      ev.select(expr("graft_bitmap_distinct(user_id * -1 - 1)")).collect()
    }
    assert(bad.getMessage != null)
  }

  test("agg_ttest matches an in-memory Welch computation") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val got = ops.Relational.aggTtest(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    rows.map(_._1).distinct.foreach { pri =>
      val f = rows.filter(t => t._1 == pri && t._2 == "F").map(_._3)
      val o = rows.filter(t => t._1 == pri && t._2 == "O").map(_._3)
      val (n1, n2) = (f.length.toDouble, o.length.toDouble)
      def mv(xs: Array[Double]) = {
        val m = xs.sum / xs.length
        (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      }
      val ((m1, v1), (m2, v2)) = (mv(f), mv(o))
      val se2 = v1 / n1 + v2 / n2
      val t = (m1 - m2) / math.sqrt(se2)
      val df = se2 * se2 /
        (v1 / n1 * (v1 / n1) / (n1 - 1) + v2 / n2 * (v2 / n2) / (n2 - 1))
      val (gn1, gn2, gt, gdf) = got(pri)
      assert(gn1 == f.length && gn2 == o.length, s"$pri cohort sizes")
      assert(math.abs(gt - t) < 2e-3, s"$pri t: $gt vs $t")
      assert(math.abs(gdf - df) < 1.0, s"$pri df: $gdf vs $df")
    }
  }

  test("win_rolling_distinct_bitmap equals the exact expansion form") {
    val exact = ops.SketchOps.winRollingDistinctExact(spark, sf).collect()
      .map(r => (r.get(0).toString, r.getLong(1))).toMap
    val bitmap = ops.SketchOps.winRollingDistinctBitmap(spark, sf).collect()
      .map(r => (r.get(0).toString, r.getLong(1))).toMap
    assert(bitmap == exact, "bitmap rolling distinct must be row-identical")
  }

  test("dedup_paragraph: exactly one keeper per duplicated paragraph") {
    val rows = ops.TextOps.dedupParagraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    assert(rows.exists(_._4 > 1), "corpus should contain duplicate paragraphs")
    // replay fingerprints to group rows, then check the keeper rule
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def fp(id: Long, cid: Long): String = {
      val wsx = docs(id).split(" ")
      val chunk = wsx.slice((cid * 64).toInt,
        math.min(wsx.length, (cid * 64 + 64).toInt)).mkString(" ")
      java.security.MessageDigest.getInstance("MD5").digest(chunk.getBytes)
        .map("%02x".format(_)).mkString
    }
    rows.groupBy { case (id, cid, _, _) => fp(id, cid) }.foreach {
      case (_, g) =>
        assert(g.count(_._3) == 1, "exactly one keeper per fingerprint")
        assert(g.forall(_._4 == g.size), "n_copies must equal group size")
        assert(g.minBy(t => (t._1, t._2))._3, "keeper must be the min tuple")
    }
  }

  test("agg_gini matches an in-memory rank-formula replay and stays in [0,1)") {
    val got = ops.Relational.aggGini(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val spend = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
            col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$sf/nation.parquet"),
            col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "c_custkey")
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))"))
             .cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    spend.groupBy(_._1).foreach { case (nat, g) =>
      val xs = g.sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length.toDouble
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val want = 2.0 * six / (n * xs.sum) - (n + 1.0) / n
      val (gn, gv) = got(nat)
      assert(gn == xs.length, s"$nat customer count")
      assert(math.abs(gv - want) < 1e-3, s"$nat gini $gv vs $want")
      assert(gv >= 0.0 && gv < 1.0, s"$nat gini out of range")
    }
  }

  test("ml_fpgrowth: anti-monotone itemsets above the support floor") {
    val rows = ops.MlOps.mlFpgrowth(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val singles = rows.filterNot(_._1.contains(",")).toMap
    val pairs = rows.filter(_._1.contains(","))
    assert(singles.nonEmpty && pairs.nonEmpty)
    // support is anti-monotone: a pair can never beat its items
    pairs.foreach { case (is, f) =>
      val Array(a, b) = is.split(",")
      assert(f <= singles(a) && f <= singles(b), s"$is violates monotonicity")
    }
    // every surviving itemset clears the 1%-of-baskets floor
    val nBaskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey").distinct().count()
    val floor = math.ceil(0.01 * nBaskets).toLong
    rows.foreach { case (is, f) => assert(f >= floor, s"$is below support") }
  }

  test("durable exports are reused by a fresh process (memo reset)") {
    // Prime both exports, capture their _SUCCESS mtimes, forget the
    // per-JVM memos (= what a restart loses), re-run: the `_SUCCESS`
    // guard must short-circuit — same files, no rewrite.
    ops.Relational.scanPartitioned(spark, sf).count()
    ops.Relational.scanEvolved(spark, sf).count()
    val pDir = ops.Relational.ensurePartitionedExport(spark, sf)
    val eDir = ops.Relational.ensureEvolvedExport(spark, sf)
    val (p, e) = (new java.io.File(pDir, "_SUCCESS"),
                  new java.io.File(eDir, "_SUCCESS"))
    val (pT, eT) = (p.lastModified(), e.lastModified())
    ops.Relational.resetPartitionedMemo()
    ops.Relational.resetEvolvedMemo()
    ops.Relational.scanPartitioned(spark, sf).count()
    ops.Relational.scanEvolved(spark, sf).count()
    assert(p.lastModified() == pT && e.lastModified() == eT,
      "a fresh JVM must reuse the durable exports, not rebuild them")
  }

  test("scan_partitioned: the status filter prunes at the partition level") {
    val df = ops.Relational.scanPartitioned(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
           plan.matches("(?s).*PartitionFilters: \\[[^\\]]*o_orderstatus[^\\]]*\\].*"),
      s"status filter must prune partitions, not rows:\n$plan")
    val want = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderstatus") === "F").count()
    assert(df.count() == want)
  }

  test("join_star_schema: broadcast cascade with the date filter pushed down") {
    val df = ops.Relational.joinStarSchema(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"star chain should broadcast at this scale:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 5,
      "all five dimension joins should be broadcast-hash")
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      "date range must reach the orders scan")
    // cross-check the revenue of one nation against a direct computation
    val rows = df.collect()
    assert(rows.nonEmpty && rows.map(_.getLong(2)).sum > 0)
  }

  test("win_transitions: row-stochastic matrix accounting for every step") {
    val rows = ops.EventOps.winTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val ev = graft.engine.Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // each user contributes (his event count - 1) transitions
    assert(rows.map(_._3).sum == nEvents - nUsers, "transition count")
    rows.groupBy(_._1).foreach { case (cur, g) =>
      val pSum = g.map(_._4).sum
      assert(math.abs(pSum - 1.0) < g.size * 1e-4 + 1e-9,
        s"row $cur not stochastic: $pSum")
    }
  }

  test("merge_scd2: one open row per key; further applies are no-ops") {
    val hist = ops.MergeOps.mergeScd2Query(spark, sf).collect()
    val byKey = hist.groupBy(_.getLong(0))
    byKey.foreach { case (k, rows) =>
      val open = rows.filter(_.isNullAt(4))
      assert(open.length == 1, s"key $k must have exactly one open row")
      // versions chain: closed row (if any) ends where the open one starts
      rows.filterNot(_.isNullAt(4)).foreach { closed =>
        assert(open.head.getLong(3) == closed.getLong(4),
          s"key $k version chain broken")
      }
    }
    // a third apply of the same batch must not grow the history
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_scd2_" + sf.replaceAll("[^A-Za-z0-9]+", "_")
        .replaceAll("^_+", "")).getAbsolutePath
    val before = ops.MergeOps.readHistory(spark, dir).count()
    val batch = ops.MergeOps.readHistory(spark, dir)
      .where(col("valid_to").isNull)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal_r"))
    ops.MergeOps.mergeScd2(spark, dir, batch, "c_custkey",
      Seq("c_mktsegment", "c_acctbal_r"), version = 2L)
    assert(ops.MergeOps.readHistory(spark, dir).count() == before,
      "re-applying current state must be a no-op")
  }

  test("graph_sssp matches an in-memory BFS replay") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val om = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cs = li.map { case (ok, sk) => (om(ok), sk + 1000000000L) }.distinct
    val adj = (cs ++ cs.map(_.swap)).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSet }
    val src = om.values.min
    var dist = Map(src -> 0L)
    var frontier = Set(src)
    for (h <- 1L to 6L) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      dist ++= frontier.map(_ -> h)
    }
    val got = ops.GraphOps.graphSssp(spark, sf).collect()
      .map { r =>
        val id = if (r.getBoolean(1)) r.getLong(0) + 1000000000L else r.getLong(0)
        id -> r.getLong(2)
      }.toMap
    assert(got == dist, s"BFS mismatch: ${got.size} vs ${dist.size} nodes")
  }

  test("text_quality_pctl: kept docs sit strictly above their class p90") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val kept = ops.TextOps.textQualityPctl(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(kept.nonEmpty)
    val keptIds = kept.map(_._1).toSet
    docs.groupBy(_._2).foreach { case (lang, g) =>
      // exact interpolated p90 replayed in memory
      val v = g.map(_._3.toDouble).sorted
      val rank = (v.length - 1) * 0.9
      val (lo, frac) = (rank.toInt, rank - rank.toInt)
      val p90 = if (lo + 1 < v.length) v(lo) + frac * (v(lo + 1) - v(lo))
                else v(lo)
      g.foreach { case (id, _, n) =>
        assert(keptIds.contains(id) == (n > p90), s"doc $id lang $lang")
      }
    }
    // a p90 gate keeps roughly the top decile of each class
    assert(kept.length <= docs.length / 5, "gate should be selective")
  }

  test("scan_evolved: union schema null-fills only the pre-schema batch") {
    val rows = ops.Relational.scanEvolved(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getLong(0)
      if (key % 2 == 0)
        assert(r.getString(2) == "<pre-schema>", s"even key $key must fill")
      else assert(r.getString(2) != "<pre-schema>", s"odd key $key has real col")
    }
    // durable export: a second call must not rewrite the files
    val loc = ops.Relational.ensureEvolvedExport(spark, sf)
    val p = new java.io.File(loc, "_SUCCESS")
    val t0 = p.lastModified()
    ops.Relational.scanEvolved(spark, sf).count()
    assert(p.lastModified() == t0, "export must be built once per dataset")
  }

  test("agg_chisq matches an in-memory contingency computation") {
    val ev = graft.engine.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), if (r.getDouble(1) >= 50) "hi" else "lo"))
    val cells = ev.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val n = ev.length.toDouble
    val rt = cells.groupBy(_._1._1).map { case (t, g) => t -> g.values.sum }
    val kb = cells.groupBy(_._1._2).map { case (b, g) => b -> g.values.sum }
    val want = cells.map { case ((t, b), c) =>
      val e = rt(t) * kb(b) / n
      (c - e) * (c - e) / e
    }.sum
    val row = ops.StatsOps.aggChisq(spark, sf).collect().head
    assert(row.getLong(0) == ev.length)
    assert(row.getLong(1) == (rt.size - 1) * (kb.size - 1))
    assert(math.abs(row.getDouble(2) - want) < 1e-3,
      s"chi2 ${row.getDouble(2)} vs $want")
  }

  test("fn_fuzzy_match: argmin distance verified against a direct scan") {
    val names = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_name").collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val got = ops.Functions.fnFuzzyMatch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.keySet == names.toSet)
    names.foreach { a =>
      val best = names.filter(_ != a).map(b => (lev(a, b).toLong, b)).min
      assert(got(a) == best, s"$a: ${got(a)} vs $best")
    }
  }

  test("join_point_in_range: bands partition orders; broadcast plan") {
    val df = ops.Relational.joinPointInRange(spark, sf)
    val rows = df.collect()
    val total = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_totalprice") >= 0 && col("o_totalprice") < 1000000).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "bands must partition the order value domain")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"tiny literal interval dim should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }
}
