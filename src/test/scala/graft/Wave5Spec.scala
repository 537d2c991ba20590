package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Wave-5 tests: subquery rewrite path, approx percentile bound, CSV scan. */
class Wave5Spec extends SparkTestBase {

  test("sub_scalar equals the decorrelated join formulation") {
    val out = Relational.subScalar(spark, sf)
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val avg = o.groupBy(col("o_custkey").as("k"))
      .agg((sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).cast("double") /
            count(lit(1))).as("cavg"))
    val naive = o.join(avg, col("o_custkey") === col("k"))
      .where(col("o_totalprice") > col("cavg"))
    assert(out.count() == naive.count())
    // a customer's max-priced order is above its avg iff it has >1 distinct price
    assert(out.count() > 0 && out.count() < o.count())
  }

  test("sub_scalar plan is decorrelated (no per-row subquery)") {
    val plan = Relational.subScalar(spark, sf).queryExecution
      .executedPlan.toString
    assert(!plan.contains("ScalarSubquery"),
           "correlated scalar subquery must be rewritten to an agg+join")
  }

  test("join_lateral decorrelates to a group-limited window, not a loop") {
    val plan = Relational.joinLateral(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "lateral should become a window rank")
    assert(plan.contains("WindowGroupLimit"),
           "per-group LIMIT should push into WindowGroupLimit (top-k prune)")
    assert(!plan.contains("CartesianProduct"))
  }

  test("sub_in matches set-algebra formulation") {
    val out = Relational.subIn(spark, sf).collect().map(_.getLong(0)).toSet
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val urgent = o.where(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val bigF = o.where(col("o_orderstatus") === "F" &&
                       col("o_totalprice") > 300000)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val expect = c.collect().map(_.getLong(0)).toSet
      .intersect(urgent).diff(bigF)
    assert(out == expect)
  }

  test("agg_approx_percentile lands within rank-error bound of exact") {
    val apx = Relational.aggApproxPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    apx.foreach { case (flag, (p50, p90)) =>
      val vals = li.where(col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      val n = vals.length
      // accuracy=10000 → rank error <= n/10000; generous 2x slack
      val tol = math.max(2 * n / 10000, 2)
      def rankOf(v: Double): Int = vals.count(_ <= v)
      assert(math.abs(rankOf(p50) - 0.5 * n) <= tol,
             s"$flag p50 rank off: ${rankOf(p50)} vs ${0.5 * n}")
      assert(math.abs(rankOf(p90) - 0.9 * n) <= tol,
             s"$flag p90 rank off: ${rankOf(p90)} vs ${0.9 * n}")
    }
  }

  test("agg_decimal outputs are exact scale-pinned decimal strings") {
    // The pipeline runs in DECIMAL; the output serializes each value to
    // its scale-pinned string (decimal-typed columns are comparator
    // hazards — CORRECTNESS_r02). Scale shows as fixed fraction digits.
    val out = Relational.aggDecimal(spark, sf)
    val r = out.collect()
    assert(r.nonEmpty)
    def frac(s: String): Int = s.length - s.indexOf('.') - 1
    assert(r.forall(row => frac(row.getString(1)) == 2 &&
                           frac(row.getString(2)) == 4 &&
                           frac(row.getString(3)) == 6))
    assert(r.forall(row => BigDecimal(row.getString(1)).signum > 0))
  }

  test("pipeline cache serves re-queries from InMemoryTableScan") {
    import graft.engine.Pipeline
    val p = Pipeline.source(spark, s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 1000).cache()
    val n1 = p.df.count()
    val plan = p.df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
           s"re-query must hit the cache:\n$plan")
    assert(p.df.count() == n1)
    p.unpersist()
    val lc = Pipeline.source(spark, s"$sf/orders.parquet")
      .map(col("o_orderkey")).localCheckpoint()
    assert(lc.df.count() > 0 &&
           lc.df.queryExecution.optimizedPlan.toString
             .contains("LogicalRDD"), "checkpoint must truncate lineage")
  }

  test("join_salted equals the plain join and spreads salts") {
    import graft.engine.Scale
    val probe = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val build = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = Scale.saltedJoin(probe, build, "l_orderkey", 4)
    val plain = probe.join(build, "l_orderkey")
    assert(salted.count() == plain.count())
    // restart-stable: recomputing yields the identical salt assignment
    val s1 = Scale.saltedJoin(probe, build, "l_orderkey", 4).count()
    assert(s1 == salted.count())
  }

  test("data_split folds are deterministic and ~80/10/10") {
    val out = TextOps.dataSplit(spark, sf)
    val byFold = out.groupBy("fold").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = byFold.values.sum.toDouble
    assert(byFold("train") / n > 0.6 && byFold("train") / n < 0.95)
    assert(byFold.keySet == Set("train", "valid", "test"))
    // same doc always lands in the same fold
    val f1 = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val f2 = TextOps.dataSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(f1 == f2)
  }

  test("text_normalize output is lowercase, single-spaced, trimmed") {
    TextOps.textNormalize(spark, sf).collect().foreach { r =>
      val t = r.getString(1)
      assert(t == t.toLowerCase && !t.contains("  ") && t == t.trim)
      assert(t.forall(c => c.isLetterOrDigit || c == ' '))
    }
  }

  test("agg_regression matches Spark's builtin regr_slope/intercept") {
    val ours = Relational.aggRegression(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val builtin = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("sl"),
           expr("regr_intercept(l_extendedprice, l_quantity)").as("ic"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    ours.foreach { case (flag, (sl, ic)) =>
      assert(math.abs(sl - builtin(flag)._1) < 1e-3, s"$flag slope")
      assert(math.abs(ic - builtin(flag)._2) < 1e-2, s"$flag intercept")
    }
  }

  test("fn_encode round-trip flag is always true") {
    assert(Functions.fnEncode(spark, sf).where(!col("rt_ok")).count() == 0)
  }

  test("sample_seeded is reproducible and fraction-bounded") {
    val a = Relational.sampleSeeded(spark, sf).collect().map(_.getLong(0))
    val b = Relational.sampleSeeded(spark, sf).collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq, "same seed must give the same sample")
    val n = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(a.length > n * 0.05 && a.length < n * 0.2,
           s"fraction 0.1 of $n, got ${a.length}")
  }

  test("pipeline orc source/sink round-trips") {
    import graft.engine.Pipeline
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val p = Pipeline.source(spark, s"$sf/nation.parquet")
    p.sinkOrc(s"$dir/orc")
    val back = Pipeline.orc(spark, s"$dir/orc").df
    assert(back.count() == 25 &&
           back.columns.toSet == p.df.columns.toSet)
  }

  test("stream-static join enriches a stream against a dim table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Long)]   // (event_id, user_id)
    val joined = in.toDF().toDF("event_id", "user_id")
      .join(dim, Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData((10L, 1L), (11L, 2L), (12L, 3L))
      q.processAllAvailable()
      val out = spark.table("enriched").collect()
        .map(r => r.getLong(1) -> Option(r.getString(2))).toMap
      assert(out == Map(10L -> Some("gold"), 11L -> Some("basic"),
                        12L -> None))
    } finally q.stop()
  }

  test("scan_csv round-trips the committed nation fixture") {
    val out = Relational.scanCsv(spark, sf).collect()
    assert(out.length == 25)
    assert(out.head.getLong(0) == 0L && out.last.getLong(0) == 24L)
    assert(out.forall(r => r.getString(1) == s"NATION_${r.getLong(0)}"))
  }
}
