package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Tables._

/** Typed Dataset surface (SURVEY §1.3: DataFrame-first, Dataset[T] where
  * per-group imperative logic genuinely needs it). groupByKey.mapGroups is
  * the escape hatch for logic Catalyst can't express: it shuffles by key
  * and hands each group to plain Scala. State per group is O(group size) —
  * acceptable for bounded keys (customers), the same contract as
  * collect_list. */
object TypedOps {

  /** Per-customer order cadence via typed mapGroups: order count and the
    * maximum day-gap between consecutive orders (by date, then key).
    * Deterministic: the group is sorted before the scan, the output is
    * totally ordered. */
  def typedMapgroups(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = orders(s, d)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .as[(Long, Long, java.time.LocalDateTime)]
    ds.groupByKey(_._1)
      .mapGroups { (cust, it) =>
        val rows = it.toIndexedSeq
          .sortBy(t => (t._3.toEpochSecond(java.time.ZoneOffset.UTC), t._2))
        val gaps = rows.iterator.map(_._3).sliding(2).withPartial(false)
          .map { case Seq(a, b) => java.time.Duration.between(a, b).toDays }
          .toSeq
        (cust, rows.length.toLong, if (gaps.isEmpty) 0L else gaps.max)
      }
      .toDF("o_custkey", "n_orders", "max_gap_days")
      .orderBy("o_custkey")
  }

  /** Typed cogroup (KeyValueGroupedDataset.cogroup): customer rows and
    * their orders co-processed per key in one function — the typed twin
    * of a join+agg, for logic that needs both groups materialized.
    * Money sums run in BigDecimal (exact; matches the oracle's DECIMAL
    * sum cast to double). One shuffle per side on the key — the same
    * cost shape as the equivalent join.
    *
    * The oracle is a LEFT JOIN from customer, so the seg="NONE" branch
    * (order custkeys with no customer row) only stays row-identical
    * under the fixtures' referential integrity (every o_custkey exists
    * in customer — TPC-H-shaped data guarantees it). */
  def typedCogroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = customer(s, d).select("c_custkey", "c_mktsegment")
      .as[(Long, String)].groupByKey(_._1)
    val ord = orders(s, d).select("o_custkey", "o_totalprice")
      .as[(Long, Double)].groupByKey(_._1)
    cust.cogroup(ord) { (k, cs, os) =>
      val seg = cs.toSeq.headOption.map(_._2).getOrElse("NONE")
      val prices = os.map(p => BigDecimal.valueOf(p._2)).toSeq
      Iterator((k, prices.length.toLong, seg,
                prices.sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble))
    }.toDF("k", "n_orders", "seg", "total_price")
      .orderBy("k")
  }
}
