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
}
