package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Data-quality audit over the raw tables — the validation gate an ingest
  * pipeline runs before anything downstream trusts a batch. Each check
  * yields one (check, n_bad) row; the whole audit is a fixed, tiny result
  * regardless of input size.
  *
  * Scale shape: every per-table rule family is FUSED into a single
  * conditional-aggregate pass over its table (one scan, map-side partial
  * sums, no shuffle of raw rows), and the referential checks are
  * left-anti shuffle joins on the key columns only — column pruning keeps
  * the scans at two ints each. Nothing here is quadratic and nothing
  * collects; adding a rule to an existing table's family costs zero extra
  * passes. */
object AuditOps {

  /** Join-key skew diagnosis — the pre-flight a 100 TB join needs before
    * it runs, not after it straggles: per canonical join key, the
    * per-key count distribution's shape (top-key-to-mean ratio, exact
    * p99 of per-key counts). A top/mean ratio ≫ 1 on the build side is
    * the signal to reach for join_salted or the pinned AQE skew split;
    * emitting it as a query makes the decision data-driven and
    * monitorable. One partial-agg pass per table (the raw stream
    * collapses at the per-key groupBy); constant-size output. */
  def dqSkew(s: SparkSession, d: String): DataFrame = {
    def keyStats(df: DataFrame, tbl: String, keyCol: String): DataFrame =
      df.groupBy(col(keyCol).as("k"))
        .agg(count(lit(1)).as("cnt"))
        .agg(sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"),
             max("cnt").as("max_cnt"),
             expr("percentile(cnt, 0.99)").as("p99"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("n_keys"),
                col("max_cnt"),
                round((col("max_cnt") * col("n_keys")).cast("double") /
                      col("n_rows"), 4).as("top_to_mean_r"),
                round(col("p99"), 4).as("p99_cnt_r"))
    keyStats(orders(s, d), "orders.o_custkey", "o_custkey")
      .unionByName(keyStats(events(s, d), "events.user_id", "user_id"))
      .unionByName(keyStats(lineitem(s, d), "lineitem.l_orderkey",
                            "l_orderkey"))
      .orderBy("tbl")
  }

  def dqAudit(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val o = orders(s, d)
    // one fused pass per table: each rule is a conditional count
    val liChecks = li.agg(
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
        .otherwise(0L)).as("lineitem_bad_discount"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L))
        .as("lineitem_nonpos_qty"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
        .as("lineitem_null_shipdate"))
    val evChecks = events(s, d).agg(
      sum(when(col("user_id").isNull, 1L).otherwise(0L))
        .as("events_null_user"),
      sum(when(col("value") < 0, 1L).otherwise(0L))
        .as("events_negative_value"))
    val docs = documents(s, d)
    val docChecks = docs.agg(
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("documents_empty_text"),
      (count(lit(1)) - countDistinct(col("text")))
        .as("documents_dup_text"))
    // referential integrity: anti-joins on pruned key columns
    val orphanLi = li.select("l_orderkey")
      .join(o.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
    val orphanOrd = o.select("o_custkey")
      .join(customer(s, d).select("c_custkey"),
            col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"))

    def unpivotRow(df: DataFrame): DataFrame = {
      val cols = df.columns
      df.select(explode(map(
        cols.flatMap(c => Seq(lit(c), col(c))): _*)).as(Seq("chk", "n_bad")))
    }
    unpivotRow(liChecks)
      .union(unpivotRow(evChecks))
      .union(unpivotRow(docChecks))
      .union(orphanLi.select(lit("lineitem_orphan_order").as("chk"),
                             col("n").as("n_bad")))
      .union(orphanOrd.select(lit("orders_orphan_customer").as("chk"),
                              col("n").as("n_bad")))
      .orderBy("chk")
  }
}
