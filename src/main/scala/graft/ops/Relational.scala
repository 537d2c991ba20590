package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Relational operators (SURVEY.md §2 groups A–F): scans, projection/filter,
  * joins, aggregations, windows, sort/limit/set ops.
  *
  * Determinism contract (SURVEY.md §7.3): every query ends with a total
  * `orderBy` over a unique key set, every floating-point output column is
  * rounded (suffix `_r`), and counts/sums are typed to match DuckDB.
  *
  * Scale notes are per-query; the common ones: filters/projections push into
  * the parquet scan (Catalyst), dim joins are broadcast (no shuffle of the
  * fact side), aggregations use partial (map-side) combine automatically.
  */
object Relational {

  // ---- A. scans ----

  /** Full scan, stable total order. At 100 TB this is only ever a sink-copy
    * shape; order comes from the unique PK so output is reproducible. */
  def scanParquet(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).orderBy("l_orderkey", "l_linenumber")

  /** Column pruning + predicate pushdown: .explain shows PushedFilters and a
    * 4-column ReadSchema — the scan never materializes the other 7 cols. */
  def scanPruned(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
      .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
             col("l_quantity") < 10)
      .orderBy("l_orderkey", "l_linenumber")

  // ---- B. projection / filter ----

  /** Per-record map: arithmetic + string expressions (the map verb).
    * Money math runs in DECIMAL: the 2-dp source values hit exact half-cent
    * ties where double rounding differs between engines (11 rows at sf0.01);
    * decimal arithmetic + HALF_UP round is engine-exact. */
  def mapProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      expr("""CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
             |  * (1 - CAST(l_discount AS DECIMAL(12,2)))
             |  * (1 + CAST(l_tax AS DECIMAL(12,2))), 2) AS DOUBLE)"""
        .stripMargin).as("charge_r"),
      concat(col("l_returnflag"), lit("-"), col("l_linestatus")).as("flag_status")
    ).orderBy("l_orderkey", "l_linenumber")

  /** Compound predicate: AND/OR/NOT, IN, BETWEEN, LIKE, modulo. */
  def filterPred(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority")
      .where(col("o_orderstatus").isin("F", "P") &&
             col("o_totalprice").between(10000, 200000) &&
             (col("o_orderpriority").like("%URGENT%") ||
              col("o_orderpriority").like("5-%")) &&
             !(col("o_custkey") % 10 === 3))
      .orderBy("o_orderkey")

  // ---- C. joins ----

  /** Equi inner join orders⋈customer. At scale: both sides shuffle on the
    * key (SMJ/SHJ); co-locating via bucketing on custkey removes it. */
  def joinInner(s: SparkSession, d: String): DataFrame =
    orders(s, d).join(customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")

  /** Star join: fact ⋈ 3 broadcast dims, then aggregate. The broadcast()
    * hints keep the 600k-row (→100 TB) fact side shuffle-free until the
    * final groupBy; dims are ≤ a few MB at any scale. */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("cnt"),
           round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
             .as("revenue_r"))
      .orderBy("r_name", "n_name")

  // ---- D. aggregations ----

  /** TPC-H Q1-style pricing summary: filter → groupBy → multi-agg.
    * Partial aggregation makes this a single shuffle of 6 groups. */
  def aggPricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty_r"),
        round(sum("l_extendedprice"), 2).as("sum_base_r"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_r"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
                  (lit(1) + col("l_tax"))), 2).as("sum_charge_r"),
        round(avg("l_quantity"), 4).as("avg_qty_r"),
        round(avg("l_extendedprice"), 4).as("avg_price_r"),
        round(avg("l_discount"), 4).as("avg_disc_r"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Exact distinct counts. At scale COUNT(DISTINCT x, y) expands to two
    * aggregations; HLL (approx_count_distinct) is the 100 TB path (§2.D T3). */
  def aggCountDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("d_part"),
      countDistinct(col("l_suppkey")).as("d_supp"))

  // ---- E. windows ----

  /** Top-3 orders per customer by date. Unique tiebreaker o_orderkey in the
    * window ORDER BY makes row_number deterministic (SURVEY §7.3). */
  def winRownumTopk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"),
                                                    col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  // ---- F. sort / limit / top-k ----

  /** Multi-column global sort asc/desc. Spark range-partitions the sort at
    * scale (sampled boundaries), so it stays distributed. */
  def sortMulti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .orderBy(col("c_nationkey").asc, col("c_acctbal").desc,
               col("c_custkey").asc)

  /** agg → sort → limit: top-10 orders by revenue. The limit pushes a
    * per-partition TakeOrdered before the final merge — no global sort. */
  def topkGlobal(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
             .as("revenue_r"))
      .orderBy(col("revenue_r").desc, col("l_orderkey").asc)
      .limit(10)
}
