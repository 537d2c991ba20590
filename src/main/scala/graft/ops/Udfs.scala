package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** UDF / UDAF surface (SURVEY.md §2.J). These exist to prove the extension
  * points; everything hot-path elsewhere uses built-ins or native
  * expressions (SURVEY §4). */
object Udfs {

  /** Typed UDAF: discount-weighted average price. Buffer is (Σw, Σwx);
    * merge is associative+commutative so partial aggregation works. */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._2, b._2 + a._1 * a._2) // a = (price, weight)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Double)): Double = r._2 / r._1
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed UDAF: bounded top-k accumulator (k highest prices, ties broken
    * by smaller key). The buffer never exceeds k entries, so merge cost is
    * O(k log k) regardless of group size — the scalable top-k-per-group
    * shape. */
  object TopKOrders extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]] {
    val k = 5
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy(t => (-t._1, t._2)).take(k)
    override def zero: Seq[(Double, Long)] = Nil
    override def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] =
      trim(b :+ ((a._2, a._1)))
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    override def finish(r: Seq[(Double, Long)]): Seq[Long] = trim(r).map(_._2)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Typed UDAF: bounded top-k neighbor accumulator for the kNN kernel —
    * keeps the k best (cos desc, id asc) (cos, id, label) triples per
    * group. Replaces a row_number window over the full pair stream: the
    * heap aggregates map-side, so the shuffle carries k rows per group
    * instead of every candidate pair. */
  object TopKNeighbors extends Aggregator[(Double, Long, Int),
      Seq[(Double, Long, Int)], Seq[(Double, Long, Int)]] {
    val k = 5
    // buffer invariant: sorted by (cos desc, id asc), length <= k.
    // reduce() is the 4M-calls-per-query hot path: O(k) early-out compare
    // against the current worst — no per-row sort allocation.
    private def better(a: (Double, Long, Int), b: (Double, Long, Int)) =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(b: Seq[(Double, Long, Int)], a: (Double, Long, Int)) = {
      val i = b.indexWhere(better(a, _))
      val pos = if (i < 0) b.length else i
      (b.take(pos) :+ a) ++ b.drop(pos)
    }
    override def zero: Seq[(Double, Long, Int)] = Nil
    override def reduce(b: Seq[(Double, Long, Int)], a: (Double, Long, Int)) =
      if (b.length < k) insert(b, a)
      else if (better(a, b.last)) insert(b, a).take(k)
      else b
    override def merge(x: Seq[(Double, Long, Int)], y: Seq[(Double, Long, Int)]) =
      y.foldLeft(x)(reduce)
    override def finish(r: Seq[(Double, Long, Int)]): Seq[(Double, Long, Int)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long, Int)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Int)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long, Int)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Int)]]()
  }

  /** Scalar UDF: token normalizer (lowercase, strip non-alphanumerics). */
  def udfScalar(s: SparkSession, d: String): DataFrame = {
    val norm = udf((v: String) =>
      if (v == null) null else v.toLowerCase.replaceAll("[^a-z0-9]", ""))
    part(s, d)
      .select(col("p_partkey"), norm(col("p_name")).as("norm_name"))
      .orderBy("p_partkey")
  }

  /** Discount-weighted average price per return flag via the typed UDAF. */
  def udafWeightedAvg(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(WeightedAvg)
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(round(wavg(col("l_extendedprice"), col("l_discount")), 4)
        .as("wavg_r"))
      .orderBy("l_returnflag")
  }

  /** Top-5 order keys per customer by total price via the bounded-heap
    * UDAF. The key list is serialized to a comma-joined string (the driver
    * comparator cannot hash array cells). */
  def udafTopkAcc(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(TopKOrders)
    orders(s, d)
      .groupBy("o_custkey")
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("tk"))
      .select(col("o_custkey"),
              concat_ws(",", transform(col("tk"), _.cast("string")))
                .as("top_orders"))
      .orderBy("o_custkey")
  }
}
