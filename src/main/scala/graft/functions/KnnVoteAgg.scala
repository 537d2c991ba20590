package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Fused kNN vote as a native TypedImperativeAggregate (SURVEY §4 tier b):
  * per group, keep the k best (cos DESC, id ASC) neighbors in a bounded
  * buffer, then emit the majority label of those k (ties: more votes
  * first, then smaller label) as struct(pred_label, votes).
  *
  * Compared with the Scala Aggregator + explode + re-aggregate pipeline it
  * replaces: update() reads the input InternalRow fields directly (no
  * encoder round-trip per row — the measured cost at 4M rows/query), the
  * buffer is an object until shuffle (serialized compactly below), and the
  * vote happens in eval() so the whole operator is ONE aggregation. */
case class KnnVote(
    cos: Expression, nid: Expression, label: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long, Int)]] {

  override def children: Seq[Expression] = Seq(cos, nid, label)

  override def checkInputDataTypes(): TypeCheckResult =
    if (cos.dataType == DoubleType && nid.dataType == LongType &&
        label.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_knn_vote expects (DOUBLE, BIGINT, INT)")

  override def dataType: DataType = StructType(Seq(
    StructField("pred_label", IntegerType, nullable = false),
    StructField("votes", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_knn_vote"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long, Int)] =
    ArrayBuffer.empty

  // sorted by (cos desc, nid asc); length <= k
  private def better(a: (Double, Long, Int), b: (Double, Long, Int)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insert keeping the buffer deduplicated by neighbor id: LSH candidate
    * streams deliver the same (qid, nid) pair once per colliding
    * table/probe (deduplicating the stream itself would cost a shuffle),
    * and a duplicated neighbor must not occupy two of the k slots. A
    * duplicate always carries the identical (cos, label) — same pair, same
    * deterministic rounding — so dropping it is exact. */
  private def insert(buf: ArrayBuffer[(Double, Long, Int)],
                     a: (Double, Long, Int)): Unit = {
    if (buf.length >= k && !better(a, buf.last)) return
    var i = 0
    while (i < buf.length && !better(a, buf(i))) {
      if (buf(i)._2 == a._2) return // this neighbor is already held
      i += 1
    }
    var j = i
    while (j < buf.length && buf(j)._2 != a._2) j += 1
    if (j < buf.length) buf.remove(j)
    buf.insert(i, a)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[(Double, Long, Int)],
                      input: InternalRow): ArrayBuffer[(Double, Long, Int)] = {
    val c = cos.eval(input)
    val n = nid.eval(input)
    val l = label.eval(input)
    if (c != null && n != null && l != null)
      insert(buf, (c.asInstanceOf[Double], n.asInstanceOf[Long],
                   l.asInstanceOf[Int]))
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long, Int)],
                     other: ArrayBuffer[(Double, Long, Int)]): ArrayBuffer[(Double, Long, Int)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long, Int)]): Any = {
    if (buf.isEmpty) return InternalRow(-1, 0L)
    val counts = buf.groupBy(_._3).view.mapValues(_.size.toLong)
    val (lbl, votes) = counts.toSeq.minBy { case (l, v) => (-v, l) }
    InternalRow(lbl, votes)
  }

  override def serialize(buf: ArrayBuffer[(Double, Long, Int)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 20)
    bb.putInt(buf.length)
    buf.foreach { case (c, n, l) => bb.putDouble(c); bb.putLong(n); bb.putInt(l) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long, Int)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long, Int)]
    (0 until n).foreach { _ =>
      buf += ((bb.getDouble, bb.getLong, bb.getInt))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KnnVote =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KnnVote =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(cos = newChildren(0), nid = newChildren(1), label = newChildren(2))
}

/** argmax neighbor: the (cos DESC, id ASC)-best (nid, cos) pair per group
  * as struct(nid, cos). A deterministic max_by — ties on cos break toward
  * the smaller id, which built-in max_by does not guarantee. */
case class Top1Neighbor(
    cos: Expression, nid: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(cos, nid)

  override def checkInputDataTypes(): TypeCheckResult =
    if (cos.dataType == DoubleType && nid.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_top1 expects (DOUBLE, BIGINT)")

  override def dataType: DataType = StructType(Seq(
    StructField("nid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top1"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val c = cos.eval(input)
    val n = nid.eval(input)
    if (c != null && n != null) {
      val a = (c.asInstanceOf[Double], n.asInstanceOf[Long])
      if (buf.isEmpty) buf += a
      else if (better(a, buf(0))) buf(0) = a
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
                     other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach { a =>
      if (buf.isEmpty) buf += a else if (better(a, buf(0))) buf(0) = a
    }
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    if (buf.isEmpty) null else InternalRow(buf(0)._2, buf(0)._1)

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (c, n) => bb.putDouble(c); bb.putLong(n) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long)]
    (0 until n).foreach(_ => buf += ((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): Top1Neighbor =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): Top1Neighbor =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(cos = newChildren(0), nid = newChildren(1))
}

object KnnVote {
  /** ObjectHashAggregate (which runs TypedImperativeAggregates) falls back
    * to sort-based aggregation past 128 in-memory groups by default — a
    * disaster for 2000-group kNN (full sort of the pair stream). Buffers
    * here are <= 100 bytes, so millions of groups fit comfortably. Applied
    * explicitly by the operators that aggregate with these functions
    * (SimOps.simKnnLabel / simAnnBucket), not as a register() side effect. */
  def raiseHashAggFallback(spark: SparkSession): Unit =
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")

  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "graft_knn_vote", "graft_top1")
}
