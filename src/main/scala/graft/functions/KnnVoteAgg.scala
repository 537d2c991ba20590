package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
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

  private def insert(buf: ArrayBuffer[(Double, Long, Int)],
                     a: (Double, Long, Int)): Unit = {
    if (buf.length >= k && !better(a, buf.last)) return
    var i = 0
    while (i < buf.length && !better(a, buf(i))) i += 1
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

object KnnVote {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_knn_vote"),
      new ExpressionInfo(classOf[KnnVote].getCanonicalName, "graft_knn_vote"),
      (children: Seq[Expression]) =>
        KnnVote(children(0), children(1), children(2), k = 5))
}
