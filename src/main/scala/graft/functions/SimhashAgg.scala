package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash sketch as one native aggregate: accumulate the 64 per-bit
  * ±1 counters over token hashes in a primitive int array and emit the
  * packed 64-bit signature. Replaces 64 separate sum(CASE WHEN ...)
  * aggregate buffers per group with a single 256-byte buffer and a tight
  * loop per row — the mergeable-sketch shape (counters add), so map-side
  * partial aggregation works unchanged at any scale. */
case class SimhashAgg(
    h: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(h)

  override def checkInputDataTypes(): TypeCheckResult =
    if (h.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_simhash expects BIGINT")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = h.eval(input)
    if (v != null) {
      val hash = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += (if (((hash >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 64) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(256)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimhashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(h = newChildren(0))
}

object SimhashAgg {
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "graft_simhash")
}
