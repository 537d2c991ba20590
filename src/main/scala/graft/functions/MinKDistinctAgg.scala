package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType}

/** The K smallest DISTINCT bigint values per group, as a sorted array —
  * `collect_set` with an O(k) aggregation buffer (round 17, the
  * dedup_substring bound): a group's buffer holds at most k values at
  * every moment (insert, trim the max), and merging two capped buffers
  * re-trims, so map-side partial aggregation works unchanged. For a
  * group with ≤ k distinct values the result IS the full sorted
  * distinct set; a group with more returns exactly k — so a caller
  * filtering `size(result) <= k-1` (rarity gates) gets answers
  * identical to an unbounded collect_set while a boilerplate key that
  * would have accumulated millions of doc ids holds k longs. */
case class MinKDistinctAgg(
    child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child, kExpr)

  private lazy val cap: Int = {
    val k = kExpr.eval(null).asInstanceOf[Number].intValue
    require(k > 0, s"graft_minset cap must be positive, got $k")
    k
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("graft_minset expects BIGINT values")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_minset cap must be a " +
        "constant INT")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minset"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > cap) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > cap) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val ts = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { ts.add(bb.getLong); i += 1 }
    ts
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinKDistinctAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinKDistinctAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object MinKDistinctAgg {
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "graft_minset")
}
