package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (SURVEY §4 tier b — each earned by
  * measurement, see SimOps.simAnnPq).
  *
  * [[PqAdcScore]]: the per-pair ADC sum Σⱼ adc[j·k + code_j]. The
  * builtin `transform`+`aggregate` composition allocates an intermediate
  * array per PAIR — at ~1.4 M candidate pairs that allocation dominated
  * the whole query (the same failure mode DotProduct fixed for the
  * cosine kernel). This expression is a straight codegen'd loop over the
  * two ArrayDatas: no allocation, stays inside whole-stage codegen. */
case class PqAdcScore(codes: Expression, adc: Expression)
    extends BinaryExpression {
  override def left: Expression = codes
  override def right: Expression = adc

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, adc.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_pq_adc expects (ARRAY<INT> codes, ARRAY<DOUBLE> adc)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  /** Input guards (r9 advice): an empty code array is an empty sum (no
    * division by zero), the ADC table length must be an exact multiple
    * of m (a silent floor would misalign every sub-vector after the
    * first), and each code must index inside its sub-table — an
    * out-of-range code against an UnsafeArrayData would otherwise READ
    * ARBITRARY MEMORY and return a garbage score with no error. */
  override def nullSafeEval(c: Any, a: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val adc = a.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0) return 0.0
    if (adc.numElements() % m != 0) throw new IllegalArgumentException(
      s"graft_pq_adc: ADC table length ${adc.numElements()} is not a " +
        s"multiple of the code length $m")
    val ksub = adc.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) {
      val code = codes.getInt(j)
      if (code < 0 || code >= ksub) throw new IllegalArgumentException(
        s"graft_pq_adc: code $code at position $j is outside [0, $ksub)")
      s += adc.getDouble(j * ksub + code)
      j += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, a) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val k = ctx.freshName("ksub")
      val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      // same guards as nullSafeEval: empty codes → 0.0, exact-multiple
      // table, in-range codes (out-of-range on UnsafeArrayData is a
      // silent arbitrary-memory read)
      s"""
         |final int $m = $c.numElements();
         |double $s = 0.0;
         |if ($m > 0) {
         |  if ($a.numElements() % $m != 0) {
         |    throw new IllegalArgumentException(
         |      "graft_pq_adc: ADC table length " + $a.numElements() +
         |        " is not a multiple of the code length " + $m);
         |  }
         |  final int $k = $a.numElements() / $m;
         |  for (int $j = 0; $j < $m; $j++) {
         |    final int $code = $c.getInt($j);
         |    if ($code < 0 || $code >= $k) {
         |      throw new IllegalArgumentException(
         |        "graft_pq_adc: code " + $code + " at position " + $j +
         |          " is outside [0, " + $k + ")");
         |    }
         |    $s += $a.getDouble($j * $k + $code);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, adc = newRight)
}

/** Top-C neighbor ids per group by (score DESC, nid ASC), deduplicated
  * by nid, as a bounded-buffer TypedImperativeAggregate — the shortlist
  * step of IVFPQ without a window sort: a row_number window would
  * shuffle-sort every candidate pair, while this aggregate's map-side
  * partial heaps collapse each query's pairs to ≤ C entries before the
  * exchange (the Top1Neighbor argument, C-wide). Emits ARRAY<BIGINT>. */
case class TopCNeighbors(
    score: Expression, nid: Expression, c: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, nid)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && nid.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_topc expects (DOUBLE, BIGINT)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topc"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: ArrayBuffer[(Double, Long)],
                     a: (Double, Long)): Unit = {
    if (buf.length >= c && !better(a, buf.last)) return
    var i = 0
    while (i < buf.length && !better(a, buf(i))) {
      if (buf(i)._2 == a._2) return
      i += 1
    }
    var j = i
    while (j < buf.length) {
      if (buf(j)._2 == a._2) { buf.remove(j); j = buf.length }
      else j += 1
    }
    buf.insert(i, a)
    if (buf.length > c) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val n = nid.eval(input)
    if (s != null && n != null)
      insert(buf, (s.asInstanceOf[Double], n.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
                     other: ArrayBuffer[(Double, Long)])
      : ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map(_._2).toArray)

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, n) => bb.putDouble(s); bb.putLong(n) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long)]
    (0 until n).foreach(_ => buf += ((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopCNeighbors =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopCNeighbors =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), nid = newChildren(1))
}

object PqExprs {
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "graft_pq_adc", "graft_topc")
}
