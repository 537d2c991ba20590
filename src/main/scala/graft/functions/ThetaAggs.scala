package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch aggregate: `graft_theta(x)` → compact sketch bytes.
  *
  * The set-algebra tier HLL cannot provide: theta sketches support
  * INTERSECTION and DIFFERENCE estimates, not just union — "how many
  * distinct tokens appear in BOTH crawl A and crawl B" without
  * re-scanning either. Same standing pattern as the HLL/KLL roll-ups:
  * each slice persists its own compact sketch (mergeable, fixed
  * K-entries memory), any cross-slice set question is sketch algebra.
  * Below the nominal-entries threshold (4096 here) the sketch is in
  * EXACT mode — the declared query's corpus vocabulary sits far under
  * that, which is why it can carry an ordinary COUNT DISTINCT /
  * INTERSECT / EXCEPT SQL oracle (the CMS/Misra-Gries exact-regime
  * pattern); the sampling regime is property-tested separately
  * (Karnin et al. / Dasgupta et al., the DataSketches theta family). */
case class ThetaAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_theta expects STRING input")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult())
    buf
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult().toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThetaAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `graft_theta_est(sk)` → rounded distinct-count estimate of one
  * compact theta sketch. CodegenFallback like the other sketch readers —
  * runs once per output row, never in a hot loop. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure("graft_theta_est expects sketch bytes")
    else TypeCheckResult.TypeCheckSuccess
  override def prettyName: String = "graft_theta_est"
  override protected def nullSafeEval(b: Any): Any =
    math.round(Sketches.wrapCompactSketch(
      Memory.wrap(b.asInstanceOf[Array[Byte]])).getEstimate)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_theta_setop(a, b, 'union'|'intersect'|'anotb')` → rounded
  * estimate of the set-algebra result over two compact sketches. */
case class ThetaSetOp(a: Expression, b: Expression, op: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = op
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (a.dataType != BinaryType || b.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure("graft_theta_setop expects sketch bytes")
    else if (!op.foldable || op.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        "graft_theta_setop op must be a STRING literal")
    else TypeCheckResult.TypeCheckSuccess
  override def prettyName: String = "graft_theta_setop"

  override protected def nullSafeEval(av: Any, bv: Any, opv: Any): Any = {
    val ska = Sketches.wrapCompactSketch(
      Memory.wrap(av.asInstanceOf[Array[Byte]]))
    val skb = Sketches.wrapCompactSketch(
      Memory.wrap(bv.asInstanceOf[Array[Byte]]))
    val est = opv.asInstanceOf[UTF8String].toString match {
      case "union" =>
        SetOperation.builder().buildUnion().union(ska, skb).getEstimate
      case "intersect" =>
        SetOperation.builder().buildIntersection()
          .intersect(ska, skb).getEstimate
      case "anotb" =>
        val an = SetOperation.builder().buildANotB()
        an.setA(ska); an.notB(skb)
        an.getResult(false).getEstimate
      case other =>
        throw new IllegalArgumentException(
          s"graft_theta_setop: unknown op '$other'")
    }
    math.round(est)
  }

  override protected def withNewChildrenInternal(
      na: Expression, nb: Expression, nop: Expression): Expression =
    copy(a = na, b = nb, op = nop)
}
