package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (UDTF tier, SURVEY §2.J): explode a
  * token array into its n-grams, one output row per n-gram with its
  * position — `graft_ngrams(tokens, n)` ⇒ rows of (pos INT, ngram STRING).
  *
  * Exists to prove the Generator extension point; the declared bigram
  * query (text_ngrams) deliberately stays on the built-in
  * transform+explode composition, which whole-stage codegen handles
  * (CollectionGenerator UDTFs are CodegenFallback). */
case class NgramGenerator(child: Expression, n: Expression)
    extends CollectionGenerator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)
  override def position: Boolean = true
  override def inline: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n.foldable &&
        n.dataType == IntegerType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_ngrams expects (ARRAY<STRING>, constant INT)")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def collectionType: DataType = ArrayType(elementSchema)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val size = n.eval(input).asInstanceOf[Int]
    val toks = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString)
    (0 to toks.length - size).map { i =>
      InternalRow(i,
        UTF8String.fromString(toks.slice(i, i + size).mkString(" ")))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), n = newChildren(1))
}

object NgramGenerator {
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "graft_ngrams")
}
