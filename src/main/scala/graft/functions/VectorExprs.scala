package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused dot product over two ArrayType(Double) columns as a native
  * Catalyst expression with whole-stage codegen (SURVEY §4: a codegen
  * Expression beats interpreted HOFs beats a UDF).
  *
  * Why it exists: `aggregate(zip_with(a, b, _*_), ...)` evaluates an
  * interpreted lambda per element — at sf0.1 the cosine kernel runs it
  * 4M pairs × 64 dims times (21 s measured). This compiles to a tight
  * primitive loop inside the generated join stage instead.
  *
  * Accumulation is sequential left-to-right in double, the same order as
  * the HOF form and DuckDB's list_sum(list_transform(...)), so results are
  * bitwise identical to the oracle before rounding. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two ARRAY<DOUBLE> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two SORTED long arrays (hashed shingle sets) in a
  * single codegen merge pass: |∩| counted by two-pointer merge, |∪| =
  * na + nb − |∩|. Replaces array_intersect/array_union on string arrays,
  * which build a hash set per pair (~80× slower measured on the ngram
  * near-dup query). Inputs MUST be distinct + ascending (array_sort of
  * xxhash64 values). */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard expects two ARRAY<BIGINT> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (na, nb) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val (xa, yb) = (x.getLong(i), y.getLong(j))
      if (xa == yb) { inter += 1; i += 1; j += 1 }
      else if (xa < yb) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(na, nb, i, j, inter, xa, yb, union) =
        Seq("na", "nb", "i", "j", "inter", "xa", "yb", "union")
          .map(ctx.freshName)
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $xa = $a.getLong($i); long $yb = $b.getLong($j);
         |  if ($xa == $yb) { $inter++; $i++; $j++; }
         |  else if ($xa < $yb) { $i++; } else { $j++; }
         |}
         |int $union = $na + $nb - $inter;
         |${ev.value} = $union == 0 ? 0.0 : (double) $inter / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection COUNT of two SORTED long arrays — [[JaccardSorted]]'s
  * two-pointer merge with the raw |∩| as the result, for asymmetric
  * measures (containment = |∩| / |A|) where the Jaccard normalization
  * would erase exactly the signal being measured. Same input contract:
  * distinct + ascending. */
case class OverlapSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_overlap expects two ARRAY<BIGINT> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_overlap"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (na, nb) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val (xa, yb) = (x.getLong(i), y.getLong(j))
      if (xa == yb) { inter += 1; i += 1; j += 1 }
      else if (xa < yb) i += 1
      else j += 1
    }
    inter
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(na, nb, i, j, inter, xa, yb) =
        Seq("na", "nb", "i", "j", "inter", "xa", "yb").map(ctx.freshName)
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $inter = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $xa = $a.getLong($i); long $yb = $b.getLong($j);
         |  if ($xa == $yb) { $inter++; $i++; $j++; }
         |  else if ($xa < $yb) { $i++; } else { $j++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Idempotently register the native expressions in the session's function
    * registry so operators can use them via expr("graft_dot(a, b)") etc.
    * Delegates to the shared [[GraftExtensions]] descriptor list. */
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "graft_dot", "graft_jaccard",
                             "graft_overlap")

  /** Register the bloom-probe kernel (see [[GraftExtensions]]). */
  def registerBloom(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "graft_bloom_might_contain")
}
