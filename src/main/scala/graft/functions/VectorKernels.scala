package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Hot-loop kernels for the §2.12 pipelines, kept as static-forwarder
  * objects callable from generated Java. These exist because the
  * higher-order-function formulation (aggregate/zip_with lambdas,
  * per-call regex tokenization) is interpreted per element — measured
  * 179 s / 60 s on the sf0.1 bench — while a primitive loop over
  * ArrayData is codegen-friendly and ~20× faster at identical
  * semantics (same left-to-right fold order, so identical floats).
  */
object VectorKernelUtil {
  /** Sequential dot product — same fold order as
    * aggregate(zip_with(a, b, *), 0.0, +). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Jaccard of two SORTED DISTINCT string arrays via linear merge —
    * equal by construction to the token-set Jaccard. */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** [[sortedJaccard]] with sound early abandon against a threshold:
    * returns the EXACT Jaccard whenever it could reach `tau`, and
    * -1.0 as soon as it provably cannot. J ≥ tau ⟺ the intersection
    * reaches ceil(tau·(|A|+|B|)/(1+tau)); the reachable intersection
    * is bounded by inter-so-far + the shorter remaining suffix, so
    * the merge bails the moment that bound drops below the target
    * (one integer compare per step; the 1e-9 slack makes the float
    * ceiling conservative — a boundary pair is never abandoned, its
    * exact j is computed and the caller's `>= tau` filter decides). */
  def sortedJaccardMin(a: ArrayData, b: ArrayData, tau: Double): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val needed = math.ceil(tau * (na + nb) / (1.0 + tau) - 1e-9).toInt
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      if (inter + math.min(na - i, nb - j) < needed) return -1.0
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

/** `vec_dot(array<double>, array<double>) -> double` */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true // element nullability irrelevant
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernelUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** `sorted_jaccard(array<string>, array<string>) -> double` over
  * sorted distinct arrays. */
case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] && right.dataType.isInstanceOf[ArrayType]
        && left.dataType.asInstanceOf[ArrayType].elementType == StringType
        && right.dataType.asInstanceOf[ArrayType].elementType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard requires (array<string>, array<string>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelUtil.sortedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernelUtil.sortedJaccard($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccard =
    copy(left = l, right = r)
}

/** `sorted_jaccard_min(array<string>, array<string>, tauLiteral) ->
  * double`: exact Jaccard, or -1.0 once it provably cannot reach
  * `tau` (sound early abandon — see VectorKernelUtil.sortedJaccardMin).
  * `tau` is a literal baked into the generated code. */
case class SortedJaccardMin(left: Expression, right: Expression, tau: Double)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] && right.dataType.isInstanceOf[ArrayType]
        && left.dataType.asInstanceOf[ArrayType].elementType == StringType
        && right.dataType.asInstanceOf[ArrayType].elementType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard_min requires (array<string>, array<string>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard_min"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelUtil.sortedJaccardMin(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], tau)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernelUtil.sortedJaccardMin($a, $b, ${tau}D)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccardMin =
    copy(left = l, right = r)
}
