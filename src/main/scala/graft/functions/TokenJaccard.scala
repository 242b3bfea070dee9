package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel kept in a companion-class-free object so scalac emits a
  * static forwarder that whole-stage-generated Java can call directly.
  */
object TokenJaccardUtil {
  /** Jaccard similarity of the DISTINCT whitespace-token sets. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString.split("\\s+").filter(_.nonEmpty).toSet
    val s2 = b.toString.split("\\s+").filter(_.nonEmpty).toSet
    val union = (s1 union s2).size
    if (union == 0) 0.0 else (s1 intersect s2).size.toDouble / union
  }
}

/** §2.11 `udf_expression_codegen` (SURVEY.md:306): a native Catalyst
  * `Expression` with real `doGenCode` — the Spark analogue of a Hive
  * GenericUDF, but compiled into the whole-stage-codegen loop instead
  * of reflectively invoked per row. Registered under
  * `token_jaccard(s1, s2)` via the session FunctionRegistry
  * (Graft.registerAll).
  */
case class TokenJaccard(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_jaccard requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "token_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenJaccardUtil.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TokenJaccardUtil.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenJaccard =
    copy(left = newLeft, right = newRight)
}
