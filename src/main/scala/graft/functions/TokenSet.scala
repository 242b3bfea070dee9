package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass sorted distinct WHITESPACE-token set kernel: the set
  * [[TokenJaccardUtil.compute]] builds on each side —
  * `split("\\s+").filter(_.nonEmpty).toSet` — as a sorted array.
  *
  * This is NOT [[NgramSetKernel]] with n = 1: that kernel's set
  * definition is single-0x20-delimited with empty tokens KEPT (the
  * contract `TextOps` documents for its shingle pipelines), while
  * Java's `\s` is the six ASCII bytes 0x09–0x0D and 0x20, and the
  * nonEmpty filter makes tokens maximal non-whitespace runs. The two
  * definitions disagree on any text with consecutive/leading/trailing
  * spaces or non-space whitespace ("a  b": ngram_set(·,1) = {"","a",
  * "b"}, token_set = {"a","b"}; "a\tb": {"a\tb"} vs {"a","b"}), so a
  * consumer that confirms with `token_jaccard` must band and
  * length-filter with THIS set — [[graft.plans.LshBandRewrite]]'s
  * raw-text form exists precisely for that pairing.
  *
  * Bit-identity to the declarative reference
  * `array_sort(array_distinct(array_remove(split(s, '\\s+'), '')))`
  * holds because: (1) all six `\s` bytes are ASCII and in UTF-8 can
  * never occur inside a multi-byte sequence, so the byte scan splits
  * exactly where the regex does; (2) `split` with limit -1 differs
  * from the reference only in empty elements, which both forms drop;
  * (3) `array_sort`'s default string comparator is `UTF8String
  * .compareTo` (unsigned bytewise), the same Comparable this kernel
  * sorts with. Asserted on adversarial whitespace corpora in
  * ExtensibilitySpec. Null text → null; all-whitespace/empty text →
  * empty array.
  */
object TokenSetKernel {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  def eval(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var tokens = 0
    var i = 0
    var inTok = false
    while (i < len) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) tokens += 1
      inTok = !ws
      i += 1
    }
    if (tokens == 0) return new GenericArrayData(Array.empty[Any])
    val sh = new Array[AnyRef](tokens)
    var t = 0
    var s = -1
    i = 0
    while (i < len) {
      if (isWs(bytes(i))) {
        if (s >= 0) { sh(t) = UTF8String.fromBytes(bytes, s, i - s); t += 1; s = -1 }
      } else if (s < 0) s = i
      i += 1
    }
    if (s >= 0) { sh(t) = UTF8String.fromBytes(bytes, s, len - s); t += 1 }
    java.util.Arrays.sort(sh)
    var u = 1
    i = 1
    while (i < tokens) {
      if (sh(i) != sh(u - 1)) { sh(u) = sh(i); u += 1 }
      i += 1
    }
    val out = new Array[Any](u)
    i = 0
    while (i < u) { out(i) = sh(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** `token_set(string) -> array<string>`: sorted distinct
  * `\s+`-delimited non-empty tokens — `token_jaccard`'s own set. */
case class TokenSet(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set requires string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_set"

  override protected def nullSafeEval(a: Any): Any =
    TokenSetKernel.eval(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSetKernel.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenSet =
    copy(child = newChild)
}
