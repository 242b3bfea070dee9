package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass sorted distinct word-n-gram set kernel. Bit-identical by
  * construction to the HOF formulation it replaces in
  * `TextOps.ngramSet` / `TextOps.tokenSet` —
  *
  * {{{ array_sort(array_distinct(
  *       transform(sequence(1, size(tk) - (n-1)),
  *         i -> concat_ws(" ", tk[i], ..., tk[i+n-1])) )) }}}
  *
  * with `tk = split(text, " ")` — by two observations:
  *
  *  1. the split pattern is a SINGLE space, so between consecutive
  *     tokens sits exactly one 0x20 byte (which in UTF-8 can never be
  *     part of a multi-byte sequence). An n-gram re-joined with `" "`
  *     is therefore EXACTLY the original text's byte range from token
  *     i's start to token i+n-1's end — including the empty-token runs
  *     that consecutive/leading/trailing spaces produce (Java split
  *     with limit -1 keeps them, and `concat_ws` then contributes bare
  *     separators: "a  b" → bigrams ["a ", " b"]). The kernel emits
  *     zero-copy slices of the input bytes instead of concatenating.
  *  2. distinct-then-sort equals sort-then-unique as a sorted set, and
  *     `array_sort`'s default string comparator is `UTF8String
  *     .compareTo` (unsigned bytewise), the same Comparable the kernel
  *     sorts with.
  *
  * Fewer than n tokens → empty array (the HOF's `when` gate).
  * Null text → null, where the HOF form yields an empty array via
  * when()'s otherwise-branch — indistinguishable downstream because
  * the collapse drops both (`size(toks) > 0` filters null and empty
  * alike); asserted in ExtensibilitySpec along with the non-null
  * bit-identity.
  *
  * Why a native kernel: the HOF form evaluates interpreted (per
  * shingle a closure call, n `element_at`s and a `concat_ws`
  * allocation, then `array_distinct` plus `array_sort`'s
  * per-comparison interpreted lambda), and it runs over the FULL
  * corpus twice per collapse — once materializing `groups`, once
  * `membership`. This is a byte scan, m slice headers, one
  * `Arrays.sort`, one unique pass.
  */
object NgramSetKernel {
  def eval(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var tokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) tokens += 1; i += 1 }
    if (tokens < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    var t = 0
    var s = 0
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(t) = s; ends(t) = i; t += 1; s = i + 1 }
      i += 1
    }
    starts(t) = s; ends(t) = len
    val m = tokens - n + 1
    val sh = new Array[AnyRef](m)
    i = 0
    while (i < m) {
      val st = starts(i)
      sh(i) = UTF8String.fromBytes(bytes, st, ends(i + n - 1) - st)
      i += 1
    }
    java.util.Arrays.sort(sh)
    var u = 1
    i = 1
    while (i < m) {
      if (sh(i) != sh(u - 1)) { sh(u) = sh(i); u += 1 }
      i += 1
    }
    val out = new Array[Any](u)
    i = 0
    while (i < u) { out(i) = sh(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** `ngram_set(string, nLiteral) -> array<string>`: sorted distinct
  * word n-grams; n = 1 is the sorted distinct token set. */
case class NgramSet(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"ngram_set requires (string, positive int literal), got (${child.dataType}, $n)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_set"

  override protected def nullSafeEval(a: Any): Any =
    NgramSetKernel.eval(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramSetKernel.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramSet =
    copy(child = newChild)
}
