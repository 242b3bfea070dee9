package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** One-pass 32-bit simhash kernel. Bit-identical by construction to
  * the nested-HOF formulation it replaces in
  * `TextOps.simhashNearDupPairs` —
  *
  * {{{ aggregate(
  *       transform(sequence(0, 31), b ->
  *         if(aggregate(hs, 0, (acc, h) -> acc + (shiftright(h, b) & 1) * 2 - 1) > 0,
  *            shiftleft(1L, b), 0L)),
  *       0L, (acc, x) -> acc + x) }}}
  *
  * with `hs = transform(toks, t -> hash(t))` — because it composes
  * the same primitives: `hash(t)` = Murmur3 of the token bytes at
  * seed 42 (null token → the seed, as Murmur3Hash defines); bit b's
  * ±1 votes sum over tokens, a STRICT-majority positive sum sets the
  * bit (a tie sums to 0 and does not); summing disjoint `1L << b`
  * terms equals OR-ing them. Empty array → 0L (every vote sum is 0),
  * matching the HOF. Null input → null, where the HOF form yields 0L
  * (the inner aggregate nulls out and `if` takes the else branch) —
  * indistinguishable in the pipeline, whose inputs are collapse group
  * keys (never null); asserted in ExtensibilitySpec along with the
  * non-null bit-identity.
  *
  * Why a native kernel: the HOF form evaluates 32 interpreted
  * aggregate passes over an interpreted-materialized hash array per
  * row; this hashes each token once and updates 32 int counters in a
  * primitive loop, inside whole-stage codegen.
  */
object SimhashKernel {
  def sig(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](32)
    var t = 0
    while (t < n) {
      val h = if (toks.isNullAt(t)) 42
      else {
        val s = toks.getUTF8String(t)
        Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      }
      var b = 0
      while (b < 32) { counts(b) += ((h >> b) & 1) * 2 - 1; b += 1 }
      t += 1
    }
    var sim = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) sim |= 1L << b; b += 1 }
    sim
  }
}

/** `simhash_sig(array<string>) -> bigint`. */
case class SimhashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    SimhashKernel.sig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashKernel.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}
