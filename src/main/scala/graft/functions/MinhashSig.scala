package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** One-pass minhash signature kernel. Bit-identical by construction to
  * the higher-order-function formulation it replaces in
  * `TextOps.bandedSignatures` —
  *
  * {{{ transform(sequence(0, n-1),
  *       i -> array_min(transform(transform(toks, t -> hash(t)),
  *                                h -> hash(i, h)))) }}}
  *
  * — because it composes the SAME Catalyst murmur primitives in the
  * same order: `hash(t)` = Murmur3 of the token bytes at seed 42
  * (null token → the seed, as Murmur3Hash defines); `hash(i, h)` =
  * `hashInt(h, hashInt(i, 42))` (multi-child Murmur3Hash folds the
  * seed left-to-right). Bit-identity matters: the signatures decide
  * LSH band collisions, and the dedup keys' oracle byte-equality
  * (and the measured-lossless banding parameters) must survive the
  * kernel swap. Asserted on random + adversarial arrays in
  * ExtensibilitySpec.
  *
  * Why a native kernel: the HOF form evaluates interpreted per
  * element (numHashes × tokens closure calls and boxed ints per row)
  * and was the priciest narrow stage of every dedup flavor; this is
  * a primitive loop, hashes each token's bytes once (the HOF hashed
  * them once too, via the materialized `hs` array — same work, none
  * of the overhead), and runs inside whole-stage codegen.
  */
object MinhashKernel {
  def sig(toks: ArrayData, numHashes: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val th = new Array[Int](n)
    var t = 0
    while (t < n) {
      th(t) = if (toks.isNullAt(t)) 42
      else {
        val s = toks.getUTF8String(t)
        Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      }
      t += 1
    }
    val out = new Array[Int](numHashes)
    var i = 0
    while (i < numHashes) {
      val seed = Murmur3_x86_32.hashInt(i, 42)
      var m = Murmur3_x86_32.hashInt(th(0), seed)
      var j = 1
      while (j < n) {
        val v = Murmur3_x86_32.hashInt(th(j), seed)
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_sig(array<string>, numHashesLiteral) -> array<int>`;
  * element nulls only for an empty input array (array_min of an
  * empty transform is null, and the kernel preserves that shape). */
case class MinhashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires (array<string>, positive int literal), got (${child.dataType}, $numHashes)")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    MinhashKernel.sig(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashKernel.sig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}
