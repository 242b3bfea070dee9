package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a BROADCAST bloom filter — the executor-side
  * half of the manual bloom pre-filter (guide §3.2), replacing the
  * binary-LITERAL form (`BloomFilterMightContain(Literal(bytes), h)`)
  * in `TextOps.exactNgramContamination`.
  *
  * Why: a literal bloom is serialized into EVERY task binary of EVERY
  * stage whose plan contains the filter (measured r22 at sf0.1: the
  * 1.2 MB bloom made 2.3 MB task binaries, re-broadcast per stage, and
  * ~0.3-0.4 s of the key's warm time was driver-side plan/closure
  * handling). At 100 TB the decontamination bloom is sized to the
  * train-gram count — hundreds of MB — and a literal that size per
  * task binary is a driver/scheduler hazard. A broadcast ships the
  * bytes ONCE per executor (torrent), and the plan carries only the
  * handle.
  *
  * Decision-identical to the literal form by construction: the same
  * serialized `BloomFilter` bits answer the same `mightContainLong`
  * probe (and either way the bloom is only a lossless prefilter — the
  * exact confirm join downstream fixes any false positive, so even the
  * OUTPUT is independent of the filter's decisions; asserted in
  * ApiSpec). The filter deserializes once per task via a transient
  * lazy, not once per row.
  */
case class BloomMightContainBc(child: Expression, bloomBc: Broadcast[Array[Byte]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_bc requires bigint, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_bc"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBc.value))

  def mightContain(h: Long): Boolean = bloom.mightContainLong(h)

  override protected def nullSafeEval(h: Any): Any =
    mightContain(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the EXPRESSION object (it carries the broadcast handle
    // and the per-task lazy bloom); only the handle rides in the task
    // binary, the bytes move once per executor via the broadcast
    val ref = ctx.addReferenceObj("bloomKernel", this,
      classOf[BloomMightContainBc].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBc =
    copy(child = newChild)
}
