package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** §2.11 `udtf_generator` (SURVEY.md:309): a custom `Generator`
  * expression emitting character n-grams — the Spark analogue of a
  * Hive GenericUDTF (process/forward), planned through `Generate`
  * exactly like `explode`. Strings shorter than n yield no rows
  * (outer-generate semantics are the caller's choice, as with any
  * UDTF).
  */
case class NGrams(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n > 0, "ngram size must be positive")

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType, nullable = false) :: Nil)

  override def prettyName: String = "ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length < n) Nil
      else (0 to s.length - n).iterator
        .map(i => InternalRow(UTF8String.fromString(s.substring(i, i + n))))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}
