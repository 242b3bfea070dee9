package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** §2.11 `udaf_aggregator` (SURVEY.md:307): typed Aggregator with the
  * Hive GenericUDAFEvaluator lifecycle (update≈iterate, merge≈merge,
  * finish≈terminate). Exact weighted mean: both operands are scaled
  * to integer cents so the buffer is two longs — associative,
  * overflow-safe at the test scales, partition-order independent.
  */
object WeightedMean extends Aggregator[(Double, Double), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val w = math.round(in._1 * 100); val x = math.round(in._2 * 100)
    (b._1 + w * x, b._2 + w)
  }
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0) 0.0 else b._1.toDouble / b._2.toDouble / 100.0
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Session-level registration of the custom Catalyst functions — the
  * engine's analogue of Hive's `CREATE TEMPORARY FUNCTION` +
  * FunctionRegistry. Everything is resolved by the normal analyzer
  * afterwards, so the functions work from SQL text and expr() alike.
  */
object Graft {
  // keyed on the session's OWN FunctionRegistry, not a memo of session
  // hashes: an identity-hash memo outlives stopped sessions and can
  // collide with a later session's hash, silently skipping
  // registration. The registry lookup is a map get, and concurrent
  // double-registration is harmless (createOrReplaceTempFunction and
  // udf.register are idempotent).
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("sorted_jaccard_min"))) {
      reg.createOrReplaceTempFunction("token_jaccard",
        exprs => TokenJaccard(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("token_set",
        exprs => TokenSet(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("ngrams",
        exprs => NGrams(exprs(0),
          exprs(1).asInstanceOf[Literal].value.asInstanceOf[Int]), "built-in")
      reg.createOrReplaceTempFunction("topk_keys",
        exprs => TopKKeys(exprs(0), exprs(1),
          exprs(2).asInstanceOf[Literal].value.asInstanceOf[Int]), "built-in")
      reg.createOrReplaceTempFunction("topk_pairs",
        exprs => TopKPairs(exprs(0), exprs(1),
          exprs(2).asInstanceOf[Literal].value.asInstanceOf[Int]), "built-in")
      reg.createOrReplaceTempFunction("minhash_sig",
        exprs => MinhashSig(exprs(0),
          exprs(1).asInstanceOf[Literal].value.asInstanceOf[Int]), "built-in")
      reg.createOrReplaceTempFunction("ngram_set",
        exprs => NgramSet(exprs(0),
          exprs(1).asInstanceOf[Literal].value.asInstanceOf[Int]), "built-in")
      reg.createOrReplaceTempFunction("simhash_sig",
        exprs => SimhashSig(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("vec_dot",
        exprs => VecDot(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("sorted_jaccard",
        exprs => SortedJaccard(exprs(0), exprs(1)), "built-in")
      spark.udf.register("wmean",
        udaf(WeightedMean, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)))
      spark.udf.register("tier", (bal: Double) =>
        if (bal > 7500) "platinum" else if (bal > 2500) "gold"
        else if (bal >= 0) "standard" else "delinquent")
      // the sentinel registers LAST: if anything above throws, the
      // functionExists probe stays false and the next registerAll call
      // retries the whole block instead of permanently skipping the
      // functions after the throw point
      reg.createOrReplaceTempFunction("sorted_jaccard_min",
        exprs => SortedJaccardMin(exprs(0), exprs(1),
          exprs(2).asInstanceOf[Literal].value match {
            case d: java.lang.Double => d
            case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
            case other => other.toString.toDouble
          }), "built-in")
    }
  }
}
