package graft.api

import graft.functions.Graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public embedding-similarity API over arbitrary DataFrames with an
  * `array<float>`/`array<double>` vector column. The cosine kernel is
  * the codegen'd `vec_dot` expression; norms are computed once per
  * vector. Brute-force forms are the exact baselines; `ivfTopK` is
  * the bucket-first scale path (partition before pairwise work).
  */
object VectorOps {

  private def prepared(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    Graft.registerAll(df.sparkSession)
    df.select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
  }

  /** Exact cosine top-k: every probe against the full corpus.
    * Deterministic tie-break by candidate id. */
  def cosineTopK(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val e = prepared(corpus, idCol, vecCol)
    val p = prepared(probes, idCol, vecCol)
      .select(col("vec_id").as("pid"), col("v").as("pv"), col("nrm").as("pnrm"))
    val scored = p.crossJoin(e).filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id").as("cid"),
        (expr("vec_dot(pv, v)") / (col("pnrm") * col("nrm"))).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("score").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("pid"), col("rk"), col("cid"), col("score"))
  }

  /** All pairs with cosine ≥ tau (dedup-by-similarity primitive). */
  def cosineThresholdPairs(df: DataFrame, idCol: String, vecCol: String,
      tau: Double): DataFrame = {
    val e = prepared(df, idCol, vecCol)
    val a = e.select(col("vec_id").as("ida"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        (expr("vec_dot(va, vb)") / (col("na") * col("nb"))).as("score"))
      .filter(col("score") >= tau)
  }

  /** Approximate top-k through a sign-bit coarse quantizer over the
    * first `bits` dimensions, multi-probing all hamming-1 buckets —
    * each probe scans ~(bits+1)/2^bits of the corpus. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int = 4): DataFrame = {
    val bucket = (0 until bits)
      .map(i => when(element_at(col("v"), i + 1) > 0, 1 << i).otherwise(0))
      .reduce(_ + _).cast("int")
    val e = prepared(corpus, idCol, vecCol).withColumn("bucket", bucket)
    val probeBuckets = array((lit(0) +: (0 until bits).map(i => lit(1 << i))): _*)
    val p = prepared(probes, idCol, vecCol).withColumn("bucket", bucket)
      .select(col("vec_id").as("pid"), col("v").as("pv"), col("nrm").as("pnrm"),
        explode(probeBuckets).as("flip"), col("bucket"))
      .select(col("pid"), col("pv"), col("pnrm"),
        col("bucket").bitwiseXOR(col("flip")).as("pb"))
    val scored = p.join(e, col("pb") === col("bucket") && col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id").as("cid"),
        (expr("vec_dot(pv, v)") / (col("pnrm") * col("nrm"))).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("score").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("pid"), col("rk"), col("cid"), col("score"))
  }

  /** Per-label centroids and each vector's distance to its own
    * centroid (partial-aggregable sums per (label, dim)). */
  def centroidDistances(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val ex = df.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
        posexplode(transform(col(vecCol), x => x.cast("double"))))
      .toDF("vec_id", "label", "pos", "v")
    val cent = ex.groupBy(col("label").as("c_label"), col("pos").as("c_pos"))
      .agg((sum(col("v")) / count(lit(1))).as("cd"))
    ex.join(cent, col("label") === col("c_label") && col("pos") === col("c_pos"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sqrt(sum((col("v") - col("cd")) * (col("v") - col("cd")))).as("dist"))
  }
}
