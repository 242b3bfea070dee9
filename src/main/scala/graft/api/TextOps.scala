package graft.api

import graft.functions.Graft
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public text-pipeline API over arbitrary DataFrames — the
  * library surface a training-data pipeline calls; the SparkEntry
  * llm_* keys are instantiations of these over the test tables.
  *
  * All operators are linear explode/agg/band-join pipelines (no
  * O(n²) global state) and deterministic: fixed hash seeds, exact
  * confirm stages, documented tie-breaks.
  */
object TextOps {

  /** Distinct sorted token set of a whitespace-tokenized text column. */
  def tokenSet(textCol: Column): Column =
    array_sort(array_distinct(split(textCol, " ")))

  /** Exact text dedup groups: sha256 of the normalized text, the
    * minimum id as group keeper, and the copy count. */
  def exactDedupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(lower(trim(col(textCol))).cast("binary"), 256).as("h"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** MinHash-LSH near-duplicate pairs with exact-Jaccard confirm.
    *
    * Pipeline: exact-set collapse → fixed-seed murmur minhash
    * signatures → banded candidate generation (band keys are single
    * murmur ints; hash collisions only ADD candidates, which the
    * exact confirm filters) → codegen'd sorted-merge Jaccard ≥ tau →
    * fan-out back to member ids. Output: (a, b, j) with a < b.
    */
  def minhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String, tau: Double,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val spark = df.sparkSession
    Graft.registerAll(spark)
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")

    val docs = df.select(col(idCol).as("doc_id"), tokenSet(col(textCol)).as("toks"))
    val groups = docs.groupBy(col("toks"))
      .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("members"))
      .cache()
    val reps = groups.select(col("rep").as("doc_id"), col("toks"))
    val exploded = reps.select(col("doc_id"), explode(col("toks")).as("tok"))
    val sigCols = (0 until numHashes).map(i =>
      min(hash(concat(lit(s"$i:"), col("tok")))).as(s"h$i"))
    val sigs = exploded.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until bands).map(b =>
      hash((lit(b) +: (0 until rowsPerBand).map(r => col(s"h${rowsPerBand * b + r}"))): _*))
    val bandsDf = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bkey"))
    val cands = bandsDf.as("x").join(bandsDf.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val ta = reps.select(col("doc_id").as("a"), col("toks").as("ta"))
    val tb = reps.select(col("doc_id").as("b"), col("toks").as("tb"))
    val repPairs = cands.join(broadcast(ta), "a").join(broadcast(tb), "b")
      .withColumn("j", expr("sorted_jaccard(ta, tb)"))
      .filter(col("j") >= tau)
      .select(col("a"), col("b"), col("j"))
    val cross = repPairs
      .join(broadcast(groups.select(col("rep").as("a"), col("members").as("ma"))), "a")
      .join(broadcast(groups.select(col("rep").as("b"), col("members").as("mb"))), "b")
      .select(explode(col("ma")).as("da"), col("mb"), col("j"))
      .select(col("da"), explode(col("mb")).as("db"), col("j"))
      .select(least(col("da"), col("db")).as("a"),
        greatest(col("da"), col("db")).as("b"), col("j"))
    val within = groups.filter(size(col("members")) >= 2)
      .select(explode(col("members")).as("da"), col("members"))
      .select(col("da"), explode(col("members")).as("db"))
      .filter(col("da") < col("db"))
      .select(col("da").as("a"), col("db").as("b"), lit(1.0).as("j"))
    cross.unionAll(within)
  }

  /** SimHash near-duplicate pairs: 32-bit simhash from per-token
    * murmur bits, hamming prefilter, exact-Jaccard confirm.
    * maxHamming must be validated against the corpus for losslessness
    * (see LlmText for the measured bound on the testbed). */
  def simhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      tau: Double, maxHamming: Int): DataFrame = {
    val spark = df.sparkSession
    Graft.registerAll(spark)
    val docs = df.select(col(idCol).as("doc_id"), tokenSet(col(textCol)).as("toks"))
    val tok = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("h", hash(col("tok")))
    val sumCols = (0 until 32).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(1) * 2 - 1).as(s"s$b"))
    val sums = tok.groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*)
    val sim = sums.select(col("doc_id"),
      (0 until 32).map(b => when(col(s"s$b") > 0, 1L << b).otherwise(0L))
        .reduce(_ + _).as("sim"))
    val withSim = docs.join(sim, "doc_id")
    val a = withSim.select(col("doc_id").as("a"), col("toks").as("ta"), col("sim").as("sa"))
    val b = withSim.select(col("doc_id").as("b"), col("toks").as("tb"), col("sim").as("sb"))
    a.join(b, col("a") < col("b"))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= maxHamming)
      .withColumn("j", expr("sorted_jaccard(ta, tb)"))
      .filter(col("j") >= tau)
      .select(col("a"), col("b"), col("j"))
  }

  /** Word n-gram array (order-sensitive shingles). */
  def wordNgrams(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + o)): _*))
    ).otherwise(array().cast("array<string>"))

  /** Brute-force n-gram-set Jaccard pairs (shard the input or use
    * [[minhashNearDupPairs]] over shingle text at scale). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double): DataFrame = {
    val spark = df.sparkSession
    Graft.registerAll(spark)
    val docs = df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("tk"))
      .select(col("doc_id"), array_sort(array_distinct(wordNgrams(col("tk"), n))).as("bg"))
    val a = docs.select(col("doc_id").as("a"), col("bg").as("ba"))
    val b = docs.select(col("doc_id").as("b"), col("bg").as("bb"))
    a.join(b, col("a") < col("b"))
      .withColumn("j", expr("sorted_jaccard(ba, bb)"))
      .filter(col("j") >= tau)
      .select(col("a"), col("b"), col("j"))
  }

  /** Winnowing-lite rolling-hash fingerprint over 4-token windows. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def tokhash(c: Column) =
      length(c) * 961 + ascii(substring(c, 1, 1)) * 31 + ascii(substring(c, -1, 1))
    val tk = col("tk")
    val windowHashes = transform(sequence(lit(1), size(tk) - 3),
      i => (0 until 4).map(k => tokhash(element_at(tk, i + k)) * (k + 1)).reduce(_ + _))
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("tk"))
      .filter(size(tk) >= 4)
      .select(col("doc_id"), array_min(windowHashes).as("fp"))
  }
}
