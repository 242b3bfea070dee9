package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling scratch — not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Graft.registerAll(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("toks"))
    val groups = docs.groupBy(col("toks"))
      .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("members"))
      .cache()
    println("groups=" + time("groups")(groups.count()))
    val reps = groups.select(col("rep").as("doc_id"), col("toks"))
    val numHashes = 32; val bands = 8; val rowsPerBand = 4
    val exploded = reps.select(col("doc_id"), explode(col("toks")).as("tok"))
    val sigCols = (0 until numHashes).map(i =>
      min(hash(concat(lit(s"$i:"), col("tok")))).as(s"h$i"))
    val sigs = exploded.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*).cache()
    println("sigs=" + time("sigs")(sigs.count()))
    val bandCols = (0 until bands).map(b =>
      hash((lit(b) +: (0 until rowsPerBand).map(r => col(s"h${rowsPerBand * b + r}"))): _*))
    val bandsDf = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bkey")).cache()
    println("bands=" + time("bands")(bandsDf.count()))
    val candsRaw = bandsDf.as("x").join(bandsDf.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    println("candsRaw=" + time("candsRaw")(candsRaw.count()))
    val cands = candsRaw.distinct().cache()
    println("cands=" + time("cands-distinct")(cands.count()))
    val ta = reps.select(col("doc_id").as("a"), col("toks").as("ta"))
    val tb = reps.select(col("doc_id").as("b"), col("toks").as("tb"))
    val repPairs = cands.join(ta, "a").join(tb, "b")
      .withColumn("j", expr("sorted_jaccard(ta, tb)"))
      .filter(col("j") >= 0.95)
      .select(col("a"), col("b"), col("j"))
    println("repPairs=" + time("confirm")(repPairs.count()))
    spark.stop()
  }
}
