package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** JMH-style JVM warmup for the bench mains: exercise the interpreter,
  * Janino codegen, shuffle, window, higher-order-function, custom
  * kernel, and streaming micro-batch machinery ONCE on tiny synthetic
  * in-memory data, so first-touch compiler cost is not charged to
  * whichever measured query happens to run first (measured: the first
  * HOF-heavy dedup query pays ~12 s of JIT/codegen cold vs ~1.5 s
  * steady-state). Input tables are deliberately NOT touched — scan,
  * decode, and data-dependent costs all stay inside the measurements.
  */
object Warmup {
  def run(spark: SparkSession): Unit = {
    import spark.implicits._
    graft.functions.Graft.registerAll(spark)
    val w = spark.range(256).selectExpr(
      "id", "cast(id % 7 as string) k",
      "array(cast(id as string), cast(id + 1 as string)) sarr",
      "array(cast(id as double), cast(id + 1 as double)) varr")
    // aggregate + sort shuffle, codegen'd agg
    w.groupBy($"k").count().orderBy($"k").count()
    // sort-merge / broadcast join paths
    w.as("a").join(w.as("b"), "k").count()
    // window machinery
    w.selectExpr("row_number() over (partition by k order by id) rn").count()
    // higher-order functions (interpreted eval path) + multi-arg hash
    w.selectExpr(
      "transform(sarr, t -> hash(1, t)) th",
      "array_min(transform(sarr, t -> hash(2, t))) mn",
      "aggregate(varr, 0.0D, (acc, x) -> acc + x) ag").count()
    // custom codegen'd kernels
    w.selectExpr("vec_dot(varr, varr) d",
      "sorted_jaccard_min(sarr, sarr, 0.5D) j").count()
    // sketch aggregates run on the ObjectHashAggregate path, whose
    // first use costs ~1.5 s of class-load/codegen (measured:
    // agg_approx_distinct 1.8 s cold vs 0.13 s warm) — compile it
    // here like every other engine shape; the measured query still
    // pays all scan + sketch-merge work on real data
    w.selectExpr("approx_count_distinct(k) ad",
      "percentile_approx(cast(id as double), 0.5, 100) pa").count()
    // streaming micro-batch + state-store machinery
    val ms = MemoryStream[Long](spark)
    ms.addData(1L to 64L: _*)
    val q = ms.toDF().groupBy($"value" % 8).count()
      .writeStream.outputMode("complete").format("noop").start()
    q.processAllAvailable(); q.stop()
    // the dedup/similarity pipelines on a 3-row SYNTHETIC corpus: the
    // interpreted HOF signature path, band join, sorted-merge kernel,
    // fan-out joins, and the label-propagation loop all get their
    // Janino/JIT compilation here instead of inside the first measured
    // dedup query (~9 s cold vs ~1.5 s steady-state, measured)
    val docs = Seq((1L, "a b c d"), (2L, "a b c d e"), (3L, "x y z"))
      .toDF("doc_id", "text")
    graft.api.TextOps.minhashNearDupClusters(docs, "doc_id", "text", 0.5).count()
    // the simhash and shingle flavors compile DIFFERENT plan shapes
    // (per-bit simhash fold + hamming filter; n-gram window transform
    // and 10×3 banding) — without these two calls their first measured
    // run pays ~3.6 s of Janino/JIT (r7 BenchOne: simhash 5.01 s first
    // vs 1.42 s steady)
    graft.api.TextOps.simhashNearDupPairs(docs, "doc_id", "text",
      tau = 0.5, maxHamming = 8).count()
    graft.api.TextOps.ngramJaccardPairs(docs, "doc_id", "text", n = 2, tau = 0.5).count()
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    graft.api.VectorOps.cosineTopK(vecs, vecs, "vec_id", "embedding", 1).count()
    graft.api.VectorOps.ivfTopK(vecs, vecs, "vec_id", "embedding",
      k = 1, numCells = 2, nprobe = 1, sampleSize = 4).count()
  }
}
