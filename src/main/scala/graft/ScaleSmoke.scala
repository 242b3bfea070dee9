package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10×-scale smoke for the dedup path: replicate the sf0.1 corpus
  * `factor` times (50k docs at the default 10) under a PER-REPLICA
  * VOCABULARY RENAMING (every token prefixed with the replica id — a
  * bijection of the vocab), so within a replica every pairwise
  * Jaccard is EXACTLY the original's (renaming both sides of every
  * pair) and across replicas the overlap is zero. True pair count is
  * therefore exactly factor × the sf0.1 pair count, and the
  * banded-minhash join must scale linearly with it — this main
  * measures exactly that, the empirical "would the plan survive 10×"
  * datapoint the 100 TB story rests on.
  * Usage: runMain graft.ScaleSmoke [factor] [sfDir]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val base = docs.count()
    val big = (0 until factor).map { i =>
      docs.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        concat(lit(s"r${i}_"),
          regexp_replace(col("text"), " ", s" r${i}_")).as("text"))
    }.reduce(_ unionAll _).repartition(cpus.toInt).cache()
    val n = big.count() // materialize the synthetic corpus outside the timing
    val t0 = System.nanoTime()
    val pairs = api.TextOps.minhashNearDupPairs(big, "doc_id", "text", tau = 0.95).count()
    val sec = (System.nanoTime() - t0) / 1e9
    // reference point: the same pipeline on the unreplicated corpus
    val t1 = System.nanoTime()
    val basePairs = api.TextOps.minhashNearDupPairs(docs, "doc_id", "text", tau = 0.95).count()
    val baseSec = (System.nanoTime() - t1) / 1e9
    println(f"SCALESMOKE docs=$n (${factor}x$base) pairs=$pairs " +
      f"sec=$sec%.2f | base docs=$base pairs=$basePairs sec=$baseSec%.2f | " +
      f"pair_ratio=${pairs.toDouble / basePairs}%.2f time_ratio=${sec / baseSec}%.2f")
    spark.stop()
  }
}
