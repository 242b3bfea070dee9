package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT r14 stretch: measure the opt-in LshBandRewrite under real
  * data — the SAME brute-force similarity-join query text, timed with
  * the rule off (BroadcastNestedLoopJoin, Θ(n²) kernel evaluations)
  * and on (banded-minhash equi-join + exact confirm), plus a
  * result-equality check between the two plans.
  *
  * Usage: runMain graft.LshRuleBench [sfDir] [tau] [reps]
  */
object LshRuleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val tau = if (args.length > 1) args(1).toDouble else 0.8
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Graft.registerAll(spark)
    graft.plans.LshBandRewrite.install(spark)

    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    docs.count() // materialize the cache outside the readings
    val l = docs.select(col("doc_id").as("ida"), col("text").as("sa"))
    val r = docs.select(col("doc_id").as("idb"), col("text").as("sb"))
    // the brute-force form a user writes: no equi key, kernel filter
    def q = l.join(r, expr(s"token_jaccard(sa, sb) >= $tau") &&
      col("ida") < col("idb")).select(col("ida"), col("idb"))

    def run(label: String, enabled: Boolean): Long = {
      spark.conf.set(graft.plans.LshBandRewrite.EnabledKey, enabled.toString)
      try {
        var rows = -1L
        (1 to reps).foreach { i =>
          val t0 = System.nanoTime()
          rows = q.count()
          println(f"LSHBENCH $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
        }
        rows
      } finally spark.conf.set(graft.plans.LshBandRewrite.EnabledKey, "false")
    }

    val banded = run("banded(rule_on)", enabled = true)
    val brute = run("brute(rule_off)", enabled = false)
    println(s"LSHBENCH equal_rowcounts=${banded == brute} sf=$sfDir tau=$tau")
    spark.stop()
  }
}
