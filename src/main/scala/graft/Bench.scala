package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed region (first Spark job in
    // a fresh JVM otherwise charges ~5 s of JIT/codegen to whichever
    // query happens to run first); table caches are NOT pre-warmed —
    // input-scan cost stays inside the measurements
    spark.range(1000).selectExpr("sum(id * 2)").collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // The driver tail-captures stdout: emit the long per-query map
    // FIRST and a short self-contained total line LAST, so truncation
    // can only ever eat the detail, never the parsed headline.
    println(s"""{"metric":"queries","queries":$qs,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
