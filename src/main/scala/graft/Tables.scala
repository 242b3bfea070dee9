package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cached loaders for the 10 driver-generated parquet tables
  * (TESTDATA.md, FIXTURES.md). Base tables are read once per
  * (session, sfDir) and cached: at bench time ~100 queries share the
  * same inputs, so re-scanning parquet per query would dominate the
  * run. At cluster scale the same role is played by a shared
  * table catalog; caching tiny dims is exactly what a 100 TB job
  * would do before a broadcast join.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Cached read of one base table. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate(
      s"${System.identityHashCode(spark)}|$dir|$name",
      read(spark, dir, name).cache())

  /** Uncached read — for keys that assert parquet pushdown in the
    * physical plan (a cached table would scan InMemoryRelation and
    * hide PushedFilters).
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    read(spark, dir, name)

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos via the
    * legacy long path and truncate to µs naive timestamps — exactly
    * what DuckDB does when it reads the same file, so oracles agree
    * (SURVEY.md §5.4 ns-alignment rule). */
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000"))
            .cast(org.apache.spark.sql.types.TimestampNTZType))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all base tables as temp views (for spark.sql queries). */
  def views(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
