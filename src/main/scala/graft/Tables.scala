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
      spark.read.parquet(s"$dir/$name.parquet").cache())

  /** Uncached read — for keys that assert parquet pushdown in the
    * physical plan (a cached table would scan InMemoryRelation and
    * hide PushedFilters).
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all base tables as temp views (for spark.sql queries). */
  def views(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
