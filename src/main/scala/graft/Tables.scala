package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cached loaders for the 10 driver-generated parquet tables
  * (TESTDATA.md, FIXTURES.md). Base tables are read once per
  * (session, sfDir); whether a table is also `.cache()`d is a
  * SIZE-AWARE policy, not unconditional:
  *
  *   - dimension-class tables are always cached — that is exactly
  *     what a 100 TB job does before broadcasting them;
  *   - fact-class tables (lineitem/orders/events) are cached only
  *     while their on-disk size stays under `spark.graft.factCacheMaxBytes`
  *     (default 4 GiB). On this single-node bench all facts qualify
  *     and ~114 queries share one scan; on a 100 TB cluster the facts
  *     exceed the bound and stream from parquet with pushdown/pruning
  *     intact (the `raw` path is what the pushdown-asserting keys use
  *     either way).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val factTables = Set("lineitem", "orders", "events")

  private def shouldCache(spark: SparkSession, dir: String, name: String): Boolean =
    !factTables.contains(name) || {
      val bound = spark.conf.getOption("spark.graft.factCacheMaxBytes")
        .map(_.toLong).getOrElse(4L << 30)
      new java.io.File(s"$dir/$name.parquet").length() < bound
    }

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Compute-heavy corpus tables: per-row cost downstream (tokenize,
    * shingle, minhash, vector math — interpreted HOFs, no codegen) is
    * orders of magnitude above scan cost, so these are rebalanced to
    * core width BEFORE caching when they arrive as fewer file splits
    * than cores (a small parquet file is ONE split, and caching it
    * as-is pins every downstream operator to a single task — measured:
    * the sf0.1 documents table ran the whole shingle pipeline on 1 of
    * 32 cores). Relational tables deliberately keep their natural
    * split count: blanket 32-way rebalance was measured to COST ~15 s
    * across the ~100 small relational queries (32-task scheduling per
    * stage, 32× the output files on write paths) for no CPU win. On a
    * real cluster corpus tables exceed core count in splits and this
    * is a no-op. */
  private val computeHeavy = Set("documents", "embeddings")

  /** Cached read of one base table (size-aware `.cache()`, see above;
    * corpus tables rebalanced to core width first). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate(
      s"${System.identityHashCode(spark)}|$dir|$name", {
        val df = read(spark, dir, name)
        if (shouldCache(spark, dir, name)) {
          val cores = spark.sparkContext.defaultParallelism
          val balanced =
            if (computeHeavy(name) && df.rdd.getNumPartitions < cores)
              df.repartition(cores)
            else df
          balanced.cache()
        } else df
      })

  /** Uncached read — for keys that assert parquet pushdown in the
    * physical plan (a cached table would scan InMemoryRelation and
    * hide PushedFilters).
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    read(spark, dir, name)

  /** events.ts parquet encoding is NOT part of the testbed contract:
    * the generator shipped TIMESTAMP(NANOS) through round 12 and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) from round 13 — a real
    * 100 TB pipeline reads whatever footer it finds. Normalize to the
    * µs TimestampNTZType every oracle compares against, branching on
    * the INFERRED type rather than assuming either encoding:
    *  - timestamp footer (µs/ms) → plain cast, no arithmetic;
    *  - LongType (a TIMESTAMP(NANOS) footer surfaced through the
    *    legacy nanosAsLong flag — Spark 4 otherwise rejects ns files
    *    with [PARQUET_TYPE_ILLEGAL]) → integer-truncate ns→µs, which
    *    is byte-identical to DuckDB's own ns read (SURVEY.md §5.4). */
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      // harmless for µs files: the flag only rewrites NANOS columns
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/events.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
        case _ =>
          df.withColumn("ts", col("ts").cast(TimestampNTZType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all base tables as temp views (for spark.sql queries).
    * Fault-isolated per table: one unreadable file must not take down
    * queries over the other nine (round 13: a single events-encoding
    * change crashed nine SQL-form keys that never touch events). */
  def views(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      try t(spark, dir, n).createOrReplaceTempView(n)
      catch { case e: Throwable =>
        System.err.println(s"[graft] view '$n' unavailable ($dir): ${e.getMessage}")
      }
    }
}
