package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented SURVEY.md §2 key is one entry in `queries`; the
  * SQL-expressible ones also appear in `oracleSql` (DuckDB dialect).
  */
object SparkEntry {
  /** Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggGroupby(spark, "/root/testdata/sf0.001")

  /** Each module contributes (queries, oracle) maps; a silent key
    * collision would shadow an operator, so concatenation asserts
    * uniqueness (the round-2 registration gap must never recur). */
  private def combine[A](parts: Seq[Map[String, A]], what: String): Map[String, A] = {
    val total = parts.map(_.size).sum
    val merged = parts.reduce(_ ++ _)
    require(merged.size == total,
      s"duplicate $what keys: ${parts.flatMap(_.keys).groupBy(identity).collect { case (k, v) if v.size > 1 => k }.mkString(",")}")
    merged
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    combine(Seq(
      Probes.queries,
      Scans.queries,
      Relational.queries,
      Aggregates.queries,
      Joins.queries,
      Windows.queries,
      Functions.queries,
      Generators.queries,
      Extensibility.queries,
      LlmText.queries,
      LlmVector.queries,
      LlmAnalysis.queries,
      Multimodal.queries,
      graft.streaming.Streams.queries,
    ), "query")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    combine(Seq(
      Probes.oracle,
      Scans.oracle,
      Relational.oracle,
      Aggregates.oracle,
      Joins.oracle,
      Windows.oracle,
      Functions.oracle,
      Generators.oracle,
      Extensibility.oracle,
      LlmText.oracle,
      LlmVector.oracle,
      LlmAnalysis.oracle,
      Multimodal.oracle,
      graft.streaming.Streams.oracle,
    ), "oracle")
}
