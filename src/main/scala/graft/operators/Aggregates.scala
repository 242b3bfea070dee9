package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** §2.4 aggregation operators (SURVEY.md:191-207).
  * Hive origin: ql.exec.GroupByOperator partial/final modes — in
  * Spark the same split is HashAggregateExec partial → shuffle →
  * final, map-side combine included for free.
  */
object Aggregates {

  /** TPC-H Q1 shape — the M0 walking skeleton (SURVEY.md §7 M0).
    * Decimal money math, deterministic double division for averages,
    * total ORDER BY on the (unique) group key.
    */
  def aggGroupby(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val l = Tables.t(spark, dir, "lineitem")
    l.filter(col("l_shipdate") <= lit("1998-12-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(dec(col("l_quantity")))).as("sum_qty"),
        money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        money(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("sum_disc_price"),
        money(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) * (lit(1) + dec(col("l_tax"))))).as("sum_charge"),
        avgExact(sum(dec(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        avgExact(sum(dec(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val queries: Map[String, Q.QueryFn] = Map(
    "agg_groupby" -> ((s, d) => aggGroupby(s, d))
  )

  val oracle: Map[String, String] = Map(
    "agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
