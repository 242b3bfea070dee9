package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §5.3 window laws on real data: the running sum's last row per
  * group must equal the group total, and top-k per group is a subset
  * of the group ordered by the ranking key.
  */
class WindowLawSpec extends SparkSpec {

  test("running_sum last row per customer equals the group sum") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        Q.dec(col("o_totalprice")).as("p"))
      .withColumn("run", sum(col("p")).over(w))
    // totalprice > 0, so the running sum is monotone: its max is the
    // final cumulative value and must equal the plain group sum
    val totals = df.groupBy(col("o_custkey")).agg(sum(col("p")).as("tot"),
      max(col("run")).as("max_run"))
    assert(totals.filter(col("tot") =!= col("max_run")).count() === 0)
  }

  test("top-3 per brand is contained in the full ranking and has <= 3 rows per brand") {
    val top = graft.operators.Windows.queries("win_topk_per_group")(spark, sf)
    val sizes = top.groupBy("p_brand").count()
    assert(sizes.filter(col("count") > 3).count() === 0)
    assert(top.filter(col("rk") < 1 || col("rk") > 3).count() === 0)
  }
}
