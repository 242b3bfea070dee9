package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §5.3 window laws on real data: the running sum's last row per
  * group must equal the group total, and top-k per group is a subset
  * of the group ordered by the ranking key.
  */
class WindowLawSpec extends SparkSpec {

  test("fill-forward laws: null only before the first observation, carried value is the last non-null") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Windows.queries("win_fill_forward")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.exists(_._3.isEmpty), "null injection must bite")
    // replay the carry per partition in the WINDOW's order — by
    // (o_orderdate, o_orderkey), which is byCust's frame order, NOT
    // the output presentation order — and check every row
    val dateOf = Tables.t(spark, sf, "orders")
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_orderdate"))
      .collect().map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1)).toMap
    rows.groupBy(_._1).foreach { case (cust, rs) =>
      var carry: Option[Double] = None
      rs.sortBy { case (_, okey, _, _) => (dateOf(okey).toString, okey) }
        .foreach { case (_, okey, v, filled) =>
          if (v.isDefined) carry = v
          assert(filled === carry,
            s"cust=$cust key=$okey: filled=$filled expected carry=$carry")
        }
    }
  }

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
