package graft

import org.apache.spark.sql.functions._

/** §2.1 plan-shape assertions: pushdown and pruning must reach the
  * parquet reader — at 100 TB these two properties are the difference
  * between reading terabytes and reading gigabytes (SURVEY.md:149-152).
  */
class ScanSpec extends SparkSpec {

  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("filter pushdown reaches the parquet scan (PushedFilters)") {
    val df = Tables.raw(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("2000-06-01"))
      .select(col("l_orderkey"))
    val plan = formattedPlan(df)
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("l_shipdate"), plan)
    assert(!plan.matches("(?s).*PushedFilters: \\[\\].*"), plan)
  }

  test("column pruning reaches the parquet reader (ReadSchema)") {
    val df = Tables.raw(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = formattedPlan(df)
    // 2 of 11 columns in ReadSchema; the wide columns must be absent
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_extendedprice"), plan)
    assert(!plan.contains("l_comment"), plan)
  }

  test("broadcast join is chosen for the small dimension side") {
    val df = Tables.raw(spark, sf, "lineitem")
      .join(broadcast(Tables.raw(spark, sf, "part")),
        col("l_partkey") === col("p_partkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("partition pruning reaches the file index (PartitionFilters)") {
    import graft.operators.Scans
    Scans.queries("scan_partitioned")(spark, sf).count() // writes the partitioned copy
    val dir = s"${sys.props("java.io.tmpdir")}/graft_io/${math.abs(sf.hashCode)}/scan_partitioned"
    val df = spark.read.parquet(dir).filter(col("o_year") === 1997)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*o_year[^\\]]*\\].*"), plan)
  }

  test("csv/json/orc roundtrips preserve row counts and values") {
    import graft.operators.Scans
    val base = Tables.t(spark, sf, "orders").count()
    for (key <- Seq("scan_csv", "scan_json_file", "scan_orc")) {
      val rt = Scans.queries(key)(spark, sf)
      assert(rt.count() === base, key)
    }
  }
}
