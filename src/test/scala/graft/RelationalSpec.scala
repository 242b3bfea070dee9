package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** §2.2/§2.6/§2.7 properties that the oracle cannot check:
  * per-partition sortedness for DISTRIBUTE/SORT BY, sample bounds,
  * and set-operation algebra (SURVEY.md:169-171, 234, 240-243).
  */
class RelationalSpec extends SparkSpec {

  test("distribute_cluster: rows are sorted within every partition and co-located by key") {
    val df = Tables.t(spark, sf, "lineitem")
      .repartition(col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"))
    val perPartition = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val rows = it.map(r => (r.getLong(0), r.getInt(1))).toVector
      Iterator((pid, rows == rows.sorted, rows.map(_._1).toSet))
    }.collect()
    assert(perPartition.forall(_._2), "a partition was not sorted")
    // DISTRIBUTE BY: a key never spans two partitions
    val keySets = perPartition.map(_._3)
    for (i <- keySets.indices; j <- keySets.indices if i < j)
      assert((keySets(i) intersect keySets(j)).isEmpty, s"key split across partitions $i/$j")
  }

  test("sample_fraction: seeded sample is deterministic and within bounds") {
    val base = Tables.t(spark, sf, "lineitem")
    val n = base.count()
    val s1 = base.sample(0.1, 42).count()
    val s2 = base.sample(0.1, 42).count()
    assert(s1 === s2, "same seed must give the same sample")
    assert(s1 > n * 0.05 && s1 < n * 0.15, s"sample fraction off: $s1 of $n")
  }

  test("set algebra: unionAll counts add; except+intersect partition the left set") {
    val c = Tables.t(spark, sf, "customer").select(col("c_nationkey").as("k"))
    val s = Tables.t(spark, sf, "supplier").select(col("s_nationkey").as("k"))
    assert(c.unionAll(s).count() === c.count() + s.count())
    val left = c.distinct()
    assert(left.intersect(s).count() + left.except(s).count() === left.count())
  }

  test("dedup_exact is idempotent") {
    val d1 = Tables.t(spark, sf, "orders").select("o_orderstatus", "o_orderpriority").distinct()
    assert(d1.distinct().count() === d1.count())
  }
}
