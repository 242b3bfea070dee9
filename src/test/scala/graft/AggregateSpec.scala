package graft

import org.apache.spark.sql.functions._

/** §2.4 approx-sketch bounds and builtin-vs-exact cross-checks that
  * can never be oracle-compared (SURVEY.md:200-203).
  */
class AggregateSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val l = Tables.t(spark, sf, "lineitem")
    val exact = l.select(countDistinct(col("l_partkey"))).head.getLong(0)
    val approx = l.select(approx_count_distinct(col("l_partkey"))).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
  }

  test("percentile_approx within rank tolerance of exact percentile") {
    val l = Tables.t(spark, sf, "lineitem")
    val exact = l.select(expr("percentile(l_extendedprice, 0.5)")).head.getDouble(0)
    val approx = l.select(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)))
      .head.getDouble(0)
    // rank-tolerance: the approx median must sit within the 45th-55th pct band
    val lo = l.select(expr("percentile(l_extendedprice, 0.45)")).head.getDouble(0)
    val hi = l.select(expr("percentile(l_extendedprice, 0.55)")).head.getDouble(0)
    assert(approx >= lo && approx <= hi, s"approx $approx outside [$lo, $hi] (exact $exact)")
  }

  test("builtin stddev/var/corr agree with the exact-moment formulation") {
    val l = Tables.t(spark, sf, "lineitem")
    val builtin = l.agg(
      stddev_samp(col("l_extendedprice")), var_samp(col("l_quantity")),
      corr(col("l_quantity"), col("l_extendedprice"))).head
    val exact = graft.operators.Aggregates.queries("agg_stats")(spark, sf)
      .agg(sum(col("n"))).head // force evaluation of the exact pipeline
    val moments = Tables.t(spark, sf, "lineitem").agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("l_extendedprice")).as("sp"),
      sum(col("l_extendedprice") * col("l_extendedprice")).as("spp"),
      sum(col("l_quantity")).as("sq"),
      sum(col("l_quantity") * col("l_quantity")).as("sqq"),
      sum(col("l_quantity") * col("l_extendedprice")).as("sqp")).head
    val (n, sp, spp, sq, sqq, sqp) =
      (moments.getDouble(0), moments.getDouble(1), moments.getDouble(2),
        moments.getDouble(3), moments.getDouble(4), moments.getDouble(5))
    val stddevExact = math.sqrt((n * spp - sp * sp) / (n * (n - 1)))
    val varExact = (n * sqq - sq * sq) / (n * (n - 1))
    val corrExact = (n * sqp - sq * sp) /
      (math.sqrt(n * sqq - sq * sq) * math.sqrt(n * spp - sp * sp))
    assert(math.abs(builtin.getDouble(0) / stddevExact - 1) < 1e-9)
    assert(math.abs(builtin.getDouble(1) / varExact - 1) < 1e-9)
    assert(math.abs(builtin.getDouble(2) - corrExact) < 1e-9)
  }

  test("bround is HALF_EVEN where round is HALF_UP") {
    val r = spark.sql("SELECT round(2.5), bround(2.5), round(3.5), bround(3.5)").head
    assert(r.getDecimal(0).intValue === 3)
    assert(r.getDecimal(1).intValue === 2)
    assert(r.getDecimal(2).intValue === 4)
    assert(r.getDecimal(3).intValue === 4)
  }

  test("months_between fractional semantics") {
    val r = spark.sql(
      "SELECT months_between('1997-02-28 10:30:00', '1996-10-30'), months_between('1997-03-31', '1997-02-28')").head
    assert(math.abs(r.getDouble(0) - 3.94959677) < 1e-6)
    assert(r.getDouble(1) === 1.0) // both are month-ends
  }

  test("histogram_numeric: heights sum to row count, centers within data range, bins sorted") {
    // the approximate twin of fn_text_stats' deterministic equi-width
    // bins: NO cross-engine oracle exists (the bin placement is
    // algorithm-specific), so the correctness story is the invariant
    // set every histogram sketch must satisfy
    import org.apache.spark.sql.functions._
    val src = Tables.t(spark, sf, "lineitem")
    val bins = src.agg(expr("histogram_numeric(l_extendedprice, 10)"))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val (n, mn, mx) = {
      val r = src.agg(count(lit(1)), min(col("l_extendedprice")), max(col("l_extendedprice"))).head
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    assert(bins.length === 10)
    assert(math.abs(bins.map(_._2).sum - n) < 1e-6, "bin heights must sum to the row count")
    bins.foreach { case (x, y) =>
      assert(x >= mn && x <= mx, s"bin center $x outside [$mn, $mx]")
      assert(y > 0, "empty bin emitted")
    }
    assert(bins.map(_._1) === bins.map(_._1).sorted, "bin centers must be ascending")
  }

  test("hll sketch: per-grain error bound, union == direct sketch, partition-invariant") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Aggregates.queries("agg_hll_sketch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, est, exact) =>
      // lgConfigK=12 → relative standard error ~1.6%; 5% is >3 sigma
      assert(math.abs(est - exact) <= math.max(3, (0.05 * exact).toLong),
        s"$src: est=$est exact=$exact")
    }
    // THE mergeable-sketch property: union of per-source sketches
    // estimates what sketching the whole corpus does. NOT bit-equal —
    // the DataSketches union gadget carries a different internal
    // representation than direct aggregation (measured: 503 vs 501
    // on this corpus) — but both sit inside the configured error and
    // within ~1% of each other, which is the contract a rollup
    // re-aggregation actually relies on.
    val docs = Tables.t(spark, sf, "documents")
    val direct = docs.agg(expr("hll_sketch_estimate(hll_sketch_agg(text, 12))"))
      .head.getLong(0)
    val unionEst = rows.find(_._1 == "__ALL__").get._2
    assert(math.abs(unionEst - direct) <= math.max(2, (0.01 * direct).toLong),
      s"union-of-sketches ($unionEst) drifted from sketch-of-union ($direct)")
    // UNLIKE count-min sketch (whose counter merges are exact and
    // partition-invariant, asserted below), a merged HLL's estimate
    // is NOT identical to a sequentially-built one — measured here:
    // 497 vs 501 under repartition(13) — because the union path
    // carries a different internal representation. The honest
    // contract is that ANY partitioning's estimate stays inside the
    // error bound; this is exactly why the key is unit-verified
    // rather than hash-oracled.
    val exactAll = rows.find(_._1 == "__ALL__").get._3
    val reparted = docs.repartition(13)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(text, 12))")).head.getLong(0)
    for (est <- Seq(direct, reparted))
      assert(math.abs(est - exactAll) <= math.max(3, (0.05 * exactAll).toLong),
        s"estimate $est outside bound of exact $exactAll")
  }

  test("count-min sketch: one-sided error within eps*N, deterministic across partitionings") {
    import org.apache.spark.sql.functions._
    val run = () => {
      val df = graft.operators.Aggregates.queries("agg_count_min_sketch")(spark, sf)
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    }
    val rows = run()
    assert(rows.length === 20)
    val n = Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " "))).count()
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"CMS must never under-count: $tok $est < $exact")
      assert(est <= exact + (0.001 * math.E * n).toLong + 1,
        s"CMS over-count beyond the eps*N bound for $tok: est=$est exact=$exact N=$n")
    }
    // commutative merges + fixed seed ⇒ identical estimates regardless
    // of how the data was partitioned when the sketch was folded
    val reparted = Tables.t(spark, sf, "documents").repartition(13)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head.getAs[Array[Byte]](0)
    val cms2 = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(reparted))
    rows.foreach { case (tok, _, est) =>
      assert(cms2.estimateCount(tok) === est, s"partitioning changed the estimate for $tok")
    }
  }
}
