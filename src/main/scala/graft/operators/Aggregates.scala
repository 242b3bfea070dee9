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
        // Exact scale-6 decimal sum → DOUBLE, like every money column.
        // Empirically green at the sf0.01 gate (r4): per-group unscaled
        // sums stay ~15× under 2^53 there, so both engines round the
        // same exact decimal once. The r5 FLOAT render regressed (the
        // engines' decimal→f32 paths disagree), and rounding per-row to
        // DECIMAL(18,2) first can't work either: DuckDB's decimal
        // down-cast is NOT half-up (1.005→1.00, measured) and sf0.01
        // has 148 exact .xx5 ties — per the dialect doc's
        // "never down-cast decimal scale" rule.
        money(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) * (lit(1) + dec(col("l_tax"))))).as("sum_charge"),
        avgExact(sum(dec(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        avgExact(sum(dec(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Exact-input statistics (SURVEY.md:200 agg_stats): moment sums are
    * computed in DECIMAL (exact, partition-order independent — the
    * same property that makes them partial-aggregable at 100 TB),
    * cast to DOUBLE, then pushed through IDENTICAL double formulas on
    * both engines, so the floats agree bit-for-bit. The built-in
    * stddev/corr/covar functions are cross-checked against these in
    * AggregateSpec (they use order-dependent running-moment updates,
    * which can never hash-match across engines).
    */
  private def statsExact(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val l = Tables.t(s, d, "lineitem")
    val q = dec(col("l_quantity")); val p = dec(col("l_extendedprice"))
    l.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(q).cast(DoubleType).as("sq"), sum(p).cast(DoubleType).as("sp"),
        sum(q * q).cast(DoubleType).as("sqq"), sum(p * p).cast(DoubleType).as("spp"),
        sum(q * p).cast(DoubleType).as("sqp"))
      .select(col("l_returnflag"), col("n"),
        (col("sq") / col("n")).as("mean_qty"),
        (col("sp") / col("n")).as("mean_price"),
        ((col("n") * col("sqq") - col("sq") * col("sq")) / (col("n") * (col("n") - lit(1)))).as("var_samp_qty"),
        // spp exceeds 2^53: DuckDB's int128→double decimal cast
        // double-rounds where Spark's BigDecimal path rounds once, so
        // spp-derived floats differ in the last ulp — render as FLOAT
        // (f32), where the ulp noise is far below representable precision
        sqrt((col("n") * col("spp") - col("sp") * col("sp")) / (col("n") * (col("n") - lit(1))))
          .cast(FloatType).as("stddev_samp_price"),
        ((col("n") * col("spp") - col("sp") * col("sp")) / (col("n") * col("n")))
          .cast(FloatType).as("var_pop_price"),
        ((col("n") * col("sqp") - col("sq") * col("sp")) / (col("n") * col("n"))).as("covar_pop"),
        ((col("n") * col("sqp") - col("sq") * col("sp")) /
          (sqrt(col("n") * col("sqq") - col("sq") * col("sq")) *
            sqrt(col("n") * col("spp") - col("sp") * col("sp"))))
          .cast(FloatType).as("corr_qp"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, Q.QueryFn] = Map(
    "agg_groupby" -> ((s, d) => aggGroupby(s, d)),

    "agg_global" -> ((s, d) =>
      Tables.t(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        money(sum(dec(col("l_extendedprice")))).as("sum_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        avgExact(sum(dec(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))),

    "agg_count_distinct" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    "agg_multi_distinct" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          money(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("l_linestatus"))),

    "agg_having" -> ((s, d) =>
      Tables.t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          money(sum(dec(col("o_totalprice")))).as("total"))
        .filter(col("n_orders") >= 13)
        .orderBy(col("o_custkey"))),

    "agg_rollup" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          money(sum(dec(col("l_quantity")))).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("sum_qty"), col("n"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    "agg_cube" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          money(sum(dec(col("l_extendedprice")))).as("sum_price"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("sum_price"), col("n"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    "agg_grouping_sets" -> { (s, d) =>
      Tables.views(s, d)
      s.sql("""SELECT l_returnflag, l_linestatus, grouping_id() AS gid,
              |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              |  count(*) AS n
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
              |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
    },

    "agg_collect" -> ((s, d) =>
      Tables.t(s, d, "orders").filter(col("o_custkey") < 10)
        .groupBy(col("o_custkey"))
        .agg(
          expr("array_join(transform(sort_array(collect_list(o_orderkey)), x -> cast(x as string)), ',')").as("keys_csv"),
          expr("array_join(sort_array(collect_set(o_orderstatus)), ',')").as("statuses_csv"))
        .orderBy(col("o_custkey"))),

    "agg_stats" -> ((s, d) => statsExact(s, d)),

    "agg_percentile" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.25)").as("q1"),
          expr("percentile(l_quantity, 0.5)").as("median"),
          expr("percentile(l_quantity, 0.75)").as("q3"))
        .orderBy(col("l_returnflag"))),

    // approx ops: engine-specific sketches — declared rows-only (no
    // oracle); error bounds vs exact asserted in AggregateSpec
    "agg_approx_percentile" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median"))
        .orderBy(col("l_returnflag"))),

    "agg_approx_distinct" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_nd"))
        .orderBy(col("l_returnflag"))),

    // Count-Min Sketch heavy-hitter estimation — the mergeable
    // fixed-memory frequency sketch a 100 TB token-count pass ships
    // instead of an exact (token, count) table. Spark-first: the
    // built-in `count_min_sketch` aggregate (partial-aggregable, the
    // per-partition sketches merge commutatively, so the estimate is
    // DETERMINISTIC under any partitioning with the fixed seed) folds
    // the exploded token stream into ONE bounded binary; the 20 exact
    // heavy hitters then probe it driver-side (20-row collect + one
    // ~KB sketch — bounded at any corpus size). Estimates obey
    // est >= exact and est <= exact + eps·N w.h.p. (asserted in
    // AggregateSpec); no DuckDB CMS exists → rows-only key, unit
    // bounds are the correctness story.
    "agg_count_min_sketch" -> { (s, d) =>
      val toks = Tables.t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
      val skBytes = toks
        .agg(expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
        .head.getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(skBytes))
      val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("tok")).limit(20).collect()
      import s.implicits._
      top.toSeq.map { r =>
        (r.getString(0), r.getLong(1), cms.estimateCount(r.getString(0)))
      }.toDF("tok", "exact", "est").orderBy(col("tok"))
    },

    // The MERGEABLE-sketch rollup surface (Apache DataSketches HLL,
    // Spark's hll_sketch_agg/hll_union_agg): a 100 TB distinct-count
    // rollup ships one fixed-size sketch per grain and RE-AGGREGATES
    // by merging sketches — never by re-reading raw data. Per-source
    // sketches estimate per-source distincts; their union estimates
    // the global distinct WITHOUT a second pass. No RNG, but a merged
    // sketch's estimate is NOT bit-identical to a sequentially-built
    // one (the union path carries a different internal representation
    // — measured ±0.8% across partitionings, unlike CMS whose counter
    // merges are exact) → unit key: AggregateSpec asserts every
    // partitioning's estimate stays inside the error bound and
    // union-of-sketches tracks sketch-of-union within ~1%.
    "agg_hll_sketch" -> { (s, d) =>
      val docs = Tables.t(s, d, "documents")
      val per = docs.groupBy(col("source"))
        .agg(expr("hll_sketch_agg(text, 12)").as("sk"),
          countDistinct(col("text")).as("exact_nd"))
      val perOut = per.select(col("source"),
        expr("hll_sketch_estimate(sk)").as("est_nd"), col("exact_nd"))
      val allOut = per.agg(expr("hll_union_agg(sk, true)").as("sk"))
        .select(lit("__ALL__").as("source"),
          expr("hll_sketch_estimate(sk)").as("est_nd"))
        .crossJoin(docs.agg(countDistinct(col("text")).as("exact_nd")))
      perOut.unionByName(allOut).orderBy(col("source"))
    },

    // max_by/min_by keyed by (price, orderkey) struct: equal prices
    // tie-break on the orderkey itself, so the ordering is total and
    // both engines must pick the same row (ADVICE r4)
    "agg_minmax_by" -> ((s, d) =>
      Tables.t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("best_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("worst_order"),
          money(max(dec(col("o_totalprice")))).as("best_price"))
        .orderBy(col("o_custkey"))),

    "agg_bool" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("bool_and(l_quantity < 50)").as("all_small"),
          expr("bool_or(l_discount > 0.09)").as("any_deep_discount"),
          expr("bool_and(l_extendedprice > 0)").as("all_positive"))
        .orderBy(col("l_returnflag"))),

    "agg_pivot" -> ((s, d) =>
      Tables.t(s, d, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy(col("user_id"))),

    "agg_unpivot" -> { (s, d) =>
      val wide = Tables.t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(money(sum(dec(col("l_quantity")))).as("qty"),
          money(sum(dec(col("l_extendedprice")))).as("price"))
      wide.unpivot(Array(col("l_returnflag")), Array(col("qty"), col("price")), "metric", "val")
        .orderBy(col("l_returnflag"), col("metric"))
    },

    // Materialized view with automatic rewrite (VERDICT r16 #2; Hive 3
    // `CREATE MATERIALIZED VIEW ... ENABLE REWRITE`): the query below
    // is written against the FACT table, but with the opt-in rule
    // enabled it executes as a roll-up over the registered
    // (l_returnflag, l_linestatus) summary — PlanRuleSpec asserts the
    // optimized plan scans the MV path and not the fact path. The
    // oracle is the plain aggregate over lineitem: the rewrite must be
    // value-identical (decimal partial sums re-aggregate exactly).
    "agg_mv_rewrite" -> { (s, d) =>
      val (factPath, _) = mvDemo(s, d)
      s.read.parquet(factPath)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_price")).as("sum_price_dec"),
          count(lit(1)).as("n"),
          count(col("l_quantity")).as("n_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          // avg through the rewrite (r17 verdict #3): served as
          // Σ s_qty / Σ c_qty over the summary. l_quantity is
          // integer-valued doubles, so sum is exact in float64 and
          // the division is the identical IEEE op on both engines —
          // hash-safe without rounding games. The decimal-measure
          // avg (engine-specific oracle rounding) is bit-identity-
          // asserted against the rule-off plan in PlanRuleSpec.
          avg(col("l_quantity")).as("avg_qty"))
        .select(col("l_returnflag"), money(col("sum_price_dec")).as("sum_price"),
          col("n"), col("n_qty"), col("min_qty"), col("max_qty"), col("avg_qty"))
        .orderBy(col("l_returnflag"))
    },

    // Incremental materialized-view rebuild (Hive 3 `ALTER
    // MATERIALIZED VIEW ... REBUILD` with incremental maintenance):
    // the summary is built while the fact holds only the ≤1996
    // partitions, the later years then arrive as INSERT-only new
    // partitions, and `rebuildIncremental` absorbs them by
    // aggregating ONLY the delta dirs and merging partials into the
    // standing summary — never re-scanning the fact. The query below
    // is the fact-table aggregate served from that incrementally
    // maintained summary (rule on), so the oracle — the plain
    // aggregate over ALL of orders — proves the merged partials are
    // exact end-to-end. PlanRuleSpec asserts the delta-only
    // absorption, bit-identity with a full rebuild, and the
    // summary-only scan.
    "agg_mv_incremental" -> { (s, d) =>
      val factPath = mvIncDemo(s, d)
      s.read.parquet(factPath)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("o_price")).as("total_dec"),
          count(lit(1)).as("n"),
          min(col("o_price")).as("min_dec"),
          max(col("o_price")).as("max_dec"))
        .select(col("o_orderstatus"), money(col("total_dec")).as("total"),
          col("n"), money(col("min_dec")).as("min_price"),
          money(col("max_dec")).as("max_price"))
        .orderBy(col("o_orderstatus"))
    }
  )

  /** Stage the INCREMENTAL MV demo once per (session, input dir):
    * a year-partitioned orders fact seeded with only the ≤1996
    * partitions, its (o_orderstatus) summary materialized with
    * partition tracking, the later years appended as new partitions,
    * and the summary refreshed incrementally. Leaves the rewrite
    * rule installed + enabled (same sticky-enable safety argument as
    * [[mvDemo]]: the rule only fires on registered fact paths).
    * Returns the fact path. */
  private val mvIncOnce =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def mvIncDemo(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    mvIncOnce.getOrElseUpdate(s"${Q.sessionToken(s)}|$d", {
      val base = Scans.ioDir("agg_mv_incremental", d)
      val factPath = s"$base/fact"
      val mvPath = s"$base/mv"
      val o = Tables.t(s, d, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .select(col("o_orderstatus"), dec(col("o_totalprice")).as("o_price"),
          col("o_year"))
      // static overwrite wipes any previous run's layout entirely
      o.filter(col("o_year") <= 1996).repartition(col("o_year"))
        .write.mode("overwrite").partitionBy("o_year").parquet(factPath)
      val mv = graft.plans.MvRewrite.materializePartitioned(s,
        "mv_orders_by_status", factPath, "o_year",
        dims = Seq("o_orderstatus"), measures = Seq("o_price"), mvPath)
      o.filter(col("o_year") >= 1997).repartition(col("o_year"))
        .write.mode("append").partitionBy("o_year").parquet(factPath)
      val delta = graft.plans.MvRewrite.rebuildIncremental(s, mv)
      require(delta.nonEmpty, "fixture must append at least one new partition")
      graft.plans.MvRewrite.install(s)
      s.conf.set(graft.plans.MvRewrite.EnabledKey, "true")
      factPath
    })

  /** Stage the MV demo once per (session, input dir): a fact parquet
    * (decimal money baked in, so the roll-up identity is exact), its
    * (l_returnflag, l_linestatus) summary materialized + registered,
    * the rule installed, and the opt-in conf flipped ON for the
    * session — the sticky enable is safe because the rule only ever
    * touches aggregates over a REGISTERED fact path, which nothing
    * else in the suite scans. Returns (factPath, mvPath). */
  private val mvOnce =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private[graft] def mvDemo(s: org.apache.spark.sql.SparkSession,
      d: String): (String, String) =
    mvOnce.getOrElseUpdate(s"${Q.sessionToken(s)}|$d", {
      val base = Scans.ioDir("agg_mv_rewrite", d)
      val factPath = s"$base/fact"
      val mvPath = s"$base/mv"
      Tables.t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          dec(col("l_extendedprice")).as("l_price"), col("l_quantity"))
        .write.mode("overwrite").parquet(factPath)
      graft.plans.MvRewrite.materialize(s, "mv_lineitem_pricing",
        s.read.parquet(factPath), factPath,
        dims = Seq("l_returnflag", "l_linestatus"),
        measures = Seq("l_price", "l_quantity"), mvPath)
      graft.plans.MvRewrite.install(s)
      s.conf.set(graft.plans.MvRewrite.EnabledKey, "true")
      (factPath, mvPath)
    })

  /** Rebuild the staged fact + summary from scratch (overwrite both)
    * — for tests that mutate the staged fact (the freshness-contract
    * spec appends rows) and must hand later keys a clean demo. */
  private[graft] def resetMvDemo(s: org.apache.spark.sql.SparkSession,
      d: String): (String, String) = {
    mvOnce.remove(s"${Q.sessionToken(s)}|$d")
    mvDemo(s, d)
  }

  /** Shared decimal-cast shorthands for oracle SQL. */
  private val Q2 = "CAST(l_quantity AS DECIMAL(18,2))"
  private val P2 = "CAST(l_extendedprice AS DECIMAL(18,2))"

  val oracle: Map[String, String] = Map(
    "agg_global" ->
      s"""SELECT count(*) AS n,
         |  CAST(sum($P2) AS DOUBLE) AS sum_price,
         |  min(l_extendedprice) AS min_price,
         |  max(l_extendedprice) AS max_price,
         |  CAST(sum($Q2) AS DOUBLE) / count(*) AS avg_qty,
         |  min(l_shipdate) AS first_ship,
         |  max(l_shipdate) AS last_ship
         |FROM lineitem""".stripMargin,
    "agg_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_multi_distinct" ->
      s"""SELECT l_linestatus, count(DISTINCT l_partkey) AS nd_part,
         |  count(DISTINCT l_suppkey) AS nd_supp,
         |  CAST(sum($Q2) AS DOUBLE) AS sum_qty
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 13
        |ORDER BY o_custkey""".stripMargin,
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag, l_linestatus) AS gid,
         |  CAST(sum($Q2) AS DOUBLE) AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag, l_linestatus) AS gid,
         |  CAST(sum($P2) AS DOUBLE) AS sum_price, count(*) AS n
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag, l_linestatus) AS gid,
         |  CAST(sum($Q2) AS DOUBLE) AS sum_qty, count(*) AS n
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_collect" ->
      """SELECT o_custkey,
        |  array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS keys_csv,
        |  array_to_string(list(DISTINCT o_orderstatus ORDER BY o_orderstatus), ',') AS statuses_csv
        |FROM orders WHERE o_custkey < 10
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "agg_stats" ->
      s"""WITH m AS (SELECT l_returnflag, count(*) AS n,
         |  CAST(sum($Q2) AS DOUBLE) AS sq,
         |  CAST(sum($P2) AS DOUBLE) AS sp,
         |  CAST(sum($Q2 * $Q2) AS DOUBLE) AS sqq,
         |  CAST(sum($P2 * $P2) AS DOUBLE) AS spp,
         |  CAST(sum($Q2 * $P2) AS DOUBLE) AS sqp
         |FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  sq / n AS mean_qty,
         |  sp / n AS mean_price,
         |  (n * sqq - sq * sq) / (n * (n - 1)) AS var_samp_qty,
         |  CAST(sqrt((n * spp - sp * sp) / (n * (n - 1))) AS REAL) AS stddev_samp_price,
         |  CAST((n * spp - sp * sp) / (n * n) AS REAL) AS var_pop_price,
         |  (n * sqp - sq * sp) / (n * n) AS covar_pop,
         |  CAST((n * sqp - sq * sp) / (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)) AS REAL) AS corr_qp
         |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q1,
        |  quantile_cont(l_quantity, 0.5) AS median,
        |  quantile_cont(l_quantity, 0.75) AS q3
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // DuckDB's arg_max has no composite-key overload — struct max +
    // field extract expresses the same (price, orderkey) total order
    "agg_minmax_by" ->
      """SELECT o_custkey,
        |  max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS best_order,
        |  min(struct_pack(p := o_totalprice, k := o_orderkey)).k AS worst_order,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS best_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "agg_bool" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity < 50) AS all_small,
        |  bool_or(l_discount > 0.09) AS any_deep_discount,
        |  bool_and(l_extendedprice > 0) AS all_positive
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_unpivot" ->
      s"""WITH w AS (SELECT l_returnflag,
         |  CAST(sum($Q2) AS DOUBLE) AS qty,
         |  CAST(sum($P2) AS DOUBLE) AS price
         |FROM lineitem GROUP BY l_returnflag)
         |SELECT * FROM (UNPIVOT w ON qty, price INTO NAME metric VALUE val)
         |ORDER BY l_returnflag, metric""".stripMargin,
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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // the plain aggregate over ALL of orders: the incrementally
    // merged partials must reproduce it exactly
    "agg_mv_incremental" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the UNREWRITTEN aggregate: the MV roll-up must be value-identical
    "agg_mv_rewrite" ->
      s"""SELECT l_returnflag,
         |  CAST(sum($P2) AS DOUBLE) AS sum_price,
         |  count(*) AS n, count(l_quantity) AS n_qty,
         |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         |  avg(l_quantity) AS avg_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
