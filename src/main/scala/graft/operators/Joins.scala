package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.3 joins (SURVEY.md:174-187).
  * Hive origin: ql.exec.JoinOperator / MapJoinOperator (MAPJOIN hint,
  * hive.auto.convert.join) / LEFT SEMI JOIN / CalcitePlanner anti-join
  * and subquery decorrelation. Spark-first: declarative `.join` +
  * `broadcast()` hints; Catalyst's JoinSelection + AQE pick
  * broadcast-hash vs sort-merge from actual sizes; subqueries go
  * through spark.sql and RewritePredicateSubquery → semi/anti joins.
  *
  * 100 TB notes: dimension sides (region/nation/part/supplier/
  * customer-slices) are broadcast; the fact side never shuffles twice
  * for the same key chain; the as-of join is banded (1-day window
  * prefilter) so the per-key cross product is bounded instead of
  * quadratic in events-per-user.
  */
object Joins {

  private def rev(c1: String, c2: String) =
    dec(col(c1)) * (lit(1) - dec(col(c2)))

  /** The two nullif-keyed sides of join_null_safe — shared with the
    * spec's plain-vs-null-safe identity assert so tuning the subsets
    * or the null-injection rule in one place cannot desynchronize
    * the test's baseline (r16 review). */
  private[graft] def nullSafeSides(s: SparkSession, d: String): (DataFrame, DataFrame) = (
    Tables.t(s, d, "orders").filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"), nullif(col("o_custkey") % 100, lit(7)).as("k")),
    Tables.t(s, d, "customer").filter(col("c_custkey") < 200)
      .select(col("c_custkey"), nullif(col("c_custkey") % 100, lit(7)).as("k")))

  val queries: Map[String, Q.QueryFn] = Map(
    // shuffle equi-join: fact ⋈ fact-sized orders — sort-merge/shuffle-hash
    "join_inner" -> ((s, d) =>
      Tables.t(s, d, "orders").join(Tables.t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"), "inner")
        .select(col("o_orderkey"), col("l_linenumber"), col("o_orderstatus"),
          money(rev("l_extendedprice", "l_discount")).as("revenue"))
        .orderBy(col("o_orderkey"), col("l_linenumber"), col("o_orderstatus"),
          col("revenue"))),

    // map-side join: part is a dimension → broadcast (plan asserted in JoinSpec)
    "join_broadcast" -> ((s, d) =>
      Tables.t(s, d, "lineitem").join(broadcast(Tables.t(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("p_brand"),
          money(dec(col("l_extendedprice"))).as("price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("p_brand"),
          col("price"))),

    // null-extending joins: filtered orders so unmatched customers exist
    "join_left_outer" -> { (s, d) =>
      val big = Tables.t(s, d, "orders").filter(col("o_totalprice") > 250000)
        .select(col("o_custkey"), col("o_orderkey"),
          money(dec(col("o_totalprice"))).as("big_price"))
      Tables.t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("o_orderkey"), col("big_price"))
        .orderBy(col("c_custkey"), col("o_orderkey"), col("big_price"))
    },

    "join_right_outer" -> { (s, d) =>
      val urgent = Tables.t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000)
        .select(col("o_custkey"), col("o_orderkey"),
          money(dec(col("o_totalprice"))).as("urgent_price"))
      urgent.join(Tables.t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"), col("o_orderkey"), col("urgent_price"))
        .orderBy(col("c_custkey"), col("o_orderkey"), col("urgent_price"))
    },

    // disjoint key-filters guarantee null-extension on BOTH sides at any sf
    "join_full_outer" -> { (s, d) =>
      val cn = Tables.t(s, d, "customer").filter(col("c_nationkey") < 15)
        .groupBy(col("c_nationkey").as("nkey_c")).agg(count(lit(1)).as("c_cnt"))
      val sn = Tables.t(s, d, "supplier").filter(col("s_nationkey") >= 10)
        .groupBy(col("s_nationkey").as("nkey_s")).agg(count(lit(1)).as("s_cnt"))
      cn.join(sn, col("nkey_c") === col("nkey_s"), "full")
        .select(col("nkey_c"), col("nkey_s"), col("c_cnt"), col("s_cnt"))
        .orderBy(col("nkey_c"), col("nkey_s"))
    },

    "join_left_semi" -> { (s, d) =>
      val urgent = Tables.t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      Tables.t(s, d, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    "join_left_anti" -> { (s, d) =>
      val urgent = Tables.t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      Tables.t(s, d, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    "join_cross" -> ((s, d) =>
      Tables.t(s, d, "nation").crossJoin(Tables.t(s, d, "region"))
        .select(col("n_nationkey"), col("n_name"), col("r_regionkey"), col("r_name"))
        .orderBy(col("n_nationkey"), col("r_regionkey"))),

    // pure non-equi predicate → BroadcastNestedLoopJoin (small × small)
    "join_theta" -> ((s, d) =>
      Tables.t(s, d, "supplier").join(Tables.t(s, d, "customer"),
          col("s_acctbal") > col("c_acctbal") && col("s_nationkey") =!= col("c_nationkey"))
        .select(col("s_suppkey"), col("c_custkey"),
          money(dec(col("s_acctbal"))).as("s_bal"),
          money(dec(col("c_acctbal"))).as("c_bal"))
        .orderBy(col("s_suppkey"), col("c_custkey"))),

    // equi prefix + interval containment residual: ships within 7 days of order
    "join_range" -> ((s, d) =>
      Tables.t(s, d, "orders").join(Tables.t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey")
            && col("l_shipdate") >= col("o_orderdate")
            && col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 7 DAYS"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_orderdate"), col("l_shipdate"))
        .orderBy(col("o_orderkey"), col("l_linenumber"), col("o_orderdate"), col("l_shipdate"))),

    // as-of: latest click at-or-before each purchase (same user), banded to
    // 1 day so the per-user cross product stays linear-ish at scale
    "join_asof" -> { (s, d) =>
      val ev = Tables.t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      val w = Window.partitionBy(col("p_id"))
        .orderBy(col("c_ts").desc, col("c_id").desc)
      p.join(c, col("user_id") === col("c_user")
            && col("c_ts") <= col("p_ts")
            && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 DAY"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("p_id"), col("user_id"), col("p_ts"), col("c_id"), col("c_ts"))
        .orderBy(col("p_id"))
    },

    // UNBOUNDED as-of (VERDICT r14 "What's missing" #2: the banded
    // join_asof silently loses matches older than its 1-day window).
    // Not a join at all: purchases and clicks interleave into ONE
    // per-user stream and a running `last(click_ts)` window answers
    // "latest click at-or-before" — one shuffle on user_id, one sort,
    // LINEAR in events (the unbounded join form would be quadratic in
    // events-per-user). Clicks sort before purchases at equal ts so
    // the at-or-before bound stays inclusive. Output is the matched
    // VALUE (c_ts), not the click id: DuckDB's native ASOF JOIN (the
    // oracle) is value-deterministic but id-nondeterministic under
    // same-(user,ts) click ties.
    "join_asof_unbounded" -> { (s, d) =>
      val tagged = Tables.t(s, d, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_type") === "purchase").cast("int").as("kind"),
          when(col("event_type") === "click", col("ts")).as("click_ts"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged.withColumn("c_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1 && col("c_ts").isNotNull)
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"), col("c_ts"))
        .orderBy(col("p_id"))
    },

    // TPC-H-Q5-shaped 6-table star: dims broadcast, one agg at the top
    "join_multiway_star" -> { (s, d) =>
      Tables.t(s, d, "region").filter(col("r_name") === "ASIA")
        .join(Tables.t(s, d, "nation"), col("n_regionkey") === col("r_regionkey"))
        .join(Tables.t(s, d, "customer"), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.t(s, d, "orders"), col("o_custkey") === col("c_custkey"))
        .join(Tables.t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(money(sum(rev("l_extendedprice", "l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    },

    // Explicit salted skew join — the manual form of the skew
    // mitigation a 100 TB shuffle join needs when one key carries a
    // disproportionate row share (AQE's skewedJoin handles the
    // runtime case; the salt is the plan-level guarantee). The build
    // side replicates each row across SALT buckets, the probe side
    // tags each row with a DETERMINISTIC data-derived salt (never
    // rand() — retries/speculative tasks must agree), and the join
    // key becomes (key, salt): a hot orderkey's rows now spread over
    // SALT reducers instead of one. Results are provably identical
    // to the unsalted join (the oracle IS the plain join), and
    // JoinSpec asserts the salted shuffle keys and row identity.
    "join_skew_salted" -> { (s, d) =>
      val SALT = 8
      val probe = Tables.t(s, d, "lineitem")
        .withColumn("salt", (col("l_linenumber") % SALT).cast("int"))
      val build = Tables.t(s, d, "orders")
        .withColumn("salt", explode(array((0 until SALT).map(lit): _*)))
      probe.hint("shuffle_hash")
        .join(build, col("l_orderkey") === col("o_orderkey")
          && probe("salt") === build("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          money(sum(rev("l_extendedprice", "l_discount"))).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },

    // Null-safe equi-join (Hive `<=>` / GenericUDFOPEqualNS as a JOIN
    // condition, not just a filter): under three-valued logic a plain
    // `=` join DROPS every null-keyed row on both sides; `<=>` makes
    // null a joinable value, so the null-keyed rows of the two sides
    // cross-match. Keys are nullif-derived so both sides carry real
    // nulls and the null×null block is non-empty — a plain-join
    // implementation would lose exactly those rows and fail the
    // row-count match. Spark plans `<=>` as a normal hash/merge join
    // key (knownfloatingpointnormalized wrapper), NOT a nested loop —
    // same shuffle shape as `=` at 100 TB.
    "join_null_safe" -> { (s, d) =>
      val (a, b) = nullSafeSides(s, d)
      a.join(b, a("k") <=> b("k"))
        .select(col("o_orderkey"), col("c_custkey"),
          a("k").as("k_a"), b("k").as("k_b"))
        .orderBy(col("o_orderkey"), col("c_custkey"))
    },

    // subqueries through the SQL frontend (RewritePredicateSubquery)
    "sub_in" -> { (s, d) =>
      Tables.views(s, d)
      s.sql("""SELECT c_custkey, c_name FROM customer
              |WHERE c_custkey IN (SELECT o_custkey FROM orders
              |                    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000)
              |ORDER BY c_custkey""".stripMargin)
    },

    "sub_exists" -> { (s, d) =>
      Tables.views(s, d)
      s.sql("""SELECT s_suppkey, s_name FROM supplier s
              |WHERE EXISTS (SELECT 1 FROM lineitem l
              |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
              |ORDER BY s_suppkey""".stripMargin)
    },

    // scalar subqueries kept exact: max (order-independent) in SELECT,
    // sum×count decimal inequality instead of a lossy avg in WHERE
    "sub_scalar" -> { (s, d) =>
      Tables.views(s, d)
      s.sql("""SELECT c_custkey,
              |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
              |  CAST((SELECT max(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer) AS DOUBLE) AS max_bal
              |FROM customer
              |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT count(*) FROM customer)
              |      > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer)
              |ORDER BY c_custkey""".stripMargin)
    },

    // Hive `WITH` CTE surface (`ql.parse.SemanticAnalyzer` CTE
    // handling — the §1.1 views/CTEs row's keyed form): one CTE
    // defined ONCE and referenced TWICE — directly as the
    // per-customer spend relation and again through a second CTE
    // that reduces it to a global max — through the SQL frontend
    // (CTESubstitution/WithCTE). The identical text runs in DuckDB,
    // so resolution, scoping, and the double-reference semantics are
    // all under the hash. Money stays DECIMAL(18,2) to the output
    // boundary; the share divides two exact decimals as DOUBLE (one
    // IEEE division on both engines — the avgExact discipline). At
    // 100 TB the double reference is the part that matters: the
    // repeated subtree plans per reference and ReuseExchange
    // collapses the duplicate shuffle (same machinery the
    // AdaptiveReadSpec exchange-reuse assert pins down).
    "sql_cte" -> { (s, d) =>
      Tables.views(s, d)
      s.sql(cteSql)
    },

    // WITH RECURSIVE (r18; Spark 4.x UnionLoop execution): calendar
    // densification — a recursive spine from min to max o_orderdate,
    // LEFT-joined back so empty months surface as zero rows (the
    // gaps-and-spine pattern every revenue-over-time dashboard needs;
    // a plain GROUP BY silently drops empty months). HiveQL has no
    // recursive CTE, so this is a deliberate Spark-surface EXTENSION
    // of the §1.1 views/CTEs row, not a contract transliteration.
    // RECURSION GRANULARITY IS THE COST MODEL: UnionLoop runs one
    // Spark job per iteration (~0.1-0.15 s fixed overhead each), so
    // the first cut — one iteration per MONTH, 80 iterations —
    // MEASURED 11.7 s in-suite with the join itself worth ~0.5 s.
    // Recursing per YEAR (7-8 iterations) and densifying months with
    // a LATERAL VIEW explode inside the CTE chain keeps the query
    // genuinely recursive and cuts the reading to ~1.5 s. Same rows.
    // Scale shape: the spine is bounded by the date span (never
    // data-sized) and broadcasts; the one data-sized pass is the
    // orders-by-month join.
    "sql_cte_recursive" -> { (s, d) =>
      Tables.views(s, d)
      s.sql("""WITH RECURSIVE years(y) AS (
              |  SELECT trunc((SELECT min(o_orderdate) FROM orders), 'YYYY')
              |  UNION ALL
              |  SELECT add_months(y, 12) FROM years
              |  WHERE y < trunc((SELECT max(o_orderdate) FROM orders), 'YYYY')
              |),
              |months AS (
              |  SELECT add_months(y, k) AS m
              |  FROM years LATERAL VIEW explode(sequence(0, 11)) t AS k
              |  WHERE add_months(y, k) >= trunc((SELECT min(o_orderdate) FROM orders), 'MM')
              |    AND add_months(y, k) <= trunc((SELECT max(o_orderdate) FROM orders), 'MM')
              |)
              |SELECT CAST(m.m AS TIMESTAMP_NTZ) AS month_start,
              |  count(o.o_orderkey) AS n_orders,
              |  CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total
              |FROM months m LEFT JOIN orders o ON trunc(o.o_orderdate, 'MM') = m.m
              |GROUP BY m.m ORDER BY month_start""".stripMargin)
    }
  )

  /** One SQL text for both engines — the oracle IS the query. */
  private val cteSql =
    """WITH cust_spend AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
      |         count(*) AS n_orders
      |  FROM orders GROUP BY o_custkey),
      |top AS (SELECT max(spend) AS max_spend FROM cust_spend)
      |SELECT c.c_mktsegment AS segment,
      |  CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(sum(cs.n_orders) AS BIGINT) AS n_orders,
      |  CAST(sum(cs.spend) AS DOUBLE) AS segment_spend,
      |  CAST(max(cs.spend) AS DOUBLE) / CAST(max(t.max_spend) AS DOUBLE) AS top_share
      |FROM cust_spend cs
      |JOIN customer c ON c.c_custkey = cs.o_custkey
      |CROSS JOIN top t
      |GROUP BY c.c_mktsegment
      |ORDER BY segment""".stripMargin

  val oracle: Map[String, String] = Map(
    "sql_cte" -> cteSql,
    // DuckDB dialect twin of the recursive spine (date_trunc +
    // interval arithmetic in place of trunc/add_months, unnest of
    // generate_series for the month densification; the CAST back to
    // DATE keeps the recursive union's column type stable)
    "sql_cte_recursive" ->
      """WITH RECURSIVE years(y) AS (
        |  SELECT date_trunc('year', (SELECT min(o_orderdate) FROM orders))
        |  UNION ALL
        |  SELECT CAST(y + INTERVAL 12 MONTH AS DATE) FROM years
        |  WHERE y < date_trunc('year', (SELECT max(o_orderdate) FROM orders))
        |),
        |months AS (
        |  SELECT CAST(y + k * INTERVAL 1 MONTH AS DATE) AS m
        |  FROM years, (SELECT unnest(generate_series(0, 11)) AS k)
        |  WHERE CAST(y + k * INTERVAL 1 MONTH AS DATE)
        |        BETWEEN date_trunc('month', (SELECT min(o_orderdate) FROM orders))
        |        AND date_trunc('month', (SELECT max(o_orderdate) FROM orders))
        |)
        |SELECT CAST(m.m AS TIMESTAMP) AS month_start,
        |  count(o.o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total
        |FROM months m LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m.m
        |GROUP BY m.m ORDER BY month_start""".stripMargin,
    "join_null_safe" ->
      """WITH a AS (SELECT o_orderkey, nullif(o_custkey % 100, 7) AS k
        |           FROM orders WHERE o_orderkey < 500),
        |b AS (SELECT c_custkey, nullif(c_custkey % 100, 7) AS k
        |      FROM customer WHERE c_custkey < 200)
        |SELECT o_orderkey, c_custkey, a.k AS k_a, b.k AS k_b
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY o_orderkey, c_custkey""".stripMargin,
    "join_inner" ->
      """SELECT o_orderkey, l_linenumber, o_orderstatus,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey, l_linenumber, o_orderstatus, revenue""".stripMargin,
    "join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_brand,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, p_brand, price""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS big_price
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST, big_price NULLS FIRST""".stripMargin,
    "join_right_outer" ->
      """SELECT c_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS urgent_price
        |FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000) o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST, urgent_price NULLS FIRST""".stripMargin,
    "join_full_outer" ->
      """SELECT nkey_c, nkey_s, c_cnt, s_cnt FROM
        |  (SELECT c_nationkey AS nkey_c, count(*) AS c_cnt FROM customer
        |   WHERE c_nationkey < 15 GROUP BY c_nationkey) cn
        |FULL OUTER JOIN
        |  (SELECT s_nationkey AS nkey_s, count(*) AS s_cnt FROM supplier
        |   WHERE s_nationkey >= 10 GROUP BY s_nationkey) sn
        |ON nkey_c = nkey_s
        |ORDER BY nkey_c NULLS FIRST, nkey_s NULLS FIRST""".stripMargin,
    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |SEMI JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |ANTI JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "join_cross" ->
      """SELECT n_nationkey, n_name, r_regionkey, r_name
        |FROM nation CROSS JOIN region
        |ORDER BY n_nationkey, r_regionkey""".stripMargin,
    "join_theta" ->
      """SELECT s_suppkey, c_custkey,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_bal,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_bal
        |FROM supplier JOIN customer
        |  ON s_acctbal > c_acctbal AND s_nationkey <> c_nationkey
        |ORDER BY s_suppkey, c_custkey""".stripMargin,
    "join_range" ->
      """SELECT o_orderkey, l_linenumber, o_orderdate, l_shipdate
        |FROM orders JOIN lineitem
        |  ON o_orderkey = l_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
        |ORDER BY o_orderkey, l_linenumber, o_orderdate, l_shipdate""".stripMargin,
    "join_asof" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts FROM events WHERE event_type = 'click'),
        |j AS (SELECT p_id, user_id, p_ts, c_id, c_ts,
        |        row_number() OVER (PARTITION BY p_id ORDER BY c_ts DESC, c_id DESC) AS rn
        |      FROM p JOIN c ON user_id = c_user
        |        AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 DAY)
        |SELECT p_id, user_id, p_ts, c_id, c_ts FROM j WHERE rn = 1
        |ORDER BY p_id""".stripMargin,
    // native ASOF JOIN — the cross-check SURVEY §2.3 declared
    "join_asof_unbounded" ->
      """SELECT p.event_id AS p_id, p.user_id AS user_id, p.ts AS p_ts, c.ts AS c_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p_id""".stripMargin,
    // salting is semantics-preserving: the oracle is the PLAIN join
    "join_skew_salted" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_multiway_star" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "sub_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,
    "sub_exists" ->
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
        |ORDER BY s_suppkey""".stripMargin,
    "sub_scalar" ->
      """SELECT c_custkey,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
        |  CAST((SELECT max(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer) AS DOUBLE) AS max_bal
        |FROM customer
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT count(*) FROM customer)
        |      > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer)
        |ORDER BY c_custkey""".stripMargin
  )
}
