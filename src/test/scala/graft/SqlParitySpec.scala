package graft

import org.apache.spark.sql.DataFrame

/** SQL-text parity twins for the relational core (VERDICT r17 #5).
  *
  * BASELINE.json frames this engine as "Spark SQL replaces HiveQL
  * execution", and SURVEY §3.2's claim is that the DSL forms and the
  * HiveQL text forms meet at the same LogicalPlan IR. Until now only
  * `sql_cte` and the `sub_*` keys exercised the SQL frontend end to
  * end; this suite pins the claim for the rest of the relational
  * core: each test runs a representative §2 key's DSL form (the
  * oracle-certified `SparkEntry.queries` entry, verbatim) and a
  * HiveQL-shaped text twin through `spark.sql`, and asserts column
  * and row identity — including result order, since every compared
  * key's output order is deterministic (that's what the driver's
  * in-order hash already requires of the DSL form).
  *
  * The twins deliberately use the Hive-dialect spellings where they
  * exist — LEFT SEMI JOIN, LATERAL VIEW explode ... AS, GROUP BY ...
  * WITH ROLLUP, DISTRIBUTE BY / SORT BY, HAVING, WINDOW clauses —
  * because that is the frontend surface a HiveQL user actually types
  * (Hive ql/parse/HiveParser.g's joinSource / lateralView /
  * rollupStandard / distributeByClause productions).
  */
class SqlParitySpec extends SparkSpec {

  private def dsl(key: String): DataFrame =
    SparkEntry.queries(key)(spark, sf)

  /** Row identity, in result order (both sides' order is total). */
  private def assertParity(key: String, sqlText: String): Unit = {
    Tables.views(spark, sf)
    val a = dsl(key)
    val b = spark.sql(sqlText)
    assert(b.columns.toSeq === a.columns.toSeq, s"$key: column names differ")
    val ra = a.collect().map(_.toSeq)
    val rb = b.collect().map(_.toSeq)
    assert(ra.length === rb.length, s"$key: row counts differ")
    assert(ra.sameElements(rb) || ra.zip(rb).forall { case (x, y) => x == y },
      s"$key: rows differ; first delta = ${ra.zip(rb).find { case (x, y) => x != y }}")
  }

  /** Row-SET identity for keys with no total order (distribute/sort-by). */
  private def assertSetParity(key: String, sqlText: String): Unit = {
    Tables.views(spark, sf)
    val a = dsl(key)
    val b = spark.sql(sqlText)
    assert(b.columns.toSeq === a.columns.toSeq, s"$key: column names differ")
    val ra = a.collect().map(_.toSeq.mkString("|")).sorted
    val rb = b.collect().map(_.toSeq.mkString("|")).sorted
    assert(ra.toSeq === rb.toSeq, s"$key: row sets differ")
  }

  private val REV =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  test("join_inner twin: HiveQL JOIN ... ON") {
    assertParity("join_inner",
      s"""SELECT o_orderkey, l_linenumber, o_orderstatus,
         |  CAST($REV AS DOUBLE) AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |ORDER BY o_orderkey, l_linenumber, o_orderstatus, revenue""".stripMargin)
  }

  test("join_left_outer twin: LEFT OUTER JOIN against a filtered subquery") {
    assertParity("join_left_outer",
      """SELECT c_custkey, b.o_orderkey, b.big_price
        |FROM customer c LEFT OUTER JOIN
        |  (SELECT o_custkey, o_orderkey,
        |     CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS big_price
        |   FROM orders WHERE o_totalprice > 250000) b
        |  ON c.c_custkey = b.o_custkey
        |ORDER BY c_custkey, o_orderkey, big_price""".stripMargin)
  }

  test("join_left_semi twin: Hive LEFT SEMI JOIN syntax") {
    assertParity("join_left_semi",
      """SELECT c_custkey, c_name
        |FROM customer LEFT SEMI JOIN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') o
        |  ON c_custkey = o.o_custkey
        |ORDER BY c_custkey""".stripMargin)
  }

  test("join_multiway_star twin: five-way star join as one FROM chain") {
    assertParity("join_multiway_star",
      s"""SELECT n_name,
         |  CAST(sum($REV) AS DOUBLE) AS revenue,
         |  count(*) AS n_lines
         |FROM region
         |JOIN nation   ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders   ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin)
  }

  test("agg_groupby twin: TPC-H Q1 as HiveQL text") {
    assertParity("agg_groupby",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($REV) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum($REV * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= '1998-12-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("agg_having twin: GROUP BY ... HAVING") {
    assertParity("agg_having",
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 13
        |ORDER BY o_custkey""".stripMargin)
  }

  test("agg_rollup twin: Hive GROUP BY ... WITH ROLLUP") {
    assertParity("agg_rollup",
      """SELECT l_returnflag, l_linestatus, grouping_id() AS gid,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus WITH ROLLUP
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
  }

  test("win_rank_family twin: WINDOW clause") {
    assertParity("win_rank_family",
      """SELECT o_orderpriority, year(o_orderdate) AS o_year, o_orderkey,
        |  rank() OVER w AS rk, dense_rank() OVER w AS drk,
        |  percent_rank() OVER w AS prk, cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY year(o_orderdate))
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin)
  }

  test("win_topk_per_group twin: row_number over a joined aggregate") {
    assertParity("win_topk_per_group",
      s"""SELECT p_brand, p_partkey, CAST(rev AS DOUBLE) AS revenue, rk FROM (
         |  SELECT p_brand, p_partkey, rev,
         |    row_number() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_partkey) AS rk
         |  FROM (SELECT p_brand, p_partkey, sum($REV) AS rev
         |        FROM lineitem JOIN part ON l_partkey = p_partkey
         |        GROUP BY p_brand, p_partkey) agg) ranked
         |WHERE rk <= 3
         |ORDER BY p_brand, rk""".stripMargin)
  }

  test("udtf_explode twin: Hive LATERAL VIEW explode ... AS") {
    assertParity("udtf_explode",
      """SELECT tok, count(*) AS n
        |FROM documents LATERAL VIEW explode(split(text, ' ')) t AS tok
        |GROUP BY tok ORDER BY tok""".stripMargin)
  }

  test("dedup_by_key twin: row_number-over-subquery dedup") {
    assertParity("dedup_by_key",
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin)
  }

  test("filter_like twin: LIKE with % and _ wildcards") {
    assertParity("filter_like",
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_name LIKE 'Customer#%1%' AND c_mktsegment LIKE 'B_ILDING'
        |ORDER BY c_custkey""".stripMargin)
  }

  test("sort_multi_nulls twin: explicit NULLS FIRST/LAST directives") {
    assertParity("sort_multi_nulls",
      """SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders
        |ORDER BY st DESC NULLS LAST, price ASC NULLS FIRST, o_orderkey""".stripMargin)
  }

  test("distribute_cluster twin: Hive DISTRIBUTE BY / SORT BY (row-set identity)") {
    assertSetParity("distribute_cluster",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_linenumber""".stripMargin)
  }

  test("distribute_cluster twin 2: Hive CLUSTER BY shorthand (row-set identity)") {
    // CLUSTER BY k = DISTRIBUTE BY k SORT BY k — the one-word Hive
    // spelling; same row set as the DSL repartition+sortWithin form
    assertSetParity("distribute_cluster",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |CLUSTER BY l_orderkey""".stripMargin)
  }

  test("set_except_all twin: EXCEPT ALL text form") {
    assertParity("set_except_all",
      """SELECT o_custkey AS k FROM orders WHERE o_custkey < 30
        |EXCEPT ALL
        |SELECT user_id AS k FROM events WHERE user_id < 15
        |ORDER BY k""".stripMargin)
  }

  test("transform_script twin: Hive SELECT TRANSFORM ... USING as SQL text") {
    // Spark executes TRANSFORM natively (no-serde mode, SPARK-32388):
    // same forked-process dataflow as Hive's ScriptOperator and as
    // our RDD.pipe key. TRANSFORM emits strings in no-serde mode, so
    // the twin casts back to the DSL key's (bigint, string, int)
    // schema. Only meaningful where the script binary exists — the
    // DSL key itself falls back in-process on hosts without it.
    assume(new java.io.File(graft.operators.Generators.transformCmd.head).canExecute)
    Tables.views(spark, sf)
    // TRANSFORM's USING string runs under `bash -c` (Hive semantics),
    // so the awk invocation is shell-quoted here, unlike the
    // RDD.pipe Seq form which execs argv directly. The explicit ROW
    // FORMAT DELIMITED tab on BOTH sides matters: Spark's no-serde
    // default field delimiter is Hive's \u0001 ctrl-A (probed — an
    // awk expecting tabs sees one unsplit line), and our script
    // speaks TSV like Hive's canonical `FIELDS TERMINATED BY '\t'`
    // TRANSFORM examples.
    val script =
      "/usr/bin/awk -F'\\t' '{ n = split($2, a, / /); " +
        "print $1 \"\\t\" toupper(substr($2, 1, 20)) \"\\t\" n }'"
    val cmd = script.replace("'", "''")
    val a = dsl("transform_script")
    val b = spark.sql(
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, head_uc,
         |  CAST(n_toks AS INT) AS n_toks FROM (
         |  SELECT TRANSFORM(doc_id, text)
         |    ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
         |    USING '$cmd'
         |    AS (doc_id, head_uc, n_toks)
         |    ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
         |  FROM documents) t
         |ORDER BY doc_id""".stripMargin)
    assert(b.columns.toSeq === a.columns.toSeq)
    assert(b.collect().map(_.toSeq).toSeq === a.collect().map(_.toSeq).toSeq,
      "TRANSFORM text form differs from the RDD.pipe DSL form")
  }

  test("MAPJOIN hint spelling drives a broadcast join from SQL text") {
    // Hive's /*+ MAPJOIN(dim) */ is accepted verbatim by Spark's hint
    // resolver (ResolveJoinStrategyHints lists MAPJOIN as an alias of
    // BROADCAST) — the join_broadcast key's plan, reachable from the
    // HiveQL spelling a migrating user already has in their scripts.
    Tables.views(spark, sf)
    val hinted = spark.sql(
      """SELECT /*+ MAPJOIN(part) */ l_orderkey, l_linenumber, p_brand,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, p_brand, price""".stripMargin)
    val plan = hinted.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"MAPJOIN hint did not produce a broadcast join:\n$plan")
    val a = dsl("join_broadcast").collect().map(_.toSeq)
    assert(hinted.collect().map(_.toSeq).toSeq === a.toSeq)
  }

  test("text and DSL forms meet at the same optimized plan (SURVEY §3.2)") {
    Tables.views(spark, sf)
    // sameResult on the canonicalized optimized plans — the strongest
    // "one IR" statement Catalyst offers. Asserted for twins whose
    // text is a direct transliteration (no subquery reshaping).
    for ((key, sqlText) <- Seq(
      "filter_like" ->
        """SELECT c_custkey, c_name, c_mktsegment FROM customer
          |WHERE c_name LIKE 'Customer#%1%' AND c_mktsegment LIKE 'B_ILDING'
          |ORDER BY c_custkey""".stripMargin,
      "agg_having" ->
        """SELECT o_custkey, count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders GROUP BY o_custkey
          |HAVING count(*) >= 13
          |ORDER BY o_custkey""".stripMargin)) {
      val a = dsl(key).queryExecution.optimizedPlan
      val b = spark.sql(sqlText).queryExecution.optimizedPlan
      assert(b.sameResult(a), s"$key: optimized plans not sameResult")
    }
  }
}
