package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.2 projection/filter/predicates, §2.6 sorts/limits, §2.7 set ops
  * (SURVEY.md:157-171, 227-243).
  * Hive origin: SelectOperator / FilterOperator / LimitOperator /
  * UnionOperator + the GenericUDF predicate surface. All stock Spark;
  * Catalyst folds, pushes and prunes these without help.
  */
object Relational {

  val queries: Map[String, Q.QueryFn] = Map(
    "project_expr" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          money(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("revenue"),
          (col("l_quantity") + lit(10)).as("qty_plus"),
          (dec(col("l_extendedprice")) / lit(2)).cast(DoubleType).as("half_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"),
          col("qty_plus"), col("half_price"))),

    "project_case_when" -> ((s, d) =>
      Tables.t(s, d, "orders")
        .select(col("o_orderkey"),
          // searched CASE
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("size_class"),
          // simple CASE on status
          when(col("o_orderstatus") === "F", "finished")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("other").as("status_word"))
        .orderBy(col("o_orderkey"))),

    "project_cast" -> ((s, d) =>
      Tables.t(s, d, "orders")
        .select(col("o_orderkey"),
          col("o_orderkey").cast(StringType).as("key_str"),
          // decimal + date casts exercised, rendered via hash-safe types
          // (string / naive timestamp) per the Q.scala contract
          col("o_totalprice").cast(DecimalType(18, 2)).cast(StringType).as("price_dec_str"),
          col("o_totalprice").cast(LongType).as("price_long"),
          dateOut(col("o_orderdate").cast(DateType)).as("date_only"),
          col("o_orderstatus").cast(StringType).as("status_str"),
          lit("42").cast(IntegerType).as("str_int"),
          col("o_custkey").cast(DoubleType).as("cust_dbl"))
        .orderBy(col("o_orderkey"))),

    "filter_compound" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .filter((col("l_quantity").between(10, 40)
          && col("l_returnflag").isin("A", "R")
          && !(col("l_discount") > 0.08))
          || col("l_extendedprice") > 90000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // data — order by every output column so ties are identical
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    "filter_like" -> ((s, d) =>
      Tables.t(s, d, "customer")
        .filter(col("c_name").like("Customer#%1%") && col("c_mktsegment").like("B_ILDING"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    "filter_rlike" -> ((s, d) =>
      Tables.t(s, d, "customer")
        .filter(col("c_name").rlike("Customer#0+1[0-9]$"))
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "filter_null_semantics" -> ((s, d) =>
      Tables.t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("flag_n"))
        .select(col("l_orderkey"), col("l_linenumber"), col("flag_n"),
          col("flag_n").isNull.as("is_null"),
          col("flag_n").isNotNull.as("is_not_null"),
          col("flag_n") <=> lit("A") as "null_safe_eq_a",
          // nullable BOOLEAN is not hash-safe (pyarrow None vs DuckDB
          // nan) — render 3-valued results as strings (Q.scala)
          (col("flag_n") === "A").cast(StringType).as("three_valued_eq"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("flag_n"))),

    "dedup_exact" -> ((s, d) =>
      Tables.t(s, d, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))),

    "dedup_by_key" -> { (s, d) =>
      // deterministic first-row-per-key: NOT bare dropDuplicates
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_custkey"))
    },

    "sample_fraction" -> ((s, d) =>
      // seed semantics are engine-specific → rows-only check + unit test
      Tables.t(s, d, "lineitem").sample(0.1, 42)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // ---- §2.6 sorts / limits ----
    "sort_multi_nulls" -> ((s, d) =>
      Tables.t(s, d, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("st"),
          money(dec(col("o_totalprice"))).as("price"))
        .orderBy(col("st").desc_nulls_last, col("price").asc_nulls_first, col("o_orderkey"))),

    "sort_limit" -> ((s, d) =>
      Tables.t(s, d, "orders")
        .select(col("o_orderkey"), money(dec(col("o_totalprice"))).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(20)),

    "limit_offset" -> ((s, d) =>
      Tables.t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .offset(10).limit(15)),

    "distribute_cluster" -> ((s, d) =>
      // DISTRIBUTE BY + SORT BY: per-partition sort, no total order.
      // Row-set equality is what we can promise; sortedness per
      // partition is asserted in RelationalSpec via mapPartitions.
      Tables.t(s, d, "lineitem")
        .repartition(col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"))),

    // ---- §2.7 set operations ----
    "set_union_all" -> { (s, d) =>
      val c = Tables.t(s, d, "customer")
        .select(col("c_nationkey").as("nkey"), money(dec(col("c_acctbal"))).as("bal"), lit("c").as("src"))
      val sup = Tables.t(s, d, "supplier")
        .select(col("s_nationkey").as("nkey"), money(dec(col("s_acctbal"))).as("bal"), lit("s").as("src"))
      c.unionAll(sup).orderBy(col("src"), col("nkey"), col("bal"))
    },

    "set_union_distinct" -> { (s, d) =>
      val c = Tables.t(s, d, "customer").select(col("c_nationkey").as("nkey"))
      val sup = Tables.t(s, d, "supplier").select(col("s_nationkey").as("nkey"))
      c.union(sup).distinct().orderBy(col("nkey"))
    },

    "set_intersect" -> { (s, d) =>
      val c = Tables.t(s, d, "customer").select(col("c_nationkey").as("nkey"))
      val sup = Tables.t(s, d, "supplier").select(col("s_nationkey").as("nkey"))
      c.intersect(sup).orderBy(col("nkey"))
    },

    "set_intersect_all" -> { (s, d) =>
      val a = Tables.t(s, d, "orders").select(col("o_custkey").as("k")).filter(col("k") < 30)
      val b = Tables.t(s, d, "events").select(col("user_id").as("k"))
      a.intersectAll(b).orderBy(col("k"))
    },

    // operands chosen for a provably NON-EMPTY difference at every SF
    // (suppliers cover all customer nations, so the full-table EXCEPT
    // was 0 rows — a vacuous green; VERDICT r4): the first 5 suppliers
    // span ≤5 nations, leaving ≥20 customer nations at sf0.001/0.01/0.1
    "set_except" -> { (s, d) =>
      val c = Tables.t(s, d, "customer").select(col("c_nationkey").as("nkey"))
      val sup = Tables.t(s, d, "supplier").filter(col("s_suppkey") < 5)
        .select(col("s_nationkey").as("nkey"))
      c.except(sup).orderBy(col("nkey"))
    },

    // events user_ids cover custkeys<30 with higher multiplicity at
    // sf≥0.01 (EXCEPT ALL was 0 rows); restricting the right side to
    // user_id<15 leaves 141-174 surplus rows at every SF
    "set_except_all" -> { (s, d) =>
      val a = Tables.t(s, d, "orders").select(col("o_custkey").as("k")).filter(col("k") < 30)
      val b = Tables.t(s, d, "events").select(col("user_id").as("k")).filter(col("k") < 15)
      a.exceptAll(b).orderBy(col("k"))
    }
  )

  val oracle: Map[String, String] = Map(
    "project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  l_quantity + 10 AS qty_plus,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) / 2 AS half_price
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, revenue, qty_plus, half_price""".stripMargin,
    "project_case_when" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS size_class,
        |  CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
        |       ELSE 'other' END AS status_word
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "project_cast" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec_str,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS price_long,
        |  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS date_only,
        |  CAST(o_orderstatus AS VARCHAR) AS status_str,
        |  CAST('42' AS INTEGER) AS str_int,
        |  CAST(o_custkey AS DOUBLE) AS cust_dbl
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE (l_quantity BETWEEN 10 AND 40
        |       AND l_returnflag IN ('A','R')
        |       AND NOT (l_discount > 0.08))
        |   OR l_extendedprice > 90000
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "filter_like" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_name LIKE 'Customer#%1%' AND c_mktsegment LIKE 'B_ILDING'
        |ORDER BY c_custkey""".stripMargin,
    "filter_rlike" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE regexp_matches(c_name, 'Customer#0+1[0-9]$')
        |ORDER BY c_custkey""".stripMargin,
    "filter_null_semantics" ->
      """SELECT l_orderkey, l_linenumber,
        |  nullif(l_returnflag, 'N') AS flag_n,
        |  nullif(l_returnflag, 'N') IS NULL AS is_null,
        |  nullif(l_returnflag, 'N') IS NOT NULL AS is_not_null,
        |  nullif(l_returnflag, 'N') IS NOT DISTINCT FROM 'A' AS null_safe_eq_a,
        |  CAST(nullif(l_returnflag, 'N') = 'A' AS VARCHAR) AS three_valued_eq
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, flag_n NULLS FIRST""".stripMargin,
    "dedup_exact" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "dedup_by_key" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "sort_multi_nulls" ->
      """SELECT o_orderkey, nullif(o_orderstatus,'O') AS st,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders
        |ORDER BY st DESC NULLS LAST, price ASC NULLS FIRST, o_orderkey""".stripMargin,
    "sort_limit" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 20""".stripMargin,
    "limit_offset" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 15 OFFSET 10""".stripMargin,
    "set_union_all" ->
      """SELECT * FROM (
        |  SELECT c_nationkey AS nkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal, 'c' AS src FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nkey, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal, 's' AS src FROM supplier)
        |ORDER BY src, nkey, bal""".stripMargin,
    "set_union_distinct" ->
      """SELECT c_nationkey AS nkey FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nkey""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT k FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_custkey < 30
        |  INTERSECT ALL SELECT user_id FROM events) ORDER BY k""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier WHERE s_suppkey < 5 ORDER BY nkey""".stripMargin,
    "set_except_all" ->
      """SELECT k FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_custkey < 30
        |  EXCEPT ALL SELECT user_id FROM events WHERE user_id < 15) ORDER BY k""".stripMargin
  )
}
