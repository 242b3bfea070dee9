package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 window functions (SURVEY.md:215-225).
  * Hive origin: PTFOperator / GenericUDAFRowNumber etc. (windowing
  * since Hive 0.11). Spark: WindowExec over
  * Window.partitionBy.orderBy with explicit frames.
  *
  * Determinism rules: every orderBy inside a window carries a unique
  * tie-break key (or the frame is tie-invariant, as in RANGE frames);
  * running decimal sums are exact; windowed averages are computed as
  * exact-sum/count in double on both engines (never avg(decimal),
  * whose result scale rounding differs per engine).
  *
  * 100 TB note: window state is per-partition-key; all partitions here
  * key on customer/brand/priority — high-cardinality, so WindowExec
  * shuffles once by the partition key and streams frames; no global
  * sort except the final presentation ORDER BY required by the hash
  * contract.
  */
object Windows {

  private def byCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  val queries: Map[String, Q.QueryFn] = Map(
    "win_row_number" -> ((s, d) =>
      Tables.t(s, d, "orders")
        .withColumn("rn", row_number().over(byCust))
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))),

    "win_rank_family" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(year(col("o_orderdate")))
      Tables.t(s, d, "orders")
        .select(col("o_orderpriority"), year(col("o_orderdate")).as("o_year"),
          col("o_orderkey"),
          rank().over(w).as("rk"), dense_rank().over(w).as("drk"),
          percent_rank().over(w).as("prk"), cume_dist().over(w).as("cd"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    },

    "win_ntile" -> { (s, d) =>
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.t(s, d, "customer")
        .select(col("c_custkey"), money(dec(col("c_acctbal"))).as("bal"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("c_custkey"))
    },

    "win_lag_lead" -> ((s, d) =>
      Tables.t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(byCust).as("prev_date"),
          lead(col("o_orderdate"), 1).over(byCust).as("next_date"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(byCust)).as("gap_days"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))),

    "win_first_last" -> { (s, d) =>
      // the classic last_value pitfall: frame must be the FULL partition
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"),
          nth_value(col("o_orderkey"), 3).over(w).as("third_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // IGNORE NULLS window semantics — the forward-fill (gap-fill)
    // idiom: carry the last non-null observation forward within each
    // partition. The standard way a 100 TB pipeline densifies sparse
    // measurements (sensor readings, price ticks) without a
    // self-join: last(v, ignoreNulls).over(unboundedPreceding..
    // currentRow) is one windowed pass. Nulls injected
    // deterministically so every partition exercises both the carry
    // and the leading-null (no prior observation → stays null) cases.
    "win_fill_forward" -> { (s, d) =>
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          when(col("o_orderkey") % 3 === 0, lit(null))
            .otherwise(dec(col("o_totalprice"))).as("v"))
        .select(col("o_custkey"), col("o_orderkey"),
          money(col("v")).as("v"),
          money(last(col("v"), ignoreNulls = true).over(w)).as("v_filled"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    "win_running_sum" -> { (s, d) =>
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          money(sum(dec(col("o_totalprice"))).over(w)).as("run_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    "win_sliding_avg" -> { (s, d) =>
      val w = byCust.rowsBetween(-3, 0)
      Tables.t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(dec(col("o_totalprice"))).over(w).cast("double")
            / count(lit(1)).over(w)).as("avg4"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    "win_range_frame" -> { (s, d) =>
      Tables.views(s, d)
      s.sql("""SELECT o_custkey, o_orderkey, o_orderdate,
              |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
              |    PARTITION BY o_custkey ORDER BY o_orderdate
              |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30d
              |FROM orders
              |ORDER BY o_custkey, o_orderkey, o_orderdate""".stripMargin)
    },

    "win_topk_per_group" -> { (s, d) =>
      val rev = Tables.t(s, d, "lineitem")
        .join(broadcast(Tables.t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("rev"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("rev").desc, col("p_partkey"))
      rev.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("p_brand"), col("p_partkey"), money(col("rev")).as("revenue"), col("rk"))
        .orderBy(col("p_brand"), col("rk"))
    },

    // BATCH sessionization — the gaps-and-islands window idiom
    // (lag → new-session flag → running-sum session id → group):
    // the batch twin of stream_session/stream_session_timers, over
    // the same events with the same 30-min gap, so all three
    // formulations are mutually checkable. Tie-safe: rows sharing a
    // user_id+ts land in the same session whichever physical order
    // the window visits them in (a tie never crosses the gap).
    "win_sessionize" -> { (s, d) =>
      Tables.views(s, d)
      s.sql("""WITH e AS (SELECT user_id, ts FROM events),
              |flags AS (SELECT user_id, ts,
              |    CASE WHEN lag(ts) OVER w IS NULL
              |         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS new_s
              |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              |sess AS (SELECT user_id, ts,
              |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
              |  FROM flags)
              |SELECT user_id, CAST(sid AS BIGINT) AS sid, min(ts) AS sstart, max(ts) AS send,
              |  count(*) AS n
              |FROM sess GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin)
    }
  )

  private val OP2 = "CAST(o_totalprice AS DECIMAL(18,2))"

  val oracle: Map[String, String] = Map(
    "win_row_number" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "win_rank_family" ->
      """SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderkey,
        |  rank() OVER w AS rk, dense_rank() OVER w AS drk,
        |  percent_rank() OVER w AS prk, cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY year(o_orderdate))
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "win_ntile" ->
      """SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
        |  ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "win_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_orderdate, 1) OVER w AS prev_date,
        |  lead(o_orderdate, 1) OVER w AS next_date,
        |  CAST(date_diff('day', CAST(lag(o_orderdate, 1) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  nth_value(o_orderkey, 3) OVER w AS third_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_fill_forward" ->
      """WITH t AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS v
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, CAST(v AS DOUBLE) AS v,
        |  CAST(last_value(v IGNORE NULLS) OVER (PARTITION BY o_custkey
        |       ORDER BY o_orderdate, o_orderkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS v_filled
        |FROM t ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_running_sum" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(sum($OP2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
         |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_sliding_avg" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(sum($OP2) OVER w AS DOUBLE) / count(*) OVER w AS avg4
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_range_frame" ->
      s"""SELECT o_custkey, o_orderkey, o_orderdate,
         |  CAST(sum($OP2) OVER (
         |    PARTITION BY o_custkey ORDER BY o_orderdate
         |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30d
         |FROM orders
         |ORDER BY o_custkey, o_orderkey, o_orderdate""".stripMargin,
    "win_topk_per_group" ->
      """WITH rev AS (
        |  SELECT p_brand, p_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey),
        |rk AS (SELECT p_brand, p_partkey, rev,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_partkey) AS rk FROM rev)
        |SELECT p_brand, p_partkey, CAST(rev AS DOUBLE) AS revenue, rk
        |FROM rk WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "win_sessionize" ->
      """WITH e AS (SELECT user_id, ts FROM events),
        |flags AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT user_id, CAST(sid AS BIGINT) AS sid, min(ts) AS sstart, max(ts) AS send,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin
  )
}
