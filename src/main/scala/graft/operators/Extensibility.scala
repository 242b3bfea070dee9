package graft.operators

import graft.{Q, Tables}
import graft.Q._
import graft.functions.Graft
import org.apache.spark.sql.functions._

/** §2.11 UDF / UDAF / UDTF extension APIs (SURVEY.md:303-309) — the
  * Hive extensibility surface re-expressed as Catalyst extensions:
  * Scala UDF, native Expression with codegen, typed Aggregator,
  * TypedImperativeAggregate with binary buffer, and a Generator.
  * All are registered in the session FunctionRegistry
  * (graft.functions.Graft) and invoked through the normal analyzer.
  */
object Extensibility {

  val queries: Map[String, Q.QueryFn] = Map(
    "udf_scalar" -> { (s, d) =>
      Graft.registerAll(s)
      Tables.views(s, d)
      s.sql("""SELECT c_custkey, tier(c_acctbal) AS tier,
              |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
              |FROM customer ORDER BY c_custkey""".stripMargin)
    },

    "udf_expression_codegen" -> { (s, d) =>
      Graft.registerAll(s)
      Tables.t(s, d, "documents")
        .select(col("doc_id"),
          expr("token_jaccard(text, concat(text, ' zz_novel_tok'))").as("j_almost"),
          expr("token_jaccard(text, text)").as("j_self"),
          expr("token_jaccard(text, 'spark join data')").as("j_probe"))
        .orderBy(col("doc_id"))
    },

    "udaf_aggregator" -> { (s, d) =>
      Graft.registerAll(s)
      Tables.t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("wmean(l_quantity, l_extendedprice)").as("w_mean_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    "udaf_typed_imperative" -> { (s, d) =>
      Graft.registerAll(s)
      Tables.t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("topk_keys(o_orderkey, o_totalprice, 5)").as("top5_csv"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },

    "udtf_generator" -> { (s, d) =>
      Graft.registerAll(s)
      Tables.views(s, d)
      s.sql("""SELECT doc_id, ngram FROM (
              |  SELECT doc_id, ngrams(left(text, 30), 3) AS ngram
              |  FROM documents WHERE doc_id < 50)
              |ORDER BY doc_id, ngram""".stripMargin)
    }
  )

  val oracle: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal > 7500 THEN 'platinum'
        |       WHEN c_acctbal > 2500 THEN 'gold'
        |       WHEN c_acctbal >= 0 THEN 'standard'
        |       ELSE 'delinquent' END AS tier,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "udf_expression_codegen" ->
      """WITH t AS (SELECT doc_id,
        |    list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS DOUBLE) / (len(toks) + 1) AS j_almost,
        |  CAST(1.0 AS DOUBLE) AS j_self,
        |  CAST(len(list_intersect(toks, ['spark','join','data'])) AS DOUBLE)
        |    / len(list_distinct(list_concat(toks, ['spark','join','data']))) AS j_probe
        |FROM t ORDER BY doc_id""".stripMargin,
    "udaf_aggregator" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        |    / CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS w_mean_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udaf_typed_imperative" ->
      """SELECT o_orderstatus,
        |  array_to_string(list_slice(list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey), 1, 5), ',') AS top5_csv,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "udtf_generator" ->
      """SELECT doc_id, ngram FROM (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(length(left(text, 30)) - 2, 0)),
        |      i -> substring(left(text, 30), i, 3))) AS ngram
        |  FROM documents WHERE doc_id < 50)
        |ORDER BY doc_id, ngram""".stripMargin
  )
}
