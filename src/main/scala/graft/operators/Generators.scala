package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.9 generators / UDTF surface / lateral views (SURVEY.md:270-278).
  * Hive origin: GenericUDTFExplode/PosExplode/JSONTuple/Stack/Inline +
  * UDTFOperator/LateralViewJoinOperator; TRANSFORM ... USING 'script'
  * (ScriptOperator). Spark: generator expressions in select();
  * TRANSFORM pipes rows through a REAL external process via RDD.pipe
  * (one process per partition, rows streamed over stdin/stdout TSV —
  * exactly Hive's ScriptOperator dataflow), with a typed
  * mapPartitions fallback for hosts without the script binary.
  */
object Generators {

  /** The external TRANSFORM script: uppercase the first 20 chars and
    * count space-separated tokens — awk is the kind of stock /bin
    * row processor every Hive TRANSFORM corpus uses. `split(/ /)` (regex,
    * not awk's magic single-space FS) matches java's split(" ") on
    * this corpus (no consecutive/trailing spaces — verified). */
  private[graft] val transformCmd: Seq[String] = Seq("/usr/bin/awk", "-F\t",
    """{ n = split($2, a, / /); print $1 "\t" toupper(substr($2, 1, 20)) "\t" n }""")

  /** TRANSFORM via a forked process per partition (RDD.pipe): fully
    * distributed, no driver involvement, rows streamed as TSV. */
  private[graft] def transformPiped(
      src: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.rdd.RDD[(Long, String, Int)] =
    src.rdd.map { case (id, text) => s"$id\t$text" }
      .pipe(transformCmd)
      .map { line =>
        val f = line.split("\t", -1)
        (f(0).toLong, f(1), f(2).toInt)
      }

  /** In-process stand-in with identical semantics — the fallback when
    * the script binary is absent, and the unit cross-check's oracle
    * for the piped form. */
  private[graft] def transformLocal(
      src: org.apache.spark.sql.Dataset[(Long, String)]): org.apache.spark.rdd.RDD[(Long, String, Int)] =
    src.rdd.map { case (id, text) =>
      (id, text.toUpperCase.take(20), text.split(" ").length)
    }

  val queries: Map[String, Q.QueryFn] = Map(
    // the canonical Hive wordcount: LATERAL VIEW explode(split(text,' '))
    "udtf_explode" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("tok"))),

    "udtf_posexplode" -> ((s, d) =>
      Tables.t(s, d, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "tok")
        .orderBy(col("doc_id"), col("pos"))),

    "udtf_explode_outer" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(col("doc_id"),
          explode_outer(filter(split(col("text"), " "), t => t === "merge")).as("tok"))
        .orderBy(col("doc_id"), col("tok"))),

    "udtf_json_tuple" -> ((s, d) =>
      Tables.t(s, d, "events")
        .select(col("event_id"), json_tuple(col("props"), "k"))
        .withColumnRenamed("c0", "k")
        .orderBy(col("event_id"))),

    "udtf_stack" -> ((s, d) =>
      Tables.t(s, d, "region").filter(col("r_regionkey") === 0)
        .select(expr("stack(3, 'a', 1, 'b', 2, 'c', 3)").as(Seq("k", "v")))
        .orderBy(col("k"))),

    "udtf_inline" -> ((s, d) =>
      Tables.t(s, d, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"),
          expr("inline(transform(split(text, ' '), x -> named_struct('tok', x, 'tlen', length(x))))"))
        .orderBy(col("doc_id"), col("tok"), col("tlen"))),

    // TRANSFORM ... USING 'script': a real forked process when the
    // script binary exists (Hive-faithful), in-process fallback else
    "transform_script" -> { (s, d) =>
      import org.apache.spark.sql.Encoders
      val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
      val out = Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaInt)
      val src = Tables.t(s, d, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)](enc)
      val rows =
        if (new java.io.File(transformCmd.head).canExecute) transformPiped(src)
        else transformLocal(src)
      s.createDataset(rows)(out)
        .toDF("doc_id", "head_uc", "n_toks")
        .orderBy(col("doc_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "udtf_explode" ->
      """SELECT tok, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok ORDER BY tok""".stripMargin,
    "udtf_posexplode" ->
      """SELECT * FROM (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id < 20)
        |ORDER BY doc_id, pos""".stripMargin,
    "udtf_explode_outer" ->
      """SELECT d.doc_id, u.tok FROM documents d
        |LEFT JOIN (
        |  SELECT doc_id AS did, unnest(list_filter(string_split(text, ' '), t -> t = 'merge')) AS tok
        |  FROM documents) u ON d.doc_id = u.did
        |ORDER BY d.doc_id, u.tok NULLS FIRST""".stripMargin,
    "udtf_json_tuple" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "udtf_stack" ->
      """SELECT k, CAST(v AS INTEGER) AS v
        |FROM (VALUES ('a', 1), ('b', 2), ('c', 3)) t(k, v)
        |ORDER BY k""".stripMargin,
    "udtf_inline" ->
      """SELECT * FROM (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok,
        |    CAST(unnest(list_transform(string_split(text, ' '), t -> length(t))) AS INTEGER) AS tlen
        |  FROM documents WHERE doc_id < 20)
        |ORDER BY doc_id, tok, tlen""".stripMargin,
    "transform_script" ->
      """SELECT doc_id, upper(left(text, 20)) AS head_uc,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_toks
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
