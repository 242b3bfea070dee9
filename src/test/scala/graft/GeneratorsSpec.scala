package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.operators.Generators

/** `transform_script`'s external-process pipe (RDD.pipe — Hive's
  * ScriptOperator dataflow) cross-checked against the in-process
  * fallback. The DuckDB oracle covers the registered key end to end;
  * this suite proves the PIPED form specifically forks a real
  * process and produces identical rows.
  */
class GeneratorsSpec extends SparkSpec {

  test("transform_script pipes through a real external process, identical to in-process form") {
    assume(new java.io.File(Generators.transformCmd.head).canExecute,
      s"${Generators.transformCmd.head} not present on this host")
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val src = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      .as[(Long, String)](enc)
    val piped = Generators.transformPiped(src).collect().sortBy(_._1)
    val local = Generators.transformLocal(src).collect().sortBy(_._1)
    assert(piped.length == local.length && piped.length > 0)
    assert(piped.toSeq == local.toSeq,
      s"first divergence: ${piped.toSeq.zip(local.toSeq).find { case (a, b) => a != b }}")
  }

  test("registered transform_script key prefers the piped form and stays ordered") {
    val df = SparkEntry.queries("transform_script")(spark, sf)
    val ids = df.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted && ids.nonEmpty)
    assert(df.columns.toSeq == Seq("doc_id", "head_uc", "n_toks"))
  }
}
