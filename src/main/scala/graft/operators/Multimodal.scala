package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Encoders, Row}

/** Multimodal binary-column plumbing (task brief: treat image/audio
  * as opaque BINARY + typed metadata; decode via a per-partition
  * kernel).
  *
  * The container has no media codecs, so the DECODER IS A
  * DETERMINISTIC STUB — it interprets the blob as an 8-bit grayscale
  * "image" of fixed stride 32 and extracts byte-level "features".
  * Everything around the stub is the real pipeline shape:
  *   - an opaque BinaryType column + typed metadata struct,
  *   - a typed mapPartitions kernel iterating rows batch-wise per
  *     partition (exactly where a JNI/codec call would sit — no
  *     driver involvement, partitioning preserved),
  *   - a declared schema for the decoded features.
  * Swapping the stub for a real codec changes ONE function.
  */
object Multimodal {

  final case class Decoded(
      doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, mean_byte: Double, max_byte: Int)

  /** THE STUB: a real implementation would decode pixels/samples
    * here; this fake is deterministic and cheap. */
  private def decodeStub(id: Long, blob: Array[Byte]): Decoded = {
    val n = blob.length
    val width = 32
    val height = (n + width - 1) / width
    var sum = 0L; var mx = 0
    var i = 0
    while (i < n) { val b = blob(i) & 0xff; sum += b; if (b > mx) mx = b; i += 1 }
    Decoded(id, "application/x-graft-fake", n, width, height,
      if (n == 0) 0.0 else sum.toDouble / n, mx)
  }

  val queries: Map[String, Q.QueryFn] = Map(
    "llm_multimodal_decode" -> { (s, d) =>
      val media = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("blob"),
          struct(lit("application/x-graft-fake").as("mime"),
            length(col("text")).as("declared_len")).as("meta"))
      val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
      media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])](inEnc)
        .mapPartitions(_.map { case (id, blob) => decodeStub(id, blob) })(
          Encoders.product[Decoded])
        .toDF()
        .orderBy(col("doc_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    // the stub's arithmetic re-stated in SQL over the same bytes
    "llm_multimodal_decode" ->
      """WITH b AS (SELECT doc_id, text, strlen(text) AS n FROM documents),
        |f AS (SELECT doc_id, n,
        |    list_transform(generate_series(1, n), i -> ord(substring(text, i, 1))) AS bytes
        |  FROM b)
        |SELECT doc_id, 'application/x-graft-fake' AS mime,
        |  CAST(n AS INTEGER) AS n_bytes,
        |  CAST(32 AS INTEGER) AS width,
        |  CAST((n + 31) // 32 AS INTEGER) AS height,
        |  CAST(list_sum(bytes) AS DOUBLE) / n AS mean_byte,
        |  CAST(list_aggregate(bytes, 'max') AS INTEGER) AS max_byte
        |FROM f ORDER BY doc_id""".stripMargin
  )
}
