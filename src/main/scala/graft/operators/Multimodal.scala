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

  final case class Frame(
      doc_id: Long, frame_idx: Int, n_bytes: Int,
      mean_byte: Double, max_byte: Int)

  final case class Resized(
      doc_id: Long, out_h: Int, out_w: Int, pool_csv: String, total_sum: Long)

  /** THE STUB: a real implementation would decode pixels/samples
    * here; this fake is deterministic and cheap. A null blob (null
    * source text) decodes as empty — mirrored by coalesce(text,'') in
    * the oracles. NOTE the byte/char invariant: these kernels pool
    * UTF-8 BYTES while the DuckDB oracles index CHARACTERS, identical
    * only on a pure-ASCII corpus — so each oracle carries an explicit
    * strlen<>length guard that raises error() instead of silently
    * diverging, and LlmSpec asserts the corpus invariant (ADVICE r15). */
  private def decodeStub(id: Long, blobOrNull: Array[Byte]): Decoded = {
    val blob = if (blobOrNull == null) Array.emptyByteArray else blobOrNull
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
    },

    // Frame sampling — the one-to-MANY kernel shape (video → every
    // Nth frame): the blob is treated as a fixed-stride frame
    // sequence (32-byte "frames", sample every 4th, ragged tail
    // kept), each sampled frame emitted as its own row with per-frame
    // features. Same stub contract as the decode key: the arithmetic
    // is a stand-in for a codec, the flatMap-per-partition plumbing
    // (no driver involvement, partitioning preserved, output fan-out
    // bounded by blob size / stride) is the real pipeline shape.
    "llm_multimodal_frames" -> { (s, d) =>
      val frameLen = 32
      val stride = 4
      val media = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
      val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
      media.as[(Long, Array[Byte])](inEnc)
        .mapPartitions(_.flatMap { case (id, blobOrNull) =>
          val blob = if (blobOrNull == null) Array.emptyByteArray else blobOrNull
          val nFrames = (blob.length + frameLen - 1) / frameLen
          (0 until nFrames by stride).iterator.map { fi =>
            val from = fi * frameLen
            val until = math.min(from + frameLen, blob.length)
            var sum = 0L; var mx = 0; var i = from
            while (i < until) { val b = blob(i) & 0xff; sum += b; if (b > mx) mx = b; i += 1 }
            val n = until - from
            Frame(id, fi, n, if (n == 0) 0.0 else sum.toDouble / n, mx)
          }
        })(Encoders.product[Frame])
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // Resize/downsample — the spatial-pooling kernel shape (image →
    // thumbnail / feature map): the width-32 stub image is 4×4
    // average-pooled to width 8, ragged edges kept as partial cells.
    // Pooled values ship as INTEGER SUMS (exact — a mean is one
    // division away for the consumer) so the output stays bit-exact
    // cross-engine; CSV rendering per the representation contract.
    // Same stub contract as decode/frames: the pooling arithmetic
    // stands in for a real resampler, the per-partition plumbing is
    // the real pipeline shape.
    "llm_multimodal_resize" -> { (s, d) =>
      val width = 32
      val pool = 4
      val outW = width / pool
      val media = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
      val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
      media.as[(Long, Array[Byte])](inEnc)
        .mapPartitions(_.flatMap { case (id, blobOrNull) =>
          val blob = if (blobOrNull == null) Array.emptyByteArray else blobOrNull
          val n = blob.length
          if (n == 0) Iterator.empty
          else {
            val h = (n + width - 1) / width
            val outH = (h + pool - 1) / pool
            val sums = Array.ofDim[Long](outH * outW)
            var i = 0
            while (i < n) {
              val r = (i / width) / pool
              val c = (i % width) / pool
              sums(r * outW + c) += blob(i) & 0xff
              i += 1
            }
            Iterator.single(Resized(id, outH, outW,
              sums.mkString(","), sums.sum))
          }
        })(Encoders.product[Resized])
        .toDF()
        .orderBy(col("doc_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    // The stub's arithmetic re-stated in SQL over the same bytes.
    // substring/ord index CHARACTERS while the kernel pools UTF-8
    // BYTES — identical only on pure-ASCII text, so the n column
    // raises error() on any strlen (bytes) vs length (chars) mismatch
    // instead of silently diverging (ADVICE r15); null text decodes
    // as empty on both sides (coalesce here, null-blob guard in the
    // kernel).
    "llm_multimodal_decode" ->
      """WITH b AS (SELECT doc_id, coalesce(text, '') AS text,
        |    CASE WHEN strlen(coalesce(text, '')) <> length(coalesce(text, ''))
        |         THEN CAST(error('non-ASCII text invalidates the byte/char multimodal oracle') AS BIGINT)
        |         ELSE strlen(coalesce(text, '')) END AS n FROM documents),
        |f AS (SELECT doc_id, n,
        |    list_transform(generate_series(1, n), i -> ord(substring(text, i, 1))) AS bytes
        |  FROM b)
        |SELECT doc_id, 'application/x-graft-fake' AS mime,
        |  CAST(n AS INTEGER) AS n_bytes,
        |  CAST(32 AS INTEGER) AS width,
        |  CAST((n + 31) // 32 AS INTEGER) AS height,
        |  CAST(coalesce(list_sum(bytes), 0) AS DOUBLE) / greatest(n, 1) AS mean_byte,
        |  CAST(coalesce(list_aggregate(bytes, 'max'), 0) AS INTEGER) AS max_byte
        |FROM f ORDER BY doc_id""".stripMargin,
    // the frame sampler's arithmetic re-stated in SQL: frame i covers
    // bytes [i*32, min(i*32+32, n)), sampled at i % 4 = 0
    "llm_multimodal_frames" ->
      """WITH b AS (SELECT doc_id, coalesce(text, '') AS text,
        |    CASE WHEN strlen(coalesce(text, '')) <> length(coalesce(text, ''))
        |         THEN CAST(error('non-ASCII text invalidates the byte/char multimodal oracle') AS BIGINT)
        |         ELSE strlen(coalesce(text, '')) END AS n FROM documents),
        |fr AS (SELECT doc_id, text, n,
        |         unnest(generate_series(0, CAST((n + 31) // 32 AS INTEGER) - 1, 4)) AS frame_idx
        |       FROM b WHERE n > 0),
        |f AS (SELECT doc_id, frame_idx,
        |        least(32, n - frame_idx * 32) AS fn,
        |        list_transform(generate_series(1, least(32, n - frame_idx * 32)),
        |                       i -> ord(substring(text, frame_idx * 32 + i, 1))) AS bytes
        |      FROM fr)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(fn AS INTEGER) AS n_bytes,
        |  CAST(list_sum(bytes) AS DOUBLE) / CAST(fn AS DOUBLE) AS mean_byte,
        |  CAST(list_aggregate(bytes, 'max') AS INTEGER) AS max_byte
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // the pooling kernel re-stated byte-wise: byte idx lands in pooled
    // cell ((idx//32)//4, (idx%32)//4); cells that receive no byte
    // (ragged edge cells fully past the end) do not exist in the
    // kernel either ONLY when an entire pooled ROW is absent — within
    // a started row every cell gets at least a zero from the kernel's
    // dense array, so the SQL right-pads missing cells with 0
    "llm_multimodal_resize" ->
      """WITH b AS (SELECT doc_id, coalesce(text, '') AS text,
        |    CASE WHEN strlen(coalesce(text, '')) <> length(coalesce(text, ''))
        |         THEN CAST(error('non-ASCII text invalidates the byte/char multimodal oracle') AS BIGINT)
        |         ELSE strlen(coalesce(text, '')) END AS n FROM documents),
        |by_byte AS (SELECT doc_id, i - 1 AS idx, ord(substring(text, i, 1)) AS v
        |            FROM b, unnest(generate_series(1, n)) AS t(i) WHERE n > 0),
        |cell AS (SELECT doc_id, (idx // 32) // 4 AS r_out, (idx % 32) // 4 AS c_out,
        |           CAST(sum(v) AS BIGINT) AS s
        |         FROM by_byte GROUP BY 1, 2, 3),
        |dims AS (SELECT doc_id, max(r_out) + 1 AS out_h FROM cell GROUP BY doc_id),
        |grid AS (SELECT dims.doc_id, out_h, r, c
        |         FROM dims,
        |              unnest(generate_series(0, CAST(out_h AS INTEGER) - 1)) AS tr(r),
        |              unnest(generate_series(0, 7)) AS tc(c)),
        |dense AS (SELECT grid.doc_id, grid.out_h, grid.r, grid.c, coalesce(cell.s, 0) AS s
        |          FROM grid LEFT JOIN cell ON cell.doc_id = grid.doc_id
        |                        AND cell.r_out = grid.r AND cell.c_out = grid.c)
        |SELECT doc_id,
        |  CAST(out_h AS INTEGER) AS out_h,
        |  CAST(8 AS INTEGER) AS out_w,
        |  string_agg(CAST(s AS VARCHAR), ',' ORDER BY r, c) AS pool_csv,
        |  CAST(sum(s) AS BIGINT) AS total_sum
        |FROM dense GROUP BY doc_id, out_h ORDER BY doc_id""".stripMargin
  )
}
