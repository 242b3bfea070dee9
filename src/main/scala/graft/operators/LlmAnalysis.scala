package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Task-brief text-analysis operators beyond SURVEY §2.12's original
  * ten: language-ID (marker heuristic), per-doc quality scoring, and
  * rolling-hash document fingerprinting. All deterministic and
  * SQL-oracle-checked; all linear explode/agg pipelines (no global
  * state) per the 100 TB design note.
  *
  * Note on the corpus: the synthetic languages share one vocabulary,
  * so the lang-ID heuristic cannot actually separate them — the
  * operator's mechanics (marker scoring, argmax with deterministic
  * tie-break, confusion-matrix output) are what is exercised and
  * verified.
  */
object LlmAnalysis {

  /** Fixed marker vocabulary per language (first listed wins ties). */
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("batch", "merge", "group"),
    "en" -> Seq("spark", "join", "the"),
    "es" -> Seq("table", "row", "order"),
    "fr" -> Seq("query", "filter", "sort"),
    "zh" -> Seq("hash", "scan", "stream"))

  /** Per-source keep rates for the deterministic mixture sampler:
    * src_i keeps 20% + 4%/step (src0 20% … src19 96%) — the
    * "upweight the better sources" shape of a training-mixture spec.
    * Rendered as a hex threshold against the first 4 md5 hex digits
    * of the doc id, so membership is a pure function of the row (no
    * RNG, no partition sensitivity) and the oracle can evaluate the
    * IDENTICAL CASE text. */
  private val srcThresholds: Seq[(String, String)] = (0 until 20).map { i =>
    val rate = math.min(1.0, 0.2 + 0.04 * i)
    (s"src$i", f"${(rate * 65536).toInt}%04x")
  }

  private[operators] val thrSql = "CASE source " +
    srcThresholds.map { case (s, h) => s"WHEN '$s' THEN '$h'" }.mkString(" ") +
    " ELSE '0000' END"

  val queries: Map[String, Q.QueryFn] = Map(
    // Deterministic weighted mixture sampling — the corpus-curation
    // step that assembles a training mix from sources at different
    // rates. Hash-gated (md5 prefix vs per-source threshold): exactly
    // reproducible across runs/engines, no sampled RNG state, and at
    // 100 TB it is a per-row predicate + partial-aggregable count
    // rollup (zero extra shuffles beyond the final per-source agg).
    "llm_mixture_sample" -> { (s, d) =>
      val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4)
      Tables.t(s, d, "documents")
        .withColumn("keep", h < expr(thrSql))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("keep"), 1)).as("n_kept"),
          coalesce(min(when(col("keep"), col("doc_id"))), lit(-1L)).as("first_kept"),
          coalesce(max(when(col("keep"), col("doc_id"))), lit(-1L)).as("last_kept"))
        .withColumn("kept_frac", col("n_kept").cast("double") / col("n_total"))
        .orderBy(col("source"))
    },
    "llm_lang_id" -> { (s, d) =>
      val toks = split(col("text"), " ")
      val scored = Tables.t(s, d, "documents").select(
        (col("lang") +: Markers.map { case (l, ms) =>
          size(filter(toks, t => ms.map(m => t === m).reduce(_ || _))).as(s"s_$l")
        }): _*)
      // argmax with ties resolved by Markers order: the SAME CASE
      // chain text runs through both engines (see predSql)
      scored.withColumn("predicted", expr(predSql))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    },

    "llm_quality_score" -> { (s, d) =>
      val toks = split(col("text"), " ")
      val stop = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
      Tables.t(s, d, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        size(toks).as("n_toks"),
        (size(filter(toks, t => array_contains(stop, t))).cast("double")
          / size(toks)).as("stop_ratio"),
        ((length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
          .cast("double") / length(col("text"))).as("punct_ratio"),
        ((length(col("text")) - (size(toks) - 1)).cast("double") / size(toks)).as("mean_tok_len"),
        // BPE-ish subword count: greedy <=4-char chunks — the cheap
        // deterministic stand-in for a real tokenizer's token count
        size(regexp_extract_all(col("text"), lit("[a-z0-9]{1,4}"), lit(0))).as("bpe_tokens"))
        .withColumn("quality",
          when(col("stop_ratio") < 0.05 && col("mean_tok_len") >= 4.5, "high")
            .when(col("stop_ratio") < 0.15, "medium")
            .otherwise("low"))
        .orderBy(col("doc_id"))
    },

    // winnowing-lite: positional rolling hash over 4-token windows,
    // fingerprint = min window hash; docs sharing a fingerprint are
    // near-dup candidates at scale (groupable, no pairwise work)
    "llm_fingerprint" -> ((s, d) =>
      graft.api.TextOps.fingerprint(Tables.t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // FULL winnowing (MOSS selection, guarantee window 5): every
    // 5-hash window's minimum kept, distinct minima = the doc's
    // fingerprint set — any shared run of ≥ 8 tokens between docs is
    // GUARANTEED to share a fingerprint (the property the single-min
    // lite form above only approximates). Per-row fold, shuffle-free;
    // fingerprints bucket docs for candidate generation at scale.
    "llm_winnow" -> ((s, d) =>
      graft.api.TextOps.winnow(Tables.t(s, d, "documents"), "doc_id", "text", w = 5)
        .orderBy(col("doc_id"))),

    // Per-source token/char-length distribution report — the corpus
    // dashboard a curation run reads before setting mixture weights.
    // Percentiles are EXACT (both engines interpolate identically);
    // chars-per-token is a ratio of exact integer sums, never an avg
    // of per-row doubles (float-sum order would break hash parity).
    "llm_length_stats" -> { (s, d) =>
      val toks = size(split(col("text"), " "))
      Tables.t(s, d, "documents")
        .select(col("source"), toks.as("n_toks"), col("n_chars"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_toks")).as("min_toks"),
          max(col("n_toks")).as("max_toks"),
          percentile(col("n_toks"), lit(0.5)).as("p50_toks"),
          percentile(col("n_toks"), lit(0.9)).as("p90_toks"),
          (sum(col("n_chars")).cast("double") / sum(col("n_toks")).cast("double"))
            .as("chars_per_tok"))
        .orderBy(col("source"))
    },

    // Gopher-style repetition filter: drop documents whose most
    // frequent unigram/bigram claims too large a token share.
    // Thresholds sized to the corpus (measured at sf0.01: ratio
    // medians 0.093/0.033) so both outcomes are exercised — 376
    // keep / 124 drop. Spark side is a shuffle-free per-row fold
    // (sorted-run count); the oracle recomputes via unnest + groupBy,
    // a genuinely different formulation of the same semantics.
    "llm_repetition_filter" -> ((s, d) =>
      graft.api.TextOps.repetitionStats(Tables.t(s, d, "documents"), "doc_id", "text")
        .withColumn("keep",
          col("top_tok_ratio") < 0.12 && col("top_bigram_ratio") < 0.06)
        .orderBy(col("doc_id"))),

    // PII scrubbing — the redaction pass a corpus runs before
    // training: emails and phone-shaped strings replaced with typed
    // placeholder tokens, counts reported per doc. The synthetic
    // corpus carries no PII, so a deterministic doc_id-derived
    // injection (docs ≡0 mod 3 get an email, ≡0 mod 5 a phone; the
    // oracle performs the identical construction) makes the redaction
    // path non-vacuous: both scrub and pass-through outcomes occur.
    // Whole pipeline is codegen'd builtins (concat/lpad/regexp_*) —
    // per-row, shuffle-free, linear at any scale.
    "llm_pii_scrub" -> { (s, d) =>
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
      val aug = concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" tel 415-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      Tables.t(s, d, "documents")
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("aug"), lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("aug"), lit(phoneRe), lit(0))).as("n_phones"),
          regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("scrubbed"))
        .orderBy(col("doc_id"))
    }
  )

  private val markerSql = Markers.map { case (l, ms) =>
    val set = ms.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), t -> list_contains([$set], t))) AS s_$l"
  }.mkString(",\n        |    ")

  private val langs = Markers.map(_._1)

  /** First-listed-max CASE chain, evaluated identically by Spark and
    * DuckDB: branch i fires when s_i >= every other score, and CASE's
    * sequential evaluation makes the earliest such lang win ties. */
  private val predSql = {
    val cases = langs.dropRight(1).map { l =>
      val cond = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE '${langs.last}' END"
  }

  val oracle: Map[String, String] = Map(
    "llm_mixture_sample" ->
      s"""WITH k AS (SELECT source, doc_id,
         |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < ($thrSql) AS keep
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept,
         |  coalesce(min(CASE WHEN keep THEN doc_id END), -1) AS first_kept,
         |  coalesce(max(CASE WHEN keep THEN doc_id END), -1) AS last_kept,
         |  CAST(count(CASE WHEN keep THEN 1 END) AS DOUBLE) / count(*) AS kept_frac
         |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "llm_lang_id" ->
      s"""WITH sc AS (SELECT lang,
         |    $markerSql
         |  FROM documents)
         |SELECT lang, $predSql AS predicted, count(*) AS n
         |FROM sc GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    "llm_quality_score" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars_m,
        |  CAST(len(toks) AS INTEGER) AS n_toks,
        |  CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to'], t))) AS DOUBLE)
        |    / len(toks) AS stop_ratio,
        |  CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
        |    / length(text) AS punct_ratio,
        |  CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks) AS mean_tok_len,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS INTEGER) AS bpe_tokens,
        |  CASE WHEN CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to'], t))) AS DOUBLE) / len(toks) < 0.05
        |        AND CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks) >= 4.5 THEN 'high'
        |       WHEN CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to'], t))) AS DOUBLE) / len(toks) < 0.15 THEN 'medium'
        |       ELSE 'low' END AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "llm_repetition_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |u AS (SELECT doc_id, count(*) AS c
        |      FROM (SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY doc_id, tok),
        |um AS (SELECT doc_id, max(c) AS mx FROM u GROUP BY doc_id),
        |b AS (SELECT doc_id, count(*) AS c
        |      FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
        |              i -> tk[i] || ' ' || tk[i + 1])) AS g FROM t) GROUP BY doc_id, g),
        |bm AS (SELECT doc_id, max(c) AS mx FROM b GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(len(tk) AS INTEGER) AS n_toks,
        |  CAST(um.mx AS INTEGER) AS top_tok_n,
        |  CAST(coalesce(bm.mx, 0) AS INTEGER) AS top_bigram_n,
        |  CAST(um.mx AS DOUBLE) / len(tk) AS top_tok_ratio,
        |  CAST(coalesce(bm.mx, 0) AS DOUBLE) / greatest(len(tk) - 1, 1) AS top_bigram_ratio,
        |  (CAST(um.mx AS DOUBLE) / len(tk) < 0.12
        |    AND CAST(coalesce(bm.mx, 0) AS DOUBLE) / greatest(len(tk) - 1, 1) < 0.06) AS keep
        |FROM t JOIN um ON t.doc_id = um.doc_id
        |       LEFT JOIN bm ON t.doc_id = bm.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "llm_winnow" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |h AS (SELECT doc_id,
        |    list_transform(generate_series(1, len(tk) - 3), i ->
        |      (length(tk[i]) * 961 + ord(left(tk[i], 1)) * 31 + ord(right(tk[i], 1))) * 1
        |    + (length(tk[i+1]) * 961 + ord(left(tk[i+1], 1)) * 31 + ord(right(tk[i+1], 1))) * 2
        |    + (length(tk[i+2]) * 961 + ord(left(tk[i+2], 1)) * 31 + ord(right(tk[i+2], 1))) * 3
        |    + (length(tk[i+3]) * 961 + ord(left(tk[i+3], 1)) * 31 + ord(right(tk[i+3], 1))) * 4) AS hs
        |  FROM t WHERE len(tk) >= 8),
        |f AS (SELECT doc_id, list_sort(list_distinct(
        |        list_transform(generate_series(1, len(hs) - 4), i ->
        |          list_aggregate(list_slice(hs, i, i + 4), 'min')))) AS fps
        |      FROM h)
        |SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fps,
        |  coalesce(array_to_string(fps, ','), '') AS fps_csv
        |FROM f ORDER BY doc_id""".stripMargin,
    "llm_length_stats" ->
      """WITH t AS (SELECT source, len(string_split(text, ' ')) AS n_toks, n_chars
        |           FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(n_toks) AS INTEGER) AS min_toks,
        |  CAST(max(n_toks) AS INTEGER) AS max_toks,
        |  quantile_cont(n_toks, 0.5) AS p50_toks,
        |  quantile_cont(n_toks, 0.9) AS p90_toks,
        |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_toks) AS DOUBLE) AS chars_per_tok
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "llm_fingerprint" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |f AS (SELECT doc_id,
        |    list_aggregate(list_transform(generate_series(1, len(tk) - 3), i ->
        |      (length(tk[i]) * 961 + ord(left(tk[i], 1)) * 31 + ord(right(tk[i], 1))) * 1
        |    + (length(tk[i+1]) * 961 + ord(left(tk[i+1], 1)) * 31 + ord(right(tk[i+1], 1))) * 2
        |    + (length(tk[i+2]) * 961 + ord(left(tk[i+2], 1)) * 31 + ord(right(tk[i+2], 1))) * 3
        |    + (length(tk[i+3]) * 961 + ord(left(tk[i+3], 1)) * 31 + ord(right(tk[i+3], 1))) * 4),
        |    'min') AS fp
        |  FROM t WHERE len(tk) >= 4)
        |SELECT doc_id, CAST(fp AS INTEGER) AS fp FROM f ORDER BY doc_id""".stripMargin,
    "llm_pii_scrub" ->
      """WITH a AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |            ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0
        |            THEN ' tel 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |            ELSE '' END AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
        |  regexp_replace(regexp_replace(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |                 '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
        |FROM a ORDER BY doc_id""".stripMargin
  )
}
