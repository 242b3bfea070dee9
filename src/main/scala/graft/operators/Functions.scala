package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.8 scalar-function families (SURVEY.md:253-266).
  * Hive origin: the built-in UDF registry (ql.exec.FunctionRegistry,
  * ql.udf.*). One query per family, many functions per query — all
  * codegen'd builtins, no UDFs.
  *
  * Dialect + determinism notes (probed against DuckDB 1.0.0):
  *  - transcendentals (exp/ln/log/trig/cbrt/hypot) differ across libm
  *    implementations in the last ulp → rendered as FLOAT on both
  *    sides, where sub-ulp noise vanishes.
  *  - int-typed function results: Spark gives INT where DuckDB gives
  *    BIGINT — both sides cast explicitly so pandas dtypes agree.
  *  - DuckDB lacks initcap/sha1/bround/months_between/next_day —
  *    composed from primitives in the oracle where exact (initcap,
  *    next_day) or moved to FunctionSpec golden tests (sha1, crc32,
  *    xxhash64, murmur hash, bround, months_between).
  */
object Functions {

  private def f32(c: org.apache.spark.sql.Column) = c.cast(FloatType)

  val queries: Map[String, Q.QueryFn] = Map(
    "fn_string_basic" -> ((s, d) =>
      Tables.t(s, d, "customer").select(
        col("c_custkey"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cc"),
        concat_ws(":", col("c_name"), col("c_mktsegment")).as("cw"),
        upper(col("c_mktsegment")).as("up"),
        lower(col("c_name")).as("lo"),
        length(col("c_name")).as("len_name"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("tr"),
        ltrim(concat(lit("  "), col("c_mktsegment"))).as("ltr"),
        rtrim(concat(col("c_mktsegment"), lit("  "))).as("rtr"),
        lpad(col("c_name"), 25, "*").as("lp"),
        rpad(col("c_name"), 25, "*").as("rp"),
        substring(col("c_name"), 10, 5).as("sub"),
        instr(col("c_name"), "1").as("in1"),
        locate("2", col("c_name")).as("loc2"),
        initcap(lower(col("c_mktsegment"))).as("ic"),
        reverse(col("c_name")).as("rev"),
        repeat(col("c_mktsegment"), 2).as("rep"),
        translate(col("c_name"), "#0", "_x").as("tl"),
        regexp_replace(col("c_name"), lit("Customer"), lit("Cust")).as("repl"),
        expr("left(c_name, 4)").as("l4"),
        expr("right(c_name, 4)").as("r4"),
        format_string("%s|%d", col("c_mktsegment"), col("c_custkey")).as("fmt"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev"),
        ascii(col("c_name")).as("asc"),
        expr("chr(65 + c_custkey % 26)").as("chr_"),
        expr("split_part(c_name, '#', 2)").as("sp2"))
        .orderBy(col("c_custkey"))),

    "fn_string_regex" -> ((s, d) =>
      Tables.t(s, d, "customer").select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(0*)([1-9][0-9]*)", 2).as("numpart"),
        regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
        size(split(col("c_name"), "0+")).as("n_parts"),
        col("c_name").rlike("00[1-9]").as("has_mid"),
        regexp_count(col("c_name"), lit("0")).cast(IntegerType).as("n_zeros"))
        .orderBy(col("c_custkey"))),

    "fn_date" -> ((s, d) =>
      Tables.t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderdate"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("woy"),
        dayofyear(col("o_orderdate")).as("doy"),
        dateOut(date_add(col("o_orderdate"), 7)).as("d7"),
        dateOut(add_months(col("o_orderdate"), 2)).as("am2"),
        datediff(lit("2002-01-01"), col("o_orderdate")).as("dd"),
        dateOut(last_day(col("o_orderdate"))).as("ld"),
        dateOut(next_day(col("o_orderdate"), "Monday")).as("nd"),
        dateOut(trunc(col("o_orderdate"), "MM")).as("tm"),
        dateOut(date_trunc("MONTH", col("o_orderdate"))).as("dtm"),
        date_format(col("o_orderdate"), "yyyy-MM").as("fmt"),
        dateOut(to_date(lit("1997-03-15"))).as("td"),
        unix_timestamp(col("o_orderdate").cast(TimestampType)).as("ut"),
        from_unixtime(lit(862000000L)).as("fu"),
        dateOut(make_date(lit(1997), lit(5), lit(3))).as("md"),
        hour(lit("1997-03-01 12:34:56").cast(TimestampNTZType)).as("hh"),
        minute(lit("1997-03-01 12:34:56").cast(TimestampNTZType)).as("mi"),
        second(lit("1997-03-01 12:34:56").cast(TimestampNTZType)).as("ss"))
        .orderBy(col("o_orderkey"))),

    "fn_math" -> ((s, d) =>
      Tables.t(s, d, "part").select(
        col("p_partkey"),
        round(col("p_retailprice"), 1).as("r1"),
        floor(col("p_retailprice")).as("fl"),
        ceil(col("p_retailprice")).as("ce"),
        abs(col("p_size") - 25).as("ab"),
        pow(col("p_size"), 2).as("pw"),
        sqrt(col("p_size")).as("sq"),
        f32(cbrt(col("p_size"))).as("cb"),
        f32(exp(col("p_size") / lit(100.0))).as("ex"),
        f32(log(col("p_retailprice"))).as("lnp"),
        f32(log10(col("p_retailprice"))).as("l10"),
        f32(log2(col("p_retailprice"))).as("l2"),
        f32(log(3.0, col("p_retailprice"))).as("l3"),
        f32(sin(col("p_size"))).as("sn"),
        f32(cos(col("p_size"))).as("cs"),
        f32(tan(col("p_size"))).as("tn"),
        f32(asin(lit(1.0) / greatest(col("p_size"), lit(1)))).as("as_"),
        f32(acos(lit(1.0) / greatest(col("p_size"), lit(1)))).as("ac"),
        f32(atan(col("p_size"))).as("at"),
        f32(atan2(col("p_size").cast(DoubleType), lit(3.0))).as("at2"),
        f32(degrees(lit(1.0))).as("dg"),
        f32(radians(lit(180.0))).as("rd"),
        signum(col("p_size") - 25).cast(IntegerType).as("sg"),
        pmod(-col("p_size"), lit(7)).as("pm"),
        (col("p_size") % 7).as("md"),
        greatest(col("p_size"), lit(25)).as("gr"),
        least(col("p_size"), lit(25)).as("le"),
        f32(hypot(col("p_size").cast(DoubleType), lit(3.0))).as("hy"))
        .orderBy(col("p_partkey"))),

    "fn_conditional" -> { (s, d) =>
      val np = nullif(col("o_orderstatus"), lit("O"))
      Tables.t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 100000, "hi").otherwise("lo").as("iff"),
        coalesce(np, lit("none")).as("nvl_"),
        when(np.isNotNull, "has").otherwise("nul").as("nvl2_"),
        np.as("nullif_"),
        coalesce(np, col("o_orderpriority")).as("coal"),
        isnan(lit(Double.NaN)).as("nan_true"),
        isnan(col("o_totalprice")).as("nan_false"),
        nanvl(lit(Double.NaN), col("o_totalprice")).as("nanvl_"),
        np.isNull.as("isnull_"),
        np.isNotNull.as("isnotnull_"))
        .orderBy(col("o_orderkey"))
    },

    "fn_bitwise" -> ((s, d) =>
      Tables.t(s, d, "part").select(
        col("p_partkey"),
        (col("p_size").bitwiseAND(12)).as("band"),
        (col("p_size").bitwiseOR(5)).as("bor"),
        (col("p_size").bitwiseXOR(9)).as("bxor"),
        expr("~p_size").as("bnot"),
        shiftleft(col("p_size"), 2).as("shl"),
        shiftright(col("p_size"), 1).as("shr"),
        bit_count(col("p_size")).cast(IntegerType).as("bc"))
        .orderBy(col("p_partkey"))),

    "fn_array" -> { (s, d) =>
      val toks = split(col("text"), " ")
      Tables.t(s, d, "documents").select(
        col("doc_id"),
        size(toks).as("n_toks"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        array_contains(toks, "spark").as("has_spark"),
        array_join(array_sort(array_distinct(toks)), " ").as("sd"),
        array_position(toks, "data").cast(IntegerType).as("pos_data"),
        array_max(transform(toks, x => length(x))).as("max_len"),
        aggregate(transform(toks, x => length(x)), lit(0), (a, x) => a + x)
          .cast(LongType).as("tot_len"),
        array_join(slice(toks, 1, 3), " ").as("sl"),
        aggregate(sequence(lit(1), size(toks)), lit(0), (a, x) => a + x)
          .cast(LongType).as("seq_sum"),
        aggregate(
          zip_with(transform(toks, x => length(x)), sequence(lit(1), size(toks)),
            (x, y) => x * y),
          lit(0), (a, x) => a + x).cast(LongType).as("zp"),
        array_join(flatten(array(slice(toks, 1, 2), slice(toks, 3, 2))), "|").as("fl"),
        exists(toks, x => x === "join").as("ex"),
        array_join(filter(toks, x => length(x) > 4), " ").as("fil"),
        array_join(array_sort(array_distinct(
          array_union(toks, array(lit("zzz_extra"))))), ",").as("au"),
        array_join(array_sort(array_distinct(
          array_intersect(toks, array(lit("spark"), lit("join"), lit("data"))))), ",").as("ai"),
        array_join(array_sort(array_except(toks, array(lit("the"), lit("a")))), ",").as("ae"))
        .orderBy(col("doc_id"))
    },

    "fn_map" -> { (s, d) =>
      val m = map(lit("id"), col("doc_id"), lit("chars"), col("n_chars"))
      Tables.t(s, d, "documents").select(
        col("doc_id"),
        array_join(array_sort(map_keys(m)), ",").as("keys_csv"),
        aggregate(map_values(m), lit(0L), (a, x) => a + x).as("vals_sum"),
        element_at(m, "id").as("get_id"),
        size(m).cast(IntegerType).as("sz"),
        element_at(map_concat(m, map(lit("x"), lit(1L))), "x").as("mc"),
        element_at(transform_values(m, (_, v) => v * 2), "chars").as("tv"),
        size(map_filter(m, (_, v) => v > 100)).cast(IntegerType).as("mf"),
        element_at(str_to_map(lit("a:1,b:2"), lit(","), lit(":")), "b").as("stm"),
        element_at(map_from_arrays(array(lit("p"), lit("q")), array(col("doc_id"), col("n_chars"))), "q").as("mfa"),
        element_at(map_from_entries(array(struct(lit("e").as("k"), col("doc_id").as("v")))), "e").as("mfe"))
        .orderBy(col("doc_id"))
    },

    "fn_struct" -> { (s, d) =>
      Tables.t(s, d, "nation").select(
        col("n_nationkey"),
        expr("named_struct('k', n_nationkey, 'nm', n_name).nm").as("field_nm"),
        struct(col("n_regionkey"), col("n_nationkey")).getField("n_nationkey").as("anon_field"))
        .orderBy(col("n_nationkey"))
    },

    "fn_json" -> ((s, d) =>
      Tables.t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        expr("from_json(props, 'k INT').k").as("k_int"),
        expr("to_json(named_struct('k', from_json(props, 'k INT').k))").as("tj"),
        schema_of_json(lit("""{"k":1}""")).as("sof"))
        .orderBy(col("event_id"))),

    "fn_hash" -> ((s, d) =>
      Tables.t(s, d, "customer").select(
        col("c_custkey"),
        md5(col("c_name").cast(BinaryType)).as("h_md5"),
        sha2(col("c_name").cast(BinaryType), 256).as("h_sha256"))
        .orderBy(col("c_custkey"))),

    // Error-safe ANSI function family (`try_*`): malformed casts,
    // division by zero, and bigint overflow yield NULL instead of a
    // runtime error — the semantics a 100 TB batch NEEDS, because one
    // bad row must never kill a nine-hour job. The oracle restates
    // each as TRY_CAST / guarded CASE. NULL-bearing bigint columns
    // reach pandas as float64 NaN identically on both compare paths.
    "fn_try" -> ((s, d) =>
      Tables.t(s, d, "customer").select(
        col("c_custkey"),
        expr("try_cast(CASE WHEN c_custkey % 2 = 0 THEN substring(c_name, 10, 9) ELSE c_name END AS INT)")
          .as("maybe_int"),
        expr("try_divide(c_acctbal, c_nationkey)").as("safe_div"),
        expr("try_add(9223372036854775807L, c_custkey)").as("safe_add"))
        .orderBy(col("c_custkey"))),

    // The remaining HiveQL string builtins with clean cross-engine
    // mirrors: levenshtein, translate, repeat, reverse, ascii, chr,
    // overlay (restated in the oracle as left||repl||substring).
    "fn_string_extra" -> ((s, d) =>
      Tables.t(s, d, "customer").select(
        col("c_custkey"),
        levenshtein(col("c_name"), reverse(col("c_name"))).as("lev_rev"),
        translate(col("c_name"), "Cust", "Kvst").as("trans"),
        repeat(lower(col("c_mktsegment")), 2).as("rep2"),
        reverse(col("c_name")).as("revd"),
        ascii(col("c_name")).as("first_code"),
        chr(lit(65) + (col("c_custkey") % 26)).as("letter"),
        overlay(col("c_name"), lit("XX"), lit(2), lit(3)).as("ovl"))
        .orderBy(col("c_custkey"))),

    // Hive's URL/masking function family: parse_url (HOST/PATH/QUERY
    // + per-key query extraction) over URLs constructed from customer
    // attributes, and mask() (upper→X, lower→x, digit→n). The oracle
    // restates both as RE2 regexes — deterministic per row.
    "fn_url_mask" -> { (s, d) =>
      val url = concat(lit("https://shop.example.org/c/"),
        col("c_custkey").cast(StringType),
        lit("?seg="), lower(col("c_mktsegment")),
        lit("&nat="), col("c_nationkey").cast(StringType))
      Tables.t(s, d, "customer").select(
        col("c_custkey"),
        url.as("url"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("QUERY"), lit("seg")).as("seg"),
        mask(col("c_name")).as("masked_name"))
        .orderBy(col("c_custkey"))
    },

    // Hive's binary/radix encoding builtins (UDFBase64, UDFHex,
    // UDFConv, GenericUDFEncode/Decode): base64 and hex both as
    // one-way renderings AND as full roundtrips back to the original
    // string (a one-way match could pass with both engines wrong in
    // the same direction; the roundtrip pins the inverse too), plus
    // radix conversion to base 16 and 2 (DuckDB to_base — both
    // engines render uppercase digits without padding).
    "fn_encoding" -> ((s, d) =>
      Tables.t(s, d, "customer").select(
        col("c_custkey"),
        base64(encode(col("c_name"), "UTF-8")).as("b64"),
        decode(unbase64(base64(encode(col("c_name"), "UTF-8"))), "UTF-8").as("b64_rt"),
        hex(col("c_custkey")).as("hx_num"),
        hex(encode(col("c_mktsegment"), "UTF-8")).as("hx_str"),
        decode(unhex(hex(encode(col("c_mktsegment"), "UTF-8"))), "UTF-8").as("hx_rt"),
        conv(col("c_custkey").cast(StringType), 10, 16).as("cv16"),
        conv(col("c_custkey").cast(StringType), 10, 2).as("cv2"))
        .orderBy(col("c_custkey"))),

    // Hive's statistical text builtins (GenericUDTFSentences family):
    // BreakIterator sentence + word segmentation via `sentences()`,
    // cross-checked against a CLOSED-FORM oracle. The corpus is
    // lowercase words + single spaces (LlmSpec asserts the charset
    // invariant), so (a) unpunctuated text is exactly one sentence,
    // (b) after deterministically injecting a period every 10 words
    // the sentence count is ceil(words/10) — the text is uppercased
    // first because BreakIterator only breaks a sentence when the
    // next one starts with a capital ('three. four' is ONE sentence,
    // 'THREE. FOUR' is two; measured) — and (c) the segmented
    // word total equals the whitespace token count — all three are
    // exact SQL on the DuckDB side, so the engine's real segmentation
    // is hash-checked, not just smoke-tested. Rolled up per
    // (lang, 100-char length bin) — the deterministic equi-width
    // histogram idiom; the approximate `histogram_numeric` twin is
    // bins-are-algorithm-specific and lives in AggregateSpec with
    // property bounds (same allowance as agg_approx_percentile).
    "fn_text_stats" -> ((s, d) =>
      Tables.t(s, d, "documents")
        .select(col("lang"), col("n_chars"),
          size(sentences(col("text"))).as("n_sent_flat"),
          sentences(regexp_replace(upper(col("text")),
            lit("((\\w+ ){9}\\w+) "), lit("$1. "))).as("sent10"),
          size(split(col("text"), " ")).as("n_words_ws"))
        .select(col("lang"), col("n_chars"), col("n_sent_flat"),
          size(col("sent10")).as("n_sent10"),
          expr("aggregate(sent10, 0, (a, x) -> a + size(x))").as("n_words_seg"),
          col("n_words_ws"))
        .groupBy(col("lang"),
          (expr("n_chars div 100") * 100).cast(LongType).as("len_bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_sent_flat")).cast(LongType).as("n_sent_flat"),
          sum(col("n_sent10")).cast(LongType).as("n_sentences"),
          sum(col("n_words_seg")).cast(LongType).as("n_words_seg"),
          sum(col("n_words_ws")).cast(LongType).as("n_words_ws"))
        .orderBy(col("lang"), col("len_bin"))),

    // Hive's `context_ngrams(sentences(...), array(w1, w2, null), k)`
    // — the last statistical-text builtin without a row (VERDICT r16
    // #6): top-k words FOLLOWING a fixed 2-token context, exact
    // counts, deterministic tie-break. The context itself is
    // data-derived deterministically (the most frequent
    // trigram-prefix bigram, ties broken lexicographically) so the
    // key is self-contained at every SF; the oracle replays the
    // identical selection. Plan shape at 100 TB (r22: ONE corpus
    // explode, not two): the raw trigram stream aggregates once to
    // exact (w1, w2, w3) counts — partial-aggregable, so the shuffle
    // carries distinct trigrams, not corpus rows — and BOTH consumers
    // derive from that relation: the context as a re-aggregation
    // (Σ over w3 of the trigram counts IS the bigram-prefix count —
    // exact integers) + TakeOrdered(1), the answer as a broadcast of
    // the 1-row context onto the counts. The pre-r22 form inlined the
    // explode into both branches (Spark does not CSE across join
    // branches), paying a second full corpus pass for the join side.
    // The counts relation is pinned once (localCheckpoint — the same
    // trade as llm_pmi's unigram/bigram count pins, r21: a COUNT
    // relation is corpus-sublinear where the explode it replaces is
    // corpus-linear); pinning, not AQE stage reuse, because the two
    // consumers' exchange subtrees stop canonicalizing equal the
    // moment the join pushes its key null-filters into one branch.
    "fn_context_ngrams" -> { (s, d) =>
      val tcnt = Tables.t(s, d, "documents")
        .select(split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 3)
        .select(explode(expr(
          "transform(sequence(0, size(tk) - 3), " +
            "i -> struct(tk[i] AS w1, tk[i+1] AS w2, tk[i+2] AS w3))")).as("g"))
        .select(col("g.w1"), col("g.w2"), col("g.w3"))
        .groupBy(col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val ctx = tcnt.groupBy(col("w1"), col("w2"))
        .agg(sum(col("n")).as("n"))
        .orderBy(col("n").desc, col("w1"), col("w2")).limit(1)
        .select(col("w1"), col("w2"))
      tcnt.join(broadcast(ctx), Seq("w1", "w2"))
        .select(concat_ws(" ", col("w1"), col("w2")).as("context"),
          col("w3").as("following"), col("n"))
        .orderBy(col("n").desc, col("following")).limit(5)
    },

    // Hive's XPath UDF family (`ql.udf.xml.*` — `xpath`,
    // `xpath_string`, `xpath_boolean`, `xpath_long`, `xpath_double`):
    // the "query XML logs in place" surface. The XML is CONSTRUCTED
    // from customer columns, so the oracle restates every extraction
    // from the base columns exactly — if any axis/typing rule drifted
    // (text() node lists, numeric sum() over a node-set, existence
    // tests, absent-path defaults), the roundtrip breaks under the
    // hash. All are codegen-registered builtins through the SQL
    // registry; at 100 TB this is a per-row scalar map, no shuffle.
    "fn_xpath" -> ((s, d) =>
      Tables.t(s, d, "customer")
        .select(col("c_custkey"),
          concat(lit("<r><k>"), col("c_custkey"),
            lit("</k><seg>"), col("c_mktsegment"),
            lit("</seg><ns><n>"), col("c_custkey") % 5,
            lit("</n><n>"), col("c_custkey") % 7,
            lit("</n></ns></r>")).as("xml"))
        .select(col("c_custkey"),
          expr("xpath_long(xml, '/r/k')").as("xk"),
          expr("xpath_string(xml, '/r/seg')").as("xseg"),
          expr("xpath_boolean(xml, '/r/ns')").as("has_ns"),
          expr("xpath_boolean(xml, '/r/missing')").as("has_missing"),
          expr("xpath_double(xml, 'sum(/r/ns/n)')").as("nsum"),
          array_join(expr("xpath(xml, '/r/ns/n/text()')"), ",").as("ns_list"))
        .orderBy(col("c_custkey"))),

    // inherently engine-specific: properties asserted, no oracle
    "fn_misc" -> { (s, d) =>
      val base = Tables.raw(s, d, "nation").select(
        monotonically_increasing_id().as("mid"),
        spark_partition_id().as("pid"),
        input_file_name().as("fn"),
        expr("uuid()").as("u"))
      base.agg(
        (countDistinct(col("mid")) === count(lit(1))).as("mid_unique"),
        (min(col("pid")) >= 0).as("pid_nonneg"),
        expr("bool_and(fn LIKE '%parquet%')").as("file_ok"),
        expr("bool_and(u RLIKE '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$')").as("uuid_ok"),
        (current_date().isNotNull && current_timestamp().isNotNull).as("now_ok"))
    }
  )

  val oracle: Map[String, String] = Map(
    // the XML was constructed from these very columns, so each
    // extraction restates as the source expression (xpath_long →
    // BIGINT, sum() over the node-set → DOUBLE, text() list →
    // comma-join, existence → constant booleans)
    "fn_xpath" ->
      """SELECT c_custkey,
        |  CAST(c_custkey AS BIGINT) AS xk,
        |  c_mktsegment AS xseg,
        |  TRUE AS has_ns,
        |  FALSE AS has_missing,
        |  CAST(c_custkey % 5 + c_custkey % 7 AS DOUBLE) AS nsum,
        |  CAST(c_custkey % 5 AS VARCHAR) || ',' || CAST(c_custkey % 7 AS VARCHAR) AS ns_list
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // the roundtrip columns restate as the IDENTITY — if either
    // direction of either codec drifted, the rt columns would differ
    "fn_encoding" ->
      """SELECT c_custkey,
        |  base64(encode(c_name)) AS b64,
        |  c_name AS b64_rt,
        |  hex(c_custkey) AS hx_num,
        |  hex(encode(c_mktsegment)) AS hx_str,
        |  c_mktsegment AS hx_rt,
        |  to_base(c_custkey, 16) AS cv16,
        |  to_base(c_custkey, 2) AS cv2
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // identical data-derived context selection + exact following-word
    // counts, replayed in DuckDB (lists are 1-based there: g runs
    // 1..len-2 via end-exclusive range)
    "fn_context_ngrams" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |  idx AS (SELECT tk, unnest(range(1, len(tk) - 1)) AS g
        |          FROM toks WHERE len(tk) >= 3),
        |  tri AS (SELECT tk[g] AS w1, tk[g+1] AS w2, tk[g+2] AS w3 FROM idx),
        |  big AS (SELECT w1, w2, count(*) AS n FROM tri GROUP BY 1, 2),
        |  ctx AS (SELECT w1, w2 FROM big ORDER BY n DESC, w1, w2 LIMIT 1),
        |  fol AS (SELECT t.w1, t.w2, t.w3, count(*) AS n
        |          FROM tri t JOIN ctx USING (w1, w2) GROUP BY 1, 2, 3)
        |SELECT w1 || ' ' || w2 AS context, w3 AS following, n
        |FROM fol ORDER BY n DESC, following LIMIT 5""".stripMargin,
    // closed-form restatement of BreakIterator segmentation on the
    // asserted single-space lowercase corpus: 1 sentence per
    // unpunctuated doc, ceil(words/10) after the every-10-words
    // period injection, segmented words == whitespace tokens
    "fn_text_stats" ->
      """WITH t AS (SELECT lang, n_chars,
        |    CASE WHEN regexp_full_match(text, '[a-z]+( [a-z]+)*')
        |         THEN len(string_split(text, ' '))
        |         ELSE CAST(error('corpus violates the lowercase-single-space invariant the closed-form segmentation oracle needs') AS BIGINT)
        |    END AS w FROM documents)
        |SELECT lang, CAST((n_chars // 100) * 100 AS BIGINT) AS len_bin,
        |  count(*) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_sent_flat,
        |  CAST(sum((w + 9) // 10) AS BIGINT) AS n_sentences,
        |  CAST(sum(w) AS BIGINT) AS n_words_seg,
        |  CAST(sum(w) AS BIGINT) AS n_words_ws
        |FROM t GROUP BY 1, 2 ORDER BY lang, len_bin""".stripMargin,
    "fn_string_basic" ->
      """SELECT c_custkey,
        |  c_name || '-' || c_mktsegment AS cc,
        |  concat_ws(':', c_name, c_mktsegment) AS cw,
        |  upper(c_mktsegment) AS up,
        |  lower(c_name) AS lo,
        |  CAST(length(c_name) AS INTEGER) AS len_name,
        |  trim('  ' || c_mktsegment || '  ') AS tr,
        |  ltrim('  ' || c_mktsegment) AS ltr,
        |  rtrim(c_mktsegment || '  ') AS rtr,
        |  lpad(c_name, 25, '*') AS lp,
        |  rpad(c_name, 25, '*') AS rp,
        |  substring(c_name, 10, 5) AS sub,
        |  CAST(strpos(c_name, '1') AS INTEGER) AS in1,
        |  CAST(strpos(c_name, '2') AS INTEGER) AS loc2,
        |  upper(left(lower(c_mktsegment), 1)) || substring(lower(c_mktsegment), 2) AS ic,
        |  reverse(c_name) AS rev,
        |  repeat(c_mktsegment, 2) AS rep,
        |  translate(c_name, '#0', '_x') AS tl,
        |  replace(c_name, 'Customer', 'Cust') AS repl,
        |  left(c_name, 4) AS l4,
        |  right(c_name, 4) AS r4,
        |  printf('%s|%d', c_mktsegment, c_custkey) AS fmt,
        |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS lev,
        |  CAST(ord(c_name) AS INTEGER) AS asc,
        |  chr(CAST(65 + c_custkey % 26 AS INTEGER)) AS chr_,
        |  split_part(c_name, '#', 2) AS sp2
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_string_regex" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, 'Customer#(0*)([1-9][0-9]*)', 2) AS numpart,
        |  regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
        |  CAST(len(string_split_regex(c_name, '0+')) AS INTEGER) AS n_parts,
        |  regexp_matches(c_name, '00[1-9]') AS has_mid,
        |  CAST(len(regexp_extract_all(c_name, '0')) AS INTEGER) AS n_zeros
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow,
        |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS woy,
        |  CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS doy,
        |  CAST(CAST(o_orderdate AS DATE) + CAST(7 AS INTEGER) AS TIMESTAMP) AS d7,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS TIMESTAMP) AS am2,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS dd,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS ld,
        |  CAST(CAST(o_orderdate AS DATE) + CAST(((7 - isodow(CAST(o_orderdate AS DATE))) % 7) + 1 AS INTEGER) AS TIMESTAMP) AS nd,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS TIMESTAMP) AS tm,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS dtm,
        |  strftime(o_orderdate, '%Y-%m') AS fmt,
        |  TIMESTAMP '1997-03-15 00:00:00' AS td,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS ut,
        |  strftime(CAST(to_timestamp(862000000) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS fu,
        |  CAST(make_date(1997, 5, 3) AS TIMESTAMP) AS md,
        |  CAST(12 AS INTEGER) AS hh, CAST(34 AS INTEGER) AS mi, CAST(56 AS INTEGER) AS ss
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT p_partkey,
        |  round(p_retailprice, 1) AS r1,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  abs(p_size - 25) AS ab,
        |  pow(p_size, 2) AS pw,
        |  sqrt(p_size) AS sq,
        |  CAST(cbrt(p_size) AS REAL) AS cb,
        |  CAST(exp(p_size / 100.0) AS REAL) AS ex,
        |  CAST(ln(p_retailprice) AS REAL) AS lnp,
        |  CAST(log10(p_retailprice) AS REAL) AS l10,
        |  CAST(log2(p_retailprice) AS REAL) AS l2,
        |  CAST(log(3.0, p_retailprice) AS REAL) AS l3,
        |  CAST(sin(p_size) AS REAL) AS sn,
        |  CAST(cos(p_size) AS REAL) AS cs,
        |  CAST(tan(p_size) AS REAL) AS tn,
        |  CAST(asin(1.0 / greatest(p_size, 1)) AS REAL) AS as_,
        |  CAST(acos(1.0 / greatest(p_size, 1)) AS REAL) AS ac,
        |  CAST(atan(p_size) AS REAL) AS at,
        |  CAST(atan2(CAST(p_size AS DOUBLE), 3.0) AS REAL) AS at2,
        |  CAST(degrees(1.0) AS REAL) AS dg,
        |  CAST(radians(180.0) AS REAL) AS rd,
        |  CAST(sign(p_size - 25) AS INTEGER) AS sg,
        |  (((-p_size) % 7) + 7) % 7 AS pm,
        |  p_size % 7 AS md,
        |  greatest(p_size, 25) AS gr,
        |  least(p_size, 25) AS le,
        |  CAST(sqrt(CAST(p_size AS DOUBLE) * p_size + 9.0) AS REAL) AS hy
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 100000 THEN 'hi' ELSE 'lo' END AS iff,
        |  coalesce(nullif(o_orderstatus, 'O'), 'none') AS nvl_,
        |  CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL THEN 'has' ELSE 'nul' END AS nvl2_,
        |  nullif(o_orderstatus, 'O') AS nullif_,
        |  coalesce(nullif(o_orderstatus, 'O'), o_orderpriority) AS coal,
        |  isnan('NaN'::DOUBLE) AS nan_true,
        |  isnan(o_totalprice) AS nan_false,
        |  o_totalprice AS nanvl_,
        |  nullif(o_orderstatus, 'O') IS NULL AS isnull_,
        |  nullif(o_orderstatus, 'O') IS NOT NULL AS isnotnull_
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_bitwise" ->
      """SELECT p_partkey,
        |  p_size & 12 AS band,
        |  p_size | 5 AS bor,
        |  xor(p_size, 9) AS bxor,
        |  ~p_size AS bnot,
        |  p_size << 2 AS shl,
        |  p_size >> 1 AS shr,
        |  CAST(bit_count(p_size) AS INTEGER) AS bc
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_array" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_toks,
        |  toks[1] AS first_tok,
        |  toks[-1] AS last_tok,
        |  list_contains(toks, 'spark') AS has_spark,
        |  array_to_string(list_sort(list_distinct(toks)), ' ') AS sd,
        |  CAST(list_position(toks, 'data') AS INTEGER) AS pos_data,
        |  CAST(list_aggregate(list_transform(toks, x -> length(x)), 'max') AS INTEGER) AS max_len,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tot_len,
        |  array_to_string(list_slice(toks, 1, 3), ' ') AS sl,
        |  CAST(list_sum(generate_series(1, len(toks))) AS BIGINT) AS seq_sum,
        |  CAST(list_sum(list_transform(list_zip(list_transform(toks, x -> length(x)),
        |       generate_series(1, len(toks))), p -> p[1] * p[2])) AS BIGINT) AS zp,
        |  array_to_string(flatten([list_slice(toks, 1, 2), list_slice(toks, 3, 4)]), '|') AS fl,
        |  len(list_filter(toks, x -> x = 'join')) > 0 AS ex,
        |  coalesce(array_to_string(list_filter(toks, x -> length(x) > 4), ' '), '') AS fil,
        |  array_to_string(list_sort(list_distinct(list_concat(toks, ['zzz_extra']))), ',') AS au,
        |  coalesce(array_to_string(list_sort(list_distinct(list_intersect(toks, ['spark','join','data']))), ','), '') AS ai,
        |  coalesce(array_to_string(list_sort(list_distinct(list_filter(toks, x -> NOT list_contains(['the','a'], x)))), ','), '') AS ae
        |FROM t ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT doc_id,
        |  'chars,id' AS keys_csv,
        |  doc_id + n_chars AS vals_sum,
        |  doc_id AS get_id,
        |  CAST(2 AS INTEGER) AS sz,
        |  CAST(1 AS BIGINT) AS mc,
        |  n_chars * 2 AS tv,
        |  CAST((CASE WHEN doc_id > 100 THEN 1 ELSE 0 END)
        |     + (CASE WHEN n_chars > 100 THEN 1 ELSE 0 END) AS INTEGER) AS mf,
        |  '2' AS stm,
        |  n_chars AS mfa,
        |  doc_id AS mfe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_struct" ->
      """SELECT n_nationkey,
        |  struct_pack(k := n_nationkey, nm := n_name).nm AS field_nm,
        |  struct_pack(r := n_regionkey, n := n_nationkey).n AS anon_field
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INTEGER))) AS VARCHAR) AS tj,
        |  'STRUCT<k: BIGINT>' AS sof
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_try" ->
      """SELECT c_custkey,
        |  TRY_CAST(CASE WHEN c_custkey % 2 = 0 THEN substring(c_name, 10, 9)
        |                ELSE c_name END AS INTEGER) AS maybe_int,
        |  CASE WHEN c_nationkey = 0 THEN NULL ELSE c_acctbal / c_nationkey END AS safe_div,
        |  CASE WHEN c_custkey > 0 THEN NULL
        |       ELSE 9223372036854775807 + c_custkey END AS safe_add
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_string_extra" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, reverse(c_name)) AS INTEGER) AS lev_rev,
        |  translate(c_name, 'Cust', 'Kvst') AS trans,
        |  repeat(lower(c_mktsegment), 2) AS rep2,
        |  reverse(c_name) AS revd,
        |  CAST(ascii(c_name) AS INTEGER) AS first_code,
        |  chr(CAST(65 + c_custkey % 26 AS INTEGER)) AS letter,
        |  left(c_name, 1) || 'XX' || substring(c_name, 5) AS ovl
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_url_mask" ->
      """WITH u AS (SELECT c_custkey, c_name,
        |    'https://shop.example.org/c/' || CAST(c_custkey AS VARCHAR)
        |      || '?seg=' || lower(c_mktsegment)
        |      || '&nat=' || CAST(c_nationkey AS VARCHAR) AS url
        |  FROM customer)
        |SELECT c_custkey, url,
        |  regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]*(/[^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query,
        |  regexp_extract(url, 'seg=([^&#]*)', 1) AS seg,
        |  regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked_name
        |FROM u ORDER BY c_custkey""".stripMargin,
    "fn_hash" ->
      """SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
