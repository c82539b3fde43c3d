package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Q

/** Text-analysis operators for a training-data pipeline (builder contract):
  * token counting, type-token quality stats, stopword-based language
  * scoring, document fingerprinting, repetition quality signals. All pure
  * per-row expressions over `documents` — map-side, zero shuffle at 100 TB
  * (the final ORDER BY is presentation-only for the oracle compare) —
  * except x17's token-mode histogram, whose single exchange
  * partial-aggregates map-side (plan choice measured in its comment).
  */
object TextAnalysis {

  private def toks: Column = split(col("text"), " ")

  val x5_text_stats = Q(
    "x5_text_stats",
    """SELECT doc_id,
      |       length(text) AS n_chars,
      |       len(string_split(text, ' ')) AS n_tokens,
      |       len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |         / len(string_split(text, ' ')) AS ttr
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { t =>
    // Quality scoring: char/token counts + type-token ratio (the
    // distinct-vocabulary signal used for boilerplate detection).
    t.documents
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"))
      .orderBy("doc_id")
  }

  val x6_stopword_langscore = Q(
    "x6_stopword_langscore",
    """SELECT doc_id, lang,
      |       CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
      |            AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
      |       CASE WHEN CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
      |                 AS DOUBLE) / len(string_split(text, ' ')) >= 0.05
      |            THEN 'en-like' ELSE 'other' END AS pred
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { t =>
    // Language-ID heuristic: English-stopword density. (The synthetic corpus
    // shares one vocabulary across langs, so this demonstrates the operator
    // shape, not classifier accuracy — the n-gram profile variant lives in
    // functions.TextFunctions for real text.)
    val stops = size(filter(toks, x => x.isin("the", "a"))).cast("double") / size(toks)
    t.documents
      .select(
        col("doc_id"),
        col("lang"),
        stops.as("stop_ratio"),
        when(stops >= 0.05, "en-like").otherwise("other").as("pred"))
      .orderBy("doc_id")
  }

  val x7_regex_tokens = Q(
    "x7_regex_tokens",
    """SELECT doc_id,
      |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_ish,
      |       len(regexp_extract_all(text, '[a-z]{4,}')) AS n_long_words
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { t =>
    // Token counting: whitespace-free BPE-ish regex segmentation (letters /
    // digits / single symbol per token). Patterns restricted to constructs
    // with identical semantics in Java regex and RE2.
    t.documents
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast("long").as("n_bpe_ish"),
        size(regexp_extract_all(col("text"), lit("[a-z]{4,}"), lit(0)))
          .cast("long").as("n_long_words"))
      .orderBy("doc_id")
  }

  val x8_fingerprint = Q(
    "x8_fingerprint",
    """SELECT doc_id, CAST(SUM(ascii(substring(text, i, 1)) * i) % 1000000007 AS BIGINT) AS fp
      |FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i FROM documents)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  ) { t =>
    // Document fingerprint: position-weighted character hash mod 1e9+7 —
    // order-sensitive (permutation-detecting), pure integer arithmetic so
    // engine-exact. Computed with a higher-order fold, no explode: stays a
    // single map-side projection.
    //
    // Chars come from split(text, "") rather than substr(i, 1) per position:
    // each substr re-scans the string from the front, making the fold
    // O(n^2) per document — measured 4x slower at sf0.1 (4.27s vs 1.08s).
    // A trailing "" element from split contributes ascii("") = 0, so the
    // sum — and the oracle SQL — are unchanged.
    val codes = transform(
      split(col("text"), ""),
      (x, i) => ascii(x).cast("long") * (i.cast("long") + 1L))
    t.documents
      .select(
        col("doc_id"),
        (aggregate(codes, lit(0L), (acc, x) => acc + x) % 1000000007L).as("fp"))
      .orderBy("doc_id")
  }

  val x12_lang_id = Q(
    "x12_lang_id",
    """SELECT doc_id,
      |  CASE doc_id % 8
      |    WHEN 0 THEN 'en' WHEN 1 THEN 'es' WHEN 2 THEN 'fr' WHEN 3 THEN 'de'
      |    WHEN 4 THEN 'it' WHEN 5 THEN 'pt' WHEN 6 THEN 'nl' ELSE 'und'
      |  END AS expected_lang,
      |  CASE doc_id % 8
      |    WHEN 0 THEN 'en' WHEN 1 THEN 'es' WHEN 2 THEN 'fr' WHEN 3 THEN 'de'
      |    WHEN 4 THEN 'it' WHEN 5 THEN 'pt' WHEN 6 THEN 'nl' ELSE 'und'
      |  END AS detected_lang
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { t =>
    // Multi-language ID (SURVEY text-analysis extension): the lang_id UDF's
    // argmax over 7 stopword profiles, driver-checked on synthesized
    // unambiguous sentences (each dominated by its own language's function
    // words, with deliberate overlap forms like de/la/que present). The
    // oracle states the expected argmax per variant; x6 covers the
    // score-computation arithmetic, TextFunctionsSpec the tie/noise edges.
    import graft.functions.TextFunctions
    val sample = when(col("doc_id") % 8 === 0, lit("the quick fox and the dog that is in this yard for a while"))
      .when(col("doc_id") % 8 === 1, lit("el perro y la casa es un lugar en los pueblos del valle"))
      .when(col("doc_id") % 8 === 2, lit("le chien est dans les rues et nous avons du pain pour vous"))
      .when(col("doc_id") % 8 === 3, lit("der hund und die katze ist von einem haus zu dem garten mit uns"))
      .when(col("doc_id") % 8 === 4, lit("il cane che corre e la casa per una strada del paese si vede"))
      .when(col("doc_id") % 8 === 5, lit("o cão que corre e a casa para os meninos com uma rua não"))
      .when(col("doc_id") % 8 === 6, lit("de hond en de kat is van het huis op een tafel met niet veel"))
      .otherwise(lit("zzz qqq xyz www vvv"))
    val expected = when(col("doc_id") % 8 === 0, "en").when(col("doc_id") % 8 === 1, "es")
      .when(col("doc_id") % 8 === 2, "fr").when(col("doc_id") % 8 === 3, "de")
      .when(col("doc_id") % 8 === 4, "it").when(col("doc_id") % 8 === 5, "pt")
      .when(col("doc_id") % 8 === 6, "nl").otherwise("und")
    t.documents
      .select(col("doc_id"), expected.as("expected_lang"),
        TextFunctions.lang_id(sample).as("detected_lang"))
      .orderBy("doc_id")
  }

  val x17_repetition_stats = Q(
    "x17_repetition_stats",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |hist AS (
      |  SELECT doc_id, tk, count(*) AS c
      |  FROM (SELECT doc_id, unnest(w) AS tk FROM w) GROUP BY doc_id, tk),
      |per AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |         CAST(max(c) AS BIGINT) AS top_c
      |  FROM hist GROUP BY doc_id),
      |bg AS (
      |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM w)),
      |bgs AS (
      |  SELECT doc_id, count(*) AS n_g, count(DISTINCT g) AS n_dg
      |  FROM bg GROUP BY doc_id)
      |SELECT p.doc_id, p.n_tokens,
      |       round(CAST(p.top_c AS DOUBLE) / p.n_tokens, 6) AS top_token_frac,
      |       coalesce(round(1.0 - CAST(b.n_dg AS DOUBLE) / b.n_g, 6), 0.0) AS dup_bigram_frac
      |FROM per p LEFT JOIN bgs b ON b.doc_id = p.doc_id
      |ORDER BY p.doc_id""".stripMargin,
  ) { t =>
    // Repetition-based quality signals (the Gopher-rule family of corpus
    // filters): top-token fraction (mode frequency / doc length) flags
    // keyword-stuffed docs, duplicate-bigram fraction flags boilerplate
    // loops. ZERO SHUFFLE: the token mode is the longest equal run of the
    // SORTED token array, computed by one aggregate fold per row — the
    // oracle's explode + GROUP BY histogram produces the same number, but
    // at 100 TB the fold form keeps this a pure map-side scan like the
    // rest of TextAnalysis (the first cut shuffled a (doc, token)
    // histogram + a join: 3.7s at sf0.1 vs 0.9s for this form). Each
    // array expression is referenced exactly once — CollapseProject
    // inlines repeated expressions into every use site (the x2 lesson).
    // Fractions are single double divisions — engine-exact.
    // Three plans measured at sf0.1 before settling on this one:
    //  (a) THIS: token histogram (explode + two codegen'd hash aggs, the
    //      (doc,tk) exchange partial-aggregates map-side) + a doc_id join
    //      against the map-side bigram projection — 1.7s;
    //  (b) zero-shuffle mode-as-longest-sorted-run via an aggregate() fold
    //      — scale-shaped but 3.1s: higher-order folds with struct state
    //      are interpreted, hash aggregates are codegen'd;
    //  (c) carrying the bigram fraction THROUGH the explode — 84s(!): the
    //      per-doc gram expression collapses into the generate projection
    //      and re-runs per TOKEN row. Expression barriers matter more
    //      than shuffle counts here.
    val hist = t.documents
      .select(col("doc_id"), explode(toks).as("tk"))
      .groupBy("doc_id", "tk")
      .agg(count(lit(1)).as("c"))
    val per = hist.groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), max("c").as("top_c"))
    // gram array referenced exactly ONCE (CollapseProject inlines repeated
    // expressions into every use site — the x2 lesson); n_g = size-1.
    // zip_with, not transform(sequence): a lambda capturing the inline
    // split() re-evaluates it per ELEMENT (the r13 x87 lesson)
    val grams = zip_with(
      slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))
    val bigram = t.documents.select(
      col("doc_id"),
      when(size(toks) >= 2,
        round(lit(1.0) - size(array_distinct(grams)).cast("double") / (size(toks) - 1), 6))
        .otherwise(lit(0.0)).as("dup_bigram_frac"))
    per
      .join(bigram, "doc_id")
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("top_c").cast("double") / col("n_tokens"), 6).as("top_token_frac"),
        col("dup_bigram_frac"))
      .orderBy("doc_id")
  }

  val x43_bm25_topk = Q(
    "x43_bm25_topk",
    """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |d AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM docs),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
      |tok AS (SELECT doc_id, unnest(toks) AS w FROM docs),
      |tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf FROM tok
      |       WHERE w IN ('join', 'stream', 'filter') GROUP BY doc_id, w),
      |dfreq AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w),
      |s AS (SELECT tf.doc_id, tf.w,
      |        ln(CAST(1.0 AS DOUBLE) + (n_docs - dfreq.df + CAST(0.5 AS DOUBLE)) / (dfreq.df + CAST(0.5 AS DOUBLE)))
      |          * tf.tf * CAST(2.2 AS DOUBLE)
      |          / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * d.dl / avgdl)) AS s
      |      FROM tf JOIN d ON tf.doc_id = d.doc_id JOIN dfreq ON dfreq.w = tf.w, stats)
      |SELECT doc_id,
      |       round(COALESCE(max(CASE WHEN w = 'join' THEN s END), 0)
      |             + COALESCE(max(CASE WHEN w = 'stream' THEN s END), 0)
      |             + COALESCE(max(CASE WHEN w = 'filter' THEN s END), 0), 6) AS score
      |FROM s GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
  ) { t =>
    // BM25 keyword retrieval (k1=1.2, b=0.75) as one dataflow — the
    // lexical half of a retrieval stack next to the ANN family (x9/x18/
    // x31). Tokens filter to the QUERY TERMS before any aggregation, so
    // the tf table is (matching docs x query terms) — at 100 TB the
    // inverted-index statistics for a 3-term query never touch non-
    // matching tokens after the scan projection; df/idf frames are
    // broadcast (3 rows) and the doc-length stats one row. Cross-engine
    // float discipline: ln() can differ by 1 ulp between libm and JVM, so
    // scores round to 6 decimals; per-term contributions combine in a
    // FIXED order (the CASE pivot) because a 3-way float sum under
    // partial aggregation could re-associate; ordering uses the ROUNDED
    // score + doc_id tiebreak in both engines. k=20 plans as
    // TakeOrderedAndProject (per-partition top-k, no global sort).
    val terms = Seq("join", "stream", "filter")
    val docs = t.documents.select(col("doc_id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    val tf = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
      .filter(col("w").isInCollection(terms))
      .groupBy("doc_id", "dl", "w").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    def term(w: String): Column =
      coalesce(max(when(col("w") === w, col("s"))), lit(0.0))
    tf.join(broadcast(dfreq), "w").crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * col("tf") * lit(2.2)
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(term("join") + term("stream") + term("filter"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** Sliding-window document chunking — the context-window prep step of
    * every training/RAG pipeline: `chunkTokens`-token windows every
    * `stride` tokens, consecutive full chunks overlapping by
    * chunkTokens - stride. The start sequence runs to
    * ceil((len - chunkTokens) / stride) * stride, NOT len - chunkTokens:
    * the final (possibly short) window is the one that covers the
    * document tail — truncating at len - chunkTokens silently drops up to
    * stride - 1 trailing tokens per document (spec pins exact coverage).
    *
    * Pure map-side: split → per-row start sequence (≤ len/stride
    * elements) → explode → slice. Zero shuffle at any corpus size; chunk
    * output order is the input partition order, so downstream packing /
    * tokenization continues without an exchange. The explode multiplies
    * rows, not bytes read — each chunk row slices the SAME in-memory
    * token array.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      s"chunk=$chunkTokens stride=$stride: stride must be in (0, chunkTokens]")
    val ts = split(col(textCol), " ")
    val lastStart = greatest(
      ceil((size(ts) - chunkTokens).cast("double") / stride).cast("long") * stride,
      lit(0L))
    docs
      .select(col(idCol), ts.as("__toks"), lastStart.as("__last"))
      .withColumn("start", explode(sequence(lit(0L), col("__last"), lit(stride.toLong))))
      .select(
        col(idCol),
        (col("start") / stride).cast("long").as("chunk_idx"),
        size(slice(col("__toks"), (col("start") + 1).cast("int"), lit(chunkTokens)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), (col("start") + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk"))
  }

  val x55_chunk_overlap = Q(
    "x55_chunk_overlap",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |s AS (SELECT doc_id, ts,
      |        unnest(generate_series(0, greatest(CAST(ceil((len(ts) - 32) / 24.0) AS BIGINT) * 24, 0), 24)) AS start
      |      FROM toks)
      |SELECT doc_id, start // 24 AS chunk_idx,
      |       CAST(len(ts[start+1 : start+32]) AS BIGINT) AS n_tokens,
      |       array_to_string(ts[start+1 : start+32], ' ') AS chunk
      |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
  ) { t =>
    chunk(t.documents, "doc_id", "text", chunkTokens = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx")
  }

  val all: Seq[Q] = Seq(
    x5_text_stats, x6_stopword_langscore, x7_regex_tokens, x8_fingerprint, x12_lang_id,
    x17_repetition_stats, x43_bm25_topk, x55_chunk_overlap)
}
