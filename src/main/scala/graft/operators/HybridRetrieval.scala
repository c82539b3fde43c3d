package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Hybrid retrieval — reciprocal-rank fusion of the lexical (x43 BM25) and
  * vector (x9/x18/x31 ANN) halves of the retrieval stack, the ranked-
  * retrieval shape an LLM data/RAG user runs daily once both generators
  * exist. Reference anchor: the mention/document retrieval surface
  * (services/mention_loader.py:58-129) generalized to ranked retrieval.
  *
  * Per query (the 10 probe documents): the query's first three tokens are
  * its lexical terms; BM25 (k1=1.2, b=0.75) ranks matching documents; the
  * query's embedding ranks candidates by cosine — EXACT in x68, via the
  * x18 IVF probe in x68b (the scale rendering: candidates come from the
  * nProbe nearest cells only, so the vector side scans a fraction of the
  * corpus). Each generator keeps its top-30, and the fusion score is the
  * classic RRF `sum 1/(60 + rank)` over the lists the candidate appears
  * in — integer ranks in, so DuckDB replays the fusion bit-for-bit (IEEE
  * division and addition of identical doubles). Final answer: top-10 per
  * query. The fusion stage is generator-agnostic by construction — x68
  * and x68b share it verbatim, which is exactly how the 100 TB deployment
  * swaps generators without touching the fusion.
  *
  * 100 TB shape: the term table (30 rows) and query-vector block (10 rows)
  * broadcast, so both candidate generators are map-side against the corpus
  * scan — the token explode is pre-filtered by the broadcast term set
  * before any shuffle, and the per-query ranking windows shuffle only
  * candidate rows (matched docs x queries), never the corpus. Self-matches
  * are excluded from BOTH lists (a query retrieving itself carries no
  * signal).
  *
  * Float discipline (the x43/x9 lessons): per-term BM25 contributions
  * combine through a fixed-position pivot (p1+p2+p3, never a re-associable
  * SUM), scores round to 6 decimals before ranking, and every ORDER BY
  * carries a doc_id tiebreak.
  */
object HybridRetrieval {

  /** Lexical candidate CTEs (shared by x68/x68b oracles): per-query
    * 3-term BM25 over documents, ranked, top-30.
    */
  private val LexCtes =
    """q AS (
      |  SELECT doc_id AS query_id, string_split(text, ' ') AS ts
      |  FROM documents WHERE doc_id < 10),
      |qterms AS (
      |  SELECT query_id, p, ts[p] AS w
      |  FROM q, (VALUES (1), (2), (3)) AS t(p) WHERE len(ts) >= p),
      |docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |d AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM docs),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
      |tok AS (SELECT doc_id, unnest(toks) AS w FROM docs),
      |tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf FROM tok
      |       WHERE w IN (SELECT DISTINCT w FROM qterms) GROUP BY doc_id, w),
      |dfreq AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w),
      |s AS (SELECT tf.doc_id, tf.w,
      |        ln(CAST(1.0 AS DOUBLE) + (n_docs - dfreq.df + CAST(0.5 AS DOUBLE)) / (dfreq.df + CAST(0.5 AS DOUBLE)))
      |          * tf.tf * CAST(2.2 AS DOUBLE)
      |          / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * d.dl / avgdl)) AS s
      |      FROM tf JOIN d ON tf.doc_id = d.doc_id JOIN dfreq ON dfreq.w = tf.w, stats),
      |lexscore AS (
      |  SELECT qt.query_id, s.doc_id,
      |         round(COALESCE(max(CASE WHEN qt.p = 1 THEN s.s END), 0)
      |             + COALESCE(max(CASE WHEN qt.p = 2 THEN s.s END), 0)
      |             + COALESCE(max(CASE WHEN qt.p = 3 THEN s.s END), 0), 6) AS score
      |  FROM qterms qt JOIN s ON s.w = qt.w
      |  WHERE s.doc_id <> qt.query_id
      |  GROUP BY qt.query_id, s.doc_id),
      |lextop AS (
      |  SELECT query_id, doc_id, lex_rank FROM (
      |    SELECT query_id, doc_id,
      |           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS lex_rank
      |    FROM lexscore)
      |  WHERE lex_rank <= 30)""".stripMargin

  /** RRF fusion tail (shared): full-outer join of lextop/vectop, RRF
    * score, top-10 per query.
    */
  private val FusionTail =
    """fused AS (
      |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
      |         COALESCE(l.doc_id, v.doc_id) AS doc_id,
      |         l.lex_rank, v.vec_rank,
      |         round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.lex_rank), 0)
      |             + COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.vec_rank), 0), 6) AS rrf
      |  FROM lextop l FULL OUTER JOIN vectop v
      |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
      |SELECT query_id, doc_id, lex_rank, vec_rank, rrf FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rn
      |  FROM fused)
      |WHERE rn <= 10 ORDER BY query_id, rrf DESC, doc_id""".stripMargin

  /** Exact-cosine vector candidates (x68's oracle rendering). */
  private val ExactVecCtes =
    """vec AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
      |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(c.embedding AS DOUBLE[])), 6) AS sim
      |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 10),
      |vectop AS (
      |  SELECT query_id, doc_id, vec_rank FROM (
      |    SELECT query_id, doc_id,
      |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS vec_rank
      |    FROM vec)
      |  WHERE vec_rank <= 30)""".stripMargin

  /** IVF-probed vector candidates (x68b's oracle rendering — the x18
    * assignment/probe CTEs with the rank cut at 30).
    */
  private val IvfVecCtes =
    """cents AS (
      |  SELECT vec_id AS cell, embedding AS centroid
      |  FROM embeddings ORDER BY vec_id LIMIT 16),
      |assigned AS (
      |  SELECT cell, vec_id, embedding FROM (
      |    SELECT c.cell, e.vec_id, e.embedding,
      |           row_number() OVER (
      |             PARTITION BY e.vec_id
      |             ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                                   CAST(c.centroid AS DOUBLE[])), 6) DESC,
      |                      c.cell) AS rn
      |    FROM embeddings e, cents c) WHERE rn = 1),
      |probes AS (
      |  SELECT query_id, qe, cell FROM (
      |    SELECT q.vec_id AS query_id, q.embedding AS qe, c.cell,
      |           row_number() OVER (
      |             PARTITION BY q.vec_id
      |             ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                                   CAST(c.centroid AS DOUBLE[])), 6) DESC,
      |                      c.cell) AS rn
      |    FROM embeddings q, cents c WHERE q.vec_id < 10) WHERE rn <= 4),
      |vectop AS (
      |  SELECT query_id, doc_id, vec_rank FROM (
      |    SELECT p.query_id, a.vec_id AS doc_id,
      |           row_number() OVER (
      |             PARTITION BY p.query_id
      |             ORDER BY round(list_cosine_similarity(CAST(p.qe AS DOUBLE[]),
      |                                                   CAST(a.embedding AS DOUBLE[])), 6) DESC,
      |                      a.vec_id) AS vec_rank
      |    FROM probes p JOIN assigned a USING (cell)
      |    WHERE a.vec_id <> p.query_id)
      |  WHERE vec_rank <= 30)""".stripMargin

  /** Spark side of the shared lexical generator: (query_id, doc_id,
    * lex_rank <= 30).
    */
  private def lextop(t: Tables): DataFrame = {
    val toksCol = split(col("text"), " ")
    val qterms = t.documents.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), posexplode(slice(toksCol, 1, 3)).as(Seq("p0", "w")))
      .select(col("query_id"), (col("p0") + 1).as("p"), col("w"))
    val docs = t.documents.select(col("doc_id"), toksCol.as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    val terms = qterms.select("w").distinct()
    // tf per (doc, term): token explode pre-filtered by the broadcast term
    // set, so only matching tokens reach the aggregation shuffle
    val tf = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
      .join(broadcast(terms), "w")
      .groupBy("doc_id", "dl", "w").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    val s = tf.join(broadcast(dfreq), "w").crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * col("tf") * lit(2.2)
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
    def pos(p: Int) = coalesce(max(when(col("p") === p, col("s"))), lit(0.0))
    val lexscore = s.join(broadcast(qterms), "w")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(round(pos(1) + pos(2) + pos(3), 6).as("score"))
    val wl = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    lexscore
      .withColumn("lex_rank", row_number().over(wl).cast("long"))
      .filter(col("lex_rank") <= 30)
      .select("query_id", "doc_id", "lex_rank")
  }

  /** Spark side of the shared fusion stage: takes any two (query_id,
    * doc_id, rank) candidate lists — THE generator-agnostic seam.
    */
  private def fuse(lextop: DataFrame, vectop: DataFrame): DataFrame = {
    val fused = lextop.join(vectop, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        round(
          coalesce(lit(1.0) / (lit(60L) + col("lex_rank")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60L) + col("vec_rank")), lit(0.0)), 6))
    val wr = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rn", row_number().over(wr)).filter(col("rn") <= 10)
      .select("query_id", "doc_id", "lex_rank", "vec_rank", "rrf")
      .orderBy(col("query_id"), col("rrf").desc, col("doc_id"))
  }

  private def rankVec(candidates: DataFrame): DataFrame = {
    val wv = Window.partitionBy("query_id").orderBy(col("sim").desc, col("doc_id"))
    candidates
      .withColumn("vec_rank", row_number().over(wv).cast("long"))
      .filter(col("vec_rank") <= 30)
      .select("query_id", "doc_id", "vec_rank")
  }

  val x68_hybrid_topk = Q(
    "x68_hybrid_topk",
    s"WITH $LexCtes,\n$ExactVecCtes,\n$FusionTail",
  ) { t =>
    val qv = t.embeddings.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val exact = t.embeddings.select(col("vec_id").as("doc_id"), col("embedding").as("ce"))
      .join(broadcast(qv), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), Similarity.cosine(col("qe"), col("ce")).as("sim"))
    fuse(lextop(t), rankVec(exact))
  }

  /** The scale rendering: same fusion, but the vector generator is the
    * REAL x18 IVF probe (train-free centroids, nProbe=4) — candidates come
    * from the probed cells only, never the whole corpus. Oracle-checked
    * end-to-end: assignment, probing, ranking AND fusion replay in DuckDB.
    */
  val x68b_hybrid_ivf = Q(
    "x68b_hybrid_ivf",
    s"WITH $LexCtes,\n$IvfVecCtes,\n$FusionTail",
  ) { t =>
    val ivf = Similarity.ivfTopK(
      t.embeddings, t.embeddings.filter(col("vec_id") < 10),
      k = 30, nCells = 16, nProbe = 4)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("sim"))
    fuse(lextop(t), rankVec(ivf))
  }

  val all: Seq[Q] = Seq(x68_hybrid_topk, x68b_hybrid_ivf)
}
