package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] Sparse-retrieval operators for training-data pipelines (SURVEY
  * §7.8): BM25 top-k document retrieval over an inverted index built with
  * two hash aggregates. Not derived from the reference.
  *
  * The index is the classic decomposition — postings `tf(doc, term)`, doc
  * lengths `dl(doc)`, document frequencies `df(term)`, corpus scalars
  * `(N, avgdl)` — all plain `groupBy` aggregates over one token explode,
  * so Catalyst keeps the build in whole-stage codegen and AQE sizes the
  * exchanges. The probe side never scans the corpus: the query set is
  * broadcast against the postings (term equi-join), `df` after the probe
  * is at most |query vocabulary| rows (broadcast), and `(N, avgdl)` is a
  * broadcast single row. At 100 TB the postings/lengths aggregates are
  * the stored index (built once, term- resp. doc-partitioned); a query
  * batch touches only the postings of its own terms.
  *
  * Scoring is Robertson/Sparck-Jones BM25 with the +1 idf variant
  * (always positive): idf = ln(1 + (N - df + 0.5)/(df + 0.5)), weight =
  * tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)), k1 = 1.2, b = 0.75. Both
  * engines evaluate the identical double expression over identical
  * integer aggregates; the final score is rounded to integer micro-units
  * BEFORE ranking, so the top-k cut compares exact longs (doc_id breaks
  * ties) — bit-exact against the DuckDB oracle.
  */
object Retrieval {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed literal query set (query_id, term) — mirrored in the oracle. */
  private val QuerySet: Seq[(Int, String)] = Seq(
    1 -> "spark", 1 -> "table",
    2 -> "hash", 2 -> "merge", 2 -> "sort",
    3 -> "window", 3 -> "scan")

  /** BM25 top-k over any (doc_id, text) frame for a (query_id, term)
    * query frame — the library entry point
    * ([[graft.api.GraftApi.bm25TopK]]). Emits one row per (query_id,
    * rank ≤ k): (query_id, rnk, doc_id, score_e6). */
  private[graft] def bm25TopKOf(docs: DataFrame, queries: DataFrame, k: Int): DataFrame =
    bm25WeightedTopKOf(docs, queries.withColumn("wt_bp", lit(10000L)), k)

  /** The aggregated postings frame (doc_id, term, tf) — the inverted
    * index every retrieval operator decomposes over. Round-17: persisted
    * MEMORY_AND_DISK for the query's duration (the round-16 cleaned-corpus
    * precedent, released by the harness's between-entry
    * `Pinned.releaseAll` sweep / [[graft.api.GraftApi.releasePinned]]):
    * the old plans re-ran the corpus explode + count aggregate once per
    * consumer — dl, corpus stats, df and the per-term probe each embedded
    * their own copy, 4 full-corpus passes per ret query (guide §2.4). At
    * 100 TB this frame IS the stored index (built once, term- resp.
    * doc-partitioned); within one query the persist bounds corpus passes
    * to one. */
  private def postingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Weighted-term BM25 top-k: `queries` carries (query_id, term, wt_bp)
    * and each term's contribution is scaled by wt_bp/10⁴ — the shape
    * query-expansion retrieval needs (expansion terms down-weighted vs
    * the user's own terms). wt_bp = 10000 multiplies by exactly 1.0, so
    * [[bm25TopKOf]] delegates here without perturbing a single bit. */
  private[graft] def bm25WeightedTopKOf(docs: DataFrame, queries: DataFrame, k: Int): DataFrame =
    bm25FromPostings(postingsOf(docs), queries, k)

  /** BM25 over a prebuilt (persisted) postings frame — shared by the
    * bm25 entry points and ret5's metrics probe (which derives its
    * relevance term set from the SAME postings instead of a second
    * corpus explode). */
  private def bm25FromPostings(tf: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // dl is read twice (stats rollup + the per-term join) — from the
    // cached postings each derivation is one exchange, no corpus scan;
    // the doc-length frame itself is narrow (two longs per doc), so it
    // rides its own persist for the same query-scoped duration
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    // df only for terms the query set mentions: probe-then-aggregate keeps
    // the frame ≤ |query vocabulary| rows, so it broadcasts
    val qterms = broadcast(queries.select("term").distinct())
    val dfT = tf.join(qterms, Seq("term")).groupBy("term").agg(count(lit(1)).as("df"))
    val perTerm = tf
      .join(broadcast(queries), Seq("term"))
      .join(dl, Seq("doc_id"))
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        (expr("ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))") *
          expr("(CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))") *
          expr("CAST(wt_bp AS DOUBLE) / 10000.0"))
          .as("w"))
    val scored = perTerm.groupBy("query_id", "doc_id")
      .agg(expr("CAST(round(sum(w) * 1000000) AS BIGINT)").as("score_e6"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score_e6").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("score_e6"))
  }

  private def queryDf(s: SparkSession): DataFrame = {
    val sp = s
    import sp.implicits._
    QuerySet.toDF("query_id", "term")
  }
  private val querySql: String =
    QuerySet.map { case (q, t) => s"($q, '$t')" }
      .mkString("(VALUES ", ", ", ") AS queries(query_id, term)")

  val ret1: Q = (s, d) =>
    bm25TopKOf(Tables.documents(s, d), queryDf(s), k = 5)
      .orderBy("query_id", "rnk")
  /** The BM25 CTE chain through `ranked` — shared by ret1Sql and ret2Sql
    * (each appends its own final SELECT / fusion tail). */
  private val bm25Ctes: String =
    s"""toks AS (
       |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM toks WHERE len(term) > 0 GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |q AS (SELECT * FROM $querySql),
       |dft AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
       |  WHERE term IN (SELECT term FROM q) GROUP BY term),
       |per_term AS (
       |  SELECT q.query_id, tf.doc_id,
       |         ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
       |         ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS w
       |  FROM tf
       |  JOIN q ON q.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  JOIN dft ON dft.term = tf.term
       |  CROSS JOIN stats),
       |scored AS (
       |  SELECT query_id, doc_id,
       |         CAST(round(sum(w) * 1000000) AS BIGINT) AS score_e6
       |  FROM per_term GROUP BY query_id, doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, score_e6,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score_e6 DESC, doc_id) AS rnk
       |  FROM scored)""".stripMargin
  val ret1Sql: String =
    s"""WITH $bm25Ctes
       |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, doc_id, score_e6
       |FROM ranked WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  // ---- RET2: hybrid retrieval — reciprocal-rank fusion (BM25 ⊕ dense) ----

  /** RRF constant K = 60 — the value from Cormack, Clarke & Buettcher
    * (SIGIR 2009), where rrf(d) = Σ_signals 1/(K + rank_s(d)). */
  private val RrfK = 60

  /** Fuse a sparse ranking (query_id, rnk, doc_id — bm25TopKOf's shape)
    * with a dense ranking (q_id, cand_id, rk — cosineTopKOf's shape) by
    * reciprocal-rank fusion. Rank math is INTEGER micro-units
    * (1000000 div (K + rank)), so the fused ordering is engine-exact
    * even though each signal's internal scoring is double; a doc absent
    * from one signal contributes 0 from it (the standard convention).
    *
    * Scale: both inputs are already top-k-bounded per query (the
    * inverted-index probe; the ANN scan), so fusion is a full-outer
    * equi-join of two k·|queries|-row frames plus one windowed cut —
    * negligible at any corpus size. At 100 TB the dense side swaps to
    * the IVF/bucketed path (sim3/sim6) with the same output shape; the
    * fusion stage is unchanged. */
  private[graft] def rrfFuseOf(sparse: DataFrame, dense: DataFrame, kOut: Int): DataFrame = {
    val sp = sparse.select(col("query_id").cast("long").as("query_id"),
      col("doc_id"), col("rnk").cast("long").as("rnk_sparse"))
    val dn = dense.select(col("q_id").cast("long").as("query_id"),
      col("cand_id").as("doc_id"), col("rk").cast("long").as("rnk_dense"))
    val fused = sp.join(dn, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(expr(s"1000000L div (${RrfK}L + rnk_sparse)"), lit(0L)) +
          coalesce(expr(s"1000000L div (${RrfK}L + rnk_dense)"), lit(0L)))
    fused
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf_e6").desc, col("doc_id"))))
      .filter(col("rnk") <= kOut)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("rrf_e6"),
        col("rnk_sparse"), col("rnk_dense"))
  }

  /** RET2: the standard RAG retrieval shape — BM25 top-20 and dense
    * cosine top-20 per query, RRF-fused to a top-10. Query binding:
    * sparse query_id q ↔ dense query vector vec_id = q (ids 1..3). */
  val ret2: Q = (s, d) => {
    val sparse = bm25TopKOf(Tables.documents(s, d), queryDf(s), k = 20)
    val dense = Similarity.cosineTopKOf(Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(col("vec_id").isin(1L, 2L, 3L)), k = 20)
    rrfFuseOf(sparse, dense, kOut = 10).orderBy("query_id", "rnk")
  }
  val ret2Sql: String =
    s"""WITH $bm25Ctes,
       |${Similarity.qnormCte},
       |ddots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qn a JOIN qn b ON a.vec_id IN (1, 2, 3) AND b.vec_id <> a.vec_id)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm),
       |dranked AS (
       |  SELECT q_id, cand_id,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id)
       |           AS INTEGER) AS rk
       |  FROM ddots),
       |sp AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |              CAST(rnk AS BIGINT) AS rnk_sparse
       |       FROM ranked WHERE rnk <= 20),
       |dn AS (SELECT CAST(q_id AS BIGINT) AS query_id, cand_id AS doc_id,
       |              CAST(rk AS BIGINT) AS rnk_dense
       |       FROM dranked WHERE rk <= 20),
       |fused AS (
       |  SELECT coalesce(sp.query_id, dn.query_id) AS query_id,
       |         coalesce(sp.doc_id, dn.doc_id) AS doc_id,
       |         sp.rnk_sparse, dn.rnk_dense,
       |         CAST(coalesce(1000000 // ($RrfK + sp.rnk_sparse), 0) +
       |              coalesce(1000000 // ($RrfK + dn.rnk_dense), 0) AS BIGINT) AS rrf_e6
       |  FROM sp FULL OUTER JOIN dn
       |    ON sp.query_id = dn.query_id AND sp.doc_id = dn.doc_id),
       |fout AS (
       |  SELECT query_id, doc_id, rrf_e6, rnk_sparse, rnk_dense,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY rrf_e6 DESC, doc_id) AS rnk
       |  FROM fused)
       |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, doc_id, rrf_e6,
       |       rnk_sparse, rnk_dense
       |FROM fout WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin

  // ---- RET3: PMI query expansion + weighted BM25 ----

  /** RET3: classic corpus-statistics query expansion — each query term
    * pulls its top-2 positively-associated partners from the t14 PMI
    * co-occurrence table (support ≥ 20 docs, PMI > 0; ties on partner),
    * expansion terms enter at half weight (5000 bp vs 10000 bp), a term
    * reached both ways keeps its max weight, then weighted BM25 top-5.
    *
    * Scale: the PMI table is vocabulary-pair-bounded (t14's per-doc
    * blocked self-join — at 100 TB it is the stored association index,
    * built once); expansion itself joins the ≤|query terms| frame
    * against it, so the query-side work stays broadcast-sized, and the
    * probe inherits ret1's index-only plan. */
  val ret3: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val q0 = queryDf(s)
    val pmi = TextAnalysis.pmiCooccurrenceOf(docs, minSupport = 20L)
      .filter(col("pmi_e6") > 0)
    val dirp = pmi.select(col("wa").as("term"), col("wb").as("partner"), col("pmi_e6"))
      .unionAll(pmi.select(col("wb").as("term"), col("wa").as("partner"), col("pmi_e6")))
    val exp = q0.join(dirp, Seq("term"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id", "term").orderBy(col("pmi_e6").desc, col("partner"))))
      .filter(col("rk") <= 2)
      .select(col("query_id"), col("partner").as("term"), lit(5000L).as("wt_bp"))
    // Round-17: the expanded query frame is ≤ 3·|query terms| rows but
    // its lineage embeds the whole PMI co-occurrence chain (distinct
    // explode + self-join over the corpus), and bm25WeightedTopKOf
    // consumes `queries` TWICE (the qterms vocabulary probe and the
    // per-term broadcast) — each consumption re-ran the PMI build.
    // Persisting the tiny frame bounds the PMI chain to one evaluation
    // (released by the harness's between-entry sweep / releasePinned).
    val qx = q0.withColumn("wt_bp", lit(10000L)).unionAll(exp)
      .groupBy("query_id", "term").agg(max("wt_bp").as("wt_bp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bm25WeightedTopKOf(docs, qx, k = 5).orderBy("query_id", "rnk")
  }
  val ret3Sql: String =
    s"""WITH toksd AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, w FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0),
       |cx AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toksd GROUP BY w),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs0 FROM documents),
       |ppairs AS MATERIALIZED (
       |  SELECT a.w AS wa, b.w AS wb, CAST(count(*) AS BIGINT) AS c_xy
       |  FROM toksd a JOIN toksd b ON a.doc_id = b.doc_id AND a.w < b.w
       |  GROUP BY a.w, b.w HAVING count(*) >= 20),
       |pmi AS MATERIALIZED (
       |  SELECT wa, wb,
       |         CAST(round(ln((CAST(c_xy AS DOUBLE) * CAST(n_docs0 AS DOUBLE)) /
       |           (CAST(x.c AS DOUBLE) * CAST(y.c AS DOUBLE))) * 1000000) AS BIGINT) AS pmi_e6
       |  FROM ppairs JOIN cx x ON x.w = wa JOIN cx y ON y.w = wb CROSS JOIN nd),
       |q0 AS (SELECT * FROM $querySql),
       |dirp AS (
       |  SELECT wa AS term, wb AS partner, pmi_e6 FROM pmi WHERE pmi_e6 > 0
       |  UNION ALL
       |  SELECT wb AS term, wa AS partner, pmi_e6 FROM pmi WHERE pmi_e6 > 0),
       |expd AS (
       |  SELECT query_id, partner AS term, CAST(5000 AS BIGINT) AS wt_bp FROM (
       |    SELECT q0.query_id, q0.term, d.partner, d.pmi_e6,
       |           row_number() OVER (PARTITION BY q0.query_id, q0.term
       |                              ORDER BY d.pmi_e6 DESC, d.partner) AS rk
       |    FROM q0 JOIN dirp d ON d.term = q0.term) WHERE rk <= 2),
       |qx AS MATERIALIZED (
       |  SELECT query_id, term, CAST(max(wt_bp) AS BIGINT) AS wt_bp FROM (
       |    SELECT query_id, term, CAST(10000 AS BIGINT) AS wt_bp FROM q0
       |    UNION ALL SELECT query_id, term, wt_bp FROM expd)
       |  GROUP BY query_id, term),
       |tf AS MATERIALIZED (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents)
       |  WHERE len(term) > 0 GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |dft AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
       |  WHERE term IN (SELECT term FROM qx) GROUP BY term),
       |per_term AS (
       |  SELECT qx.query_id, tf.doc_id,
       |         ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
       |         ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) *
       |         (CAST(qx.wt_bp AS DOUBLE) / 10000.0) AS w
       |  FROM tf
       |  JOIN qx ON qx.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  JOIN dft ON dft.term = tf.term
       |  CROSS JOIN stats),
       |scored AS (
       |  SELECT query_id, doc_id,
       |         CAST(round(sum(w) * 1000000) AS BIGINT) AS score_e6
       |  FROM per_term GROUP BY query_id, doc_id),
       |rranked AS (
       |  SELECT query_id, doc_id, score_e6,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score_e6 DESC, doc_id) AS rnk
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, doc_id, score_e6
       |FROM rranked WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  // ---- RET4: query-likelihood retrieval (Dirichlet smoothing) ----

  /** Dirichlet prior μ = 2000 (the Zhai–Lafferty INEX/TREC default). */
  private val DirichletMu = 2000L

  /** RET4: language-model retrieval with Dirichlet smoothing (Zhai &
    * Lafferty SIGIR 2001) — the probabilistic alternative to BM25 and
    * the scoring family KenLM-style data-selection shares its math
    * with. Rank-equivalent decomposition: score(q, d) =
    * Σ_{t ∈ q∩d} ln(1 + tf·|C| / (μ·cf_t))  +  |q|·ln(μ / (dl + μ)),
    * which needs ONLY the present-term postings (absent terms fold into
    * the per-doc norm — no per-absent-term work, the property that
    * makes QL indexable exactly like BM25).
    *
    * Exactness: tighter than ret1 — each ln rounds to an e6 long BEFORE
    * summation, so the per-doc score is an INTEGER sum of integers
    * (double-sum order can never flip a rank); the ln argument is one
    * double division of DECIMAL-exact products (tf·|C| is corpus-scale —
    * the t22 overflow class). Candidates = docs sharing ≥ 1 query term
    * (the inverted-index probe); scale shape identical to ret1. */
  private[graft] def queryLikelihoodTopKOf(docs: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    // one persisted postings pass feeds dl/ctot/cf/present (round-17,
    // the bm25FromPostings shape — see [[postingsOf]])
    val tf = postingsOf(docs)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ctot = dl.agg(sum("dl").as("c_total"))
    val qterms = broadcast(queries.select("term").distinct())
    val cf = tf.join(qterms, Seq("term")).groupBy("term").agg(sum("tf").as("cf"))
    val nq = queries.groupBy("query_id").agg(count(lit(1)).as("nq"))
    val present = tf
      .join(broadcast(queries), Seq("term"))
      .join(broadcast(cf), Seq("term"))
      .crossJoin(broadcast(ctot))
      .select(col("query_id"), col("doc_id"),
        expr(s"CAST(round(ln(1.0 + CAST(CAST(tf AS DECIMAL(38,0)) * c_total AS DOUBLE)" +
          s" / CAST($DirichletMu * CAST(cf AS DECIMAL(38,0)) AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("w_e6"))
      .groupBy("query_id", "doc_id")
      .agg(sum("w_e6").as("sum_w_e6"))
    present
      .join(dl, Seq("doc_id"))
      .join(broadcast(nq), Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        expr(s"sum_w_e6 + nq * CAST(round(ln(CAST($DirichletMu AS DOUBLE)" +
          s" / (CAST(dl AS DOUBLE) + $DirichletMu.0)) * 1000000) AS BIGINT)")
          .as("score_e6"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score_e6").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("score_e6"))
  }

  val ret4: Q = (s, d) =>
    queryLikelihoodTopKOf(Tables.documents(s, d), queryDf(s), k = 5)
      .orderBy("query_id", "rnk")
  val ret4Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM toks WHERE len(term) > 0 GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
       |ctot AS (SELECT CAST(sum(dl) AS BIGINT) AS c_total FROM dl),
       |q AS (SELECT * FROM $querySql),
       |cf AS (
       |  SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf
       |  WHERE term IN (SELECT term FROM q) GROUP BY term),
       |nq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS nq FROM q GROUP BY query_id),
       |present AS (
       |  SELECT q.query_id, tf.doc_id,
       |         CAST(sum(CAST(round(ln(1.0 + CAST(CAST(tf.tf AS HUGEINT) * c_total AS DOUBLE)
       |           / CAST($DirichletMu * CAST(cf.cf AS HUGEINT) AS DOUBLE)) * 1000000) AS BIGINT))
       |           AS BIGINT) AS sum_w_e6
       |  FROM tf
       |  JOIN q ON q.term = tf.term
       |  JOIN cf ON cf.term = tf.term
       |  CROSS JOIN ctot
       |  GROUP BY q.query_id, tf.doc_id),
       |scored AS (
       |  SELECT p.query_id, p.doc_id,
       |         p.sum_w_e6 + nq.nq * CAST(round(ln(CAST($DirichletMu AS DOUBLE)
       |           / (CAST(dl.dl AS DOUBLE) + $DirichletMu.0)) * 1000000) AS BIGINT) AS score_e6
       |  FROM present p
       |  JOIN dl ON dl.doc_id = p.doc_id
       |  JOIN nq ON nq.query_id = p.query_id),
       |rk AS (
       |  SELECT query_id, doc_id, score_e6,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score_e6 DESC, doc_id) AS rnk
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, doc_id, score_e6
       |FROM rk WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  // ---- RET5: ranking-quality metrics — nDCG@k, MRR, precision@k ----

  /** Literal integer DCG rank weights w_i = round(10⁹·ln2/ln(i+1)) —
    * the standard 1/log₂(i+1) discount frozen to exact integers at plan
    * build (the sim11 RBO-literal convention), so DCG/IDCG sums and the
    * final integral ratio are bit-identical cross-engine; no log is ever
    * evaluated inside either engine. */
  private def dcgWeights(k: Int): Seq[Long] =
    (1 to k).map(i => math.round(1e9 * math.log(2) / math.log(i + 1.0)))

  /** Ranking-quality report for a retrieval system over binary
    * relevance — the evaluation every retrieval/RAG pipeline runs before
    * shipping an index or reranker: per query, corpus-wide relevant
    * count, relevant-in-top-k, first relevant rank, MRR (10⁶ div first
    * rank), precision@k, and nDCG@k with the literal-integer discount
    * above (IDCG over min(R, k) ideal slots; 0 when the query has no
    * relevant docs). Relevance truth here is deterministic containment:
    * a document is relevant iff it contains EVERY query term as a whole
    * token — the exact-match oracle both engines can replay.
    *
    * Exactness: integer weights, integer division (non-negative domain),
    * DECIMAL widening on dcg·10⁶ (Σw ~ 3·10⁹ at k=5; safe to k ~ 10⁴).
    * Scale: the ranked frame is k·|queries| rows; the relevance probe is
    * one distinct (doc, term) explode joined against the broadcast query
    * vocabulary and counted per (query, doc) — work proportional to docs
    * CONTAINING query terms, never all-pairs. Library entry point:
    * [[graft.api.GraftApi.rankingMetrics]]. */
  private[graft] def rankingMetricsOf(docs: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val w = dcgWeights(k)
    val prefix = w.scanLeft(0L)(_ + _).tail
    // one persisted postings frame serves BOTH the BM25 ranking and the
    // relevance probe: the postings' (doc_id, term) key set IS the
    // distinct doc-term containment relation the old second corpus
    // explode re-derived (round-17, guide §2.4)
    val tf = postingsOf(docs)
    val ranked = bm25FromPostings(tf, queries.withColumn("wt_bp", lit(10000L)), k)
    val qt = queries.select("query_id", "term").distinct()
    val nTerms = qt.groupBy("query_id").agg(count(lit(1)).as("n_terms"))
    val docTerms = tf.select(col("doc_id"), col("term"))
    val rel = docTerms.join(broadcast(qt), Seq("term"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("n_hit"))
      .join(broadcast(nTerms), Seq("query_id"))
      .filter(col("n_hit") === col("n_terms"))
      .select(col("query_id"), col("doc_id"), lit(1L).as("rel"))
    val relCount = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel_corpus"))
    val wCase = (1 to k).map(i => s"WHEN $i THEN ${w(i - 1)}L")
      .mkString("CASE rnk ", " ", " ELSE 0L END")
    val idcgCase = (1 to k).map(j => s"WHEN $j THEN ${prefix(j - 1)}L")
      .mkString(s"CASE least(n_rel_corpus, ${k}L) ", " ", " ELSE 0L END")
    val perQ = ranked.join(rel, Seq("query_id", "doc_id"), "left")
      .groupBy("query_id").agg(
        sum(when(col("rel").isNotNull, 1L).otherwise(0L)).as("n_rel_topk"),
        min(when(col("rel").isNotNull, col("rnk"))).cast("long").as("first_rel_rank"),
        sum(when(col("rel").isNotNull, expr(wCase)).otherwise(0L)).as("dcg"))
    queries.select("query_id").distinct()
      .join(perQ, Seq("query_id"), "left")
      .join(relCount, Seq("query_id"), "left")
      .select(col("query_id").cast("long").as("query_id"),
        coalesce(col("n_rel_corpus"), lit(0L)).as("n_rel_corpus"),
        coalesce(col("n_rel_topk"), lit(0L)).as("n_rel_topk"),
        col("first_rel_rank"),
        coalesce(col("dcg"), lit(0L)).as("dcg"))
      .select(col("query_id"), col("n_rel_corpus"), col("n_rel_topk"),
        col("first_rel_rank"),
        when(col("first_rel_rank").isNull, 0L)
          .otherwise(expr("1000000L div first_rel_rank")).as("mrr_e6"),
        expr(s"n_rel_topk * 1000000L div ${k}L").as("p_at_k_e6"),
        expr(s"CASE WHEN ($idcgCase) = 0 THEN 0L ELSE " +
          s"CAST(CAST(dcg AS DECIMAL(38,0)) * 1000000 div ($idcgCase) AS BIGINT) END")
          .as("ndcg_e6"))
  }

  /** RET5 on the fixture: ret1's BM25 top-5 ranking judged against
    * all-terms containment relevance. */
  val ret5: Q = (s, d) =>
    rankingMetricsOf(Tables.documents(s, d), queryDf(s), k = 5)
      .orderBy("query_id")
  val ret5Sql: String = {
    val k = 5
    val w = dcgWeights(k)
    val prefix = w.scanLeft(0L)(_ + _).tail
    val wCase = (1 to k).map(i => s"WHEN $i THEN ${w(i - 1)}")
      .mkString("CASE t.rnk ", " ", " ELSE 0 END")
    val idcgCase = (1 to k).map(j => s"WHEN $j THEN ${prefix(j - 1)}")
      .mkString(s"CASE least(n_rel_corpus, $k) ", " ", " ELSE 0 END")
    s"""WITH $bm25Ctes,
       |topk AS (SELECT query_id, rnk, doc_id FROM ranked WHERE rnk <= $k),
       |dterms AS (SELECT DISTINCT doc_id, term FROM toks WHERE len(term) > 0),
       |qt AS (SELECT DISTINCT query_id, term FROM q),
       |nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_terms FROM qt GROUP BY query_id),
       |rel AS (
       |  SELECT h.query_id, h.doc_id FROM (
       |    SELECT qt.query_id, dt.doc_id, CAST(count(*) AS BIGINT) AS n_hit
       |    FROM dterms dt JOIN qt ON qt.term = dt.term
       |    GROUP BY qt.query_id, dt.doc_id) h
       |  JOIN nt ON nt.query_id = h.query_id
       |  WHERE h.n_hit = nt.n_terms),
       |relc AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel_corpus
       |         FROM rel GROUP BY query_id),
       |perq AS (
       |  SELECT t.query_id,
       |         CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_topk,
       |         CAST(min(CASE WHEN r.doc_id IS NOT NULL THEN t.rnk END) AS BIGINT) AS first_rel_rank,
       |         CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN ($wCase) ELSE 0 END) AS BIGINT) AS dcg
       |  FROM topk t LEFT JOIN rel r ON r.query_id = t.query_id AND r.doc_id = t.doc_id
       |  GROUP BY t.query_id),
       |base AS (
       |  SELECT CAST(qq.query_id AS BIGINT) AS query_id,
       |         coalesce(relc.n_rel_corpus, 0) AS n_rel_corpus,
       |         coalesce(perq.n_rel_topk, 0) AS n_rel_topk,
       |         perq.first_rel_rank,
       |         coalesce(perq.dcg, 0) AS dcg
       |  FROM (SELECT DISTINCT query_id FROM q) qq
       |  LEFT JOIN perq ON perq.query_id = qq.query_id
       |  LEFT JOIN relc ON relc.query_id = qq.query_id)
       |SELECT query_id, n_rel_corpus, n_rel_topk, first_rel_rank,
       |       CAST(CASE WHEN first_rel_rank IS NULL THEN 0
       |                 ELSE 1000000 // first_rel_rank END AS BIGINT) AS mrr_e6,
       |       CAST(n_rel_topk * 1000000 // $k AS BIGINT) AS p_at_k_e6,
       |       CAST(CASE WHEN ($idcgCase) = 0 THEN 0
       |                 ELSE CAST(dcg AS HUGEINT) * 1000000 // ($idcgCase) END AS BIGINT) AS ndcg_e6
       |FROM base ORDER BY query_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "ret1_bm25_topk" -> ret1,
    "ret2_hybrid_rrf_topk" -> ret2,
    "ret3_expanded_bm25" -> ret3,
    "ret4_query_likelihood_topk" -> ret4,
    "ret5_ranking_quality" -> ret5,
  )

  val oracle: Map[String, String] = Map(
    "ret1_bm25_topk" -> ret1Sql,
    "ret2_hybrid_rrf_topk" -> ret2Sql,
    "ret3_expanded_bm25" -> ret3Sql,
    "ret4_query_likelihood_topk" -> ret4Sql,
    "ret5_ranking_quality" -> ret5Sql,
  )
}
