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
  private[graft] def bm25TopKOf(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
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
          expr("(CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"))
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
  val ret1Sql: String =
    s"""WITH toks AS (
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
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, doc_id, score_e6
       |FROM ranked WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  val queries: Map[String, Q] = Map(
    "ret1_bm25_topk" -> ret1,
  )

  val oracle: Map[String, String] = Map(
    "ret1_bm25_topk" -> ret1Sql,
  )
}
