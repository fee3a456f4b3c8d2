package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] The end-to-end pretraining data-prep pipeline as ONE declarative
  * plan — the composite the rest of the library exists for: ingest (with
  * a deterministic duplicate injection so the dedup stage has real work,
  * reproduced identically in the oracle) → quality gate → exact dedup →
  * per-language corpus accounting. Every stage is an operator that also
  * ships standalone (t5 quality, d1 dedup, t6 token counts); the point of
  * the composite is that Catalyst plans the WHOLE chain together — the
  * quality gate's filter runs before the dedup shuffle, the dedup
  * aggregate and the report aggregate pipeline into each other, and no
  * stage materializes an intermediate corpus.
  *
  * Scale: the chain is scan → map-side metrics + one stop-word aggregate
  * → filter → hash aggregate on md5(text) → per-lang rollups. All
  * exchanges key on doc_id, the text hash, or lang (PipelineSpec bounds
  * the count), and NO exchange carries document bytes: text reduces to
  * md5 + integer metrics in the scan projections, so only ids, hashes,
  * and counters ever shuffle — at 100 TB the corpus is read, never moved.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  private val QualityMin = 7450L

  /** Pipeline ingest: documents plus exact copies of every doc_id % 7 = 0
    * (id offset by 1,000,000, lang/text preserved) — deterministic, so
    * the DuckDB oracle ingests the identical corpus. */
  private def ingestOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .unionAll(
        docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
            col("lang"), col("n_chars")))

  /** PIPE1: per-language corpus accounting through the full prep chain:
    * (lang, n_ingested, n_quality, n_kept, sum_toks_kept). n_quality
    * counts docs past the quality gate (score ≥ 7450 of 10 000 — set to
    * bite: roughly half the synthetic corpus passes); n_kept counts
    * survivors after exact-dedup collapse (min doc_id per md5(text) wins,
    * so every injected copy — and its % 7 = 0 original's tie — resolves
    * the same way in both engines); sum_toks_kept is the training-token
    * budget the kept corpus actually buys. */
  val pipe1: Q = (s, d) => {
    val ingest = ingestOf(Tables.documents(s, d))
    // text is reduced to md5 IN THE SCAN PROJECTION — no exchange in the
    // whole chain ever carries document bytes, only ids/hashes/counters
    val hashes = ingest.select(col("doc_id"), col("lang"),
      md5(col("text")).as("text_hash"))
    val quality = TextAnalysis.qualityScoreOf(ingest)
      .filter(col("quality") >= QualityMin)
      .select(col("doc_id"), col("n_tokens"))
    val scored = hashes.join(quality, Seq("doc_id"))
    val kept = scored
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(scored, Seq("doc_id"))
    val perLangIngest = ingest.groupBy("lang").agg(count(lit(1)).as("n_ingested"))
    val perLangQuality = scored.groupBy("lang").agg(count(lit(1)).as("n_quality"))
    val perLangKept = kept.groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("n_tokens").as("sum_toks_kept"))
    perLangIngest
      .join(perLangQuality, Seq("lang"), "left")
      .join(perLangKept, Seq("lang"), "left")
      .select(col("lang"), col("n_ingested"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("sum_toks_kept"), lit(0L)).as("sum_toks_kept"))
      .orderBy("lang")
  }
  val pipe1Sql: String =
    s"""WITH ingest AS (
       |  SELECT doc_id, text, lang, n_chars FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text, lang, n_chars FROM documents
       |  WHERE doc_id % 7 = 0),
       |base AS (
       |  SELECT doc_id, n_chars,
       |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |         CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS sum_tok_len
       |  FROM ingest),
       |stops AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_stop FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM ingest)
       |  WHERE word IN ('the', 'a', 'data', 'value', 'row') GROUP BY doc_id),
       |m AS (
       |  SELECT b.doc_id, b.n_tokens,
       |         b.sum_tok_len * 100 // b.n_tokens AS mean_tok_len_x100,
       |         b.n_alpha * 10000 // greatest(b.n_chars, 1) AS alpha_bp,
       |         coalesce(s.n_stop, 0) * 10000 // b.n_tokens AS stop_bp
       |  FROM base b LEFT JOIN stops s ON b.doc_id = s.doc_id),
       |quality AS (
       |  SELECT doc_id, n_tokens FROM m
       |  WHERE (CASE WHEN n_tokens >= 20 THEN 2500 ELSE n_tokens * 125 END)
       |        + alpha_bp // 4 + stop_bp // 4
       |        + (CASE WHEN mean_tok_len_x100 BETWEEN 300 AND 800 THEN 2500 ELSE 0 END)
       |        >= $QualityMin),
       |scored AS (
       |  SELECT i.doc_id, i.text, i.lang, q.n_tokens
       |  FROM ingest i JOIN quality q ON i.doc_id = q.doc_id),
       |kept AS (
       |  SELECT s.lang, s.n_tokens FROM scored s
       |  JOIN (SELECT md5(text) AS h, min(doc_id) AS doc_id
       |        FROM scored GROUP BY md5(text)) k
       |    ON s.doc_id = k.doc_id)
       |SELECT i.lang,
       |       CAST(i.n_ingested AS BIGINT) AS n_ingested,
       |       CAST(coalesce(q.n, 0) AS BIGINT) AS n_quality,
       |       CAST(coalesce(k.n, 0) AS BIGINT) AS n_kept,
       |       CAST(coalesce(k.toks, 0) AS BIGINT) AS sum_toks_kept
       |FROM (SELECT lang, count(*) AS n_ingested FROM ingest GROUP BY lang) i
       |LEFT JOIN (SELECT lang, count(*) AS n FROM scored GROUP BY lang) q
       |  ON i.lang = q.lang
       |LEFT JOIN (SELECT lang, count(*) AS n, sum(n_tokens) AS toks
       |           FROM kept GROUP BY lang) k
       |  ON i.lang = k.lang
       |ORDER BY i.lang""".stripMargin

  /** PIPE2: per-source curation-readiness report — the second composite:
    * for every source, its document count, token budget, exact mean
    * quality (t5's score), mean cross-document n-gram novelty (t23) and
    * the share of its shingle mass the corpus already contains
    * elsewhere (the template/boilerplate pressure t28 itemizes). One
    * frame answers "which feeds are worth their tokens, and which are
    * duplicate-heavy template farms". All means are exact integral
    * divisions of summed integers.
    *
    * Scale: two token-explosion scans (the shingle frame and the
    * quality stop-word counter — both already the t23/t5 shapes, and
    * Catalyst plans the whole composite together), everything else
    * joins on doc_id and aggregates onto the bounded source domain. */
  val pipe2: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val novelty = TextAnalysis.ngramNoveltyOf(docs.select("doc_id", "text"))
    val q = TextAnalysis.qualityScoreOf(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    docs.select("doc_id", "source")
      .join(novelty, Seq("doc_id"))
      .join(q, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        expr("sum(quality) div count(1)").as("mean_quality"),
        expr("sum(novelty_bp) div count(1)").as("mean_novelty_bp"),
        expr("sum(n_shared) * 10000 div sum(n_shingles)").as("shared_shingle_bp"))
      .orderBy("source")
  }
  val pipe2Sql: String =
    s"""WITH ${Dedup.shinglesCteBody("shing", "documents")},
       |sdf AS (
       |  SELECT shingle, CAST(count(*) AS BIGINT) AS df
       |  FROM shing GROUP BY shingle),
       |nov AS (
       |  SELECT s.doc_id,
       |         CAST(count(*) AS BIGINT) AS n_shingles,
       |         CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |         CAST((count(*) - sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)) * 10000
       |              // count(*) AS BIGINT) AS novelty_bp
       |  FROM shing s JOIN sdf USING (shingle) GROUP BY s.doc_id),
       |${TextAnalysis.qualityCte}
       |SELECT d.source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(qm.n_tokens) AS BIGINT) AS sum_tokens,
       |       CAST(sum(qual.quality) // count(*) AS BIGINT) AS mean_quality,
       |       CAST(sum(nov.novelty_bp) // count(*) AS BIGINT) AS mean_novelty_bp,
       |       CAST(sum(nov.n_shared) * 10000 // sum(nov.n_shingles) AS BIGINT) AS shared_shingle_bp
       |FROM documents d
       |JOIN nov ON nov.doc_id = d.doc_id
       |JOIN qual ON qual.doc_id = d.doc_id
       |JOIN qm ON qm.doc_id = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipe1_pretrain_report" -> pipe1,
    "pipe2_curation_report" -> pipe2,
  )

  val oracle: Map[String, String] = Map(
    "pipe1_pretrain_report" -> pipe1Sql,
    "pipe2_curation_report" -> pipe2Sql,
  )
}
