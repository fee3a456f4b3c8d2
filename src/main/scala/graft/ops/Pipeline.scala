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

  // ---- PIPE3: end-to-end curation MATERIALIZATION ----

  private val Pipe3QualityMin = 7450L
  private val Pipe3Budget = 150000L
  private val Pipe3PackBudget = 512L

  /** Per-JVM output-dir token (the src4 convention): concurrent runs
    * against one dataset never share a sink directory; same-JVM re-runs
    * reuse and overwrite one. */
  private lazy val Pipe3Token =
    java.util.UUID.randomUUID().toString.substring(0, 8)

  /** PIPE3: the end-to-end curation job a real user ships — every stage
    * is an already-verified operator, composed into ONE run that ends in
    * a MATERIALIZED corpus (not a report):
    *
    *  1. ingest the d3/d10 dup-injected corpus (originals + exact copies
    *     + first-word-stripped near-copies), metadata recovered from the
    *     original row (orig = doc_id % 10⁶);
    *  2. near-dup KEEP-LIST (d10): MinHash bands → verified pairs →
    *     connected components → canonical member per cluster;
    *  3. quality GATE (t5's integer score ≥ 7450, n_chars = text length
    *     so injected near-copies score their own shortened text);
    *  4. BUDGET CUT (sel2): global (quality DESC, doc_id) rank via the
    *     distributed PrefixSum, maximal prefix with Σ tokens ≤ 150 000;
    *  5. sequence PACKING (pack1): per-language 512-token windows;
    *  6. MATERIALIZE through the GraftTsvSink two-phase commit and read
    *     the published files back.
    *
    * The oracle replays stages 1-5 in DuckDB and compares the READ-BACK
    * rows — a hash match certifies the whole chain AND the sink's
    * serialize → stage → commit → publish round trip at once.
    *
    * Scale: each stage is its verified operator's plan (banded candidate
    * generation, broadcast keep-list anti-join, one PrefixSum exchange,
    * per-shard pack windows, per-task staged sink files); no stage
    * collects rows to the driver beyond PrefixSum's bounded per-partition
    * totals. */
  /** The pipe3 TRANSFORM over any (doc_id, text, lang) corpus — every
    * stage 2-5 of the composite, without the sink: near-dup keep-list →
    * quality gate ≥ `qualityMin` → exact global budget cut (Σ tokens ≤
    * `budget`, PrefixSum-ranked by quality DESC) → per-lang
    * `packBudget`-token windows. Returns (doc_id, lang, win, toks) —
    * the library entry point ([[graft.api.GraftApi.curateCorpus]]). */
  private[graft] def curateAndPackOf(docs: DataFrame,
      qualityMin: Long = Pipe3QualityMin, budget: Long = Pipe3Budget,
      packBudget: Long = Pipe3PackBudget): DataFrame = {
    // 2. keep-list: collapse near-dup clusters to canonical members
    val kept = Dedup.dedupedCorpusOf(docs.select(col("doc_id"), col("text")))
    val withMeta = kept.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    // 3. quality gate over the kept docs' own text — quality is a pure
    // projection ([[TextAnalysis.withQuality]]) since round 16, so the
    // gate fuses into the token projection instead of self-joining two
    // projections of the kept frame (whose upstream anti-join + meta
    // join used to evaluate twice); kept doc_ids are unique, so the old
    // inner join on q was exactly this filter
    val scored = TextAnalysis.withQuality(
        withMeta.withColumn("n_chars", length(col("text")).cast("long")))
      .filter(col("quality") >= qualityMin)
      .select(col("doc_id"), col("lang"),
        size(filter(split(col("text"), " "), w => length(w) > 0))
          .cast("long").as("toks"),
        col("quality"))
    // 4. budget cut: exact global prefix under the token budget
    val ranked = PrefixSum.prefixRank(scored,
      Seq(col("quality").desc, col("doc_id").asc), sumCol = Some("toks"),
      pinInput = true).df
    val selected = ranked
      .filter(col("g_cum_excl") + col("toks") <= budget)
      .select(col("doc_id"), col("lang"), col("toks"))
    // 5. pack into per-language training windows
    ScaleOps.packWindowsOf(selected, "lang", "doc_id", "toks", packBudget)
      .select(col("doc_id"), col("lang"), col("win"), col("toks"))
  }

  val pipe3: Q = (s, d) => {
    // 1. ingest the dup-injected corpus, lang recovered from the original
    val corp = Dedup.corpus(s, d)
    val meta = Tables.documents(s, d)
      .select(col("doc_id").as("orig"), col("lang"))
    val ingest = corp.withColumn("orig", col("doc_id") % 1000000L)
      .join(meta, Seq("orig")).drop("orig")
    // 2-5. the transform stages
    val packed = curateAndPackOf(ingest)
    // 6. materialize + read back
    val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_pipe3_" + d.replaceAll("[^A-Za-z0-9]", "_") + "_" + Pipe3Token).toString
    packed.write.format("graft.sources.GraftTsvSink")
      .option("path", out).mode("overwrite").save()
    s.read.text(out + "/part-*.tsv")
      .select(split(col("value"), "\t").as("f"))
      .select(expr("CAST(f[0] AS BIGINT)").as("doc_id"),
        col("f").getItem(1).as("lang"),
        expr("CAST(f[2] AS BIGINT)").as("win"),
        expr("CAST(f[3] AS BIGINT)").as("toks"))
      .orderBy("doc_id")
  }
  val pipe3Sql: String =
    s"""WITH RECURSIVE p AS MATERIALIZED (${Dedup.d3Sql}),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM p
       |  UNION ALL
       |  SELECT id_b, id_a FROM p),
       |reach(id, lbl) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT r.id, e.b FROM reach r JOIN edges e ON r.lbl = e.a),
       |cc AS MATERIALIZED (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
       |${Dedup.corpusCte},
       |kept AS (
       |  SELECT c.doc_id, c.text FROM corpus c
       |  WHERE c.doc_id NOT IN (SELECT id FROM cc WHERE id <> cluster_id)),
       |km AS MATERIALIZED (
       |  SELECT k.doc_id, k.text, d.lang
       |  FROM kept k JOIN documents d ON d.doc_id = k.doc_id % 1000000),
       |qb AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(str_split(text, ' '), w -> len(w) > 0)) AS BIGINT) AS toks,
       |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |         CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS sum_tok_len,
       |         CAST(length(text) AS BIGINT) AS n_chars
       |  FROM km),
       |qs AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_stop FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM km)
       |  WHERE word IN ${TextAnalysis.stopListSql} GROUP BY doc_id),
       |qq AS (
       |  SELECT b.doc_id, b.toks, b.n_tokens,
       |         b.sum_tok_len * 100 // b.n_tokens AS mean_tok_len_x100,
       |         b.n_alpha * 10000 // greatest(b.n_chars, 1) AS alpha_bp,
       |         coalesce(s.n_stop, 0) * 10000 // b.n_tokens AS stop_bp
       |  FROM qb b LEFT JOIN qs s ON b.doc_id = s.doc_id),
       |gate AS (
       |  SELECT q.doc_id, m.lang, q.toks,
       |         (CASE WHEN q.n_tokens >= 20 THEN 2500 ELSE q.n_tokens * 125 END)
       |         + q.alpha_bp // 4 + q.stop_bp // 4
       |         + (CASE WHEN q.mean_tok_len_x100 BETWEEN 300 AND 800 THEN 2500 ELSE 0 END)
       |           AS quality
       |  FROM qq q JOIN km m ON m.doc_id = q.doc_id),
       |sel AS (
       |  SELECT doc_id, lang, toks FROM (
       |    SELECT doc_id, lang, toks,
       |           coalesce(sum(toks) OVER (ORDER BY quality DESC, doc_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
       |    FROM gate WHERE quality >= $Pipe3QualityMin)
       |  WHERE cum_excl + toks <= $Pipe3Budget)
       |SELECT doc_id, lang,
       |       CAST(coalesce(sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |         // $Pipe3PackBudget AS BIGINT) AS win,
       |       toks
       |FROM sel ORDER BY doc_id""".stripMargin

  // ---- PIPE4: incremental ingest admission (the nightly batch) ----

  /** PIPE4: the DAILY-INGEST composite beside pipe3's full build — a new
    * batch arrives and is admitted against the EXISTING corpus without
    * touching old×old:
    *
    *  1. split: d13's fixture convention (old = doc_id % 3 ≠ 0 of the
    *     dup-injected corpus, new = % 3 = 0 — the planted shells
    *     guarantee real cross-split near-dups);
    *  2. incremental dedup (d13's stored-index shape: the new batch's
    *     band keys probe the old corpus's capped band table; only cross
    *     candidates verify);
    *  3. quality gate (t5 ≥ 7450 on each survivor's own text);
    *  4. per-language admission accounting: arrived, surviving dedup,
    *     admitted past the gate, and the token budget the admitted docs
    *     actually add.
    *
    * Exactness: every stage is integer/set arithmetic over the d13 and
    * t5 machinery; the oracle replays the chain off the shared
    * `d13Ctes`. Scale: the old band table is the append-only dedup
    * index (built once per doc); the probe is |new batch| bands; the
    * quality gate and rollup touch only the new batch. */
  /** The pipe4 per-lang admission rollup for ONE arriving slice against
    * a static old corpus — `arrived` is (doc_id, text, lang, toks). Each
    * doc's verdict depends only on (its own text, the OLD corpus), so
    * these stats are an ADDITIVE monoid across arriving slices — what
    * lets the streaming twin (st32) maintain them by summed per-batch
    * deltas and finish bit-identical to the batch composite. */
  private[graft] def admissionDeltaOf(oldDocs: DataFrame,
      arrived: DataFrame): DataFrame =
    admissionRollup(arrived, Dedup.incrementalDroppedOf(oldDocs,
      arrived.select(col("doc_id"), col("text"))))

  /** The delta against a PREBUILT incremental index
    * ([[graft.ops.Dedup.incrementalIndexOf]]) — what the streaming twin
    * uses so the old corpus's minhash machinery runs once, not once per
    * micro-batch. */
  private[graft] def admissionDeltaAgainst(cappedBands: DataFrame,
      oldSets: DataFrame, arrived: DataFrame): DataFrame =
    admissionRollup(arrived, Dedup.incrementalDroppedAgainst(cappedBands, oldSets,
      arrived.select(col("doc_id"), col("text"))))

  /** Round-16 rollup shape (guide §2.3 "aggregate before you shuffle" /
    * §2.4): ONE groupBy(lang) with conditional sums over the arriving
    * frame LEFT-joined to the small DROP set, instead of the old
    * arrived-groupBy ⋈ admitted-groupBy diamond (which re-joined the
    * full batch against its own kept subset and shuffled the batch
    * twice). Quality is a pure projection ([[TextAnalysis.withQuality]]),
    * so no quality join either. Equivalence: `dropped` holds distinct
    * doc_ids (the left join cannot duplicate), quality is total over
    * arrived, and a lang whose docs are all dropped sums to 0 exactly
    * like the old left-join coalesce. */
  private def admissionRollup(arrived: DataFrame, dropped: DataFrame): DataFrame = {
    val admit = col("isdup").isNull && col("quality") >= Pipe3QualityMin
    TextAnalysis.withQuality(
        arrived.withColumn("n_chars", length(col("text")).cast("long")))
      .join(dropped.select(col("doc_id"), lit(1).as("isdup")), Seq("doc_id"), "left")
      .groupBy("lang").agg(
        count(lit(1)).as("n_arrived"),
        sum(when(col("isdup").isNull, 1L).otherwise(0L)).as("n_nondup"),
        sum(when(admit, 1L).otherwise(0L)).as("n_admitted"),
        sum(when(admit, col("toks")).otherwise(0L)).as("toks_admitted"))
  }

  /** pipe4's arriving slice for a (doc_id, text, lang) new-doc frame —
    * lang rides WITH the row (shells inherit their base row's lang
    * structurally via [[graft.ops.Dedup.injectShellsKeeping]]); only the
    * nonempty-token count is attached. Round-15: this replaced a
    * doc_id % 1e6 metadata join, which aliased to the wrong document for
    * base ids ≥ 1e6 and silently dropped batch-local rows in the
    * streaming twin — metadata must travel with the row, never be
    * re-derived from an id convention. */
  private[graft] def arrivedFrom(newDocs: DataFrame): DataFrame =
    newDocs.withColumn("toks",
      size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long"))

  val pipe4: Q = (s, d) => {
    val c = Dedup.injectShellsKeeping(
      Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
      Seq("lang"))
    val oldDocs = c.select("doc_id", "text").filter(col("doc_id") % 3 =!= 0)
    val newDocs = c.filter(col("doc_id") % 3 === 0)
    admissionDeltaOf(oldDocs, arrivedFrom(newDocs)).orderBy("lang")
  }
  val pipe4Sql: String =
    s"""WITH ${Dedup.d13Ctes},
       |arrived AS MATERIALIZED (
       |  SELECT c.doc_id, c.text, c.lang,
       |         CAST(len(list_filter(str_split(c.text, ' '), w -> len(w) > 0)) AS BIGINT) AS toks
       |  FROM (SELECT doc_id, text, lang FROM documents
       |        UNION ALL
       |        SELECT doc_id + 1000000, text, lang FROM documents WHERE doc_id % 7 = 0
       |        UNION ALL
       |        SELECT doc_id + 2000000, substr(text, strpos(text, ' ') + 1), lang
       |        FROM documents WHERE doc_id % 11 = 0) c
       |  WHERE c.doc_id % 3 = 0),
       |nondup AS (
       |  SELECT doc_id FROM arrived
       |  WHERE doc_id NOT IN (SELECT id_new FROM dropped)),
       |aqb AS (
       |  SELECT doc_id,
       |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |         CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS sum_tok_len,
       |         CAST(length(text) AS BIGINT) AS n_chars
       |  FROM arrived),
       |aqs AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_stop FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM arrived)
       |  WHERE word IN ${TextAnalysis.stopListSql} GROUP BY doc_id),
       |aqual AS (
       |  SELECT b.doc_id,
       |         (CASE WHEN b.n_tokens >= 20 THEN 2500 ELSE b.n_tokens * 125 END)
       |         + (b.n_alpha * 10000 // greatest(b.n_chars, 1)) // 4
       |         + (coalesce(s.n_stop, 0) * 10000 // b.n_tokens) // 4
       |         + (CASE WHEN b.sum_tok_len * 100 // b.n_tokens BETWEEN 300 AND 800
       |                 THEN 2500 ELSE 0 END) AS quality
       |  FROM aqb b LEFT JOIN aqs s ON s.doc_id = b.doc_id),
       |adm AS (
       |  SELECT a.lang, a.toks, q.quality >= $Pipe3QualityMin AS admit
       |  FROM arrived a
       |  JOIN nondup n ON n.doc_id = a.doc_id
       |  JOIN aqual q ON q.doc_id = a.doc_id)
       |SELECT a.lang,
       |       CAST(count(*) AS BIGINT) AS n_arrived,
       |       CAST(coalesce(m.n_nondup, 0) AS BIGINT) AS n_nondup,
       |       CAST(coalesce(m.n_admitted, 0) AS BIGINT) AS n_admitted,
       |       CAST(coalesce(m.toks_admitted, 0) AS BIGINT) AS toks_admitted
       |FROM arrived a
       |LEFT JOIN (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_nondup,
       |         CAST(sum(CASE WHEN admit THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       |         CAST(sum(CASE WHEN admit THEN toks ELSE 0 END) AS BIGINT) AS toks_admitted
       |  FROM adm GROUP BY lang) m ON m.lang = a.lang
       |GROUP BY a.lang, m.n_nondup, m.n_admitted, m.toks_admitted
       |ORDER BY a.lang""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipe1_pretrain_report" -> pipe1,
    "pipe2_curation_report" -> pipe2,
    "pipe3_curated_corpus" -> pipe3,
    "pipe4_incremental_admission" -> pipe4,
  )

  val oracle: Map[String, String] = Map(
    "pipe1_pretrain_report" -> pipe1Sql,
    "pipe2_curation_report" -> pipe2Sql,
    "pipe3_curated_corpus" -> pipe3Sql,
    "pipe4_incremental_admission" -> pipe4Sql,
  )
}
