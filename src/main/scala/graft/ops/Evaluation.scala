package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] Measurement & audit operators: retrieval-quality evaluation
  * (MRR / DCG / nDCG / precision / recall over a ranked list), two
  * distribution-drift audits (PSI and the Kolmogorov–Smirnov distance),
  * the deterministic train/val/test hash split, and a token-blocklist
  * content filter. These are the ops a training-data pipeline runs to
  * JUDGE its retrieval index, its incoming batches, and its split
  * hygiene — the measurement half that the selection/curation families
  * act on.
  *
  * Exactness across engines: ranks, counts and bin ids are exact
  * integers; every transcendental (the nDCG log-discount, the PSI
  * log-ratio) follows the t14/stat2 convention — ONE double expression
  * over identical exact-integer operands, rounded ONCE to an e6/bp
  * integer — so every query hash-matches its DuckDB oracle.
  */
object Evaluation {
  type Q = (SparkSession, String) => DataFrame

  // ---- EVAL1: IR metrics of the ANN ranking vs label relevance ----

  /** Retrieval evaluation of a ranked candidate list against binary
    * relevance labels — per query: MRR, DCG@k / ideal DCG / nDCG,
    * precision@k and corpus recall@k. `ranked` is (q_id, cand_id, rk)
    * (rk 1-based, ≤ k rows per query), `labels` is (vec_id, label);
    * a candidate is relevant iff it shares the query's label.
    *
    * The log2 position discount gain(r) = round(10^6·ln 2 / ln(r+1)) is
    * rounded PER POSITION to an e6 integer before summing (both DCG and
    * ideal DCG), so the ratio ndcg_bp is pure integer division —
    * engine-exact. Ideal DCG sums the first min(n_rel, k) discounts via
    * a closed-form `aggregate(sequence(...))` fold, no extra join.
    *
    * Scale: the ranked frame is |Q|·k rows by construction — everything
    * here after the (broadcast) label joins is bounded by the query set,
    * not the corpus; the one corpus-sized touch is the label-frequency
    * aggregate (one map-side-combined scan). The library entry point is
    * [[graft.api.GraftApi.irMetrics]]. */
  private[graft] def irMetricsOf(ranked: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    // corpus relevant count per label, query itself excluded; the label
    // table joins against the |Q|·k ranked frame — Spark broadcasts the
    // SMALL (ranked) side on its own, so no hint that would pin the
    // corpus-sized labels into executor memory at scale
    val labFreq = labels.groupBy("label").agg(count(lit(1)).as("n_label"))
    val rel = ranked
      .join(labels.select(col("vec_id").as("cand_id"), col("label").as("c_label")), Seq("cand_id"))
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("q_label")), Seq("q_id"))
      .join(broadcast(labFreq), col("q_label") === col("label"))
      .withColumn("n_rel_corpus", col("n_label") - 1L)
      .withColumn("rel", (col("c_label") === col("q_label")).cast("long"))
      .withColumn("gain_e6", when(col("rel") === 1L,
        expr("CAST(round(1000000 * ln(2.0) / ln(CAST(rk AS DOUBLE) + 1.0)) AS BIGINT)"))
        .otherwise(lit(0L)))
    rel.groupBy("q_id", "q_label", "n_rel_corpus")
      .agg(sum("rel").as("n_rel_at_k"),
        min(when(col("rel") === 1L, col("rk"))).as("first_rel_rank"),
        sum("gain_e6").as("dcg_e6"))
      .withColumn("mrr_e6", coalesce(expr("1000000L div first_rel_rank"), lit(0L)))
      .withColumn("first_rel_rank", coalesce(col("first_rel_rank"), lit(0)))
      .withColumn("idcg_e6", expr(
        s"""aggregate(sequence(1L, least(n_rel_corpus, ${k}L)), 0L,
           |  (acc, r) -> acc + CAST(round(1000000 * ln(2.0) / ln(CAST(r AS DOUBLE) + 1.0)) AS BIGINT))""".stripMargin))
      .withColumn("ndcg_bp", expr("dcg_e6 * 10000 div greatest(idcg_e6, 1)"))
      .withColumn("p_at_k_bp", expr(s"n_rel_at_k * 10000 div ${k}L"))
      .withColumn("r_at_k_bp", expr("n_rel_at_k * 10000 div greatest(n_rel_corpus, 1)"))
      .select("q_id", "q_label", "n_rel_corpus", "n_rel_at_k", "first_rel_rank",
        "mrr_e6", "dcg_e6", "idcg_e6", "ndcg_bp", "p_at_k_bp", "r_at_k_bp")
  }

  val eval1: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val ranked = Similarity.cosineTopKOf(emb, emb.filter(col("vec_id") % 50 === 0), k = 10)
      .select("q_id", "cand_id", "rk")
    irMetricsOf(ranked, emb.select("vec_id", "label"), k = 10).orderBy("q_id")
  }
  val eval1Sql: String =
    s"""WITH ${Similarity.qnormCte},
       |dots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qn a JOIN qn b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm),
       |ranked AS MATERIALIZED (
       |  SELECT q_id, cand_id,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id)
       |           AS INTEGER) AS rk
       |  FROM dots),
       |topk AS (SELECT * FROM ranked WHERE rk <= 10),
       |lfreq AS (SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM embeddings GROUP BY label),
       |rel AS (
       |  SELECT t.q_id, ql.label AS q_label, lf.n_label - 1 AS n_rel_corpus, t.rk,
       |         CASE WHEN cl.label = ql.label THEN 1 ELSE 0 END AS rel,
       |         CASE WHEN cl.label = ql.label
       |              THEN CAST(round(1000000 * ln(2.0) / ln(CAST(t.rk AS DOUBLE) + 1.0)) AS BIGINT)
       |              ELSE 0 END AS gain_e6
       |  FROM topk t
       |  JOIN embeddings ql ON ql.vec_id = t.q_id
       |  JOIN embeddings cl ON cl.vec_id = t.cand_id
       |  JOIN lfreq lf ON lf.label = ql.label),
       |agg AS (
       |  SELECT q_id, q_label, n_rel_corpus,
       |         CAST(count(*) AS BIGINT) AS n_ranked,
       |         CAST(sum(rel) AS BIGINT) AS n_rel_at_k,
       |         min(CASE WHEN rel = 1 THEN rk END) AS frr,
       |         CAST(sum(gain_e6) AS BIGINT) AS dcg_e6
       |  FROM rel GROUP BY q_id, q_label, n_rel_corpus)
       |SELECT q_id, q_label, n_rel_corpus, n_rel_at_k,
       |       CAST(coalesce(frr, 0) AS INTEGER) AS first_rel_rank,
       |       CAST(coalesce(1000000 // frr, 0) AS BIGINT) AS mrr_e6,
       |       dcg_e6,
       |       CAST(list_sum(list_transform(range(1, CAST(least(n_rel_corpus, 10) AS INTEGER) + 1),
       |         r -> CAST(round(1000000 * ln(2.0) / ln(CAST(r AS DOUBLE) + 1.0)) AS BIGINT))) AS BIGINT) AS idcg_e6,
       |       CAST(dcg_e6 * 10000 // greatest(CAST(list_sum(list_transform(range(1, CAST(least(n_rel_corpus, 10) AS INTEGER) + 1),
       |         r -> CAST(round(1000000 * ln(2.0) / ln(CAST(r AS DOUBLE) + 1.0)) AS BIGINT))) AS BIGINT), 1) AS BIGINT) AS ndcg_bp,
       |       n_rel_at_k * 10000 // 10 AS p_at_k_bp,
       |       n_rel_at_k * 10000 // greatest(n_rel_corpus, 1) AS r_at_k_bp
       |FROM agg ORDER BY q_id""".stripMargin

  // ---- DQ3: PSI drift audit (per-source vs reference, binned) ----

  /** Population Stability Index of each source's length distribution
    * against a reference source — THE model-monitoring drift score
    * (PSI = Σ_b (p_b − q_b)·ln(p_b/q_b), Laplace-smoothed so empty bins
    * are defined). Bins are fixed-width on n_chars (floor(v/50) capped
    * at bin 10 → 11 bins), so the bin histogram is value-domain-bounded:
    * after ONE corpus scan everything runs on |sources|·11 rows. Each
    * bin's contribution is rounded once to an e6 integer (ln over a
    * ratio of exact-integer products — the stat2 convention), then
    * integer-summed: engine-exact, and a drift threshold (classically
    * PSI > 0.2 ⇒ investigate) becomes an exact integer comparison. */
  private[graft] def psiDriftOf(docs: DataFrame, refSource: String): DataFrame = {
    val binned = docs.select(col("source"),
      expr("least(n_chars div 50, 10L)").as("bin"))
    psiFromBinCounts(binned.groupBy("source", "bin").agg(count(lit(1)).as("c")), refSource)
  }

  /** PSI from a pre-aggregated (source, bin, c) bin-count frame — the
    * shared tail of [[psiDriftOf]] and the streaming st15 variant (whose
    * foreachBatch maintains exactly these counts incrementally); one
    * code path means the streaming answer is bit-identical to dq3's. */
  private[graft] def psiFromBinCounts(counts: DataFrame, refSource: String): DataFrame = {
    val nBins = 11
    val totals = counts.groupBy("source").agg(sum("c").as("n"))
    val grid = totals.select(col("source"), col("n"),
        explode(expr(s"sequence(0L, ${nBins - 1}L)")).as("bin"))
      .join(counts, Seq("source", "bin"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val ref = grid.filter(col("source") === refSource)
      .select(col("bin"), col("c").as("rc"), col("n").as("rn"))
    grid.join(broadcast(ref), Seq("bin"))
      .withColumn("contrib_e6", expr(
        s"""CAST(round((((c + 1) / CAST(n + $nBins AS DOUBLE)) - ((rc + 1) / CAST(rn + $nBins AS DOUBLE)))
           | * ln(((c + 1) * CAST(rn + $nBins AS DOUBLE)) / ((rc + 1) * CAST(n + $nBins AS DOUBLE)))
           | * 1000000) AS BIGINT)""".stripMargin))
      .groupBy("source")
      .agg(max("n").as("n_docs"), sum("contrib_e6").as("psi_e6"))
      .withColumn("drifted", col("psi_e6") > 200000L)
  }

  val dq3: Q = (s, d) =>
    psiDriftOf(Tables.documents(s, d), "src0").orderBy("source")
  val dq3Sql: String =
    """WITH b AS (
      |  SELECT source, least(n_chars // 50, 10) AS bin FROM documents),
      |counts AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY source, bin),
      |totals AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY source),
      |grid AS MATERIALIZED (
      |  SELECT t.source, t.n, g.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c
      |  FROM totals t
      |  CROSS JOIN (SELECT unnest(range(0, 11)) AS bin) g
      |  LEFT JOIN counts c ON c.source = t.source AND c.bin = g.bin),
      |ref AS (SELECT bin, c AS rc, n AS rn FROM grid WHERE source = 'src0'),
      |contrib AS (
      |  SELECT g.source, g.n,
      |         CAST(round((((g.c + 1) / CAST(g.n + 11 AS DOUBLE)) - ((r.rc + 1) / CAST(r.rn + 11 AS DOUBLE)))
      |           * ln(((g.c + 1) * CAST(r.rn + 11 AS DOUBLE)) / ((r.rc + 1) * CAST(g.n + 11 AS DOUBLE)))
      |           * 1000000) AS BIGINT) AS contrib_e6
      |  FROM grid g JOIN ref r ON r.bin = g.bin)
      |SELECT source, max(n) AS n_docs, CAST(sum(contrib_e6) AS BIGINT) AS psi_e6,
      |       CAST(sum(contrib_e6) AS BIGINT) > 200000 AS drifted
      |FROM contrib GROUP BY source ORDER BY source""".stripMargin

  // ---- DQ4: two-sample Kolmogorov–Smirnov distance ----

  /** Exact two-sample KS distance of each source's n_chars distribution
    * vs the reference: D = max_v |F_s(v) − F_ref(v)|, computed in PURE
    * integers as max |cf_s·n_ref − cf_ref·n_s| (cross-multiplied CDFs —
    * no division until the single final e6 rounding). The CDF alignment
    * runs on the VALUE GRID (distinct n_chars × sources — value-domain
    * bounded, like dq2's percentile histograms), with one windowed
    * cumsum per source over the shared value axis; never a global sort
    * of the corpus. Integer headroom: cf·n ≤ n_s·n_ref — exact in int64
    * to ~3·10⁹ rows per side. KS (unlike PSI) is binning-free and
    * sensitive to ANY CDF gap, so the two audits are complementary. */
  private[graft] def ksDistanceOf(docs: DataFrame, refSource: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = docs.groupBy(col("source"), col("n_chars").as("v")).agg(count(lit(1)).as("f"))
    val totals = freq.groupBy("source").agg(sum("f").as("n"))
    val values = freq.select("v").distinct()
    val grid = totals.crossJoin(values)
      .join(freq, Seq("source", "v"), "left")
      .withColumn("f", coalesce(col("f"), lit(0L)))
      .withColumn("cf", sum("f").over(
        Window.partitionBy("source").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ref = grid.filter(col("source") === refSource)
      .select(col("v"), col("cf").as("rcf"), col("n").as("rn"))
    grid.join(broadcast(ref), Seq("v"))
      .withColumn("xdiff", abs(col("cf") * col("rn") - col("rcf") * col("n")))
      .groupBy("source")
      .agg(max("n").as("n_docs"), max("rn").as("n_ref"), max("xdiff").as("d_num"))
      .withColumn("d_e6", expr(
        "CAST(round(1000000 * CAST(d_num AS DOUBLE) / (CAST(n_docs AS DOUBLE) * CAST(n_ref AS DOUBLE))) AS BIGINT)"))
  }

  val dq4: Q = (s, d) =>
    ksDistanceOf(Tables.documents(s, d), "src0").orderBy("source")
  val dq4Sql: String =
    """WITH freq AS (
      |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS f
      |  FROM documents GROUP BY source, n_chars),
      |totals AS (SELECT source, CAST(sum(f) AS BIGINT) AS n FROM freq GROUP BY source),
      |vals AS (SELECT DISTINCT v FROM freq),
      |grid AS MATERIALIZED (
      |  SELECT t.source, t.n, va.v,
      |         CAST(sum(coalesce(fr.f, 0)) OVER (PARTITION BY t.source ORDER BY va.v) AS BIGINT) AS cf
      |  FROM totals t CROSS JOIN vals va
      |  LEFT JOIN freq fr ON fr.source = t.source AND fr.v = va.v),
      |ref AS (SELECT v, cf AS rcf, n AS rn FROM grid WHERE source = 'src0')
      |SELECT g.source, max(g.n) AS n_docs, max(r.rn) AS n_ref,
      |       CAST(max(abs(g.cf * r.rn - r.rcf * g.n)) AS BIGINT) AS d_num,
      |       CAST(round(1000000 * CAST(max(abs(g.cf * r.rn - r.rcf * g.n)) AS DOUBLE)
      |         / (CAST(max(g.n) AS DOUBLE) * CAST(max(r.rn) AS DOUBLE))) AS BIGINT) AS d_e6
      |FROM grid g JOIN ref r ON r.v = g.v
      |GROUP BY g.source ORDER BY g.source""".stripMargin

  // ---- SPLIT1: deterministic train/val/test hash split ----

  /** Deterministic 80/10/10 train/val/test assignment by salted-md5
    * draw — the split a 100 TB pipeline actually uses: map-side,
    * RNG-free, rerun-stable (a document's split never changes when the
    * corpus around it grows — the property `randomSplit` lacks), and
    * auditable per stratum. Output: per (lang, split) counts, char
    * volume, and the within-stratum share in basis points. One scan +
    * one tiny aggregate; the draw reuses [[ScaleOps.bernoulliKeep]]'s
    * hex-prefix idiom. */
  private[graft] def hashSplitOf(docs: DataFrame): DataFrame = {
    val draw = conv(substring(md5(concat(lit("split1:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
      .cast("long") % 10000
    val tagged = docs.withColumn("split",
      when(draw < 8000, "train").when(draw < 9000, "val").otherwise("test"))
    val strata = tagged.groupBy("lang").agg(count(lit(1)).as("n_stratum"))
    tagged.groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars_sum"))
      .join(broadcast(strata), Seq("lang"))
      .withColumn("share_bp", expr("n_docs * 10000 div n_stratum"))
  }

  val split1: Q = (s, d) =>
    hashSplitOf(Tables.documents(s, d)).orderBy("lang", "split")
  val split1Sql: String =
    """WITH tagged AS (
      |  SELECT lang, n_chars,
      |         CASE WHEN d < 8000 THEN 'train' WHEN d < 9000 THEN 'val' ELSE 'test' END AS split
      |  FROM (SELECT lang, n_chars,
      |          (('0x' || substr(md5('split1:' || doc_id::VARCHAR), 1, 4))::BIGINT % 10000) AS d
      |        FROM documents)),
      |strata AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_stratum FROM tagged GROUP BY lang)
      |SELECT t.lang, t.split, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
      |       any_value(s.n_stratum) AS n_stratum,
      |       CAST(count(*) AS BIGINT) * 10000 // any_value(s.n_stratum) AS share_bp
      |FROM tagged t JOIN strata s ON s.lang = t.lang
      |GROUP BY t.lang, t.split ORDER BY t.lang, t.split""".stripMargin

  // ---- TOX1: token-blocklist content filter ----

  /** Token-boundary blocklist filter (the C4/refined-web "bad words"
    * pass): per-source flagged-document counts, flag rate, and total
    * hit volume. Matching is EXACT whole-token membership — an array
    * lambda over the whitespace tokens, not a substring regex (so
    * "assess" never matches a blocked "ass"). Map-side projection +
    * one aggregate; the blocklist is a plan-time literal (at 100 TB, a
    * broadcast join against a blocklist table — same shape). The
    * library entry point takes any list ([[graft.api.GraftApi]]) — the
    * literal is injected through `typedLit`, never string-interpolated
    * into SQL, so words with quotes ("don't") are safe. */
  private[graft] def blocklistStatsOf(docs: DataFrame, blocklist: Seq[String]): DataFrame = {
    val listCol = typedLit(blocklist)
    docs
      .withColumn("hits",
        size(filter(split(col("text"), " "),
          w => array_contains(listCol, w))).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum("hits").as("total_hits"))
      .withColumn("flag_bp", expr("n_flagged * 10000 div n_docs"))
  }

  val tox1: Q = (s, d) =>
    blocklistStatsOf(Tables.documents(s, d), Seq("dup", "slow")).orderBy("source")
  val tox1Sql: String =
    """WITH h AS (
      |  SELECT source,
      |         CAST(len(list_filter(str_split(text, ' '), w -> w IN ('dup', 'slow'))) AS BIGINT) AS hits
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |       CAST(sum(hits) AS BIGINT) AS total_hits,
      |       CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) * 10000
      |         // CAST(count(*) AS BIGINT) AS flag_bp
      |FROM h GROUP BY source ORDER BY source""".stripMargin

  // ---- TOX2: severity-tiered blocklist policy ----

  /** TOX2: the severity-tiered extension of tox1 — real moderation
    * policies don't treat all blocklist hits alike: a severe-tier hit
    * (weight 5) blocks a document outright, mild-tier hits (weight 1)
    * accumulate toward review. Emits per source: document counts under
    * the three dispositions (block = any severe hit; review = no severe
    * but ≥1 mild; pass), tier hit volumes, and the weighted score —
    * the shape a tiered-filter rollout is evaluated with before
    * flipping it on. Same exact whole-token matching and one-scan
    * aggregate plan as tox1; tiers are plan-time literals (broadcast
    * blocklist tables at 100 TB). Library entry point:
    * [[graft.api.GraftApi.tieredBlocklistStats]]. */
  private[graft] def tieredBlocklistStatsOf(docs: DataFrame,
      severe: Seq[String], mild: Seq[String]): DataFrame = {
    def hitsIn(ws: Seq[String]): Column = {
      val listCol = typedLit(ws)
      size(filter(split(col("text"), " "),
        w => array_contains(listCol, w))).cast("long")
    }
    docs
      .withColumn("sev", hitsIn(severe))
      .withColumn("mild", hitsIn(mild))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("sev") > 0, 1L).otherwise(0L)).as("n_block"),
        sum(when(col("sev") === 0 && col("mild") > 0, 1L).otherwise(0L)).as("n_review"),
        sum("sev").as("sev_hits"),
        sum("mild").as("mild_hits"))
      .withColumn("n_pass", expr("n_docs - n_block - n_review"))
      .withColumn("wscore", expr("5 * sev_hits + mild_hits"))
      .orderBy("source")
  }

  val tox2: Q = (s, d) =>
    tieredBlocklistStatsOf(Tables.documents(s, d),
      severe = Seq("dup"), mild = Seq("slow", "big"))
  val tox2Sql: String =
    """WITH h AS (
      |  SELECT source,
      |         CAST(len(list_filter(str_split(text, ' '), w -> w IN ('dup'))) AS BIGINT) AS sev,
      |         CAST(len(list_filter(str_split(text, ' '), w -> w IN ('slow', 'big'))) AS BIGINT) AS mild
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN sev > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_block,
      |       CAST(sum(CASE WHEN sev = 0 AND mild > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_review,
      |       CAST(sum(sev) AS BIGINT) AS sev_hits,
      |       CAST(sum(mild) AS BIGINT) AS mild_hits,
      |       CAST(count(*) - sum(CASE WHEN sev > 0 THEN 1 ELSE 0 END)
      |            - sum(CASE WHEN sev = 0 AND mild > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |       CAST(5 * sum(sev) + sum(mild) AS BIGINT) AS wscore
      |FROM h GROUP BY source ORDER BY source""".stripMargin

  // ---- EVAL3: Cohen's kappa — inter-rater agreement beyond chance ----

  /** EVAL3: Cohen's kappa (Cohen 1960) between two document-quality
    * raters — the audit run before replacing an expensive rater with a
    * cheap heuristic (or before trusting LLM-judge labels against human
    * ones): rater A = the cheap length rule (n_chars ≥ 200), rater B =
    * the composite t5 quality score (≥ 5000). Raw agreement po is
    * inflated by chance; kappa subtracts the chance-agreement floor pe
    * from both sides: κ = (po − pe)/(1 − pe).
    *
    * Exactness: the whole statistic is one exact rational —
    * κ = (n·(n11+n00) − (a1·b1 + a0·b0)) / (n² − (a1·b1 + a0·b0)) —
    * so both engines compute identical integers; the e6 scaling divides
    * with EXPLICIT sign-splitting because κ can be negative and Spark's
    * `div` truncates toward zero while DuckDB's `//` floors — the CASE
    * makes both truncate. All products run in DECIMAL(38,0)/HUGEINT
    * (n·agree and n² are corpus² — the eval2 overflow class).
    *
    * Scale: one corpus scan into a 4-cell confusion aggregate; the
    * kappa arithmetic is a 1-row projection. */
  private[graft] def cohensKappaOf(rated: DataFrame): DataFrame =
    rated
      .agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN a = 1 AND b = 1 THEN 1L ELSE 0L END")).as("n11"),
        sum(expr("CASE WHEN a = 1 AND b = 0 THEN 1L ELSE 0L END")).as("n10"),
        sum(expr("CASE WHEN a = 0 AND b = 1 THEN 1L ELSE 0L END")).as("n01"),
        sum(expr("CASE WHEN a = 0 AND b = 0 THEN 1L ELSE 0L END")).as("n00"))
      .withColumn("chance", expr(
        "(CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01) + CAST(n01 + n00 AS DECIMAL(38,0)) * (n10 + n00))"))
      .withColumn("po_e6", expr(
        "CAST(CAST(n11 + n00 AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"))
      .withColumn("pe_e6", expr(
        "CAST(chance * 1000000 div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
      .withColumn("knum", expr("CAST(n AS DECIMAL(38,0)) * (n11 + n00) - chance"))
      .withColumn("kden", expr("CAST(n AS DECIMAL(38,0)) * n - chance"))
      .withColumn("kappa_e6", expr(
        "CASE WHEN kden = 0 THEN 0L " +
          "WHEN knum >= 0 THEN CAST(knum * 1000000 div kden AS BIGINT) " +
          "ELSE -CAST((-knum) * 1000000 div kden AS BIGINT) END"))
      .select("n", "n11", "n10", "n01", "n00", "po_e6", "pe_e6", "kappa_e6")

  val eval3: Q = (s, d) => {
    val q = TextAnalysis.qualityScoreOf(Tables.documents(s, d))
      .select(col("doc_id"), col("quality"))
    val rated = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      .join(q, Seq("doc_id"))
      .select(
        when(col("n_chars") >= 200, 1).otherwise(0).as("a"),
        when(col("quality") >= 5000, 1).otherwise(0).as("b"))
    cohensKappaOf(rated)
  }
  val eval3Sql: String =
    s"""WITH ${TextAnalysis.qualityCte},
       |rated AS (
       |  SELECT CASE WHEN d.n_chars >= 200 THEN 1 ELSE 0 END AS a,
       |         CASE WHEN q.quality >= 5000 THEN 1 ELSE 0 END AS b
       |  FROM documents d JOIN qual q ON q.doc_id = d.doc_id),
       |cm AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
       |         CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
       |         CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
       |         CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
       |  FROM rated),
       |k AS (
       |  SELECT *,
       |         CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
       |           + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS chance
       |  FROM cm)
       |SELECT n, n11, n10, n01, n00,
       |       CAST(CAST(n11 + n00 AS HUGEINT) * 1000000 // n AS BIGINT) AS po_e6,
       |       CAST(chance * 1000000 // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_e6,
       |       CASE WHEN CAST(n AS HUGEINT) * n - chance = 0 THEN CAST(0 AS BIGINT)
       |            WHEN CAST(n AS HUGEINT) * (n11 + n00) - chance >= 0
       |              THEN CAST((CAST(n AS HUGEINT) * (n11 + n00) - chance) * 1000000
       |                     // (CAST(n AS HUGEINT) * n - chance) AS BIGINT)
       |            ELSE -CAST((chance - CAST(n AS HUGEINT) * (n11 + n00)) * 1000000
       |                     // (CAST(n AS HUGEINT) * n - chance) AS BIGINT) END AS kappa_e6
       |FROM k""".stripMargin

  // ---- DQ5: Benford first-digit audit ----

  /** Benford expected first-digit shares, log10(1 + 1/d)·10⁶ rounded —
    * computed ONCE on the JVM and injected as the SAME literals into
    * both dialects, so no runtime transcendental can diverge. */
  private[graft] val BenfordE6: Map[Int, Long] =
    (1 to 9).map(d => d -> math.round(math.log10(1.0 + 1.0 / d) * 1e6)).toMap

  /** DQ5: Benford's-law first-digit audit over a positive integer value
    * column — the classic fabricated-/corrupted-numeric-data screen a
    * pipeline runs over money or count columns before trusting a new
    * feed. Per digit: observed count, observed share (e6), the Benford
    * expectation (a JVM-literal constant), and the absolute deviation.
    * The summary row criterion (max deviation) stays with the caller —
    * the per-digit frame IS the audit artifact.
    *
    * Scale: one scan into a 9-cell aggregate; share math in
    * DECIMAL(38,0) (count·10⁶ wraps int64 at ~9e12 rows). */
  /** The audit tail over an already-aggregated (digit, n_obs) frame —
    * split out so the streaming monitor (st18) can feed MERGED
    * micro-batch counts through the identical arithmetic (digit counts
    * are trivially mergeable, so stream-end == batch bit-for-bit). */
  private[graft] def benfordFromCounts(counts: DataFrame): DataFrame = {
    val expCase = BenfordE6.toSeq.sortBy(_._1)
      .map { case (dg, e) => s"WHEN digit = $dg THEN ${e}L" }
      .mkString("CASE ", " ", " ELSE 0L END")
    counts
      .withColumn("total", sum("n_obs").over(org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))))
      .withColumn("share_e6", expr(
        "CAST(CAST(n_obs AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)"))
      .withColumn("benford_e6", expr(expCase))
      .withColumn("dev_e6", expr("abs(share_e6 - benford_e6)"))
      .select("digit", "n_obs", "share_e6", "benford_e6", "dev_e6")
  }

  /** First digit of a positive integer value column, BIGINT-typed —
    * shared by the batch audit and the streaming monitor's per-batch
    * delta. */
  private[graft] def firstDigit(valueCol: String): Column =
    expr(s"CAST(substring(CAST($valueCol AS STRING), 1, 1) AS BIGINT)")

  private[graft] def benfordOf(values: DataFrame, valueCol: String): DataFrame =
    benfordFromCounts(
      values
        .filter(col(valueCol) > 0)
        .select(firstDigit(valueCol).as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs")))

  val dq5: Q = (s, d) =>
    benfordOf(Tables.lineitem(s, d).select(Money.cents(col("l_extendedprice")).as("v")), "v")
      .orderBy("digit")
  val dq5Sql: String = {
    val expCase = BenfordE6.toSeq.sortBy(_._1)
      .map { case (dg, e) => s"WHEN digit = $dg THEN $e" }
      .mkString("CASE ", " ", " ELSE 0 END")
    s"""WITH v AS (
       |  SELECT CAST(substr(CAST(${Money.centsSql("l_extendedprice")} AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM lineitem WHERE ${Money.centsSql("l_extendedprice")} > 0),
       |agg AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM v GROUP BY digit),
       |t AS (SELECT *, CAST(sum(n_obs) OVER () AS BIGINT) AS total FROM agg)
       |SELECT digit, n_obs,
       |       CAST(CAST(n_obs AS HUGEINT) * 1000000 // total AS BIGINT) AS share_e6,
       |       CAST($expCase AS BIGINT) AS benford_e6,
       |       CAST(abs(CAST(CAST(n_obs AS HUGEINT) * 1000000 // total AS BIGINT) - ($expCase)) AS BIGINT) AS dev_e6
       |FROM t ORDER BY digit""".stripMargin
  }

  // ---- EVAL4: unbiased pass@k estimator ----

  /** The k values the registry reports (fixed, so the falling-factorial
    * products unroll into literal expressions in both dialects). */
  private[graft] val PassAtKs = Seq(1, 5, 10)

  /** Falling factorial `base·(base−1)·…·(base−k+1)` as an unrolled
    * product string — `castHead` wraps the FIRST factor so the whole
    * chain runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): with up to
    * ~1000 samples per task a k=10 product reaches 10³⁰, far past int64
    * but comfortably inside 38 digits. ONE builder, two dialects. */
  private def fallingFactorial(base: String, k: Int, castHead: String => String): String =
    (0 until k).map(i => if (i == 0) castHead(s"($base)") else s"($base - $i)")
      .mkString(" * ")

  /** EVAL4: the unbiased pass@k estimator (Chen et al. 2021, the
    * HumanEval/codegen evaluation statistic): given n samples per task
    * with c passing, pass@k = 1 − C(n−c, k)/C(n, k) — the probability at
    * least one of k drawn samples passes. The naive "mean over random
    * k-subsets" is biased and high-variance; this closed form is the
    * standard.
    *
    * Exactness: C(n−c,k)/C(n,k) = Π_{i<k}(n−c−i) / Π_{i<k}(n−i) — two
    * falling factorials in DECIMAL(38,0)/HUGEINT (no binomials, no
    * doubles anywhere), one integral division to e6. n−c < k short-
    * circuits to exactly 10⁶ (every k-subset must contain a pass).
    * Tasks with n < k emit no row for that k (the estimator is
    * undefined there).
    *
    * Scale: one corpus scan into a per-task (n, c) aggregate; the
    * estimator is a per-task projection — embarrassingly parallel. */
  private[graft] def passAtKOf(samples: DataFrame, taskCol: String,
      passCol: String): DataFrame = {
    val perTask = samples.groupBy(col(taskCol).as("task_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(passCol) === 1, 1L).otherwise(0L)).as("c"))
    PassAtKs.map { k =>
      val num = fallingFactorial("n - c", k, e => s"CAST($e AS DECIMAL(38,0))")
      val den = fallingFactorial("n", k, e => s"CAST($e AS DECIMAL(38,0))")
      perTask.filter(col("n") >= k)
        .select(col("task_id"), lit(k).as("k"), col("n"), col("c"),
          expr(s"CASE WHEN n - c < $k THEN 1000000L " +
            s"ELSE 1000000L - CAST(($num) * 1000000 div ($den) AS BIGINT) END")
            .as("pass_at_k_e6"))
    }.reduce(_ unionAll _)
  }

  val eval4: Q = (s, d) => {
    val q = TextAnalysis.qualityScoreOf(Tables.documents(s, d))
      .select(col("doc_id"), when(col("quality") >= 5000, 1).otherwise(0).as("pass"))
    passAtKOf(q.select(expr("doc_id div 100").as("task_id"), col("pass")),
      "task_id", "pass").orderBy("task_id", "k")
  }
  val eval4Sql: String = {
    def branch(k: Int): String = {
      val num = fallingFactorial("n - c", k, e => s"CAST($e AS HUGEINT)")
      val den = fallingFactorial("n", k, e => s"CAST($e AS HUGEINT)")
      s"""SELECT task_id, CAST($k AS INTEGER) AS k, n, c,
         |       CASE WHEN n - c < $k THEN CAST(1000000 AS BIGINT)
         |            ELSE CAST(1000000 AS BIGINT)
         |              - CAST(($num) * 1000000 // ($den) AS BIGINT) END AS pass_at_k_e6
         |FROM per_task WHERE n >= $k""".stripMargin
    }
    s"""WITH ${TextAnalysis.qualityCte},
       |per_task AS (
       |  SELECT doc_id // 100 AS task_id, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN quality >= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS c
       |  FROM qual GROUP BY doc_id // 100)
       |${PassAtKs.map(branch).mkString("\nUNION ALL\n")}
       |ORDER BY task_id, k""".stripMargin
  }

  // ---- DQ6: referential-integrity audit across the star schema ----

  /** Generic FK-integrity audit of one (child, parent) relationship:
    * child keys that reference no parent (orphans — broken ingestion)
    * and parent keys referenced by no child (unreferenced — retention /
    * join-reduction candidates). Both sides reduce to DISTINCT key sets
    * FIRST (map-side combined), so the two anti-joins carry key
    * cardinality, never table cardinality. */
  private[graft] def refIntegrityOf(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, rel: String): DataFrame = {
    val ck = child.select(col(childKey).as("k")).filter(col("k").isNotNull).distinct()
    val pk = parent.select(col(parentKey).as("k")).distinct()
    val orphans = ck.join(pk, Seq("k"), "left_anti").agg(count(lit(1)).as("n"))
      .select(lit(rel).as("rel"), lit("orphan_child_keys").as("kind"), col("n"))
    val unref = pk.join(ck, Seq("k"), "left_anti").agg(count(lit(1)).as("n"))
      .select(lit(rel).as("rel"), lit("unreferenced_parent_keys").as("kind"), col("n"))
    val totals = ck.agg(count(lit(1)).as("n"))
      .select(lit(rel).as("rel"), lit("distinct_child_keys").as("kind"), col("n"))
      .unionAll(pk.agg(count(lit(1)).as("n"))
        .select(lit(rel).as("rel"), lit("distinct_parent_keys").as("kind"), col("n")))
    orphans.unionAll(unref).unionAll(totals)
  }

  /** DQ6: the four star-schema FK edges audited in one pass — the
    * pre-ingestion contract check a pipeline runs before trusting its
    * joins (an orphan rate > 0 silently deflates every inner join
    * downstream). 16 summary rows. The library entry point is
    * [[graft.api.GraftApi.refIntegrity]]. */
  val dq6: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    refIntegrityOf(Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey", "orders_customer")
      .unionAll(refIntegrityOf(li, "l_orderkey",
        Tables.orders(s, d), "o_orderkey", "lineitem_orders"))
      .unionAll(refIntegrityOf(li, "l_partkey",
        Tables.part(s, d), "p_partkey", "lineitem_part"))
      .unionAll(refIntegrityOf(li, "l_suppkey",
        Tables.supplier(s, d), "s_suppkey", "lineitem_supplier"))
      .orderBy("rel", "kind")
  }
  val dq6Sql: String = {
    def one(rel: String, child: String, ck: String, parent: String, pk: String): String =
      s"""SELECT '$rel' AS rel, 'orphan_child_keys' AS kind,
         |  CAST((SELECT count(*) FROM (SELECT DISTINCT $ck AS k FROM $child WHERE $ck IS NOT NULL)
         |        WHERE k NOT IN (SELECT $pk FROM $parent)) AS BIGINT) AS n
         |UNION ALL
         |SELECT '$rel', 'unreferenced_parent_keys',
         |  CAST((SELECT count(*) FROM (SELECT DISTINCT $pk AS k FROM $parent)
         |        WHERE k NOT IN (SELECT $ck FROM $child WHERE $ck IS NOT NULL)) AS BIGINT)
         |UNION ALL
         |SELECT '$rel', 'distinct_child_keys',
         |  CAST((SELECT count(DISTINCT $ck) FROM $child WHERE $ck IS NOT NULL) AS BIGINT)
         |UNION ALL
         |SELECT '$rel', 'distinct_parent_keys',
         |  CAST((SELECT count(DISTINCT $pk) FROM $parent) AS BIGINT)""".stripMargin
    Seq(
      one("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      one("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      one("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      one("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ).mkString("", "\nUNION ALL\n", "\nORDER BY rel, kind")
  }

  // ---- EVAL6: deterministic bootstrap CI on a pass-rate metric ----

  /** EVAL6: bootstrap confidence interval (Efron 1979) on the corpus
    * pass-rate of a quality predicate — the error bar a pipeline should
    * attach before declaring "filter X keeps 62% of docs" on a sampled
    * corpus. `b` resamples are drawn WITHOUT RNG: each (doc, replicate)
    * gets a Poisson(1)-approximating weight from two md5 hex bytes
    * (pmf 37/37/18/6/2 over w = 0..4 — mean 1.00, the multinomial
    * bootstrap's Poissonization), so both engines replay the identical
    * resample and the CI hash-matches. Per replicate the weighted rate
    * in exact bp; the interval is the exact 5/50/95 percentile of the
    * `b` replicate rates (apx3 machinery on a `b`-row frame).
    *
    * Scale: ONE corpus scan explodes b weights per doc (corpus·b rows,
    * map-side combined into b partial rates — no shuffle carries more
    * than b rows per task); everything after is O(b). */
  private[graft] def bootstrapCiOf(docs: DataFrame, b: Int = 200): DataFrame = {
    val x = docs.select(col("doc_id"), (col("n_chars") >= 300).cast("long").as("x"))
    val reps = x
      .select(col("doc_id"), col("x"), explode(expr(s"sequence(1, $b)")).as("bi"))
      .withColumn("u", expr(
        "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':', CAST(bi AS STRING))), 1, 4), 16, 10) AS BIGINT) % 100"))
      .withColumn("w", expr(
        "CASE WHEN u < 37 THEN 0L WHEN u < 74 THEN 1L WHEN u < 92 THEN 2L WHEN u < 98 THEN 3L ELSE 4L END"))
      .groupBy("bi")
      .agg(sum(expr("w * x")).as("sx"), sum("w").as("sw"))
      .withColumn("rate_bp", expr("sx * 10000 div greatest(sw, 1)"))
    val pcts = ScaleOps.exactPercentilesOf(
      reps.select(lit(0L).as("g"), col("rate_bp").as("v")), "g", "v", Seq(0.05, 0.5, 0.95))
    val point = x.agg(expr("CAST(sum(x) * 10000 div count(1) AS BIGINT)").as("point_bp"))
    point
      .crossJoin(broadcast(pcts.filter(col("pct") === 0.05).select(col("exact_pct").as("p05_bp"))))
      .crossJoin(broadcast(pcts.filter(col("pct") === 0.5).select(col("exact_pct").as("p50_bp"))))
      .crossJoin(broadcast(pcts.filter(col("pct") === 0.95).select(col("exact_pct").as("p95_bp"))))
      .withColumn("n_reps", lit(b.toLong))
  }

  val eval6: Q = (s, d) => bootstrapCiOf(Tables.documents(s, d))
  val eval6Sql: String = {
    val b = 200
    s"""WITH x AS (
       |  SELECT doc_id, CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS x FROM documents),
       |rep AS (
       |  SELECT doc_id, x, unnest(range(1, ${b + 1})) AS bi FROM x),
       |wts AS (
       |  SELECT bi, x,
       |         ('0x' || substr(md5(doc_id || ':' || bi), 1, 4))::BIGINT % 100 AS u
       |  FROM rep),
       |reps AS (
       |  SELECT bi,
       |         CAST(sum((CASE WHEN u < 37 THEN 0 WHEN u < 74 THEN 1 WHEN u < 92 THEN 2
       |                        WHEN u < 98 THEN 3 ELSE 4 END) * x) AS BIGINT) * 10000
       |           // greatest(CAST(sum(CASE WHEN u < 37 THEN 0 WHEN u < 74 THEN 1 WHEN u < 92 THEN 2
       |                        WHEN u < 98 THEN 3 ELSE 4 END) AS BIGINT), 1) AS rate_bp
       |  FROM wts GROUP BY bi),
       |freq AS (SELECT rate_bp AS v, count(*) AS f FROM reps GROUP BY 1),
       |cum AS (SELECT v, CAST(sum(f) OVER (ORDER BY v) AS BIGINT) AS cf,
       |               CAST(sum(f) OVER () AS BIGINT) AS n FROM freq),
       |p05 AS (SELECT min(v) AS p05_bp FROM cum WHERE cf >= ceil(0.05 * n)),
       |p50 AS (SELECT min(v) AS p50_bp FROM cum WHERE cf >= ceil(0.5 * n)),
       |p95 AS (SELECT min(v) AS p95_bp FROM cum WHERE cf >= ceil(0.95 * n)),
       |pt AS (SELECT CAST(sum(x) AS BIGINT) * 10000 // CAST(count(*) AS BIGINT) AS point_bp FROM x)
       |SELECT point_bp, p05_bp, p50_bp, p95_bp, CAST($b AS BIGINT) AS n_reps
       |FROM pt, p05, p50, p95""".stripMargin
  }

  // ---- EVAL5: ROUGE-2 set overlap between candidate/reference pairs ----

  /** ROUGE-2 (distinct-bigram set basis) between candidate/reference
    * text pairs — the reference-based generation metric: per pair the
    * distinct-bigram counts of each side, their overlap, and exact
    * basis-point precision / recall / F1 (`2·o·10⁴ div (c+r)` — the
    * harmonic mean collapses to one integer division on set counts).
    * `pairs` is (pair_id, side, text) with side 0 = reference,
    * 1 = candidate; pairs missing either side (or whose side has < 2
    * tokens, hence no bigram) are dropped — matched semantics.
    *
    * Scale: one corpus scan explodes each text's DISTINCT bigrams
    * (zip-of-shifted-slices — constant splits per row, the d2 lesson),
    * one shuffle on (pair_id, bigram) folds presence bits, one
    * map-side-combined count per pair. Everything is corpus-linear; no
    * string ever crosses a join. The library entry point is
    * [[graft.api.GraftApi.rougeBigram]]. */
  private[graft] def rougeBigramOf(pairs: DataFrame): DataFrame = {
    val bgArr = "array_distinct(transform(arrays_zip(" +
      "slice(split(text, ' '), 1, size(split(text, ' ')) - 1), " +
      "slice(split(text, ' '), 2, size(split(text, ' ')) - 1)), " +
      "s -> concat(s['0'], ' ', s['1'])))"
    val b = pairs
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("pair_id"), col("side"), explode(expr(bgArr)).as("bg"))
    b.groupBy("pair_id", "bg")
      .agg(max(when(col("side") === 0, 1L).otherwise(0L)).as("in_ref"),
        max(when(col("side") === 1, 1L).otherwise(0L)).as("in_cand"))
      .groupBy("pair_id")
      .agg(sum("in_ref").as("n_ref_bg"), sum("in_cand").as("n_cand_bg"),
        sum(col("in_ref") * col("in_cand")).as("n_overlap"))
      .filter(col("n_ref_bg") > 0L && col("n_cand_bg") > 0L)
      .withColumn("p_bp", expr("n_overlap * 10000 div n_cand_bg"))
      .withColumn("r_bp", expr("n_overlap * 10000 div n_ref_bg"))
      .withColumn("f_bp", expr("2 * n_overlap * 10000 div (n_cand_bg + n_ref_bg)"))
  }

  /** EVAL5 on the fixture: consecutive documents paired (even doc_id =
    * reference, odd = candidate) — a deterministic pairing that needs no
    * side table and still exercises real overlap (shared small corpus
    * vocabulary). */
  val eval5: Q = (s, d) =>
    rougeBigramOf(Tables.documents(s, d).select(
        (col("doc_id") / 2).cast("long").as("pair_id"),
        (col("doc_id") % 2).cast("int").as("side"), col("text")))
      .orderBy("pair_id")
  val eval5Sql: String =
    """WITH w AS (
      |  SELECT doc_id // 2 AS pair_id, CAST(doc_id % 2 AS INTEGER) AS side,
      |         str_split(text, ' ') AS ws
      |  FROM documents),
      |b AS (
      |  SELECT pair_id, side,
      |         unnest(list_distinct(list_transform(range(1, len(ws)),
      |           i -> ws[i] || ' ' || ws[i + 1]))) AS bg
      |  FROM w WHERE len(ws) >= 2),
      |g AS (
      |  SELECT pair_id, bg,
      |         max(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS in_ref,
      |         max(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS in_cand
      |  FROM b GROUP BY pair_id, bg),
      |a AS (
      |  SELECT pair_id, CAST(sum(in_ref) AS BIGINT) AS n_ref_bg,
      |         CAST(sum(in_cand) AS BIGINT) AS n_cand_bg,
      |         CAST(sum(in_ref * in_cand) AS BIGINT) AS n_overlap
      |  FROM g GROUP BY pair_id)
      |SELECT pair_id, n_ref_bg, n_cand_bg, n_overlap,
      |       n_overlap * 10000 // n_cand_bg AS p_bp,
      |       n_overlap * 10000 // n_ref_bg AS r_bp,
      |       2 * n_overlap * 10000 // (n_cand_bg + n_ref_bg) AS f_bp
      |FROM a WHERE n_ref_bg > 0 AND n_cand_bg > 0
      |ORDER BY pair_id""".stripMargin

  // ---- EVAL7: corpus-level BLEU-2 sufficient statistics ----

  /** EVAL7: corpus-level BLEU-2 between candidate/reference pairs — the
    * MULTISET-clipped counterpart of eval5's set-basis ROUGE: per pair
    * and n-gram, the candidate's occurrence count is clipped at the
    * reference's (`min(c_cand, c_ref)`, Papineni et al. 2002), then
    * clipped matches and candidate totals are summed over the whole
    * corpus for n ∈ {1, 2}. The headline `bleu2_core_bp` is the
    * geometric mean √(p1·p2) in basis points, computed EXACTLY in
    * integers: q = ⌊m1·m2·10⁸ / (t1·t2)⌋ in DECIMAL(38,0) (HUGEINT in
    * the oracle — m1·m2·10⁸ overflows int64 beyond ~10⁵ tokens per
    * side), then ⌊√q⌋, which is exact because q ≤ 10⁸ < 2⁵³ and
    * correctly-rounded double sqrt of an exact integer that small never
    * crosses an integer boundary. The brevity-penalty DECISION is
    * emitted as exact integers (c_len, r_len, bp_applied) rather than
    * folding exp(1−r/c) — a raw double exp — into the hash (the mix2
    * 1-ulp lesson).
    *
    * Scale: two corpus scans (unigram + bigram stage), each one
    * row-local n-gram explode → one hash aggregate on (pair_id, gram)
    * with BOTH sides' counts folded in the same aggregate (no join of
    * two corpus-sized frames), then a map-side-combined global sum.
    * Everything after the per-gram aggregate is one row. */
  private[graft] def bleu2Of(pairs: DataFrame): DataFrame = {
    def stage(grams: DataFrame): DataFrame =
      grams.groupBy("pair_id", "g")
        .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("c_cand"),
          sum(when(col("side") === 0, 1L).otherwise(0L)).as("c_ref"))
        .agg(sum(least(col("c_cand"), col("c_ref"))).as("m"),
          sum(col("c_cand")).as("t"))
    val toks = pairs
      .select(col("pair_id"), col("side"), explode(split(col("text"), " ")).as("g"))
      .filter(length(col("g")) > 0)
    val uni = stage(toks)
      .select(col("m").as("m1"), col("t").as("t1"))
    val bgArr = "transform(arrays_zip(" +
      "slice(split(text, ' '), 1, size(split(text, ' ')) - 1), " +
      "slice(split(text, ' '), 2, size(split(text, ' ')) - 1)), " +
      "s -> concat(s['0'], ' ', s['1']))"
    val bi = stage(pairs
        .filter(size(split(col("text"), " ")) >= 2)
        .select(col("pair_id"), col("side"), explode(expr(bgArr)).as("g")))
      .select(col("m").as("m2"), col("t").as("t2"))
    val lens = pairs
      .select(col("side"), explode(split(col("text"), " ")).as("g"))
      .filter(length(col("g")) > 0)
      .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("c_len"),
        sum(when(col("side") === 0, 1L).otherwise(0L)).as("r_len"))
    lens.crossJoin(uni).crossJoin(bi)
      .withColumn("p1_bp", expr("m1 * 10000 div greatest(t1, 1)"))
      .withColumn("p2_bp", expr("m2 * 10000 div greatest(t2, 1)"))
      .withColumn("bleu2_core_bp", expr(
        "CAST(floor(sqrt(CAST(CAST(m1 AS DECIMAL(38,0)) * m2 * 100000000 " +
          "div (CAST(greatest(t1, 1) AS DECIMAL(38,0)) * greatest(t2, 1)) AS DOUBLE))) AS BIGINT)"))
      .withColumn("bp_applied", when(col("c_len") < col("r_len"), 1).otherwise(0))
  }

  /** EVAL7 on the fixture: the eval5 pairing (even doc_id = reference,
    * odd = candidate). */
  val eval7: Q = (s, d) =>
    bleu2Of(Tables.documents(s, d).select(
      (col("doc_id") / 2).cast("long").as("pair_id"),
      (col("doc_id") % 2).cast("int").as("side"), col("text")))
  val eval7Sql: String =
    """WITH pr AS (
      |  SELECT doc_id // 2 AS pair_id, CAST(doc_id % 2 AS INTEGER) AS side,
      |         str_split(text, ' ') AS ws
      |  FROM documents),
      |toks AS (
      |  SELECT pair_id, side, unnest(ws) AS g FROM pr),
      |t1g AS (
      |  SELECT pair_id, g,
      |         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_cand,
      |         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_ref
      |  FROM toks WHERE len(g) > 0 GROUP BY pair_id, g),
      |uni AS (
      |  SELECT CAST(sum(least(c_cand, c_ref)) AS BIGINT) AS m1,
      |         CAST(sum(c_cand) AS BIGINT) AS t1 FROM t1g),
      |bg AS (
      |  SELECT pair_id, side,
      |         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS g
      |  FROM pr WHERE len(ws) >= 2),
      |t2g AS (
      |  SELECT pair_id, g,
      |         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_cand,
      |         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_ref
      |  FROM bg GROUP BY pair_id, g),
      |bi AS (
      |  SELECT CAST(sum(least(c_cand, c_ref)) AS BIGINT) AS m2,
      |         CAST(sum(c_cand) AS BIGINT) AS t2 FROM t2g),
      |lens AS (
      |  SELECT CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_len,
      |         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r_len
      |  FROM toks WHERE len(g) > 0)
      |SELECT c_len, r_len, m1, t1, m2, t2,
      |       m1 * 10000 // greatest(t1, 1) AS p1_bp,
      |       m2 * 10000 // greatest(t2, 1) AS p2_bp,
      |       CAST(floor(sqrt(CAST(CAST(m1 AS HUGEINT) * m2 * 100000000
      |            // (CAST(greatest(t1, 1) AS HUGEINT) * greatest(t2, 1)) AS DOUBLE))) AS BIGINT) AS bleu2_core_bp,
      |       CASE WHEN c_len < r_len THEN 1 ELSE 0 END AS bp_applied
      |FROM lens, uni, bi""".stripMargin

  // ---- DQ7: exact closed-form least-squares structure probe ----

  /** DQ7: per-source simple linear regression of chars on tokens —
    * slope (chars per token), intercept and R², each an EXACT closed
    * form over integer sufficient statistics (n, Σx, Σy, Σx², Σy²,
    * Σxy). This is the cheap "structure probe" a pipeline runs per
    * source/feed: prose sits near a tight universal slope (≈ mean word
    * length + 1) with high R²; markup-heavy or OCR-damaged feeds show
    * inflated slope or collapsed fit, and a drifting fit on a stable
    * feed means the extractor changed. The same sufficient-statistic
    * shape is how a linear quality probe is fit at 100 TB: one map-side
    * combinable aggregate, one small solve — never per-row iteration.
    *
    * Exactness: slope_e6 = 10⁶·(nΣxy − ΣxΣy)/(nΣx² − Σx²) and
    * intercept_e6 = (10⁶·Σy − slope_e6·Σx)/n are integer rationals in
    * DECIMAL(38,0)/HUGEINT with the eval3 sign-split (trunc-vs-floor);
    * R² divides num/den by 10³ FIRST (identically in both engines) so
    * its e6 product stays inside 38 digits at sf10 per-source counts;
    * degenerate sources (constant x or y, n < 2) emit NULL explicitly
    * (the voc3 convention). */
  private[graft] def leastSquaresFitOf(pts: DataFrame,
      groupCol: String, xCol: String, yCol: String): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    pts
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(col(xCol).cast("long")).as("sx"),
        sum(col(yCol).cast("long")).as("sy"),
        // cast each operand BEFORE multiplying: for IntegerType inputs
        // the product would otherwise wrap int32 in Spark (non-ANSI)
        // once x > 46340, while DuckDB promotes to HUGEINT first —
        // a silent cross-engine divergence on very long documents
        sum(col(xCol).cast("long") * col(xCol).cast("long")).as("sxx"),
        sum(col(yCol).cast("long") * col(yCol).cast("long")).as("syy"),
        sum(col(xCol).cast("long") * col(yCol).cast("long")).as("sxy"))
      .withColumn("num", expr(s"CAST(n AS $d38) * sxy - CAST(sx AS $d38) * sy"))
      .withColumn("dx", expr(s"CAST(n AS $d38) * sxx - CAST(sx AS $d38) * sx"))
      .withColumn("dy", expr(s"CAST(n AS $d38) * syy - CAST(sy AS $d38) * sy"))
      .withColumn("slope_e6", expr(
        "CASE WHEN dx = 0 THEN CAST(NULL AS BIGINT) " +
          "WHEN num >= 0 THEN CAST(num * 1000000 div dx AS BIGINT) " +
          "ELSE -CAST((-num) * 1000000 div dx AS BIGINT) END"))
      .withColumn("icept_e6", expr(
        s"CASE WHEN slope_e6 IS NULL THEN CAST(NULL AS BIGINT) " +
          s"WHEN CAST(sy AS $d38) * 1000000 - CAST(slope_e6 AS $d38) * sx >= 0 " +
          s"THEN CAST((CAST(sy AS $d38) * 1000000 - CAST(slope_e6 AS $d38) * sx) div n AS BIGINT) " +
          s"ELSE -CAST((CAST(slope_e6 AS $d38) * sx - CAST(sy AS $d38) * 1000000) div n AS BIGINT) END"))
      .withColumn("r2_e6", expr(
        // abs() before the scale-down: num can be negative and trunc-vs-
        // floor division disagree there; dx/dy are >= 0 by Cauchy-Schwarz.
        // Spark's `div` returns BIGINT, so re-cast to DECIMAL(38,0) BEFORE
        // squaring — the long product overflows from sf1 per-source counts
        // up (caught at the sf1 gate; DuckDB's HUGEINT never overflowed)
        "CASE WHEN dx = 0 OR dy = 0 OR abs(num) div 1000 = 0 OR dx div 1000 = 0 OR dy div 1000 = 0 " +
          "THEN CAST(NULL AS BIGINT) " +
          s"ELSE CAST(CAST(abs(num) div 1000 AS $d38) * CAST(abs(num) div 1000 AS $d38) * 1000000 " +
          s"div (CAST(dx div 1000 AS $d38) * CAST(dy div 1000 AS $d38)) AS BIGINT) END"))
      .select(groupCol, "n", "sx", "sy", "slope_e6", "icept_e6", "r2_e6")
      .orderBy(groupCol)
  }

  val dq7: Q = (s, d) =>
    leastSquaresFitOf(
      Tables.documents(s, d).select(col("source"),
        size(filter(split(col("text"), " "), w => length(w) > 0)).as("x"),
        col("n_chars").as("y")),
      "source", "x", "y")
  val dq7Sql: String =
    """WITH pts AS (
      |  SELECT source,
      |         CAST(len(list_filter(str_split(text, ' '), w -> len(w) > 0)) AS BIGINT) AS x,
      |         n_chars AS y
      |  FROM documents),
      |s AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
      |         CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM pts GROUP BY source),
      |k AS (
      |  SELECT *,
      |         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
      |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS dx,
      |         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS dy
      |  FROM s),
      |f AS (
      |  SELECT *,
      |         CASE WHEN dx = 0 THEN CAST(NULL AS BIGINT)
      |              WHEN num >= 0 THEN CAST(num * 1000000 // dx AS BIGINT)
      |              ELSE -CAST((-num) * 1000000 // dx AS BIGINT) END AS slope_e6
      |  FROM k)
      |SELECT source, n, sx, sy, slope_e6,
      |       CASE WHEN slope_e6 IS NULL THEN CAST(NULL AS BIGINT)
      |            WHEN CAST(sy AS HUGEINT) * 1000000 - CAST(slope_e6 AS HUGEINT) * sx >= 0
      |              THEN CAST((CAST(sy AS HUGEINT) * 1000000 - CAST(slope_e6 AS HUGEINT) * sx) // n AS BIGINT)
      |            ELSE -CAST((CAST(slope_e6 AS HUGEINT) * sx - CAST(sy AS HUGEINT) * 1000000) // n AS BIGINT) END AS icept_e6,
      |       CASE WHEN dx = 0 OR dy = 0 OR abs(num) // 1000 = 0 OR dx // 1000 = 0 OR dy // 1000 = 0
      |              THEN CAST(NULL AS BIGINT)
      |            ELSE CAST((abs(num) // 1000) * (abs(num) // 1000) * 1000000
      |              // ((dx // 1000) * (dy // 1000)) AS BIGINT) END AS r2_e6
      |FROM f ORDER BY source""".stripMargin

  // ---- EVAL8: character-error-rate cleaning-damage audit ----

  /** EVAL8: a CER (character-error-rate) audit of a cleaning stage —
    * the OCR/ASR evaluation statistic repurposed for the question every
    * pipeline owner asks before enabling a new cleaner: "how much does
    * this stage actually mutate each source's text?" The cleaner under
    * audit here is stopword removal (whole-token drop of 'a'/'the' +
    * space re-join); the damage metric is the true Levenshtein distance
    * between raw and cleaned text — not the naive dropped-char count,
    * so the same audit works unchanged for cleaners whose edits are not
    * length-decomposable (unicode fixes, de-hyphenation, boilerplate
    * excision). Per source: document count, corpus-level CER in bp
    * (Σdist·10000 / Σlen — micro-averaged, the standard corpus CER),
    * the worst per-doc CER, and how many docs exceed 10% damage.
    *
    * Exactness: Levenshtein is the classic integer DP — Spark's
    * `levenshtein` and DuckDB's `levenshtein` agree exactly; every
    * ratio is BIGINT floor division of nonnegative integers.
    *
    * Scale: embarrassingly parallel map (one DP per doc) + one
    * aggregate — no shuffle beyond the final per-source rollup. The DP
    * is O(len²) per doc, so the audit windows each doc to its first
    * [[Eval8Window]] chars (both sides, both engines) — the standard
    * bounded-cost sampling for damage audits; at 100 TB you'd also
    * Bernoulli-sample docs (samp2) ahead of it. */
  private[graft] val Eval8Window = 256

  private[graft] def cleaningDamageOf(docs: DataFrame,
      stopwords: Seq[String] = Seq("a", "the")): DataFrame = {
    val sw = typedLit(stopwords)
    docs
      .withColumn("raw", substring(col("text"), 1, Eval8Window))
      .withColumn("cleaned",
        array_join(filter(split(col("raw"), " "),
          w => !array_contains(sw, w)), " "))
      .withColumn("dist", levenshtein(col("raw"), col("cleaned")).cast("long"))
      .withColumn("len", greatest(length(col("raw")).cast("long"), lit(1L)))
      .withColumn("cer_bp", expr("dist * 10000 div len"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("dist").as("sum_dist"),
        sum("len").as("sum_len"),
        max("cer_bp").as("max_cer_bp"),
        sum(when(col("cer_bp") >= 1000L, 1L).otherwise(0L)).as("n_damaged"))
      .withColumn("corpus_cer_bp", expr("sum_dist * 10000 div sum_len"))
      .orderBy("source")
  }

  val eval8: Q = (s, d) => cleaningDamageOf(Tables.documents(s, d))
  val eval8Sql: String =
    s"""WITH c AS (
       |  SELECT source, substr(text, 1, $Eval8Window) AS raw,
       |         array_to_string(list_filter(str_split(substr(text, 1, $Eval8Window), ' '),
       |           w -> w NOT IN ('a', 'the')), ' ') AS cleaned
       |  FROM documents),
       |m AS (
       |  SELECT source,
       |         CAST(levenshtein(raw, cleaned) AS BIGINT) AS dist,
       |         greatest(CAST(len(raw) AS BIGINT), 1) AS len
       |  FROM c)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(dist) AS BIGINT) AS sum_dist,
       |       CAST(sum(len) AS BIGINT) AS sum_len,
       |       CAST(max(dist * 10000 // len) AS BIGINT) AS max_cer_bp,
       |       CAST(sum(CASE WHEN dist * 10000 // len >= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_damaged,
       |       CAST(sum(dist) AS BIGINT) * 10000 // CAST(sum(len) AS BIGINT) AS corpus_cer_bp
       |FROM m GROUP BY source ORDER BY source""".stripMargin

  // ---- EVAL9: Krippendorff's alpha (binary, two raters) ----

  /** EVAL9: Krippendorff's alpha (Krippendorff 1970/2004) over the same
    * two quality raters as eval3 — the agreement coefficient content
    * teams prefer over kappa when comparing across studies, because its
    * expected disagreement is computed from the POOLED value
    * distribution (both raters together) with a finite-sample
    * (2n−1) correction, rather than from each rater's own marginals.
    * For binary labels and two raters the whole statistic collapses to
    * an exact rational: Do = n_d/n, De = n1·n0/(n·(2n−1)) where
    * n1/n0 are pooled value counts over the 2n ratings, so
    * α = 1 − n_d·(2n−1)/(n1·n0). Emits the pooled counts, Do/De in e6,
    * and α in e6; α is NULL when one value never occurs (De = 0 — alpha
    * undefined, the heaps-law/voc3 explicit-NULL convention, since
    * Spark's div would null silently while DuckDB's // errors).
    *
    * Exactness: all-integer rationals in DECIMAL(38,0)/HUGEINT (the
    * eval3 overflow convention: 10⁶·n_d·(2n−1) is corpus² — BIGINT
    * overflows past n ≈ 10⁶·³); the α quotient operand is nonnegative,
    * so trunc-vs-floor division agrees across engines.
    *
    * Scale: one corpus scan into a 4-cell aggregate; 1-row output. */
  private[graft] def krippendorffAlphaOf(rated: DataFrame): DataFrame =
    rated
      .agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN a <> b THEN 1L ELSE 0L END")).as("n_d"),
        sum(expr("CAST(a + b AS LONG)")).as("n1"))
      .withColumn("n0", expr("2 * n - n1"))
      .withColumn("do_e6", expr("CASE WHEN n = 0 THEN NULL ELSE n_d * 1000000 div n END"))
      .withColumn("de_e6", expr(
        "CASE WHEN n = 0 THEN NULL ELSE " +
          "CAST(CAST(n1 AS DECIMAL(38,0)) * n0 * 1000000 div (CAST(n AS DECIMAL(38,0)) * (2 * n - 1)) AS BIGINT) END"))
      .withColumn("alpha_e6", expr(
        "CASE WHEN n = 0 OR n1 = 0 OR n0 = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE 1000000 - CAST(CAST(n_d AS DECIMAL(38,0)) * (2 * n - 1) * 1000000 div " +
          "(CAST(n1 AS DECIMAL(38,0)) * n0) AS BIGINT) END"))

  val eval9: Q = (s, d) => {
    val q = TextAnalysis.qualityScoreOf(Tables.documents(s, d))
      .select(col("doc_id"), col("quality"))
    val rated = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      .join(q, Seq("doc_id"))
      .select(
        when(col("n_chars") >= 200, 1).otherwise(0).as("a"),
        when(col("quality") >= 5000, 1).otherwise(0).as("b"))
    krippendorffAlphaOf(rated)
  }
  val eval9Sql: String =
    s"""WITH ${TextAnalysis.qualityCte},
       |rated AS (
       |  SELECT CASE WHEN d.n_chars >= 200 THEN 1 ELSE 0 END AS a,
       |         CASE WHEN q.quality >= 5000 THEN 1 ELSE 0 END AS b
       |  FROM documents d JOIN qual q ON q.doc_id = d.doc_id),
       |cm AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
       |         CAST(sum(a + b) AS BIGINT) AS n1
       |  FROM rated)
       |SELECT n, n_d, n1, 2 * n - n1 AS n0,
       |       CASE WHEN n = 0 THEN NULL ELSE n_d * 1000000 // n END AS do_e6,
       |       CASE WHEN n = 0 THEN NULL ELSE
       |         CAST(CAST(n1 AS HUGEINT) * (2 * n - n1) * 1000000
       |           // (CAST(n AS HUGEINT) * (2 * n - 1)) AS BIGINT) END AS de_e6,
       |       CASE WHEN n = 0 OR n1 = 0 OR 2 * n - n1 = 0 THEN CAST(NULL AS BIGINT)
       |            ELSE 1000000 - CAST(CAST(n_d AS HUGEINT) * (2 * n - 1) * 1000000
       |              // (CAST(n1 AS HUGEINT) * (2 * n - n1)) AS BIGINT) END AS alpha_e6
       |FROM cm""".stripMargin

  // ---- EVAL10: Goodman–Kruskal gamma rank concordance ----

  /** EVAL10: Goodman–Kruskal gamma (1954) between two per-document
    * quality signals — here the cheap length rater (n_chars) vs the
    * composite t5 quality score. This is the RANK-agreement audit
    * (do the two raters ORDER documents the same way?) complementing
    * eval3/eval9's categorical agreement: γ = (C−D)/(C+D) over
    * concordant/discordant pairs. Exact all-pairs concordance is O(n²),
    * so the statistic runs over fixed-width value-domain buckets (the
    * dq3/dq4 binning convention): bucket both signals, build the B×B
    * contingency once (one map-side-combinable aggregate), then count
    * C and D by self-joining the CELLS — O(B⁴) work on a frame bounded
    * by the bucket domain, never the corpus. Within-bucket ties drop
    * out of both C and D, exactly as gamma prescribes.
    *
    * Exactness: cell products are corpus² — DECIMAL(38,0)/HUGEINT (the
    * eval2 overflow class); gamma's e6 scaling sign-splits (eval3
    * convention); NULL when C+D = 0 (all mass on one bucket diagonal —
    * gamma undefined; the voc3 explicit-NULL convention). */
  private[graft] def gammaConcordanceOf(scored: DataFrame,
      xBucket: Long, yBucket: Long): DataFrame = {
    // contingency cells: bounded by the bucket domain, not the corpus
    val cells = scored
      .select(expr(s"x div $xBucket").as("bx"), expr(s"y div $yBucket").as("by"))
      .groupBy("bx", "by").agg(count(lit(1)).as("n"))
    val a = cells.select(col("bx").as("bxa"), col("by").as("bya"), col("n").as("na"))
    val b = cells.select(col("bx").as("bxb"), col("by").as("byb"), col("n").as("nb"))
    a.join(b, col("bxa") < col("bxb"))
      .agg(
        // coalesce: an all-ties corpus leaves the bxa<bxb join empty and
        // a bare sum would go NULL instead of 0 in both engines
        coalesce(sum(when(col("bya") < col("byb"),
            expr("CAST(na AS DECIMAL(38,0)) * nb"))),
          expr("CAST(0 AS DECIMAL(38,0))")).as("c_pairs"),
        coalesce(sum(when(col("bya") > col("byb"),
            expr("CAST(na AS DECIMAL(38,0)) * nb"))),
          expr("CAST(0 AS DECIMAL(38,0))")).as("d_pairs"))
      .withColumn("gamma_e6", expr(
        "CASE WHEN c_pairs + d_pairs = 0 THEN CAST(NULL AS BIGINT) " +
          "WHEN c_pairs >= d_pairs THEN CAST((c_pairs - d_pairs) * 1000000 div (c_pairs + d_pairs) AS BIGINT) " +
          "ELSE -CAST((d_pairs - c_pairs) * 1000000 div (c_pairs + d_pairs) AS BIGINT) END"))
      .select(col("c_pairs").cast("long").as("c_pairs"),
        col("d_pairs").cast("long").as("d_pairs"), col("gamma_e6"))
  }

  val eval10: Q = (s, d) => {
    val q = TextAnalysis.qualityScoreOf(Tables.documents(s, d))
      .select(col("doc_id"), col("quality"))
    val scored = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      .join(q, Seq("doc_id"))
      .select(col("n_chars").as("x"), col("quality").as("y"))
    gammaConcordanceOf(scored, xBucket = 50L, yBucket = 1000L)
  }
  val eval10Sql: String =
    s"""WITH ${TextAnalysis.qualityCte},
       |sc AS (
       |  SELECT d.n_chars // 50 AS bx, q.quality // 1000 AS by
       |  FROM documents d JOIN qual q ON q.doc_id = d.doc_id),
       |cells AS (SELECT bx, by, CAST(count(*) AS BIGINT) AS n FROM sc GROUP BY bx, by),
       |p AS (
       |  SELECT CAST(coalesce(sum(CASE WHEN a.by < b.by
       |                THEN CAST(a.n AS HUGEINT) * b.n END), 0) AS HUGEINT) AS c_pairs,
       |         CAST(coalesce(sum(CASE WHEN a.by > b.by
       |                THEN CAST(a.n AS HUGEINT) * b.n END), 0) AS HUGEINT) AS d_pairs
       |  FROM cells a JOIN cells b ON a.bx < b.bx)
       |SELECT CAST(c_pairs AS BIGINT) AS c_pairs, CAST(d_pairs AS BIGINT) AS d_pairs,
       |       CASE WHEN c_pairs + d_pairs = 0 THEN CAST(NULL AS BIGINT)
       |            WHEN c_pairs >= d_pairs
       |              THEN CAST((c_pairs - d_pairs) * 1000000 // (c_pairs + d_pairs) AS BIGINT)
       |            ELSE -CAST((d_pairs - c_pairs) * 1000000 // (c_pairs + d_pairs) AS BIGINT) END AS gamma_e6
       |FROM p""".stripMargin

  // ---- EVAL11: McNemar's paired-classifier significance test ----

  /** EVAL11: McNemar's test (1947) over the PAIRED per-document
    * correctness of two classifiers scored on the SAME test split —
    * here the two model families the reference itself ships: the
    * hand-rolled NB scorer (m6, NB.java's log-space margin) vs the
    * hand-rolled SVM scorer (m8, SVM.java's weight lookup). Marginal
    * accuracy comparisons (a6 vs a6_svm) can't tell "better" from
    * "differently wrong"; McNemar conditions on the discordant pairs:
    * b = NB-right/SVM-wrong, c = SVM-right/NB-wrong, and
    * χ² = (b−c)²/(b+c) (plus the Edwards continuity-corrected form
    * (|b−c|−1)²/(b+c)) is the significance statistic behind "is one
    * classifier ACTUALLY better on this corpus?".
    *
    * Exactness: the four agreement cells are integer counts off ONE
    * aggregate; (b−c)² rides DECIMAL(38,0)/HUGEINT (counts are
    * corpus-sized, squares wrap int64 past ~3·10⁹ — the eval2 overflow
    * class); both χ² forms are non-negative integral divisions
    * (trunc == floor, no sign-split needed); explicit NULL when
    * b + c = 0 — identical error profiles make the test undefined (the
    * voc3 NULL convention). Scale: two broadcast-model scoring passes
    * (m6/m8's own shapes) + one doc_id-keyed join + a 1-row aggregate.
    * Library entry point: [[graft.api.GraftApi.mcnemarTest]]. */
  private[graft] def mcnemarOf(paired: DataFrame): DataFrame =
    paired.agg(
      count(lit(1)).as("n"),
      sum(expr("a_ok * b_ok")).cast("long").as("n_both"),
      sum(expr("(1 - a_ok) * (1 - b_ok)")).cast("long").as("n_neither"),
      sum(expr("a_ok * (1 - b_ok)")).cast("long").as("b_only"),
      sum(expr("(1 - a_ok) * b_ok")).cast("long").as("c_only"))
    .withColumn("chi2_e6", expr(
      "CASE WHEN b_only + c_only = 0 THEN CAST(NULL AS BIGINT) " +
        "ELSE CAST(CAST(b_only - c_only AS DECIMAL(38,0)) * (b_only - c_only) * 1000000 " +
        "div (b_only + c_only) AS BIGINT) END"))
    .withColumn("chi2_cc_e6", expr(
      "CASE WHEN b_only + c_only = 0 THEN CAST(NULL AS BIGINT) " +
        "WHEN abs(b_only - c_only) <= 1 THEN 0 " +
        "ELSE CAST(CAST(abs(b_only - c_only) - 1 AS DECIMAL(38,0)) * (abs(b_only - c_only) - 1) * 1000000 " +
        "div (b_only + c_only) AS BIGINT) END"))

  val eval11: Q = (s, d) => {
    val nb = SentimentNb.m6(s, d).select(col("doc_id"),
      when(col("prediction") === col("label"), 1).otherwise(0).as("a_ok"))
    val sv = SentimentSvm.m8(s, d).select(col("doc_id"),
      when(col("prediction") === col("label"), 1).otherwise(0).as("b_ok"))
    mcnemarOf(nb.join(sv, Seq("doc_id")))
  }
  /** The two scorers' full CTE chains collide on CTE names (tokens/
    * model/scored), so each rides as a parenthesized sub-WITH. */
  val eval11Sql: String =
    s"""WITH nb AS (
       |  SELECT doc_id, CASE WHEN prediction = label THEN 1 ELSE 0 END AS a_ok
       |  FROM (${SentimentNb.m6Sql})),
       |sv AS (
       |  SELECT doc_id, CASE WHEN prediction = label THEN 1 ELSE 0 END AS b_ok
       |  FROM (${SentimentSvm.m8Sql})),
       |cm AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(a_ok * b_ok) AS BIGINT) AS n_both,
       |         CAST(sum((1 - a_ok) * (1 - b_ok)) AS BIGINT) AS n_neither,
       |         CAST(sum(a_ok * (1 - b_ok)) AS BIGINT) AS b_only,
       |         CAST(sum((1 - a_ok) * b_ok) AS BIGINT) AS c_only
       |  FROM nb JOIN sv USING (doc_id))
       |SELECT n, n_both, n_neither, b_only, c_only,
       |       CASE WHEN b_only + c_only = 0 THEN CAST(NULL AS BIGINT)
       |            ELSE CAST(CAST(b_only - c_only AS HUGEINT) * (b_only - c_only) * 1000000
       |              // (b_only + c_only) AS BIGINT) END AS chi2_e6,
       |       CASE WHEN b_only + c_only = 0 THEN CAST(NULL AS BIGINT)
       |            WHEN abs(b_only - c_only) <= 1 THEN 0
       |            ELSE CAST(CAST(abs(b_only - c_only) - 1 AS HUGEINT) * (abs(b_only - c_only) - 1) * 1000000
       |              // (b_only + c_only) AS BIGINT) END AS chi2_cc_e6
       |FROM cm""".stripMargin

  // ---- EVAL12: Spearman rank correlation (tie-averaged, distributed) ----

  /** EVAL12: Spearman's ρ between two integer quality signals — the
    * rank-level complement of eval10's gamma: gamma asks "do bucketed
    * orderings agree?", Spearman measures HOW LINEARLY the full
    * tie-averaged rankings track each other (the standard
    * rater-agreement number reported beside κ/α). Ranks use the
    * textbook average-rank tie treatment, DOUBLED to stay integral:
    * r2(v) = 2·|{u < v}| + f(v) + 1, computed at the DISTINCT-VALUE
    * level through [[PrefixSum.prefixRank]] (range-partitioned global
    * order — never a single-reducer window) and joined back by value.
    * ρ is then Pearson over (r2x, r2y): integer sufficient statistics
    * (n, Σr, Σr², Σrxry) in DECIMAL(38,0)/HUGEINT, and the single
    * transcendental num/√(denx·deny) is ONE double expression over
    * identical integer operands rounded ONCE to e6 (the t14
    * convention); NULL when either signal is constant (den = 0, the
    * voc3 convention). Decimal headroom bounds exactness at ~10⁹ rows
    * (n·Σr² ≈ 4·10³⁸) — per-shard audit scale; beyond that, bucket
    * first (eval10's convention) or sample.
    *
    * Scale: two value-level prefix ranks (distinct-value frames), two
    * value-keyed joins back, one map-side-combined 1-row aggregate.
    * Library entry point: [[graft.api.GraftApi.spearman]]. */
  private[graft] def spearmanOf(scored: DataFrame): DataFrame = {
    def ranks2(c: String): DataFrame = {
      val vc = scored.groupBy(col(c).as("v")).agg(count(lit(1)).as("f"))
      PrefixSum.prefixRank(vc, Seq(col("v")), sumCol = Some("f")).df
        .select(col("v").as(c), (lit(2L) * col("g_cum_excl") + col("f") + 1).as(s"r2_$c"))
    }
    scored.join(ranks2("x"), Seq("x")).join(ranks2("y"), Seq("y"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(expr("CAST(r2_x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(r2_y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(r2_x AS DECIMAL(38,0)) * r2_x")).as("sxx"),
        sum(expr("CAST(r2_y AS DECIMAL(38,0)) * r2_y")).as("syy"),
        sum(expr("CAST(r2_x AS DECIMAL(38,0)) * r2_y")).as("sxy"))
      .select(col("n").cast("long").as("n"),
        expr("n * sxy - sx * sy").as("num"),
        expr("n * sxx - sx * sx").as("denx"),
        expr("n * syy - sy * sy").as("deny"))
      .select(col("n"),
        expr("CASE WHEN denx = 0 OR deny = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(round(CAST(num AS DOUBLE) / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) * 1000000) AS BIGINT) END")
          .as("rho_e6"))
  }

  val eval12: Q = (s, d) => {
    val q = TextAnalysis.qualityScoreOf(Tables.documents(s, d))
      .select(col("doc_id"), col("quality"))
    val scored = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      .join(q, Seq("doc_id"))
      .select(col("n_chars").as("x"), col("quality").as("y"))
    spearmanOf(scored)
  }
  val eval12Sql: String =
    s"""WITH ${TextAnalysis.qualityCte},
       |sc AS (
       |  SELECT d.n_chars AS x, q.quality AS y
       |  FROM documents d JOIN qual q ON q.doc_id = d.doc_id),
       |vx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS f FROM sc GROUP BY x),
       |rx AS (
       |  SELECT v, 2 * (sum(f) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - f)
       |         + f + 1 AS r2
       |  FROM vx),
       |vy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS f FROM sc GROUP BY y),
       |ry AS (
       |  SELECT v, 2 * (sum(f) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - f)
       |         + f + 1 AS r2
       |  FROM vy),
       |st AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS n,
       |         CAST(sum(CAST(rx.r2 AS HUGEINT)) AS HUGEINT) AS sx,
       |         CAST(sum(CAST(ry.r2 AS HUGEINT)) AS HUGEINT) AS sy,
       |         CAST(sum(CAST(rx.r2 AS HUGEINT) * rx.r2) AS HUGEINT) AS sxx,
       |         CAST(sum(CAST(ry.r2 AS HUGEINT) * ry.r2) AS HUGEINT) AS syy,
       |         CAST(sum(CAST(rx.r2 AS HUGEINT) * ry.r2) AS HUGEINT) AS sxy
       |  FROM sc JOIN rx ON rx.v = sc.x JOIN ry ON ry.v = sc.y),
       |d2 AS (
       |  SELECT CAST(n AS BIGINT) AS n, n * sxy - sx * sy AS num,
       |         n * sxx - sx * sx AS denx, n * syy - sy * sy AS deny
       |  FROM st)
       |SELECT n,
       |       CASE WHEN denx = 0 OR deny = 0 THEN CAST(NULL AS BIGINT)
       |            ELSE CAST(round(CAST(num AS DOUBLE) / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) * 1000000) AS BIGINT) END AS rho_e6
       |FROM d2""".stripMargin

  // ---- DQ8: Simpson's-paradox slope-reversal audit ----

  /** DQ8: the Simpson's-paradox audit — does the POOLED association
    * between two signals reverse inside strata? The classic aggregation
    * trap (Simpson 1951; Berkeley admissions): a corpus-level trend can
    * be an artifact of stratum composition, so any pipeline decision
    * keyed on a pooled slope (quality-by-length cuts, source weighting)
    * must check the per-stratum slopes first. Per stratum: dq7's exact
    * closed-form least-squares slope (sign-split e6, NULL on degenerate
    * strata) plus a `reversed` flag vs the pooled slope; the pooled row
    * (NULL stratum) folds the PER-STRATUM integer sufficient statistics
    * — one corpus scan total (the emb7 rollup convention).
    *
    * Scale: one map-side-combinable six-stat aggregate, stratum-domain
    * frames after that; the pooled slope broadcasts back as a 1-row
    * frame. Library entry point: [[graft.api.GraftApi.simpsonAudit]]. */
  /** Per-stratum six-stat sufficient statistics for dq8 — an additive
    * monoid (every column merges by SUM), split out so the streaming
    * twin (st26) can fold per-batch deltas and finish through the
    * identical [[simpsonFromStats]]. */
  private[graft] def simpsonStatsOf(pts: DataFrame, groupCol: String,
      xCol: String, yCol: String): DataFrame =
    pts.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(col(xCol).cast("long")).as("sx"),
      sum(col(yCol).cast("long")).as("sy"),
      // operand-first casts (see leastSquaresFitOf): int32 products wrap
      // in Spark for IntegerType x > 46340 while DuckDB promotes — cast
      // before multiplying so the exact-integer contract holds for any
      // input width (st26's streaming twin folds through this same path)
      sum(col(xCol).cast("long") * col(xCol).cast("long")).as("sxx"),
      sum(col(xCol).cast("long") * col(yCol).cast("long")).as("sxy"))

  private[graft] def simpsonAuditOf(pts: DataFrame, groupCol: String,
      xCol: String, yCol: String): DataFrame =
    simpsonFromStats(simpsonStatsOf(pts, groupCol, xCol, yCol), groupCol)

  private[graft] def simpsonFromStats(stats: DataFrame, groupCol: String): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    def withSlope(df: DataFrame): DataFrame = df
      .withColumn("num", expr(s"CAST(n AS $d38) * sxy - CAST(sx AS $d38) * sy"))
      .withColumn("dx", expr(s"CAST(n AS $d38) * sxx - CAST(sx AS $d38) * sx"))
      .withColumn("slope_e6", expr(
        "CASE WHEN dx = 0 THEN CAST(NULL AS BIGINT) " +
          "WHEN num >= 0 THEN CAST(num * 1000000 div dx AS BIGINT) " +
          "ELSE -CAST((-num) * 1000000 div dx AS BIGINT) END"))
    val per = withSlope(stats)
    val pooled = withSlope(stats.agg(sum("n").as("n"), sum("sx").as("sx"),
      sum("sy").as("sy"), sum("sxx").as("sxx"), sum("sxy").as("sxy")))
    per.crossJoin(broadcast(pooled.select(col("slope_e6").as("pooled_slope"))))
      .select(col(groupCol).cast("string").as("stratum"),
        col("n").cast("long").as("n"), col("slope_e6"),
        when(col("slope_e6").isNull || col("pooled_slope").isNull,
          lit(null).cast("boolean"))
          .otherwise((col("slope_e6") > 0 && col("pooled_slope") < 0) ||
            (col("slope_e6") < 0 && col("pooled_slope") > 0)).as("reversed"))
      .unionByName(pooled.select(lit(null).cast("string").as("stratum"),
        col("n").cast("long").as("n"), col("slope_e6"),
        lit(null).cast("boolean").as("reversed")))
      .orderBy("stratum")
  }

  val dq8: Q = (s, d) =>
    simpsonAuditOf(
      Tables.documents(s, d).select(col("source"),
        size(filter(split(col("text"), " "), w => length(w) > 0)).as("x"),
        col("n_chars").as("y")),
      "source", "x", "y")
  val dq8Sql: String =
    """WITH pts AS (
      |  SELECT source,
      |         CAST(len(list_filter(str_split(text, ' '), w -> len(w) > 0)) AS BIGINT) AS x,
      |         n_chars AS y
      |  FROM documents),
      |s AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM pts GROUP BY source),
      |per AS (
      |  SELECT source, n,
      |         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
      |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS dx
      |  FROM s),
      |pooled AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS n,
      |         CAST(sum(n) AS HUGEINT) * sum(sxy) - CAST(sum(sx) AS HUGEINT) * sum(sy) AS num,
      |         CAST(sum(n) AS HUGEINT) * sum(sxx) - CAST(sum(sx) AS HUGEINT) * sum(sx) AS dx
      |  FROM s),
      |sl AS (
      |  SELECT source, n,
      |         CASE WHEN dx = 0 THEN CAST(NULL AS BIGINT)
      |              WHEN num >= 0 THEN CAST(num * 1000000 // dx AS BIGINT)
      |              ELSE -CAST((-num) * 1000000 // dx AS BIGINT) END AS slope_e6
      |  FROM per),
      |pl AS (
      |  SELECT n,
      |         CASE WHEN dx = 0 THEN CAST(NULL AS BIGINT)
      |              WHEN num >= 0 THEN CAST(num * 1000000 // dx AS BIGINT)
      |              ELSE -CAST((-num) * 1000000 // dx AS BIGINT) END AS slope_e6
      |  FROM pooled)
      |SELECT sl.source AS stratum, sl.n, sl.slope_e6,
      |       CASE WHEN sl.slope_e6 IS NULL OR pl.slope_e6 IS NULL THEN NULL
      |            ELSE (sl.slope_e6 > 0 AND pl.slope_e6 < 0)
      |              OR (sl.slope_e6 < 0 AND pl.slope_e6 > 0) END AS reversed
      |FROM sl CROSS JOIN pl
      |UNION ALL
      |SELECT NULL, n, slope_e6, NULL FROM pl
      |ORDER BY stratum""".stripMargin

  // ---- DQ9: repetition-quality audit (Gopher/MassiveText filters) ----

  /** DQ9: the n-gram repetition filters of the MassiveText/Gopher
    * pipeline (Rae et al. 2112.11446 §A.1.1) — the standard cut that
    * removes boilerplate/SEO-spam documents whose text is dominated by a
    * few repeated phrases. Two per-document scores, both exact-integer
    * fixed-point over word n-gram CHARACTER mass (count × gram length,
    * the inner space included; fraction of the doc's total gram mass):
    *
    *  - `rep2_e6` — mass share of the single most frequent word 2-gram
    *    (Gopher's "fraction of characters in most common n-gram",
    *    tie-broken to the lexicographically smallest gram);
    *  - `dup3_e6` — mass share of all word 3-grams occurring ≥ 2 times
    *    (Gopher's "fraction of characters in duplicated n-grams",
    *    counted with multiplicity — a documented simplification of the
    *    paper's overlap-deduped char count that keeps the score a pure
    *    integer rational).
    *
    * Rolled up PER SOURCE — the form a feed audit wants: mean scores and
    * how many documents each feed loses at the published-style
    * thresholds (rep2 > 0.20, dup3 > 0.15). Docs under 2 words score 0
    * by definition (no grams).
    *
    * Exactness: gram masses and totals are BIGINT counts; shares divide
    * once per doc (`mass·10⁶ div total`); the per-source means divide
    * once more (sums of e6 longs div counts) — every step replayed
    * verbatim by the oracle. The deterministic per-doc argmax is
    * min(struct(-count, gram)) ⟺ DuckDB's (count DESC, gram) row_number.
    *
    * Scale: one corpus scan exploded to n-gram rows (corpus-token
    * bounded, the t1/d6 class), two map-side-combinable aggregates
    * (doc×gram, then doc), then a source-domain rollup — no joins wider
    * than the corpus, no driver data. Library entry point:
    * [[graft.api.GraftApi.repetitionAudit]]. */
  private[graft] def repetitionStatsOf(docs: DataFrame, srcCol: String): DataFrame = {
    val w = docs
      .select(col(srcCol).as("src"), col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
    def gramCounts(n: Int): DataFrame = w
      .select(col("src"), col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${n - 1}), i -> " +
          s"concat_ws(' ', ${(0 until n).map(j => s"element_at(w, i + $j)").mkString(", ")}))"))
        .as("g"))
      .groupBy("src", "doc_id", "g").agg(count(lit(1)).as("c"))
      .withColumn("mass", col("c") * length(col("g")))
    val rep2 = gramCounts(2).groupBy("src", "doc_id").agg(
        min(struct((-col("c")).as("nc"), col("g").as("g"), length(col("g")).as("l"))).as("top"),
        sum("mass").as("total"))
      .select(col("src"), col("doc_id"),
        expr("(-top.nc) * top.l * 1000000 div total").as("rep2_e6"))
    val dup3 = gramCounts(3).groupBy("src", "doc_id").agg(
        sum(when(col("c") >= 2, col("mass")).otherwise(0L)).as("dup"),
        sum("mass").as("total"))
      .select(col("src"), col("doc_id"),
        expr("dup * 1000000 div total").as("dup3_e6"))
    rep2.join(dup3, Seq("src", "doc_id"), "left").na.fill(0L, Seq("dup3_e6"))
      .groupBy(col("src").as("source")).agg(
        count(lit(1)).as("n_docs"),
        sum("rep2_e6").as("s_rep2"),
        sum("dup3_e6").as("s_dup3"),
        sum(when(col("rep2_e6") > 200000L, 1L).otherwise(0L)).as("n_rep2_flagged"),
        sum(when(col("dup3_e6") > 150000L, 1L).otherwise(0L)).as("n_dup3_flagged"))
  }

  /** Finish: divide the additive per-source sums into means. Split out so
    * the streaming twin (st28) can fold per-batch deltas — every stats
    * column merges by SUM (per-doc scores are final the batch the doc
    * arrives in; the st17 one-batch-per-doc discipline) — and finish
    * through the identical division. */
  private[graft] def repetitionFromStats(stats: DataFrame): DataFrame =
    stats.select(col("source"), col("n_docs"),
      expr("s_rep2 div n_docs").as("mean_rep2_e6"),
      expr("s_dup3 div n_docs").as("mean_dup3_e6"),
      col("n_rep2_flagged"), col("n_dup3_flagged"))
      .orderBy("source")

  private[graft] def repetitionAuditOf(docs: DataFrame, srcCol: String): DataFrame =
    repetitionFromStats(repetitionStatsOf(docs, srcCol))

  val dq9: Q = (s, d) =>
    repetitionAuditOf(Tables.documents(s, d), "source")
  val dq9Sql: String =
    """WITH w AS (
      |  SELECT source AS src, doc_id, string_split(text, ' ') AS w
      |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |g2 AS (
      |  SELECT src, doc_id,
      |         w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)] AS g
      |  FROM w, UNNEST(range(1, len(w))) AS t(i)),
      |c2 AS (
      |  SELECT src, doc_id, g, CAST(count(*) AS BIGINT) AS c,
      |         CAST(count(*) * len(g) AS BIGINT) AS mass
      |  FROM g2 GROUP BY 1, 2, 3),
      |rep2 AS (
      |  SELECT src, doc_id, CAST(mass * 1000000 // total AS BIGINT) AS rep2_e6
      |  FROM (
      |    SELECT src, doc_id, mass,
      |           sum(mass) OVER (PARTITION BY src, doc_id) AS total,
      |           row_number() OVER (PARTITION BY src, doc_id
      |                              ORDER BY c DESC, g) AS rk
      |    FROM c2)
      |  WHERE rk = 1),
      |g3 AS (
      |  SELECT src, doc_id,
      |         w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)] || ' ' || w[CAST(i + 2 AS INT)] AS g
      |  FROM w, UNNEST(range(1, len(w) - 1)) AS t(i)
      |  WHERE len(w) >= 3),
      |c3 AS (
      |  SELECT src, doc_id, g, CAST(count(*) AS BIGINT) AS c,
      |         CAST(count(*) * len(g) AS BIGINT) AS mass
      |  FROM g3 GROUP BY 1, 2, 3),
      |dup3 AS (
      |  SELECT src, doc_id,
      |         CAST(sum(CASE WHEN c >= 2 THEN mass ELSE 0 END) * 1000000
      |           // sum(mass) AS BIGINT) AS dup3_e6
      |  FROM c3 GROUP BY 1, 2)
      |SELECT r.src AS source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(r.rep2_e6) // count(*) AS BIGINT) AS mean_rep2_e6,
      |       CAST(sum(coalesce(d.dup3_e6, 0)) // count(*) AS BIGINT) AS mean_dup3_e6,
      |       CAST(sum(CASE WHEN r.rep2_e6 > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rep2_flagged,
      |       CAST(sum(CASE WHEN coalesce(d.dup3_e6, 0) > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup3_flagged
      |FROM rep2 r LEFT JOIN dup3 d USING (src, doc_id)
      |GROUP BY 1 ORDER BY source""".stripMargin

  val queries: Map[String, Q] = Map(
    "dq9_repetition_audit" -> dq9,
    "eval12_spearman" -> eval12,
    "dq8_simpson_audit" -> dq8,
    "eval11_mcnemar" -> eval11,
    "eval10_gamma_concordance" -> eval10,
    "dq7_least_squares_fit" -> dq7,
    "eval8_cleaning_cer" -> eval8,
    "eval9_krippendorff_alpha" -> eval9,
    "eval7_bleu2" -> eval7,
    "eval1_ir_metrics" -> eval1,
    "eval3_cohens_kappa" -> eval3,
    "eval4_pass_at_k" -> eval4,
    "eval5_rouge_bigram" -> eval5,
    "dq3_psi_drift" -> dq3,
    "dq4_ks_distance" -> dq4,
    "dq5_benford_audit" -> dq5,
    "dq6_ref_integrity" -> dq6,
    "eval6_bootstrap_ci" -> eval6,
    "split1_hash_split" -> split1,
    "tox1_blocklist_filter" -> tox1,
    "tox2_tiered_blocklist" -> tox2,
  )

  val oracle: Map[String, String] = Map(
    "dq9_repetition_audit" -> dq9Sql,
    "eval12_spearman" -> eval12Sql,
    "dq8_simpson_audit" -> dq8Sql,
    "eval11_mcnemar" -> eval11Sql,
    "eval10_gamma_concordance" -> eval10Sql,
    "dq7_least_squares_fit" -> dq7Sql,
    "eval8_cleaning_cer" -> eval8Sql,
    "eval9_krippendorff_alpha" -> eval9Sql,
    "eval7_bleu2" -> eval7Sql,
    "eval1_ir_metrics" -> eval1Sql,
    "eval3_cohens_kappa" -> eval3Sql,
    "eval4_pass_at_k" -> eval4Sql,
    "eval5_rouge_bigram" -> eval5Sql,
    "dq3_psi_drift" -> dq3Sql,
    "dq4_ks_distance" -> dq4Sql,
    "dq5_benford_audit" -> dq5Sql,
    "dq6_ref_integrity" -> dq6Sql,
    "eval6_bootstrap_ci" -> eval6Sql,
    "split1_hash_split" -> split1Sql,
    "tox1_blocklist_filter" -> tox1Sql,
    "tox2_tiered_blocklist" -> tox2Sql,
  )
}
