package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hand-rolled Naive Bayes reproduced as declarative DataFrame queries —
  * SURVEY §2.5 A1/A2/A4/A6, §2.6 J1, §2.10 M5/M6.
  *
  * Reference semantics (`Hadoop/NB/NB.java`): training builds `word →
  * (posCount, negCount)` (A1, NB.java:103-124) plus six corpus scalars (A2,
  * NB.java:27-39); scoring probes the broadcast model per test-token
  * (J1, NB.java:230-243) with Laplace-smoothed `(count+1)/(classWords+V)`
  * probabilities × class prior (M6, NB.java:190-194,246-247); tie → NEGATIVE
  * (strict `>`, NB.java:250). Engine-native scoring is LOG-space (the
  * reference's product-space underflow is a bug we do not reproduce here;
  * prediction parity holds wherever the product doesn't underflow).
  *
  * Scale notes: the model/scalars are the only intentionally-small
  * DataFrames; they are `broadcast()` to the probe side (no shuffle on the
  * big fact). A web-scale vocabulary would exceed broadcast — then drop the
  * hint and the same plan becomes a shuffle hash join.
  *
  * Float determinism vs the DuckDB oracle: per-doc log-prob sums commute
  * differently between engines, so the decision margin is `round(…, 6)`
  * before the strict-`>` compare; all other outputs are exact integers or
  * derived from exact integers by identical double ops.
  */
object SentimentNb {
  type Q = (SparkSession, String) => DataFrame

  // =====================================================================
  //  model (A1/M5) — word × class counts over the training split
  // =====================================================================

  def model(s: SparkSession, d: String): DataFrame =
    Corpus.tokensNb(s, d).filter(col("is_train"))
      .groupBy("word")
      .agg(sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("pos"),
           sum(when(col("label") === 1.0, 0L).otherwise(1L)).as("neg"))

  private val modelBody: String =
    """model AS (
      |  SELECT word,
      |         CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
      |         CAST(sum(CASE WHEN label = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS neg
      |  FROM tokens WHERE is_train GROUP BY word)""".stripMargin

  /** CTE chain `cleaned → tokens → model` (for `WITH ${modelCte} …`). */
  val modelCte: String = s"${Corpus.tokensNbCte},\n$modelBody"

  val a1: Q = (s, d) => model(s, d).orderBy("word")
  val a1Sql: String =
    s"""WITH $modelCte
       |SELECT word, pos, neg FROM model ORDER BY word""".stripMargin

  // =====================================================================
  //  corpus scalars (A2) — the six counters of NB.java:27-39
  // =====================================================================

  def corpusStats(s: SparkSession, d: String): DataFrame = {
    val docsAgg = Corpus.cleanedNb(s, d).filter(col("is_train")).agg(
      count(lit(1)).as("tweets"),
      sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("pos_tweets"),
      sum(when(col("label") === 1.0, 0L).otherwise(1L)).as("neg_tweets"))
    val wordsAgg = Corpus.tokensNb(s, d).filter(col("is_train")).agg(
      sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("pos_words"),
      sum(when(col("label") === 1.0, 0L).otherwise(1L)).as("neg_words"),
      countDistinct(col("word")).as("features"))
    docsAgg.crossJoin(wordsAgg) // 1 row × 1 row
  }

  private val statsBody: String =
    """stats AS (
      |  SELECT d.tweets, d.pos_tweets, d.neg_tweets,
      |         w.pos_words, w.neg_words, w.features
      |  FROM (SELECT CAST(count(*) AS BIGINT) AS tweets,
      |               CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos_tweets,
      |               CAST(sum(CASE WHEN label = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS neg_tweets
      |        FROM cleaned WHERE is_train) d
      |  CROSS JOIN
      |       (SELECT CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos_words,
      |               CAST(sum(CASE WHEN label = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS neg_words,
      |               CAST(count(DISTINCT word) AS BIGINT) AS features
      |        FROM tokens WHERE is_train) w)""".stripMargin

  val a2: Q = corpusStats
  val a2Sql: String =
    s"""WITH ${Corpus.tokensNbCte},
       |$statsBody
       |SELECT tweets, pos_tweets, neg_tweets, pos_words, neg_words, features
       |FROM stats""".stripMargin

  // =====================================================================
  //  J1 — broadcast model probe (the reference's hand-rolled map-side join)
  // =====================================================================

  /** Test-token × model lookup: every matched probe, grouped per word.
    * `pos`/`neg` are functionally determined by `word` (min = the value). */
  val j1: Q = (s, d) =>
    Corpus.tokensNb(s, d).filter(!col("is_train"))
      .join(broadcast(model(s, d)), "word")
      .groupBy("word")
      .agg(count(lit(1)).as("n_probe"), min(col("pos")).as("pos"), min(col("neg")).as("neg"))
      .orderBy("word")
  val j1Sql: String =
    s"""WITH $modelCte
       |SELECT word, CAST(count(*) AS BIGINT) AS n_probe,
       |       min(pos) AS pos, min(neg) AS neg
       |FROM tokens JOIN model USING (word)
       |WHERE NOT is_train GROUP BY word ORDER BY word""".stripMargin

  // =====================================================================
  //  scoring (M6, log-space) + confusion (A4) + metrics (A6)
  // =====================================================================

  /** Internal: (doc_id, label, clean, prediction) over the test split.
    *
    * Round-16: the cleaned corpus is PERSISTED for the duration of the
    * query — the regexp cleaning chain used to re-run once per consumer
    * (the train-side model, the test-side probe, the stats words pass
    * and the final test projection: 4 full-corpus cleaning passes per
    * scoring query), and every m6/a4/a6/cal/eval entry pays it. The
    * cache is doc-level (smaller than SvmSgd's precedented train-token
    * persist), MEMORY_AND_DISK, and is released by the harness's
    * between-entry sweep (Bench/Verify call Pinned.releaseAll) — the
    * per-doc token order is row-local, so per-doc float sums (and the
    * round(…, 6) margins) are unchanged by the caching. */
  private def scoredDf(s: SparkSession, d: String): DataFrame = {
    val cleaned = Corpus.cleanedNb(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = Corpus.tokensFromCleaned(cleaned)
    val modelT = toks.filter(col("is_train"))
      .groupBy("word")
      .agg(sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("pos"),
           sum(when(col("label") === 1.0, 0L).otherwise(1L)).as("neg"))
    val docsAgg = cleaned.filter(col("is_train")).agg(
      count(lit(1)).as("tweets"),
      sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("pos_tweets"),
      sum(when(col("label") === 1.0, 0L).otherwise(1L)).as("neg_tweets"))
    val wordsAgg = toks.filter(col("is_train")).agg(
      sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("pos_words"),
      sum(when(col("label") === 1.0, 0L).otherwise(1L)).as("neg_words"),
      countDistinct(col("word")).as("features"))
    val stats = docsAgg.crossJoin(wordsAgg)
    val perDoc = toks.filter(!col("is_train"))
      .join(broadcast(modelT), "word")
      .groupBy("doc_id")
      .agg(sum(log(col("pos") + lit(1.0))).as("sp"),
           sum(log(col("neg") + lit(1.0))).as("sn"),
           count(lit(1)).as("n"))
    // nullif guards BOTH log(0) sites — the empty-class prior AND the
    // empty-vocabulary denominator (all train docs cleaning to blank):
    // Spark log(0)=NULL but DuckDB ln(0) ERRORS — nullif makes both
    // engines yield NULL margin → prediction 0.0
    val margin =
      (coalesce(col("sp"), lit(0.0))
        - coalesce(col("n"), lit(0L)) * log(nullif(col("pos_words") + col("features"), lit(0L)))
        + log(nullif(col("pos_tweets"), lit(0L)) / col("tweets"))) -
      (coalesce(col("sn"), lit(0.0))
        - coalesce(col("n"), lit(0L)) * log(nullif(col("neg_words") + col("features"), lit(0L)))
        + log(nullif(col("neg_tweets"), lit(0L)) / col("tweets")))
    cleaned.filter(!col("is_train"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("label").cast("double").as("label"), col("clean"),
        when(round(margin, 6) > 0, 1.0).otherwise(0.0).as("prediction"),
        round(margin, 6).as("margin_r6"))
  }

  /** CTE chain ending in `scored(doc_id, label, clean, prediction)`. */
  private val scoredCte: String =
    s"""$modelCte,
       |$statsBody,
       |perdoc AS (
       |  SELECT t.doc_id,
       |         sum(ln(m.pos + 1.0)) AS sp,
       |         sum(ln(m.neg + 1.0)) AS sn,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM tokens t JOIN model m USING (word)
       |  WHERE NOT t.is_train GROUP BY t.doc_id),
       |scored AS (
       |  SELECT c.doc_id, CAST(c.label AS DOUBLE) AS label, c.clean,
       |         CAST(CASE WHEN round(
       |           (coalesce(p.sp, 0.0) - coalesce(p.n, 0) * ln(nullif(s.pos_words + s.features, 0)) + ln(nullif(s.pos_tweets, 0) / s.tweets))
       |           - (coalesce(p.sn, 0.0) - coalesce(p.n, 0) * ln(nullif(s.neg_words + s.features, 0)) + ln(nullif(s.neg_tweets, 0) / s.tweets)), 6) > 0
       |         THEN 1.0 ELSE 0.0 END AS DOUBLE) AS prediction,
       |         round(
       |           (coalesce(p.sp, 0.0) - coalesce(p.n, 0) * ln(nullif(s.pos_words + s.features, 0)) + ln(nullif(s.pos_tweets, 0) / s.tweets))
       |           - (coalesce(p.sn, 0.0) - coalesce(p.n, 0) * ln(nullif(s.neg_words + s.features, 0)) + ln(nullif(s.neg_tweets, 0) / s.tweets)), 6) AS margin_r6
       |  FROM cleaned c LEFT JOIN perdoc p USING (doc_id) CROSS JOIN stats s
       |  WHERE NOT c.is_train)""".stripMargin

  val m6: Q = (s, d) =>
    scoredDf(s, d).select("doc_id", "label", "prediction").orderBy("doc_id")
  val m6Sql: String =
    s"""WITH $scoredCte
       |SELECT doc_id, label, prediction FROM scored ORDER BY doc_id""".stripMargin

  /** Prediction sink lines `id@cleanedText \t POSITIVE|NEGATIVE` (NB.java:257,266). */
  val m6Lines: Q = (s, d) =>
    scoredDf(s, d)
      .select(concat(col("doc_id").cast("string"), lit("@"), col("clean"), lit("\t"),
        when(col("prediction") === 1.0, "POSITIVE").otherwise("NEGATIVE")).as("line"))
      .orderBy("line")
  val m6LinesSql: String =
    s"""WITH $scoredCte
       |SELECT doc_id::VARCHAR || '@' || clean || chr(9) ||
       |       CASE WHEN prediction = 1.0 THEN 'POSITIVE' ELSE 'NEGATIVE' END AS line
       |FROM scored ORDER BY line""".stripMargin

  val a4: Q = (s, d) =>
    scoredDf(s, d).groupBy("prediction", "label").agg(count(lit(1)).as("n"))
      .orderBy("prediction", "label")
  val a4Sql: String =
    s"""WITH $scoredCte
       |SELECT prediction, label, CAST(count(*) AS BIGINT) AS n
       |FROM scored GROUP BY prediction, label ORDER BY prediction, label""".stripMargin

  /** A6: accuracy/precision/recall/F1 from exact integer counts; F1 uses the
    * integer form 2·tp/(2·tp+fp+fn) so both engines divide identical operands. */
  def binaryMetrics(s: SparkSession, d: String): DataFrame =
    scoredDf(s, d).agg(
      sum(when(col("prediction") === 1.0 && col("label") === 1.0, 1L).otherwise(0L)).as("tp"),
      sum(when(col("prediction") === 1.0 && col("label") === 0.0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("prediction") === 0.0 && col("label") === 0.0, 1L).otherwise(0L)).as("tn"),
      sum(when(col("prediction") === 0.0 && col("label") === 1.0, 1L).otherwise(0L)).as("fn"))
    .select(col("tp"), col("fp"), col("tn"), col("fn"),
      round((col("tp") + col("tn")) / nullif(col("tp") + col("fp") + col("tn") + col("fn"), lit(0L)), 6).as("accuracy"),
      round(col("tp") / nullif(col("tp") + col("fp"), lit(0L)), 6).as("precision"),
      round(col("tp") / nullif(col("tp") + col("fn"), lit(0L)), 6).as("recall"),
      round((lit(2L) * col("tp")) / nullif(lit(2L) * col("tp") + col("fp") + col("fn"), lit(0L)), 6).as("f1"))
  val binaryMetricsSql: String =
    s"""WITH $scoredCte,
       |cm AS (
       |  SELECT CAST(sum(CASE WHEN prediction = 1.0 AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |         CAST(sum(CASE WHEN prediction = 1.0 AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |         CAST(sum(CASE WHEN prediction = 0.0 AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |         CAST(sum(CASE WHEN prediction = 0.0 AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM scored)
       |SELECT tp, fp, tn, fn,
       |       round((tp + tn) / nullif(tp + fp + tn + fn, 0), 6) AS accuracy,
       |       round(tp / nullif(tp + fp, 0), 6) AS precision,
       |       round(tp / nullif(tp + fn, 0), 6) AS recall,
       |       round((2 * tp) / nullif(2 * tp + fp + fn, 0), 6) AS f1
       |FROM cm""".stripMargin

  // =====================================================================
  //  [EXT] CAL1 — classifier calibration audit over the NB margin
  // =====================================================================

  /** CAL1: reliability bins for the hand-rolled NB classifier — docs
    * bucketed by unit-width margin bins (floor of the 6-decimal-rounded
    * log-odds margin, clamped to [−5, 5]), per bin the empirical
    * positive-label rate and the predicted-positive count. A calibrated
    * classifier's pos_rate_bp rises monotonically with the bin — the
    * audit a scoring pipeline runs before trusting scores as sampling
    * weights (e.g. for t20-style quality filtering). Composes entirely
    * from the verified m6 scoring frame; binning happens on the SAME
    * rounded margin both engines already agree on for the prediction
    * sign, so the whole op stays engine-exact. One aggregate over the
    * scored frame — no new scan, no new shuffle shape. */
  /** Tie-aware Mann–Whitney AUC over any (labelCol ∈ {0,1} as double,
    * scoreCol) frame, in EXACT integers: 2·AUC·np·nn = 2·#{(p,n): s_p >
    * s_n} + #{score ties} is computed from per-distinct-score (p, q)
    * counts and a cumulative negative count — never a pairwise join.
    * The window runs on the distinct-score frame (value-domain-bounded,
    * `coalesce(1)` explicit — the mix3/dq2 idiom), so the corpus is
    * touched once by the counting aggregate. */
  private[graft] def aucFromScores(scores: DataFrame,
      labelCol: String, scoreCol: String): DataFrame = {
    val per = scores.groupBy(col(scoreCol).as("m"))
      .agg(sum(when(col(labelCol) === 1.0, 1L).otherwise(0L)).as("p"),
        sum(when(col(labelCol) =!= 1.0, 1L).otherwise(0L)).as("q"))
    // distributed exclusive prefix of q over ascending score
    // (PrefixSum.prefixRank — the shared voc2/pack2/cur1 idiom). Margins
    // are NEAR-UNIQUE per doc (6-decimal doubles), so the per-distinct-
    // score frame is CORPUS-sized: a coalesce(1) cumulative window here
    // would funnel every scored doc through one task at 100 TB (the
    // original shape). At the tested SFs the wall time is dominated by
    // the upstream NB scoring pipeline either way (eval2 ≈ cal1 ≈ 9 s at
    // sf1), so this is a scale-shape fix, not a measured sf1 win.
    PrefixSum.prefixRank(per, Seq(col("m")), Some("q"), pinInput = true).df
      .withColumn("qb", col("g_cum_excl"))
      // DECIMAL(38,0) accumulation: auc2 ≈ 2·n_pos·n_neg exceeds int64
      // once each class passes ~2e9 docs (well under the 100 TB target),
      // and non-ANSI Spark would wrap silently while DuckDB's HUGEINT sum
      // stays exact — so both the per-row product and the sum run in
      // decimal, and auc2 is emitted as a STRING (a DECIMAL/HUGEINT output
      // column would degrade through the driver's pandas fetch path — the
      // FRAGILE_TYPES lesson from the r08 mix1 red). auc_bp divides the
      // decimals integrally, so the headline number is exact at any scale.
      .agg(sum("p").as("n_pos"), sum("q").as("n_neg"),
        sum(expr("2 * CAST(p AS DECIMAL(38,0)) * qb + CAST(p AS DECIMAL(38,0)) * q"))
          .as("auc2d"))
      .withColumn("auc_bp", expr(
        "CAST(auc2d * 10000 div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"))
      .select(col("n_pos"), col("n_neg"),
        expr("CAST(auc2d AS STRING)").as("auc2"), col("auc_bp"))
  }

  /** EVAL2: ROC-AUC of the NB classifier — the threshold-free companion
    * to a4/a6 (accuracy at one cut) and cal1 (calibration): the exact
    * probability a random positive outscores a random negative, ties at
    * half credit. Scores are the 6-decimal-rounded margins both engines
    * already agree on bit-for-bit (the m6/cal1 exposure), and the AUC
    * numerator is pure integer, so the oracle hash-matches. */
  val eval2: Q = (s, d) =>
    aucFromScores(
      scoredDf(s, d).select(col("label"),
        expr("coalesce(margin_r6, 0.0)").as("m")),
      "label", "m")
  val eval2Sql: String =
    s"""WITH $scoredCte,
       |vals AS (
       |  SELECT coalesce(margin_r6, 0.0) AS m,
       |         CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS p,
       |         CAST(sum(CASE WHEN label <> 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS q
       |  FROM scored GROUP BY 1),
       |cum AS (
       |  SELECT m, p, q,
       |         CAST(coalesce(sum(q) OVER (ORDER BY m
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS qb
       |  FROM vals)
       |SELECT CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(q) AS BIGINT) AS n_neg,
       |       CAST(sum(2 * CAST(p AS HUGEINT) * qb + CAST(p AS HUGEINT) * q) AS VARCHAR) AS auc2,
       |       CAST(sum(2 * CAST(p AS HUGEINT) * qb + CAST(p AS HUGEINT) * q) * 10000
       |         // (2 * CAST(sum(p) AS HUGEINT) * sum(q)) AS BIGINT) AS auc_bp
       |FROM cum""".stripMargin

  /** EVAL13: cumulative gains / lift at k — the targeting companion to
    * eval2's AUC: rank the test docs by NB margin (descending, doc_id
    * tie-break) and report, at k ∈ {10, 25, 50, 100}, how many true
    * positives the top k contains and the exact lift over random
    * (pos_at_k·N·10000 div (k·n_pos) basis points). AUC summarizes the
    * whole curve; lift@k is what a selection budget actually buys — the
    * statistic behind "score the corpus, keep the top k" quality
    * filtering. Ranking uses [[PrefixSum.prefixRank]] (range-partitioned
    * global rank + exclusive positive prefix — never a single-reducer
    * window), and both engines rank the identical 6-decimal-rounded
    * margins, so every output is exact integer. */
  private[graft] def liftAtKOf(scores: DataFrame, labelCol: String,
      scoreCol: String, ks: Seq[Int]): DataFrame = {
    val base = scores.select(col(scoreCol).as("m"), col("tie"),
      col(labelCol).cast("long").as("lbl"))
    val r = PrefixSum.prefixRank(base,
      Seq(col("m").desc, col("tie").asc), sumCol = Some("lbl"), pinInput = true)
    r.df.filter(col("g_rank").isin(ks.map(k => java.lang.Long.valueOf(k.toLong)): _*))
      .select(col("g_rank").as("k"),
        (col("g_cum_excl") + col("lbl")).as("pos_at_k"))
      .withColumn("lift_bp", expr(
        s"pos_at_k * ${r.nRows}L * 10000 div greatest(k * ${r.sumTotal}L, 1)"))
      .orderBy("k")
  }

  /** EVAL14: average precision (area under the precision–recall curve,
    * step interpolation) — the imbalance-robust companion to eval2's
    * ROC-AUC: ROC flatters a classifier when negatives dominate, AP
    * weighs exactly the positive-retrieval behavior selection pipelines
    * care about. AP = Σ over distinct scores s (descending) of
    * ΔR·P(s) = (p_s/n_pos)·(cumpos_s/cum_n_s); each term is the exact
    * integral e6 quotient p_s·cumpos_s·10⁶ div (n_pos·cum_n_s) — no
    * floats, so the sum is engine-exact. Per-distinct-score counts +
    * the descending prefix come from the same eval2 machinery
    * ([[PrefixSum.prefixRank]] on the value-domain frame — never a
    * pairwise join, never a single-reducer window); ties take the
    * whole tied block's precision (the standard step convention). */
  private[graft] def averagePrecisionOf(scores: DataFrame,
      labelCol: String, scoreCol: String): DataFrame = {
    val per = scores.groupBy(col(scoreCol).as("m"))
      .agg(sum(when(col(labelCol) === 1.0, 1L).otherwise(0L)).as("p"),
        count(lit(1)).as("t"))
    // two prefix passes over the tiny value-domain frame: cum_n (all
    // rows at-or-above the score) then cum_p (positives at-or-above)
    val byDesc = Seq(col("m").desc)
    val r1 = PrefixSum.prefixRank(per, byDesc, sumCol = Some("t"), pinInput = true)
    val withCumN = r1.df.select(col("m"), col("p"), col("t"),
      (col("g_cum_excl") + col("t")).as("cum_n"))
    val r2 = PrefixSum.prefixRank(withCumN, byDesc, sumCol = Some("p"))
    val nPos = math.max(r2.sumTotal, 1L) // n_pos (guard: AP of an all-negative frame is 0)
    r2.df
      .agg(
        lit(r2.sumTotal).as("n_pos"),
        sum("t").as("n"),
        sum(expr("CASE WHEN p = 0 THEN 0L ELSE " +
          s"CAST(p AS DECIMAL(38,0)) * (g_cum_excl + p) * 1000000 div " +
          s"(CAST(${nPos}L AS DECIMAL(38,0)) * cum_n) END")).as("ap_raw"))
      .select(col("n_pos"), col("n"),
        expr("CAST(coalesce(ap_raw, 0) AS BIGINT)").as("ap_e6"))
  }

  val eval14: Q = (s, d) =>
    averagePrecisionOf(
      scoredDf(s, d).select(col("label"),
        expr("coalesce(margin_r6, 0.0)").as("m")),
      "label", "m")
  val eval14Sql: String =
    s"""WITH $scoredCte,
       |vals AS (
       |  SELECT coalesce(margin_r6, 0.0) AS m,
       |         CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS p,
       |         CAST(count(*) AS BIGINT) AS t
       |  FROM scored GROUP BY 1),
       |cum AS (
       |  SELECT m, p, t,
       |         CAST(sum(t) OVER (ORDER BY m DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
       |         CAST(coalesce(sum(p) OVER (ORDER BY m DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pb
       |  FROM vals),
       |tot AS (SELECT greatest(CAST(sum(p) AS HUGEINT), 1) AS npos,
       |               CAST(sum(p) AS BIGINT) AS n_pos_out,
       |               CAST(sum(t) AS BIGINT) AS n FROM vals)
       |SELECT tot.n_pos_out AS n_pos, tot.n,
       |       CAST(coalesce(sum(CASE WHEN p = 0 THEN 0 ELSE
       |         CAST(p AS HUGEINT) * (pb + p) * 1000000 // (tot.npos * cum_n) END), 0) AS BIGINT) AS ap_e6
       |FROM cum CROSS JOIN tot GROUP BY tot.n_pos_out, tot.n""".stripMargin

  val eval13: Q = (s, d) =>
    liftAtKOf(
      scoredDf(s, d).select(col("label"),
        expr("coalesce(margin_r6, 0.0)").as("m"), col("doc_id").as("tie")),
      "label", "m", Seq(10, 25, 50, 100))
  val eval13Sql: String =
    s"""WITH $scoredCte,
       |r AS (
       |  SELECT CAST(label AS BIGINT) AS lbl,
       |         row_number() OVER (ORDER BY coalesce(margin_r6, 0.0) DESC, doc_id) AS rn,
       |         sum(CAST(label AS BIGINT)) OVER (
       |           ORDER BY coalesce(margin_r6, 0.0) DESC, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos
       |  FROM scored),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(lbl) AS BIGINT) AS npos FROM r)
       |SELECT CAST(rn AS BIGINT) AS k, CAST(cpos AS BIGINT) AS pos_at_k,
       |       CAST(cpos * n * 10000 // greatest(rn * npos, 1) AS BIGINT) AS lift_bp
       |FROM r CROSS JOIN tot WHERE rn IN (10, 25, 50, 100) ORDER BY k""".stripMargin

  val cal1: Q = (s, d) =>
    scoredDf(s, d)
      .withColumn("bin",
        expr("least(greatest(CAST(floor(coalesce(margin_r6, 0.0)) AS BIGINT), -5L), 5L)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("n_pos_label"),
        sum(when(col("prediction") === 1.0, 1L).otherwise(0L)).as("n_pred_pos"))
      .withColumn("pos_rate_bp", expr("n_pos_label * 10000 div n"))
      .orderBy("bin")
  val cal1Sql: String =
    s"""WITH $scoredCte,
       |b AS (
       |  SELECT least(greatest(CAST(floor(coalesce(margin_r6, 0.0)) AS BIGINT), -5), 5) AS bin,
       |         label, prediction
       |  FROM scored)
       |SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_label,
       |       CAST(sum(CASE WHEN prediction = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
       |       CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) * 10000
       |         // CAST(count(*) AS BIGINT) AS pos_rate_bp
       |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  /** CAL3: expected / maximum calibration error over cal1's margin bins
    * (Naeini et al. AAAI 2015 — the single number reported beside
    * reliability diagrams): with cal2's binned midpoint forecast
    * f_k = (2·bin+11)/22, ECE = Σ n_k·|f_k − obs_k| / N and MCE is the
    * worst bin's |f_k − obs_k|. Over the common denominator 22 every
    * per-bin term is the exact integer |(2b+11)·n_k − 22·pos_k|, so
    * BOTH numbers are single exact integral divisions (e6; numerators
    * non-negative ⇒ trunc == floor). Scale: cal1's one scan + an
    * 11-row fold. */
  val cal3: Q = (s, d) =>
    scoredDf(s, d)
      .withColumn("bin",
        expr("least(greatest(CAST(floor(coalesce(margin_r6, 0.0)) AS BIGINT), -5L), 5L)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("pos"))
      .withColumn("dev", expr("abs((2 * bin + 11) * n - 22 * pos)"))
      .agg(sum("n").cast("long").as("n"),
        sum(expr("CAST(dev AS DECIMAL(38,0))")).as("sdev"),
        max(expr("dev * 1000000 div (22 * n)")).as("mce"))
      .select(col("n"),
        expr("CAST(sdev * 1000000 div (22 * CAST(n AS DECIMAL(38,0))) AS BIGINT)").as("ece_e6"),
        col("mce").cast("long").as("mce_e6"))
  val cal3Sql: String =
    s"""WITH $scoredCte,
       |b AS (
       |  SELECT least(greatest(CAST(floor(coalesce(margin_r6, 0.0)) AS BIGINT), -5), 5) AS bin,
       |         label
       |  FROM scored),
       |k AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
       |  FROM b GROUP BY bin),
       |d AS (SELECT n, abs((2 * bin + 11) * n - 22 * pos) AS dev FROM k)
       |SELECT CAST(sum(n) AS BIGINT) AS n,
       |       CAST(CAST(sum(CAST(dev AS HUGEINT)) AS HUGEINT) * 1000000
       |         // (22 * CAST(sum(n) AS HUGEINT)) AS BIGINT) AS ece_e6,
       |       CAST(max(dev * 1000000 // (22 * n)) AS BIGINT) AS mce_e6
       |FROM d""".stripMargin

  /** CAL2: Murphy (1973) decomposition of the Brier score over cal1's
    * margin bins — Brier = REL − RES + UNC with the binned forecast
    * f_k = (2·bin+11)/22 (the bin's midpoint mapped onto [0,1]):
    * reliability charges miscalibration (forecast vs observed rate per
    * bin), resolution credits bins that separate outcomes from the base
    * rate, uncertainty is the base rate's own variance. The decomposition
    * localizes WHY a Brier score is bad — a model can be well calibrated
    * (REL≈0) yet useless (RES≈0) — which is the diagnostic cal1's raw
    * curve doesn't give. Arithmetic: per-bin numerators are exact
    * DECIMAL(38,0)/HUGEINT squares over the common denominators; the
    * only truncations are the mirrored integral divisions (per-bin by
    * n_k, then the three e6 emissions), deterministic in both engines
    * (all numerators non-negative, so trunc == floor).
    *
    * Scale: cal1's one scan + an 11-row bin table; everything after the
    * bin aggregate is constant-size. */
  val cal2: Q = (s, d) => {
    val bins = scoredDf(s, d)
      .withColumn("bin",
        expr("least(greatest(CAST(floor(coalesce(margin_r6, 0.0)) AS BIGINT), -5L), 5L)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("o"))
    // totals via an unbounded window over the ≤11-row bin table
    // (coalesce(1) explicit — the mix3/dq2 bounded-value-domain idiom),
    // NOT a separate aggregate crossJoined back: that diamond re-planned
    // the ENTIRE upstream NB scoring chain once per consumer (round-16;
    // cal2 was ~2× cal3's wall for the same scan work)
    val w = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    bins.coalesce(1)
      .withColumn("nn", sum("n").over(w))
      .withColumn("oo", sum("o").over(w))
      .select(col("n"), col("nn"), col("oo"),
        expr("CAST(n * (2 * bin + 11) - 22 * o AS DECIMAL(38,0))").as("reld"),
        expr("CAST(o * nn - oo * n AS DECIMAL(38,0))").as("resd"))
      .agg(sum(expr("reld * reld div CAST(n AS DECIMAL(38,0))")).as("relsum"),
        sum(expr("resd * resd div CAST(n AS DECIMAL(38,0))")).as("ressum"),
        max("nn").as("nn"), max("oo").as("oo"))
      .select(col("nn").as("n"),
        expr("CAST(1000000 * relsum div (484 * CAST(nn AS DECIMAL(38,0))) AS BIGINT)").as("rel_e6"),
        expr("CAST(1000000 * ressum div (CAST(nn AS DECIMAL(38,0)) * nn * nn) AS BIGINT)").as("res_e6"),
        expr("CAST(1000000 * CAST(oo AS DECIMAL(38,0)) * (nn - oo) div (CAST(nn AS DECIMAL(38,0)) * nn) AS BIGINT)").as("unc_e6"))
      .withColumn("brier_e6", expr("rel_e6 - res_e6 + unc_e6"))
  }
  val cal2Sql: String =
    s"""WITH $scoredCte,
       |b AS (
       |  SELECT least(greatest(CAST(floor(coalesce(margin_r6, 0.0)) AS BIGINT), -5), 5) AS bin,
       |         label
       |  FROM scored),
       |bins AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS o
       |  FROM b GROUP BY bin),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(o) AS BIGINT) AS oo FROM bins),
       |terms AS (
       |  SELECT n, nn, oo,
       |         CAST(n * (2 * bin + 11) - 22 * o AS HUGEINT) AS reld,
       |         CAST(o * nn - oo * n AS HUGEINT) AS resd
       |  FROM bins, tot),
       |agg AS (
       |  SELECT CAST(sum(reld * reld // CAST(n AS HUGEINT)) AS HUGEINT) AS relsum,
       |         CAST(sum(resd * resd // CAST(n AS HUGEINT)) AS HUGEINT) AS ressum,
       |         max(nn) AS nn, max(oo) AS oo
       |  FROM terms)
       |SELECT nn AS n,
       |       CAST(1000000 * relsum // (484 * CAST(nn AS HUGEINT)) AS BIGINT) AS rel_e6,
       |       CAST(1000000 * ressum // (CAST(nn AS HUGEINT) * nn * nn) AS BIGINT) AS res_e6,
       |       CAST(1000000 * CAST(oo AS HUGEINT) * (nn - oo) // (CAST(nn AS HUGEINT) * nn) AS BIGINT) AS unc_e6,
       |       CAST(1000000 * relsum // (484 * CAST(nn AS HUGEINT))
       |         - 1000000 * ressum // (CAST(nn AS HUGEINT) * nn * nn)
       |         + 1000000 * CAST(oo AS HUGEINT) * (nn - oo) // (CAST(nn AS HUGEINT) * nn) AS BIGINT) AS brier_e6
       |FROM agg""".stripMargin

  // =====================================================================
  //  registry
  // =====================================================================

  val queries: Map[String, Q] = Map(
    "cal1_nb_calibration_bins" -> cal1,
    "cal2_brier_decomposition" -> cal2,
    "cal3_ece" -> cal3,
    "eval2_nb_auc" -> eval2,
    "eval13_lift_at_k" -> eval13,
    "eval14_average_precision" -> eval14,
    "a1_nb_word_class_counts" -> a1,
    "a2_corpus_scalars" -> a2,
    "j1_broadcast_model_join" -> j1,
    "m6_nb_score" -> m6,
    "m6_nb_prediction_lines" -> m6Lines,
    "a4_confusion_matrix" -> a4,
    "a6_nb_metrics" -> ((s, d) => binaryMetrics(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "cal1_nb_calibration_bins" -> cal1Sql,
    "cal2_brier_decomposition" -> cal2Sql,
    "cal3_ece" -> cal3Sql,
    "eval2_nb_auc" -> eval2Sql,
    "eval13_lift_at_k" -> eval13Sql,
    "eval14_average_precision" -> eval14Sql,
    "a1_nb_word_class_counts" -> a1Sql,
    "a2_corpus_scalars" -> a2Sql,
    "j1_broadcast_model_join" -> j1Sql,
    "m6_nb_score" -> m6Sql,
    "m6_nb_prediction_lines" -> m6LinesSql,
    "a4_confusion_matrix" -> a4Sql,
    "a6_nb_metrics" -> binaryMetricsSql,
  )
}
