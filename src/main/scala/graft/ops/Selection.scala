package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] Data-selection operators for LLM training pipelines — corpus
  * budget allocation, importance-weighted selection, entropy filtering,
  * and tokenizer (BPE) induction. Not derived from the reference; these
  * extend the mix1/mix2 family (ScaleOps) with the remaining standard
  * selection shapes.
  *
  * All scoring is integer fixed-point (each `ln` rounded to e6 micro-nats
  * BEFORE any further arithmetic — the t14/t15 convention), so every
  * ranking and keep decision compares exact BIGINTs and the DuckDB
  * oracles are engine-exact.
  *
  * 100 TB shapes:
  *   - mix3: one map-side-combined per-source token count (S rows), then
  *     a single-partition window over those S rows — the water-filling
  *     never touches the corpus again.
  *   - sel1: vocab aggregate (one explode + groupBy), equi-join of token
  *     instances against per-token deltas, per-doc sum, global top-k via
  *     `TakeOrderedAndProject` (never a full sort).
  *   - t18: alphabet histogram by 27 `replace` length-diffs per doc — a
  *     pure projection off the scan (no per-character explode, which
  *     would multiply the shuffle by average doc length).
  *   - bpe1/bpe2: statistics over the DISTINCT-token vocabulary, not the
  *     corpus — the classic BPE trainer decomposition. The corpus is
  *     scanned once for term frequencies; every later pass is vocab-sized.
  */
object Selection {
  type Q = (SparkSession, String) => DataFrame

  private def toks(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("tok"))
    .filter(length(col("tok")) > 0)

  // ---- MIX3: UniMax epoch-capped budget allocation ----

  /** Epoch cap E: no source may contribute more than E passes over its
    * own tokens (UniMax, Chung et al. 2023, arXiv:2304.09151). */
  private val UnimaxEpochCap = 2L

  /** MIX3: UniMax water-filling. Given per-source token counts n_s, a
    * budget B = Σ n_s and caps c_s = E·n_s, allocate B as uniformly as
    * possible subject to alloc_s ≤ c_s:
    *
    * sort sources ascending by (c_s, source); a source takes its FULL
    * cap iff c_s·(S−i+1) ≤ B − prefix_i (exact integer test — since caps
    * are ascending, the full set is a prefix of the order); the remaining
    * R sources share B − Σ_full c_s as evenly as integers allow (each
    * gets q = (B−T) div R, the first (B−T) mod R of them in sort order
    * get q+1). Every step is integer, so the oracle is engine-exact.
    *
    * Scale: the corpus is touched once (map-side-combined count per
    * source); the water-fill is a window over S rows on one partition.
    * Emits (source, n_toks, cap, alloc, epochs_bp) — epochs_bp is the
    * realized epoch count in basis points (alloc·10⁴ div n_toks). */
  private[graft] def unimaxAllocationOf(docs: DataFrame, epochCap: Long): DataFrame = {
    val perSrc = toks(docs).groupBy("source").agg(count(lit(1)).as("n_toks"))
      .select(col("source"), col("n_toks"), (col("n_toks") * epochCap).as("cap"))
    // S sources is tiny (one row per corpus source) — a global window on
    // one partition is the right plan; coalesce(1) makes that explicit.
    val ord = Window.orderBy(col("cap"), col("source"))
    val ranked = perSrc.coalesce(1)
      .withColumn("i", row_number().over(ord))
      .withColumn("prefix", coalesce(sum("cap").over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("s_cnt", count(lit(1)).over(Window.partitionBy()))
      .withColumn("b_tot", sum("n_toks").over(Window.partitionBy()))
      .withColumn("full", col("cap") * (col("s_cnt") - col("i") + 1) <= col("b_tot") - col("prefix"))
    val w = Window.partitionBy()
    val withRem = ranked
      .withColumn("t_full", coalesce(sum(when(col("full"), col("cap"))).over(w), lit(0L)))
      .withColumn("n_full", coalesce(sum(when(col("full"), 1L)).over(w), lit(0L)))
      .withColumn("r_cnt", col("s_cnt") - col("n_full"))
      .withColumn("rem", col("b_tot") - col("t_full"))
    withRem.select(
      col("source"), col("n_toks"), col("cap"),
      when(col("full"), col("cap"))
        .otherwise(expr("rem div r_cnt") +
          when(col("i") - col("n_full") <= expr("rem % r_cnt"), 1L).otherwise(0L))
        .as("alloc"))
      .withColumn("epochs_bp", expr("alloc * 10000 div n_toks"))
  }

  val mix3: Q = (s, d) =>
    unimaxAllocationOf(Tables.documents(s, d), UnimaxEpochCap).orderBy("source")
  val mix3Sql: String =
    s"""WITH toks AS (
       |  SELECT source, unnest(str_split(text, ' ')) AS tok FROM documents),
       |per_src AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_toks,
       |         CAST(count(*) AS BIGINT) * $UnimaxEpochCap AS cap
       |  FROM toks WHERE len(tok) > 0 GROUP BY source),
       |ranked AS (
       |  SELECT source, n_toks, cap,
       |         CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS i,
       |         CAST(coalesce(sum(cap) OVER (ORDER BY cap, source
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix,
       |         CAST(count(*) OVER () AS BIGINT) AS s_cnt,
       |         CAST(sum(n_toks) OVER () AS BIGINT) AS b_tot
       |  FROM per_src),
       |flagged AS (
       |  SELECT *, cap * (s_cnt - i + 1) <= b_tot - prefix AS is_full FROM ranked),
       |scal AS (
       |  SELECT *,
       |         CAST(coalesce(sum(CASE WHEN is_full THEN cap END) OVER (), 0) AS BIGINT) AS t_full,
       |         CAST(coalesce(sum(CASE WHEN is_full THEN 1 END) OVER (), 0) AS BIGINT) AS n_full
       |  FROM flagged)
       |SELECT source, n_toks, cap,
       |       CAST(CASE WHEN is_full THEN cap
       |            ELSE (b_tot - t_full) // (s_cnt - n_full) +
       |                 (CASE WHEN i - n_full <= (b_tot - t_full) % (s_cnt - n_full)
       |                       THEN 1 ELSE 0 END)
       |       END AS BIGINT) AS alloc,
       |       CAST(CASE WHEN is_full THEN cap
       |            ELSE (b_tot - t_full) // (s_cnt - n_full) +
       |                 (CASE WHEN i - n_full <= (b_tot - t_full) % (s_cnt - n_full)
       |                       THEN 1 ELSE 0 END)
       |       END * 10000 // n_toks AS BIGINT) AS epochs_bp
       |FROM scal ORDER BY source""".stripMargin

  // ---- MIX4: data-constrained repetition allocation ----

  /** Epoch cap for mix4: past ~4 passes repeated data adds ~no value
    * (Muennighoff et al. 2023, arXiv:2305.16264, Fig. 3). */
  private val Mix4EpochCap = 4

  /** MIX4: data-constrained, quality-weighted repetition allocation —
    * the mixing decision a token-starved run actually faces (Muennighoff
    * et al. 2023): when the budget B exceeds the fresh corpus, WHICH
    * sources earn a 2nd/3rd/4th epoch? Each (source, epoch≤4) unit of
    * n_s tokens carries utility u = q_s · 2^−(epoch−1): a stylized
    * exact-integer form of the paper's decaying value of repeated data,
    * weighted by source quality q_s = type-token ratio in e6 (richer
    * vocabulary ⇒ worth repeating; boilerplate-heavy sources decay out
    * of the budget first). Greedy by (u desc, source, epoch) — within a
    * source the halving makes epochs strictly ordered, so a later epoch
    * never allocates before an earlier one — whole units until the
    * budget B = ⌊2.5·Σn_s⌋ runs out, the boundary unit partially. Every
    * step is integer, so the oracle is engine-exact. Emits per source
    * (n_toks, q_e6, alloc, epochs_bp).
    *
    * Scale: mix3's shape — ONE map-side-combined corpus scan for the
    * (count, distinct-count) pair per source, then the greedy runs on
    * the sources×4 unit table (bounded by the source universe, one
    * partition by design, same as mix3's water-fill window). Library
    * entry point: [[graft.api.GraftApi.dataConstrainedAlloc]]. */
  private[graft] def dataConstrainedAllocOf(docs: DataFrame, epochCap: Int): DataFrame = {
    val perSrc = toks(docs).groupBy("source")
      .agg(count(lit(1)).as("n_toks"), countDistinct("tok").as("n_types"))
      .withColumn("q_e6", expr("1000000 * n_types div n_toks"))
    // sources×epochs is tiny (one row per corpus source per epoch) — a
    // global window on one partition is the right plan (mix3 precedent).
    val ord = Window.orderBy(col("u").desc, col("source"), col("epoch"))
    perSrc.coalesce(1)
      .withColumn("tot", sum("n_toks").over(Window.partitionBy()))
      .select(col("source"), col("n_toks"), col("q_e6"), col("tot"),
        explode(sequence(lit(1), lit(epochCap))).as("epoch"))
      .withColumn("u", expr("q_e6 div shiftleft(1, epoch - 1)"))
      .withColumn("prefix", coalesce(
        sum("n_toks").over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("alloc_u",
        greatest(lit(0L), least(col("n_toks"), expr("(5 * tot) div 2") - col("prefix"))))
      .groupBy("source", "n_toks", "q_e6")
      .agg(sum("alloc_u").as("alloc"))
      .withColumn("epochs_bp", expr("alloc * 10000 div n_toks"))
      .orderBy("source")
  }

  val mix4: Q = (s, d) =>
    dataConstrainedAllocOf(Tables.documents(s, d), Mix4EpochCap)

  val mix4Sql: String =
    s"""WITH toks AS (
       |  SELECT source, unnest(str_split(text, ' ')) AS tok FROM documents),
       |per_src AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_toks,
       |         CAST(count(DISTINCT tok) AS BIGINT) AS n_types
       |  FROM toks WHERE len(tok) > 0 GROUP BY source),
       |q AS (
       |  SELECT source, n_toks, 1000000 * n_types // n_toks AS q_e6,
       |         CAST(sum(n_toks) OVER () AS BIGINT) AS tot
       |  FROM per_src),
       |units AS (
       |  SELECT source, n_toks, q_e6, tot, e.epoch,
       |         q_e6 // (1 << (epoch - 1)) AS u
       |  FROM q CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS epoch) e
       |  WHERE e.epoch <= $Mix4EpochCap),
       |pre AS (
       |  SELECT *, CAST(coalesce(sum(n_toks) OVER (
       |           ORDER BY u DESC, source, epoch
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
       |  FROM units)
       |SELECT source, n_toks, q_e6,
       |       CAST(sum(greatest(0, least(n_toks, (5 * tot) // 2 - prefix))) AS BIGINT) AS alloc,
       |       CAST(sum(greatest(0, least(n_toks, (5 * tot) // 2 - prefix))) * 10000 // n_toks AS BIGINT) AS epochs_bp
       |FROM pre GROUP BY source, n_toks, q_e6 ORDER BY source""".stripMargin

  // ---- SEL1: DSIR importance-weighted selection ----

  /** The "target distribution" slice — the high-quality subset whose
    * unigram statistics define what raw documents should look like.
    * Mirrored as a literal IN-list in the oracle. */
  private val DsirTargetSources: Seq[String] = Seq("src0", "src1", "src2", "src3")
  private val DsirTopK = 50

  /** SEL1: Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169), unigram variant. Importance weight of a doc is
    * Σ_tokens [ln p_target(t) − ln p_raw(t)] with add-1 smoothing over
    * the raw vocabulary; each ln is rounded to e6 micro-nats before the
    * subtraction, so per-token deltas (and hence per-doc sums and the
    * top-k cut) are exact integers in both engines.
    *
    * Scale: one vocab aggregate over the corpus, a target-side count
    * over the (much smaller) target slice, per-token deltas joined back
    * to token instances by term equi-join, per-doc sum, then a global
    * top-k that Spark plans as `TakeOrderedAndProject` (no full sort).
    * Emits the top-50 raw docs by importance: (rnk, doc_id, source,
    * n_toks, logw_e6). */
  private[graft] def dsirTopKOf(docs: DataFrame, targetSources: Seq[String], k: Int): DataFrame = {
    val t = toks(docs)
    val rawV = t.groupBy("tok").agg(count(lit(1)).as("cr"))
    val tgtV = t.filter(col("source").isin(targetSources: _*))
      .groupBy("tok").agg(count(lit(1)).as("ct_raw"))
    val joint = rawV.join(tgtV, Seq("tok"), "left")
      .select(col("tok"), col("cr"), coalesce(col("ct_raw"), lit(0L)).as("ct"))
    val scal = joint.agg(sum("cr").as("n_raw"), sum("ct").as("n_tgt"), count(lit(1)).as("v_size"))
    val deltas = joint.crossJoin(broadcast(scal))
      .select(col("tok"),
        (expr("CAST(round(ln(CAST(ct + 1 AS DOUBLE) / CAST(n_tgt + v_size AS DOUBLE)) * 1000000) AS BIGINT)") -
          expr("CAST(round(ln(CAST(cr + 1 AS DOUBLE) / CAST(n_raw + v_size AS DOUBLE)) * 1000000) AS BIGINT)"))
          .as("delta_e6"))
    val perDoc = t.join(deltas, Seq("tok"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_toks"), sum("delta_e6").as("logw_e6"))
    perDoc
      .orderBy(col("logw_e6").desc, col("doc_id"))
      .limit(k)
      .withColumn("rnk", row_number().over(Window.orderBy(col("logw_e6").desc, col("doc_id"))))
      .select(col("rnk"), col("doc_id"), col("source"), col("n_toks"), col("logw_e6"))
  }

  val sel1: Q = (s, d) =>
    dsirTopKOf(Tables.documents(s, d), DsirTargetSources, DsirTopK).orderBy("rnk")
  val sel1Sql: String = {
    val inList = DsirTargetSources.map(x => s"'$x'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, source, unnest(str_split(text, ' ')) AS tok FROM documents),
       |tk AS (SELECT doc_id, source, tok FROM toks WHERE len(tok) > 0),
       |rawv AS (SELECT tok, CAST(count(*) AS BIGINT) AS cr FROM tk GROUP BY tok),
       |tgtv AS (SELECT tok, CAST(count(*) AS BIGINT) AS ct FROM tk
       |         WHERE source IN ($inList) GROUP BY tok),
       |joint AS (
       |  SELECT rawv.tok, cr, CAST(coalesce(ct, 0) AS BIGINT) AS ct
       |  FROM rawv LEFT JOIN tgtv ON rawv.tok = tgtv.tok),
       |scal AS (SELECT CAST(sum(cr) AS BIGINT) AS n_raw,
       |                CAST(sum(ct) AS BIGINT) AS n_tgt,
       |                CAST(count(*) AS BIGINT) AS v_size FROM joint),
       |deltas AS (
       |  SELECT tok,
       |         CAST(round(ln(CAST(ct + 1 AS DOUBLE) / CAST(n_tgt + v_size AS DOUBLE)) * 1000000) AS BIGINT) -
       |         CAST(round(ln(CAST(cr + 1 AS DOUBLE) / CAST(n_raw + v_size AS DOUBLE)) * 1000000) AS BIGINT)
       |           AS delta_e6
       |  FROM joint CROSS JOIN scal),
       |per_doc AS (
       |  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_toks,
       |         CAST(sum(delta_e6) AS BIGINT) AS logw_e6
       |  FROM tk JOIN deltas USING (tok) GROUP BY doc_id, source),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY logw_e6 DESC, doc_id) AS rnk
       |  FROM per_doc)
       |SELECT CAST(rnk AS INTEGER) AS rnk, doc_id, source, n_toks, logw_e6
       |FROM ranked WHERE rnk <= $DsirTopK ORDER BY rnk""".stripMargin
  }

  // ---- T18: character-entropy filter ----

  /** 27-symbol alphabet: a–z plus space. Characters outside it are
    * ignored (not counted toward n). */
  private val Alphabet = "abcdefghijklmnopqrstuvwxyz "
  private val EntropyKeepLoE6 = 1500000L // 1.5 nats
  private val EntropyKeepHiE6 = 3300000L // ln 27 ≈ 3.2958 nats is the max

  /** T18: per-document Shannon character entropy over the a–z+space
    * alphabet, in micro-nats: H_e6 = Σ_c count_c · round(ln(n/count_c)·10⁶)
    * div n — each ln rounded before the weighted sum, so the result and
    * the keep decision (1.5 ≤ H ≤ 3.3 nats; degenerate repeated-char spam
    * sits far below, uniform noise at the top) are engine-exact integers.
    *
    * Scale: ZERO-shuffle — the 27-bin histogram (one `replace`
    * length-diff per alphabet symbol) and both entropy folds are array
    * HOFs inside one projection, so the whole op rides the scan (the
    * naive shapes either explode per character — multiplying the
    * exchange by average doc length — or exchange 27 rows per doc for a
    * windowed sum; this exchanges nothing). The HOF lambdas are
    * interpreted rather than codegen'd, but they touch 27-element
    * arrays — the per-row cost is the 27 `replace` scans either way,
    * and at 100 TB no-exchange beats codegen on a shuffle. Docs with no
    * counted characters are dropped (matching the SQL oracle's
    * zero-histogram semantics). */
  private[graft] def charEntropyOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("text"))
    // n_counted > 0 ⟺ text contains an alphabet char; the rlike form keeps
    // Catalyst's projection-collapse from recomputing the histogram in the
    // pushed-down filter
    .filter(col("text").rlike("[a-z ]"))
    .withColumn("cs", expr(
      s"""filter(transform(sequence(0, ${Alphabet.length - 1}),
         |  i -> CAST(length(text) - length(replace(text, substring('$Alphabet', i + 1, 1), '')) AS BIGINT)),
         |  c -> c > 0)""".stripMargin))
    .withColumn("n_counted", expr("aggregate(cs, 0L, (a, c) -> a + c)"))
    .withColumn("ent_e6", expr(
      """aggregate(cs, 0L, (a, c) ->
        |  a + c * CAST(round(ln(CAST(n_counted AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
        |div n_counted""".stripMargin))
    .select(col("doc_id"), col("n_counted"), col("ent_e6"),
      (col("ent_e6").between(EntropyKeepLoE6, EntropyKeepHiE6)).cast("int").as("keep"))

  val t18: Q = (s, d) =>
    charEntropyOf(Tables.documents(s, d)).orderBy("doc_id")
  val t18Sql: String =
    s"""WITH alpha AS (
       |  SELECT substr('$Alphabet', CAST(i AS INTEGER) + 1, 1) AS ch FROM range(${Alphabet.length}) t(i)),
       |counted AS (
       |  SELECT doc_id,
       |         CAST(len(text) - len(replace(text, ch, '')) AS BIGINT) AS c
       |  FROM documents CROSS JOIN alpha),
       |nz AS (SELECT * FROM counted WHERE c > 0),
       |wn AS (
       |  SELECT doc_id, c,
       |         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
       |  FROM nz),
       |terms AS (
       |  SELECT doc_id, c, n,
       |         CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS t_e6
       |  FROM wn),
       |ent AS (
       |  SELECT doc_id, CAST(max(n) AS BIGINT) AS n_counted,
       |         CAST(sum(c * t_e6) AS BIGINT) // CAST(max(n) AS BIGINT) AS ent_e6
       |  FROM terms GROUP BY doc_id)
       |SELECT doc_id, n_counted, ent_e6,
       |       CAST(ent_e6 BETWEEN $EntropyKeepLoE6 AND $EntropyKeepHiE6 AS INTEGER) AS keep
       |FROM ent ORDER BY doc_id""".stripMargin

  // ---- BPE1: adjacent-pair statistics over the vocabulary ----

  private val BpeTopPairs = 20

  /** BPE1: the first-iteration statistic of a BPE trainer — adjacent
    * character-pair counts over the DISTINCT-token vocabulary, weighted
    * by corpus term frequency (Sennrich et al. 2016, arXiv:1508.07909).
    * The corpus is scanned once for term frequencies; pair generation
    * runs over vocab rows only (the classic trainer decomposition — at
    * 100 TB the vocab aggregate is the only corpus-sized stage).
    * Emits the top-20 pairs: (rnk, left_sym, right_sym, pair_count). */
  private[graft] def bpePairStatsOf(docs: DataFrame, k: Int): DataFrame = {
    val vocab = toks(docs).groupBy("tok").agg(count(lit(1)).as("f"))
    vocab
      .filter(length(col("tok")) >= 2)
      .select(col("tok"), col("f"), explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
      .select(expr("substring(tok, i, 1)").as("left_sym"),
        expr("substring(tok, i + 1, 1)").as("right_sym"), col("f"))
      .groupBy("left_sym", "right_sym")
      .agg(sum("f").as("pair_count"))
      .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
      .limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))))
      .select(col("rnk"), col("left_sym"), col("right_sym"), col("pair_count"))
  }

  val bpe1: Q = (s, d) =>
    bpePairStatsOf(Tables.documents(s, d), BpeTopPairs).orderBy("rnk")
  val bpe1Sql: String =
    s"""WITH toks AS (
       |  SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
       |vocab AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS f FROM toks
       |  WHERE len(tok) > 0 GROUP BY tok),
       |pairs AS (
       |  SELECT substr(tok, CAST(i AS INTEGER), 1) AS left_sym,
       |         substr(tok, CAST(i AS INTEGER) + 1, 1) AS right_sym, f
       |  FROM vocab CROSS JOIN range(1, 64) t(i)
       |  WHERE len(tok) >= 2 AND i <= len(tok) - 1),
       |agg AS (
       |  SELECT left_sym, right_sym, CAST(sum(f) AS BIGINT) AS pair_count
       |  FROM pairs GROUP BY left_sym, right_sym),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY pair_count DESC, left_sym, right_sym) AS rnk
       |  FROM agg)
       |SELECT CAST(rnk AS INTEGER) AS rnk, left_sym, right_sym, pair_count
       |FROM ranked WHERE rnk <= $BpeTopPairs ORDER BY rnk""".stripMargin

  // ---- BPE2: iterative merge induction (driver loop) ----

  private val BpeMerges = 4

  /** BPE2: k = 4 merge iterations of the trainer loop. Each iteration is
    * (a) one vocab-sized aggregate for adjacent-pair counts, (b) a ONE-row
    * bounded collect of the argmax pair (count DESC, then lexicographic),
    * (c) one vocab-sized projection applying the merge. Words are held as
    * space-separated symbol strings (" l o w "); the merge is a
    * single-separator `replace(" l r ", " lr ")` applied to fixpoint
    * (8 passes — each pass at least halves the unmerged occurrences of a
    * repeated-symbol run, so 8 covers words up to 2⁸ symbols; fixture
    * tokens are ≤ ~16 chars).
    *
    * NOTE on repeated-run semantics: for words like "aaaa" the fixpoint
    * replace merges greedily but may pick different positions than the
    * textbook left-to-right scan ("[aa,a,aa]" vs "[aa,aa,a]" on a 5-run).
    * The rule here is deterministic and documented; `SelectionSpec` pins
    * the classic no-run example where both rules coincide. The fixed-k
    * driver loop unrolls into a DuckDB oracle ([[bpeMergeCtes]]), so the
    * gate hash-checks the learned merges since round 11.
    *
    * Emits one row per merge: (iter, left_sym, right_sym, pair_count). */
  private[graft] def bpeMergesOf(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab0 = toks(docs).groupBy("tok").agg(count(lit(1)).as("f"))
      .select(concat(lit(" "), array_join(split(col("tok"), ""), " "), lit(" ")).as("repr"), col("f"))
    // The vocab is small relative to the corpus but need not fit on the
    // driver — it stays distributed; only the 1-row argmax is collected.
    // Superseded per-merge checkpoints free their blocks immediately
    // (Pinned — Spark never GC-frees them; the loop used to pin one
    // block set per merge for the session's lifetime), and the LAST one
    // frees too: the returned frame is built from the driver-collected
    // merge list, not from the vocab.
    var (vocab, freeVocab) = Pinned.checkpoint(vocab0, eager = false)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (it <- 1 to k) {
      val pairs = vocab
        .select(split(trim(col("repr")), " ").as("syms"), col("f"))
        .filter(size(col("syms")) >= 2)
        .select(col("syms"), col("f"), explode(sequence(lit(0), size(col("syms")) - 2)).as("i"))
        .select(element_at(col("syms"), col("i") + 1).as("l"),
          element_at(col("syms"), col("i") + 2).as("r"), col("f"))
        .groupBy("l", "r").agg(sum("f").as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1)
      val top = pairs.as[(String, String, Long)].collect()
      if (top.nonEmpty) {
        val (l, r, pc) = top.head
        merges += ((it, l, r, pc))
        val pat = s" $l $r "
        val rep = s" $l$r "
        // literal (non-regex) replace, applied to fixpoint in 8 passes
        val mergedCol = (1 to 8).foldLeft(col("repr")) { (c, _) =>
          org.apache.spark.sql.functions.replace(c, lit(pat), lit(rep))
        }
        // eager: materialize the new vocab BEFORE freeing the previous
        // round's blocks it was computed from
        val (nv, freeNv) = Pinned.checkpoint(
          vocab.select(mergedCol.as("repr"), col("f")))
        freeVocab()
        vocab = nv
        freeVocab = freeNv
      }
    }
    freeVocab()
    merges.result().toDF("iter", "left_sym", "right_sym", "pair_count")
      .select(col("iter").cast("int").as("iter"), col("left_sym"), col("right_sym"),
        col("pair_count").cast("long").as("pair_count"))
  }

  val bpe2: Q = (s, d) =>
    bpeMergesOf(Tables.documents(s, d), BpeMerges).orderBy("iter")

  /** DuckDB CTE chain replaying the k-iteration BPE trainer loop —
    * the driver loop is FIXED-k, so it unrolls exactly: per iteration,
    * pair counts over the current vocab (`p$n`), the 1-row argmax
    * (`m$n`, count DESC then lexicographic — the trainer's tiebreak),
    * and the merge applied via the same 8-pass fixpoint `replace`
    * (string replace is all-occurrence left-to-right in BOTH engines,
    * so even the repeated-run quirk mirrors). Shared by bpe2Sql (emit
    * the merges) and tok2Sql (apply them to encode). Ends with CTEs
    * `toksb`, `v0..v$k`, `m1..m$k`. */
  private def bpeMergeCtes(k: Int): String = {
    def rep8(base: String): String = (1 to 8).foldLeft(base)((c, _) =>
      s"replace($c, ' ' || m.l || ' ' || m.r || ' ', ' ' || m.l || m.r || ' ')")
    val head =
      """toksb AS (
        |  SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
        |v0 AS MATERIALIZED (
        |  SELECT ' ' || array_to_string(list_transform(generate_series(1, len(tok)),
        |           i -> substr(tok, CAST(i AS INTEGER), 1)), ' ') || ' ' AS repr,
        |         CAST(count(*) AS BIGINT) AS f
        |  FROM toksb WHERE len(tok) > 0 GROUP BY tok)""".stripMargin
    val iters = (1 to k).map { n =>
      s"""p$n AS (
         |  SELECT ss.s[CAST(t.i AS INTEGER)] AS l, ss.s[CAST(t.i AS INTEGER) + 1] AS r,
         |         CAST(sum(ss.f) AS BIGINT) AS pc
         |  FROM (SELECT str_split(trim(repr), ' ') AS s, f FROM v${n - 1}) ss
         |  CROSS JOIN range(1, 64) t(i)
         |  WHERE t.i <= len(ss.s) - 1
         |  GROUP BY l, r),
         |m$n AS MATERIALIZED (SELECT l, r, pc FROM p$n ORDER BY pc DESC, l, r LIMIT 1),
         |v$n AS MATERIALIZED (
         |  SELECT ${rep8("v.repr")} AS repr, v.f
         |  FROM v${n - 1} v CROSS JOIN m$n m)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  val bpe2Sql: String =
    s"""WITH ${bpeMergeCtes(BpeMerges)}
       |SELECT * FROM (
       |  SELECT CAST(1 AS INTEGER) AS iter, l AS left_sym, r AS right_sym, pc AS pair_count FROM m1
       |  UNION ALL SELECT CAST(2 AS INTEGER), l, r, pc FROM m2
       |  UNION ALL SELECT CAST(3 AS INTEGER), l, r, pc FROM m3
       |  UNION ALL SELECT CAST(4 AS INTEGER), l, r, pc FROM m4)
       |ORDER BY iter""".stripMargin

  // ---- T19: bigram-LM negative log-likelihood ----

  /** T19: per-document mean bigram NLL under an add-1-smoothed corpus
    * bigram LM — the next-order refinement of t15's unigram NLL (the
    * KenLM-style perplexity filter shape): NLL(d) = mean over bigram
    * instances (w1,w2) of −ln P(w2|w1), P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V).
    * Each ln is rounded to e6 micro-nats before the per-doc integer mean.
    *
    * Scale: bigram instances come from the token array (one `sequence`
    * explode per doc, map-side); counts are two hash aggregates; scoring
    * is one equi-join on (w1, w2). The model tables are vocab-sized, the
    * corpus is scanned once. Emits (doc_id, n_bigrams, nll_e6). */
  private[graft] def bigramNllOf(docs: DataFrame): DataFrame = {
    val bi = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"), explode(sequence(lit(0), greatest(size(col("ws")) - 2, lit(0)))).as("i"))
      .filter(col("i") <= size(col("ws")) - 2)
      .select(col("doc_id"),
        element_at(col("ws"), col("i") + 1).as("w1"),
        element_at(col("ws"), col("i") + 2).as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
    val uni = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val big = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val vSize = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .agg(countDistinct("tok").as("v_size"))
    val scored = big.join(uni, Seq("w1")).crossJoin(broadcast(vSize))
      .select(col("w1"), col("w2"),
        expr("CAST(round(ln(CAST(c1 + v_size AS DOUBLE) / CAST(c12 + 1 AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("nll_e6_tok"))
    bi.join(scored, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), expr("sum(nll_e6_tok) div count(1)").as("nll_e6"))
      .select("doc_id", "n_bigrams", "nll_e6")
  }

  val t19: Q = (s, d) =>
    bigramNllOf(Tables.documents(s, d)).orderBy("doc_id")
  val t19Sql: String =
    """WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
      |pr AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |           i -> {'w1': ws[CAST(i AS INTEGER)], 'w2': ws[CAST(i AS INTEGER) + 1]})) AS p
      |  FROM w WHERE len(ws) >= 2),
      |bi AS (
      |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM pr
      |  WHERE len(p.w1) > 0 AND len(p.w2) > 0),
      |uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bi GROUP BY w1),
      |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY w1, w2),
      |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v_size FROM (
      |        SELECT unnest(str_split(text, ' ')) AS tok FROM documents) WHERE len(tok) > 0),
      |scored AS (
      |  SELECT w1, w2,
      |         CAST(round(ln(CAST(c1 + v_size AS DOUBLE) / CAST(c12 + 1 AS DOUBLE)) * 1000000) AS BIGINT)
      |           AS nll_e6_tok
      |  FROM big JOIN uni USING (w1) CROSS JOIN v)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |       CAST(sum(nll_e6_tok) AS BIGINT) // CAST(count(*) AS BIGINT) AS nll_e6
      |FROM bi JOIN scored USING (w1, w2)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- T22: interpolated Kneser–Ney bigram LM perplexity filter ----

  /** keep ⟺ mean KN NLL below this (e6 micro-nats) — the CCNet-style
    * "head/tail" cut point; a fixture-median-ish constant so the flag is
    * non-degenerate at every SF. */
  private[graft] val KnKeepNllE6 = 3386000L

  /** T22: the production perplexity filter — interpolated Kneser–Ney
    * bigram LM (Kneser/Ney ICASSP 1995; the smoothing CCNet's KenLM
    * filter uses, Wenzek et al. 2020) scored over the corpus, vs t19's
    * add-1 baseline. With discount d = 3/4 the probability is an EXACT
    * rational: p(w2|w1) = [max(4·c12−3, 0)·Nb + 3·T1·C2] / (4·c1·Nb),
    * where T1 = |{w: c(w1,w) > 0}| (continuation fan-out of w1), C2 =
    * |{w: c(w,w2) > 0}| (left-context fan-in of w2 — the "novel
    * continuation" count that makes KN rank 'Francisco' low despite
    * high frequency), Nb = distinct bigram types. Both engines compute
    * numerator and denominator in exact int64 and take ONE ln of ONE
    * double division of identical operands (the t15/t19 convention), so
    * nll_e6 is engine-exact. Scale: all four model tables are
    * vocab-sized aggregates off one bigram scan (map-side combined);
    * scoring is one (w1,w2) equi-join against the instance stream; the
    * keep flag is an integer comparison. */
  private[graft] def knBigramNllOf(docs: DataFrame): DataFrame = {
    val bi = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"), explode(sequence(lit(0), greatest(size(col("ws")) - 2, lit(0)))).as("i"))
      .filter(col("i") <= size(col("ws")) - 2)
      .select(col("doc_id"),
        element_at(col("ws"), col("i") + 1).as("w1"),
        element_at(col("ws"), col("i") + 2).as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
    val uni = bi.groupBy("w1")
      .agg(count(lit(1)).as("c1"), countDistinct("w2").as("t1"))
    val big = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val cont = bi.groupBy("w2").agg(countDistinct("w1").as("c2"))
    val nb = big.agg(count(lit(1)).as("nb"))
    val scored = big.join(uni, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"),
        // DECIMAL(38,0) intermediates: c1·nb and c12·nb multiply two
        // corpus-scale counts (bigram tokens × bigram types) and wrap
        // int64 well below 100 TB in non-ANSI Spark (DuckDB would error);
        // the exact-rational terms stay exact in decimal and only the
        // final single division goes through double — identical operands
        // in both engines, so nll_e6 stays engine-exact at every scale.
        expr("CAST(round(ln(CAST(4 * CAST(c1 AS DECIMAL(38,0)) * nb AS DOUBLE) / " +
          "CAST(CAST(greatest(4 * c12 - 3, 0L) AS DECIMAL(38,0)) * nb " +
          "+ 3 * CAST(t1 AS DECIMAL(38,0)) * c2 AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("nll_e6_tok"))
    bi.join(scored, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(nll_e6_tok) div count(1)").as("nll_e6"))
      .withColumn("keep", when(col("nll_e6") < KnKeepNllE6, 1).otherwise(0))
      .select("doc_id", "n_bigrams", "nll_e6", "keep")
  }

  val t22: Q = (s, d) =>
    knBigramNllOf(Tables.documents(s, d)).orderBy("doc_id")
  val t22Sql: String =
    s"""WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
       |pr AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
       |           i -> {'w1': ws[CAST(i AS INTEGER)], 'w2': ws[CAST(i AS INTEGER) + 1]})) AS p
       |  FROM w WHERE len(ws) >= 2),
       |bi AS MATERIALIZED (
       |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM pr
       |  WHERE len(p.w1) > 0 AND len(p.w2) > 0),
       |uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1,
       |               CAST(count(DISTINCT w2) AS BIGINT) AS t1 FROM bi GROUP BY w1),
       |big AS MATERIALIZED (
       |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY w1, w2),
       |cont AS (SELECT w2, CAST(count(DISTINCT w1) AS BIGINT) AS c2 FROM bi GROUP BY w2),
       |nbt AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM big),
       |scored AS (
       |  SELECT w1, w2,
       |         CAST(round(ln(CAST(4 * CAST(c1 AS HUGEINT) * nb AS DOUBLE) /
       |           CAST(CAST(greatest(4 * c12 - 3, 0) AS HUGEINT) * nb
       |             + 3 * CAST(t1 AS HUGEINT) * c2 AS DOUBLE)) * 1000000) AS BIGINT)
       |           AS nll_e6_tok
       |  FROM big JOIN uni USING (w1) JOIN cont USING (w2) CROSS JOIN nbt)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |       CAST(sum(nll_e6_tok) AS BIGINT) // CAST(count(*) AS BIGINT) AS nll_e6,
       |       CASE WHEN CAST(sum(nll_e6_tok) AS BIGINT) // CAST(count(*) AS BIGINT) < $KnKeepNllE6
       |            THEN 1 ELSE 0 END AS keep
       |FROM bi JOIN scored USING (w1, w2)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- FIM1: fill-in-the-middle transformation ----

  // ---- FIM2: T5 span corruption ----

  /** FIM2: T5-style span corruption (Raffel et al. JMLR 2020) — the
    * third canonical pretraining objective transform next to pack1
    * (causal) and fim1 (infilling). Spans are chosen BLOCK-
    * DETERMINISTICALLY: tokens partition into fixed blocks of 20, each
    * block masks one 3-token span at offset md5(doc_id, block) % 18 —
    * 15% corruption with T5's mean span 3, non-overlapping BY
    * CONSTRUCTION (greedy overlap resolution is sequential and would
    * not mirror in SQL; fixed blocks make the per-token mask rule a
    * pure function both engines evaluate identically). Emits the
    * sentinel-rewritten input (`<X_b>` replaces each span) and the
    * target sequence (each sentinel followed by its span tokens), plus
    * span/token accounting. Entirely array HOFs riding the scan — the
    * t18/t21 zero-exchange shape. */
  private[graft] def spanCorruptionOf(docs: DataFrame): DataFrame = docs
    .withColumn("toks", expr("filter(split(text, ' '), x -> length(x) > 0)"))
    .withColumn("nb", expr("CAST((size(toks) + 19) div 20 AS INT)"))
    .withColumn("offs", expr(
      "CASE WHEN nb > 0 THEN transform(sequence(0, nb - 1), b -> " +
        "CAST(conv(substr(md5(concat('fim2:', CAST(doc_id AS STRING), ':', CAST(b AS STRING))), 1, 4), 16, 10) AS BIGINT) % 18) " +
        "ELSE CAST(array() AS ARRAY<BIGINT>) END"))
    .withColumn("input_text", expr(
      """array_join(filter(transform(sequence(1, size(toks)), i ->
        |  CASE WHEN size(toks) = 0 THEN NULL
        |       WHEN (i - 1) % 20 = element_at(offs, CAST((i - 1) div 20 + 1 AS INT))
        |         THEN concat('<X_', CAST((i - 1) div 20 AS STRING), '>')
        |       WHEN (i - 1) % 20 > element_at(offs, CAST((i - 1) div 20 + 1 AS INT))
        |         AND (i - 1) % 20 < element_at(offs, CAST((i - 1) div 20 + 1 AS INT)) + 3
        |         THEN CAST(NULL AS STRING)
        |       ELSE element_at(toks, i) END),
        |  x -> x IS NOT NULL), ' ')""".stripMargin))
    .withColumn("target_text", expr(
      """array_join(filter(transform(sequence(1, size(toks)), i ->
        |  CASE WHEN (i - 1) % 20 = element_at(offs, CAST((i - 1) div 20 + 1 AS INT))
        |         THEN concat('<X_', CAST((i - 1) div 20 AS STRING), '> ', element_at(toks, i))
        |       WHEN (i - 1) % 20 > element_at(offs, CAST((i - 1) div 20 + 1 AS INT))
        |         AND (i - 1) % 20 < element_at(offs, CAST((i - 1) div 20 + 1 AS INT)) + 3
        |         THEN element_at(toks, i)
        |       ELSE CAST(NULL AS STRING) END),
        |  x -> x IS NOT NULL), ' ')""".stripMargin))
    .withColumn("n_masked", expr(
      """CAST(size(filter(sequence(1, size(toks)), i ->
        |  (i - 1) % 20 >= element_at(offs, CAST((i - 1) div 20 + 1 AS INT))
        |  AND (i - 1) % 20 < element_at(offs, CAST((i - 1) div 20 + 1 AS INT)) + 3)) AS BIGINT)""".stripMargin))
    .withColumn("n_spans", expr(
      "CAST(size(filter(sequence(0, nb - 1), b -> " +
        "b * 20 + element_at(offs, b + 1) < size(toks))) AS BIGINT)"))
    .select(col("doc_id"), expr("CAST(size(toks) AS BIGINT)").as("n_toks"),
      col("n_spans"), col("n_masked"), col("input_text"), col("target_text"))

  val fim2: Q = (s, d) =>
    spanCorruptionOf(Tables.documents(s, d)).orderBy("doc_id")
  val fim2Sql: String =
    """WITH base AS (
      |  SELECT doc_id, list_filter(str_split(text, ' '), x -> len(x) > 0) AS toks
      |  FROM documents),
      |wof AS (
      |  SELECT doc_id, toks, CAST((len(toks) + 19) // 20 AS INTEGER) AS nb,
      |         CASE WHEN len(toks) > 0
      |              THEN list_transform(range(0, CAST((len(toks) + 19) // 20 AS INTEGER)),
      |                b -> ('0x' || substr(md5('fim2:' || doc_id::VARCHAR || ':' || b::VARCHAR), 1, 4))::BIGINT % 18)
      |              ELSE [] END AS offs
      |  FROM base)
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
      |       CAST(len(list_filter(range(0, nb), b ->
      |         b * 20 + offs[b + 1] < len(toks))) AS BIGINT) AS n_spans,
      |       CAST(len(list_filter(range(1, len(toks) + 1), i ->
      |         (i - 1) % 20 >= offs[CAST((i - 1) // 20 AS INTEGER) + 1]
      |         AND (i - 1) % 20 < offs[CAST((i - 1) // 20 AS INTEGER) + 1] + 3)) AS BIGINT) AS n_masked,
      |       coalesce(array_to_string(list_filter(list_transform(range(1, len(toks) + 1), i ->
      |         CASE WHEN (i - 1) % 20 = offs[CAST((i - 1) // 20 AS INTEGER) + 1]
      |                THEN '<X_' || CAST((i - 1) // 20 AS VARCHAR) || '>'
      |              WHEN (i - 1) % 20 > offs[CAST((i - 1) // 20 AS INTEGER) + 1]
      |                AND (i - 1) % 20 < offs[CAST((i - 1) // 20 AS INTEGER) + 1] + 3
      |                THEN NULL
      |              ELSE toks[CAST(i AS INTEGER)] END),
      |         x -> x IS NOT NULL), ' '), '') AS input_text,
      |       coalesce(array_to_string(list_filter(list_transform(range(1, len(toks) + 1), i ->
      |         CASE WHEN (i - 1) % 20 = offs[CAST((i - 1) // 20 AS INTEGER) + 1]
      |                THEN '<X_' || CAST((i - 1) // 20 AS VARCHAR) || '> ' || toks[CAST(i AS INTEGER)]
      |              WHEN (i - 1) % 20 > offs[CAST((i - 1) // 20 AS INTEGER) + 1]
      |                AND (i - 1) % 20 < offs[CAST((i - 1) // 20 AS INTEGER) + 1] + 3
      |                THEN toks[CAST(i AS INTEGER)]
      |              ELSE NULL END),
      |         x -> x IS NOT NULL), ' '), '') AS target_text
      |FROM wof ORDER BY doc_id""".stripMargin

  /** FIM1: the fill-in-the-middle pretraining transform (Bavarian et al.
    * 2022, arXiv:2207.14255): split each document's character range at
    * two deterministic pseudo-random points (salted-md5 draws — the
    * engine's portable RNG convention, mix1/shuf1) and emit the PSM
    * reordering `prefix ⧸ suffix ⧸ middle` with sentinel markers. Pure
    * per-row projection (map-side, no shuffle at any scale). Emits
    * (doc_id, n, s1, s2, fim_text). */
  private[graft] def fimSplitOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
    .withColumn("h1", expr("CAST(conv(substring(md5(concat('fim1:', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT)"))
    .withColumn("h2", expr("CAST(conv(substring(md5(concat('fim2:', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT)"))
    .withColumn("a", expr("h1 % (n + 1)"))
    .withColumn("b", expr("h2 % (n + 1)"))
    .withColumn("s1", least(col("a"), col("b")))
    .withColumn("s2", greatest(col("a"), col("b")))
    .select(col("doc_id"), col("n"), col("s1"), col("s2"),
      concat(lit("<PRE>"), expr("substring(text, 1, CAST(s1 AS INT))"),
        lit("<SUF>"), expr("substring(text, CAST(s2 AS INT) + 1, CAST(n - s2 AS INT))"),
        lit("<MID>"), expr("substring(text, CAST(s1 AS INT) + 1, CAST(s2 - s1 AS INT))"))
        .as("fim_text"))

  val fim1: Q = (s, d) =>
    fimSplitOf(Tables.documents(s, d)).orderBy("doc_id")
  val fim1Sql: String =
    """WITH b AS (
      |  SELECT doc_id, text, CAST(len(text) AS BIGINT) AS n,
      |         ('0x' || substr(md5('fim1:' || doc_id::VARCHAR), 1, 4))::BIGINT AS h1,
      |         ('0x' || substr(md5('fim2:' || doc_id::VARCHAR), 1, 4))::BIGINT AS h2
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, text, n,
      |         least(h1 % (n + 1), h2 % (n + 1)) AS s1,
      |         greatest(h1 % (n + 1), h2 % (n + 1)) AS s2
      |  FROM b)
      |SELECT doc_id, n, s1, s2,
      |       '<PRE>' || substr(text, 1, CAST(s1 AS INTEGER)) ||
      |       '<SUF>' || substr(text, CAST(s2 AS INTEGER) + 1, CAST(n - s2 AS INTEGER)) ||
      |       '<MID>' || substr(text, CAST(s1 AS INTEGER) + 1, CAST(s2 - s1 AS INTEGER)) AS fim_text
      |FROM s ORDER BY doc_id""".stripMargin

  // ---- REP1: adjacent-duplicate-word removal ----

  /** REP1: collapse runs of consecutive repeated tokens (the cheap
    * intra-document repetition scrub that complements t10's repetition
    * STATS — this one produces the cleaned text). Array lambda with the
    * 1-offset index trick (`filter`'s 0-based index i addresses the
    * PREVIOUS element in 1-based `element_at`), so the whole op is one
    * codegen'd projection — no explode, no shuffle. Emits (doc_id,
    * n_tokens, n_kept, removed_bp, clean_text). */
  private[graft] def adjacentDedupOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), split(col("text"), " ").as("ws"))
    // try_element_at: OR is not guaranteed to short-circuit, and ANSI
    // element_at(ws, 0) would throw on the first element's probe
    .withColumn("kept", expr("filter(ws, (x, i) -> i = 0 OR x != try_element_at(ws, i))"))
    .select(col("doc_id"),
      size(col("ws")).cast("long").as("n_tokens"),
      size(col("kept")).cast("long").as("n_kept"),
      expr("(CAST(size(ws) - size(kept) AS BIGINT) * 10000) div CAST(size(ws) AS BIGINT)").as("removed_bp"),
      array_join(col("kept"), " ").as("clean_text"))

  val rep1: Q = (s, d) =>
    adjacentDedupOf(Tables.documents(s, d)).orderBy("doc_id")
  val rep1Sql: String =
    """WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
      |k AS (
      |  SELECT doc_id, ws,
      |         list_filter(ws, (x, i) -> i = 1 OR x != ws[i - 1]) AS kept
      |  FROM w)
      |SELECT doc_id,
      |       CAST(len(ws) AS BIGINT) AS n_tokens,
      |       CAST(len(kept) AS BIGINT) AS n_kept,
      |       CAST((len(ws) - len(kept)) * 10000 // len(ws) AS BIGINT) AS removed_bp,
      |       array_to_string(kept, ' ') AS clean_text
      |FROM k ORDER BY doc_id""".stripMargin

  // ---- TOK2: BPE encoding with learned merges ----

  /** TOK2: apply a learned merge list (bpe2's output order) to the
    * corpus and account the tokenization: per doc, word count, symbol
    * count before (characters) and after encoding, and the compression
    * in basis points. The merges are applied on the DISTINCT-token
    * vocabulary (each merge is one fixpoint `replace` projection over
    * vocab rows — the same trainer decomposition as bpe2), then the
    * per-token symbol counts join back to the token instances and sum
    * per doc: the corpus is scanned once and never rewritten.
    *
    * Oracled since round 11: [[tok2Sql]] replays the trainer CTEs and
    * the encode chain in DuckDB; `SelectionSpec` additionally pins the
    * classic-corpus encoding exactly. Emits
    * (doc_id, n_words, n_sym_before, n_sym_after, compression_bp). */
  private[graft] def bpeEncodeStatsOf(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val t = toks(docs)
    val vocab0 = t.groupBy("tok").agg(count(lit(1)).as("f"))
      .select(col("tok"), concat(lit(" "), array_join(split(col("tok"), ""), " "), lit(" ")).as("repr"))
    val encoded = merges.foldLeft(vocab0) { case (v, (l, r)) =>
      val pat = s" $l $r "
      val rep = s" $l$r "
      val mergedCol = (1 to 8).foldLeft(col("repr")) { (c, _) =>
        org.apache.spark.sql.functions.replace(c, lit(pat), lit(rep))
      }
      v.select(col("tok"), mergedCol.as("repr"))
    }
    val symCounts = encoded.select(col("tok"),
      length(col("tok")).cast("long").as("n_before"),
      size(split(trim(col("repr")), " ")).cast("long").as("n_after"))
    t.join(symCounts, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_before").as("n_sym_before"),
        sum("n_after").as("n_sym_after"))
      .withColumn("compression_bp", expr("n_sym_after * 10000 div n_sym_before"))
  }

  /** Registry variant: self-contained — learns 4 merges from the corpus
    * (bpe2), then encodes the same corpus with them. */
  val tok2: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val spark = s
    import spark.implicits._
    val merges = bpeMergesOf(docs, BpeMerges)
      .orderBy("iter").select("left_sym", "right_sym")
      .as[(String, String)].collect().toSeq
    bpeEncodeStatsOf(docs, merges).orderBy("doc_id")
  }

  /** Encode-side CTE chain shared by tok2Sql and tok4Sql: replays the
    * learned merges m1..m$k over the distinct-token vocabulary
    * (`e0..e$k` — the encode side keeps the `tok` key so symbol counts
    * join back to instances) and ends in
    * `sc(tok, n_before, n_after)`. A constant builder, not string
    * surgery (the cl2Sql lesson). */
  private def bpeEncodeCtes(k: Int): String = {
    def rep8(base: String): String = (1 to 8).foldLeft(base)((c, _) =>
      s"replace($c, ' ' || m.l || ' ' || m.r || ' ', ' ' || m.l || m.r || ' ')")
    val enc = (1 to k).map { n =>
      s"""e$n AS MATERIALIZED (
         |  SELECT e.tok, ${rep8("e.repr")} AS repr
         |  FROM e${n - 1} e CROSS JOIN m$n m)""".stripMargin
    }.mkString(",\n")
    s"""e0 AS (
       |  SELECT tok, ' ' || array_to_string(list_transform(generate_series(1, len(tok)),
       |           i -> substr(tok, CAST(i AS INTEGER), 1)), ' ') || ' ' AS repr
       |  FROM (SELECT DISTINCT tok FROM toksb WHERE len(tok) > 0)),
       |$enc,
       |sc AS (
       |  SELECT tok, CAST(len(tok) AS BIGINT) AS n_before,
       |         CAST(len(str_split(trim(repr), ' ')) AS BIGINT) AS n_after
       |  FROM e$k)""".stripMargin
  }

  /** tok2's oracle: replay the trainer ([[bpeMergeCtes]]) to get m1..m4,
    * encode via [[bpeEncodeCtes]], then the per-doc accounting. */
  val tok2Sql: String =
    s"""WITH ${bpeMergeCtes(BpeMerges)},
       |${bpeEncodeCtes(BpeMerges)},
       |tk AS (
       |  SELECT doc_id, tok FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
       |  WHERE len(tok) > 0)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(n_before) AS BIGINT) AS n_sym_before,
       |       CAST(sum(n_after) AS BIGINT) AS n_sym_after,
       |       CAST(sum(n_after) * 10000 // sum(n_before) AS BIGINT) AS compression_bp
       |FROM tk JOIN sc USING (tok)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- TOK4: tokenizer fertility by language ----

  /** TOK4: the multilingual tokenizer-equity audit — fertility (subword
    * tokens per word) and continuation-token share PER LANGUAGE under
    * the corpus-learned BPE merges. A tokenizer trained on a skewed mix
    * encodes under-represented languages into more pieces (fertility
    * 2-3× the dominant language's), which inflates their effective
    * sequence length and training cost; this table is the standard
    * diagnostic (cf. the tokenizer-parity analyses around NLLB/BLOOM).
    * fertility_e3 = 1000·n_tokens div n_words exactly;
    * cont_bp = 10000·(n_tokens − n_words) div n_tokens (share of
    * emitted tokens that are word-continuations, i.e. non-initial
    * pieces — each word contributes exactly one initial piece).
    *
    * Scale: the trainer and the per-token symbol counts are tok2's
    * (vocab-sized frames, one corpus scan); this aggregate folds the
    * SAME joined instances per (lang) instead of per (doc) — language
    * count is bounded, so the final frame is tiny. Library entry point:
    * [[graft.api.GraftApi.bpeFertilityByLang]]. */
  private[graft] def bpeFertilityByLangOf(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val t = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab0 = t.select(col("tok")).distinct()
      .select(col("tok"), concat(lit(" "), array_join(split(col("tok"), ""), " "), lit(" ")).as("repr"))
    val encoded = merges.foldLeft(vocab0) { case (v, (l, r)) =>
      val mergedCol = (1 to 8).foldLeft(col("repr")) { (c, _) =>
        org.apache.spark.sql.functions.replace(c, lit(s" $l $r "), lit(s" $l$r "))
      }
      v.select(col("tok"), mergedCol.as("repr"))
    }
    val symCounts = encoded.select(col("tok"),
      length(col("tok")).cast("long").as("n_before"),
      size(split(trim(col("repr")), " ")).cast("long").as("n_after"))
    t.join(symCounts, Seq("tok"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("n_after").as("n_tokens"),
        sum("n_before").as("n_chars"))
      .withColumn("fertility_e3", expr("1000 * n_tokens div n_words"))
      .withColumn("cont_bp", expr("10000 * (n_tokens - n_words) div n_tokens"))
      .orderBy("lang")
  }

  /** Registry variant: learns the 4 corpus merges (bpe2's trainer), then
    * audits fertility per language. */
  val tok4: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val spark = s
    import spark.implicits._
    val merges = bpeMergesOf(docs, BpeMerges)
      .orderBy("iter").select("left_sym", "right_sym")
      .as[(String, String)].collect().toSeq
    bpeFertilityByLangOf(docs, merges)
  }

  val tok4Sql: String =
    s"""WITH ${bpeMergeCtes(BpeMerges)},
       |${bpeEncodeCtes(BpeMerges)},
       |tkl AS (
       |  SELECT lang, tok FROM (
       |    SELECT lang, unnest(str_split(text, ' ')) AS tok FROM documents)
       |  WHERE len(tok) > 0)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(n_after) AS BIGINT) AS n_tokens,
       |       CAST(sum(n_before) AS BIGINT) AS n_chars,
       |       1000 * CAST(sum(n_after) AS BIGINT) // CAST(count(*) AS BIGINT) AS fertility_e3,
       |       10000 * (CAST(sum(n_after) AS BIGINT) - CAST(count(*) AS BIGINT))
       |         // CAST(sum(n_after) AS BIGINT) AS cont_bp
       |FROM tkl JOIN sc USING (tok)
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- BATCH1: length-bucket padding-waste accounting ----

  private val BucketWidth = 64L
  private val MicroBatch = 8L

  /** BATCH1: the padding-efficiency audit for fixed-shape training
    * batches — bucket documents by token length into width-64 buckets
    * (every doc in bucket b pads to b·64 tokens) and account, per
    * bucket, the docs, real tokens, padding waste, waste in basis
    * points, and the microbatch count at batch size 8 (+ tail slots).
    * This is the number that decides whether length-bucketed batching
    * is worth it vs pack1/pack2's concat-and-chunk (which trades
    * padding for cross-doc attention).
    *
    * Scale: token count is a map-side `size(split(...))` projection;
    * the rest is ONE hash aggregate on ≤ ~dozens of bucket keys.
    * Emits (bucket, cap_toks, n_docs, sum_toks, sum_waste, waste_bp,
    * n_microbatches, tail_slots). */
  private[graft] def lengthBucketsOf(docs: DataFrame, width: Long, mb: Long): DataFrame = docs
    .select(size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long").as("n_toks"))
    .filter(col("n_toks") > 0)
    .select(expr(s"(n_toks + $width - 1) div $width").as("bucket"), col("n_toks"))
    .groupBy("bucket")
    .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("sum_toks"))
    .select(col("bucket"), (col("bucket") * width).as("cap_toks"), col("n_docs"), col("sum_toks"),
      (col("bucket") * width * col("n_docs") - col("sum_toks")).as("sum_waste"))
    .withColumn("waste_bp", expr("sum_waste * 10000 div (bucket * " + BucketWidth + " * n_docs)"))
    .withColumn("n_microbatches", expr(s"(n_docs + $mb - 1) div $mb"))
    .withColumn("tail_slots", expr(s"(n_docs + $mb - 1) div $mb * $mb - n_docs"))

  val batch1: Q = (s, d) =>
    lengthBucketsOf(Tables.documents(s, d), BucketWidth, MicroBatch).orderBy("bucket")
  val batch1Sql: String =
    s"""WITH n AS (
       |  SELECT CAST(len(list_filter(str_split(text, ' '), w -> len(w) > 0)) AS BIGINT) AS n_toks
       |  FROM documents),
       |b AS (
       |  SELECT (n_toks + $BucketWidth - 1) // $BucketWidth AS bucket, n_toks
       |  FROM n WHERE n_toks > 0),
       |agg AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_toks) AS BIGINT) AS sum_toks
       |  FROM b GROUP BY bucket)
       |SELECT bucket, CAST(bucket * $BucketWidth AS BIGINT) AS cap_toks, n_docs, sum_toks,
       |       CAST(bucket * $BucketWidth * n_docs - sum_toks AS BIGINT) AS sum_waste,
       |       CAST((bucket * $BucketWidth * n_docs - sum_toks) * 10000
       |            // (bucket * $BucketWidth * n_docs) AS BIGINT) AS waste_bp,
       |       CAST((n_docs + $MicroBatch - 1) // $MicroBatch AS BIGINT) AS n_microbatches,
       |       CAST((n_docs + $MicroBatch - 1) // $MicroBatch * $MicroBatch - n_docs AS BIGINT) AS tail_slots
       |FROM agg ORDER BY bucket""".stripMargin

  // ---- SAMP4: weighted sampling without replacement (A-ES top-k) ----

  /** Weighted random sampling without replacement — the Efraimidis–
    * Spirakis A-ES scheme (IPL 2006): each row draws u ∈ (0,1] from a
    * salted md5 (8 hex chars → (h+1)/2³²) and keys on ln(u)/w; the k
    * LARGEST keys are a weighted sample without replacement, P(doc in
    * sample) increasing in w. Weight here is n_chars ("sample
    * proportionally to content volume" — the corpus-mixing primitive
    * when quotas must land on documents, not Bernoulli rates like
    * mix1's). Deterministic, rerun-stable, join-free.
    *
    * Scale: the key is one map-side projection; the global top-k cut is
    * `TakeOrderedAndProject` (per-partition heap of k + driver merge,
    * never a full sort). The rank ordering compares raw doubles built
    * from identical exact-integer operands with the identical op
    * sequence in both engines; key_e9 is rounded ONCE for display —
    * accepted 1-ulp .5-boundary risk, quantified at ~1e-8 per round
    * (mix2 carried the same risk class until its exp moved to the
    * integer Horner form; ln here has no bounded-range fixed-point
    * equivalent, so the documented risk stays). */
  private[graft] def weightedSampleOf(docs: DataFrame, k: Int, salt: String): DataFrame = {
    val keyed = docs
      .withColumn("h", conv(substring(md5(concat(lit(salt), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long"))
      // explicit DOUBLE casts: a bare 4294967296.0 literal is DECIMAL in
      // both engines' parsers, and decimal-division scale rules differ —
      // double-division of exact integers is the IEEE-identical form
      .withColumn("key", expr(
        "ln(CAST(h + 1 AS DOUBLE) / CAST(4294967296 AS DOUBLE)) / CAST(n_chars AS DOUBLE)"))
      .select("doc_id", "source", "n_chars", "key")
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
    keyed
      .withColumn("rk", row_number().over(
        Window.orderBy(col("key").desc, col("doc_id"))))
      .select(col("rk"), col("doc_id"), col("source"), col("n_chars"),
        expr("CAST(round(key * 1000000000) AS BIGINT)").as("key_e9"))
  }

  val samp4: Q = (s, d) =>
    weightedSampleOf(Tables.documents(s, d), k = 20, salt = "samp4:").orderBy("rk")
  val samp4Sql: String =
    """WITH keyed AS (
      |  SELECT doc_id, source, n_chars,
      |         ln(CAST(('0x' || substr(md5('samp4:' || doc_id::VARCHAR), 1, 8))::BIGINT + 1 AS DOUBLE)
      |            / CAST(4294967296 AS DOUBLE)) / CAST(n_chars AS DOUBLE) AS key
      |  FROM documents),
      |topk AS (SELECT * FROM keyed ORDER BY key DESC, doc_id LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INTEGER) AS rk,
      |       doc_id, source, n_chars,
      |       CAST(round(key * 1000000000) AS BIGINT) AS key_e9
      |FROM topk ORDER BY rk""".stripMargin

  // ---- registry ----

  // ---- TOK3: unigram-LM Viterbi segmentation (SentencePiece shape) ----

  /** TOK3: Viterbi min-cost segmentation of the distinct token
    * vocabulary against the fixed unigram piece table — the
    * SentencePiece encode step (Kudo 2018) beside tok2's BPE encode.
    * The whole DP runs inside the native codegen'd
    * [[graft.functions.ViterbiCost]] expression (`graft_viterbi`);
    * per word it emits the packed min (cost·2¹⁶ + pieces), split here
    * into exact integers. The oracle replays the forward DP as one
    * chained CTE per character position (12-deep fixed unroll, the
    * bpe2 precedent) over the SAME packed integers and the SAME
    * vocabulary VALUES — an independent implementation of the
    * recurrence, not a mirror of the loop.
    *
    * Scale: one corpus scan → distinct tokens (map-side combined); the
    * DP is per-token O(len·6) with zero joins — at 100 TB the token
    * DOMAIN (not the corpus) bounds everything after the scan, and the
    * expression rides whole-stage codegen inside it. */
  val tok3: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")).between(1, 12))
      .distinct()
      .select(col("word"),
        length(col("word")).cast("long").as("n_chars"),
        expr("graft_viterbi(word)").as("comb"))
      .select(col("word"), col("n_chars"),
        expr("comb div 65536").as("cost_units"),
        expr("comb % 65536").as("n_pieces"))
      .orderBy("word")
  }

  val tok3Sql: String = {
    import graft.functions.ViterbiCost
    val maxLen = 12
    def lk(j: Int, L: Int): String = {
      val sub = s"substr(word, ${j - L + 1}, $L)"
      if (L == 1) s"coalesce((SELECT cost FROM v WHERE piece = $sub), ${ViterbiCost.UnkCost})"
      else s"(SELECT cost FROM v WHERE piece = $sub)"
    }
    val steps = (1 to maxLen).map { j =>
      val cands = (1 to math.min(ViterbiCost.MaxPiece, j)).map { L =>
        s"b${j - L} + ${lk(j, L)} * 65536 + 1"
      }
      val bexpr = if (cands.size == 1) cands.head else s"least(${cands.mkString(", ")})"
      s"s$j AS (SELECT *, CAST($bexpr AS BIGINT) AS b$j FROM s${j - 1})"
    }
    val caseN = (1 to maxLen).map(j => s"WHEN $j THEN b$j").mkString(" ")
    s"""WITH v(piece, cost) AS (VALUES ${ViterbiCost.piecesSql}),
       |words AS (
       |  SELECT DISTINCT word, CAST(len(word) AS BIGINT) AS n
       |  FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
       |  WHERE len(word) BETWEEN 1 AND $maxLen),
       |s0 AS (SELECT word, n, CAST(0 AS BIGINT) AS b0 FROM words),
       |${steps.mkString(",\n")}
       |SELECT word, n AS n_chars,
       |       (CASE n $caseN END) // 65536 AS cost_units,
       |       (CASE n $caseN END) % 65536 AS n_pieces
       |FROM s$maxLen ORDER BY word""".stripMargin
  }

  // ---- TOK5: WordPiece greedy longest-match encoding (BERT shape) ----

  /** TOK5: WordPiece encoding (Wu et al. 2016; the BERT tokenizer) of
    * the distinct token vocabulary — GREEDY longest-match-first with
    * `##` continuation pieces and the all-or-nothing [UNK] rule,
    * BESIDE tok3's global-min-cost Viterbi: the two segmenters that
    * dominate production tokenizers, over the same word domain, so
    * their piece-count/UNK profiles are directly comparable. The scan
    * runs inside the native codegen'd
    * [[graft.functions.WordPieceEncode]] expression
    * (`graft_wordpiece`); per word it emits pieceCount·2 + isUnk,
    * split here into exact integers. The oracle replays the greedy
    * scan as one (take, advance) CTE pair per character position
    * (12-deep fixed unroll, the tok3 precedent) over the SAME
    * vocabulary VALUES.
    *
    * Scale: identical to tok3 — one corpus scan → map-side-combined
    * distinct token domain; per-word O(len·6) with zero joins. */
  val tok5: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")).between(1, 12))
      .distinct()
      .select(col("word"),
        length(col("word")).cast("long").as("n_chars"),
        expr("graft_wordpiece(word)").as("packed"))
      .select(col("word"), col("n_chars"),
        expr("packed div 2").as("n_pieces"),
        expr("packed % 2").as("is_unk"))
      .orderBy("word")
  }

  // ---- SEL2: budgeted corpus selection by global quality rank ----

  /** SEL2: budget-constrained corpus selection — the "spend exactly B
    * training tokens on the best documents" cut that every
    * fixed-compute pretraining run makes (the greedy knapsack under
    * uniform value density; beside sel1's DSIR importance cut and
    * mix4's repetition allocator): rank ALL documents by (quality
    * DESC, doc_id) and keep the maximal prefix whose token mass stays
    * within the budget. The global rank and the running token mass come
    * from ONE [[graft.ops.PrefixSum.prefixRank]] pass (range-partitioned
    * order + exclusive token prefix — never a single-reducer window), so
    * the kept set is exact and deterministic: a document is kept iff
    * its exclusive prefix + its own tokens fit.
    *
    * Output: per source, docs/tokens before and after the cut plus the
    * kept-id checksum (the samp5 convention — proves both engines keep
    * the SAME set, not just equal counts). Exactness: integer tokens,
    * counts and id sums only. Scale: one corpus scan for (quality,
    * tokens), the PrefixSum exchange, one rollup. Library entry point:
    * [[graft.api.GraftApi.budgetSelect]]. */
  private[graft] def budgetSelectOf(docs: DataFrame, budget: Long): DataFrame = {
    val scored = docs.select(col("doc_id"), col("source"), col("q"), col("toks"))
    val ranked = PrefixSum.prefixRank(scored,
      Seq(col("q").desc, col("doc_id").asc), sumCol = Some("toks")).df
      .withColumn("keep", col("g_cum_excl") + col("toks") <= budget)
    ranked.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("toks").as("toks_all"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("toks")).otherwise(0L)).as("toks_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("kept_id_sum"))
      .orderBy("source")
  }

  val sel2: Q = (s, d) => {
    val q = graft.ops.TextAnalysis.qualityScoreOf(Tables.documents(s, d))
      .select(col("doc_id"), col("quality").as("q"))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long").as("toks"))
      .join(q, Seq("doc_id"))
    budgetSelectOf(docs, budget = 100000L)
  }
  val sel2Sql: String =
    s"""WITH ${graft.ops.TextAnalysis.qualityCte},
       |docs AS (
       |  SELECT d.doc_id, d.source,
       |         CAST(len(list_filter(str_split(d.text, ' '), w -> len(w) > 0)) AS BIGINT) AS toks,
       |         q.quality AS q
       |  FROM documents d JOIN qual q ON q.doc_id = d.doc_id),
       |ranked AS (
       |  SELECT doc_id, source, toks,
       |         coalesce(sum(toks) OVER (ORDER BY q DESC, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
       |  FROM docs)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(toks) AS BIGINT) AS toks_all,
       |       CAST(sum(CASE WHEN cum_excl + toks <= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN cum_excl + toks <= 100000 THEN toks ELSE 0 END) AS BIGINT) AS toks_kept,
       |       CAST(sum(CASE WHEN cum_excl + toks <= 100000 THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
       |FROM ranked GROUP BY source ORDER BY source""".stripMargin

  // ---- TOK6: WordPiece vocabulary-utilization audit ----

  /** TOK6: the vocabulary-utilization audit over tok5's greedy WordPiece
    * encoding — per vocabulary piece (plus the `[UNK]` sink), how many
    * distinct corpus words touch it and how many times it fires in
    * total, with dead pieces emitted explicitly (`is_dead`). This is
    * the tokenizer-health report run before shipping or shrinking a
    * vocabulary: dead pieces are reclaimable slots, single-char pieces
    * carrying heavy traffic mean the vocab underfits the corpus, and
    * the `[UNK]` row is the coverage hole tok5's is_unk rate summarizes.
    *
    * The piece sequence comes from the native codegen'd
    * [[graft.functions.WordPieceSegments]] (`graft_wordpiece_pieces`) —
    * the same greedy longest-match scan as `graft_wordpiece`, emitting
    * the pieces joined by `+`; the oracle replays the scan with tok5's
    * fixed per-position CTE unroll, accumulating the same string.
    *
    * Scale: one distinct-word frame (vocab-bounded), one native
    * expression pass, two map-side-combined aggregates bounded by the
    * PIECE domain; the vocabulary itself is a plan literal on both
    * engines. Library entry point:
    * [[graft.api.GraftApi.wordPieceUsage]]. */
  private[graft] def pieceUsageOf(words: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(words.sparkSession)
    val enc = words
      .select(col("word"), expr("graft_wordpiece_pieces(word)").as("pcs"))
    val uses = enc.select(explode(split(col("pcs"), "\\+")).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("n_uses"))
    val perWord = enc
      .select(explode(array_distinct(split(col("pcs"), "\\+"))).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("n_words"))
    val sp = words.sparkSession
    import sp.implicits._
    val vocab = (graft.functions.WordPieceEncode.Vocab :+ "[UNK]").toDF("piece")
    broadcast(vocab)
      .join(perWord, Seq("piece"), "left")
      .join(uses, Seq("piece"), "left")
      .select(col("piece"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_uses"), lit(0L)).as("n_uses"),
        (coalesce(col("n_uses"), lit(0L)) === 0L).as("is_dead"))
      .orderBy("piece")
  }

  val tok6: Q = (s, d) =>
    pieceUsageOf(Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")).between(1, 12))
      .distinct())

  val tok6Sql: String = {
    import graft.functions.WordPieceEncode
    val maxLen = 12
    def takeExpr(p: String): String = {
      val whens = (WordPieceEncode.MaxPiece to 1 by -1).map { l =>
        s"WHEN n - $p + 1 >= $l AND EXISTS (SELECT 1 FROM v WHERE piece = " +
          s"CASE WHEN $p = 1 THEN substr(word, $p, $l) " +
          s"ELSE '##' || substr(word, $p, $l) END) THEN $l"
      }.mkString(" ")
      s"(CASE $whens ELSE -1 END)"
    }
    val steps = (1 to maxLen).map { k =>
      val (p, u, a) = (s"p${k - 1}", s"u${k - 1}", s"a${k - 1}")
      s"""t$k AS (
         |  SELECT word, n, $p, $u, $a,
         |         CASE WHEN $u = 1 OR $p > n THEN 0 ELSE ${takeExpr(p)} END AS tk
         |  FROM s${k - 1}),
         |s$k AS (
         |  SELECT word, n,
         |         CASE WHEN tk > 0 THEN $p + tk ELSE $p END AS p$k,
         |         CASE WHEN tk = -1 THEN 1 ELSE $u END AS u$k,
         |         CASE WHEN tk > 0 THEN
         |           (CASE WHEN $a = '' THEN '' ELSE $a || '+' END) ||
         |           (CASE WHEN $p = 1 THEN substr(word, $p, tk)
         |                 ELSE '##' || substr(word, $p, tk) END)
         |         ELSE $a END AS a$k
         |  FROM t$k)""".stripMargin
    }
    s"""WITH v(piece) AS (VALUES ${WordPieceEncode.vocabSql}),
       |words AS (
       |  SELECT DISTINCT word, CAST(len(word) AS BIGINT) AS n
       |  FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
       |  WHERE len(word) BETWEEN 1 AND $maxLen),
       |s0 AS (SELECT word, n, 1 AS p0, 0 AS u0, '' AS a0 FROM words),
       |${steps.mkString(",\n")},
       |pieces AS (
       |  SELECT word, CASE WHEN u$maxLen = 1 THEN '[UNK]' ELSE a$maxLen END AS pcs
       |  FROM s$maxLen),
       |uses AS (
       |  SELECT piece, CAST(count(*) AS BIGINT) AS n_uses FROM (
       |    SELECT unnest(str_split(pcs, '+')) AS piece FROM pieces)
       |  GROUP BY piece),
       |pw AS (
       |  SELECT piece, CAST(count(*) AS BIGINT) AS n_words FROM (
       |    SELECT word, unnest(list_distinct(str_split(pcs, '+'))) AS piece FROM pieces)
       |  GROUP BY piece),
       |vv AS (SELECT piece FROM v UNION ALL SELECT '[UNK]')
       |SELECT vv.piece, coalesce(pw.n_words, 0) AS n_words,
       |       coalesce(uses.n_uses, 0) AS n_uses,
       |       coalesce(uses.n_uses, 0) = 0 AS is_dead
       |FROM vv LEFT JOIN pw ON pw.piece = vv.piece
       |        LEFT JOIN uses ON uses.piece = vv.piece
       |ORDER BY vv.piece""".stripMargin
  }

  val tok5Sql: String = {
    import graft.functions.WordPieceEncode
    val maxLen = 12
    // longest-match take at 1-based position `p`: the max piece length
    // whose (root | ##continuation) form is in the vocabulary, else -1
    def takeExpr(p: String): String = {
      val whens = (WordPieceEncode.MaxPiece to 1 by -1).map { l =>
        s"WHEN n - $p + 1 >= $l AND EXISTS (SELECT 1 FROM v WHERE piece = " +
          s"CASE WHEN $p = 1 THEN substr(word, $p, $l) " +
          s"ELSE '##' || substr(word, $p, $l) END) THEN $l"
      }.mkString(" ")
      s"(CASE $whens ELSE -1 END)"
    }
    val steps = (1 to maxLen).map { k =>
      val (p, c, u) = (s"p${k - 1}", s"c${k - 1}", s"u${k - 1}")
      s"""t$k AS (
         |  SELECT word, n, $p, $c, $u,
         |         CASE WHEN $u = 1 OR $p > n THEN 0 ELSE ${takeExpr(p)} END AS tk
         |  FROM s${k - 1}),
         |s$k AS (
         |  SELECT word, n,
         |         CASE WHEN tk > 0 THEN $p + tk ELSE $p END AS p$k,
         |         CASE WHEN tk > 0 THEN $c + 1 ELSE $c END AS c$k,
         |         CASE WHEN tk = -1 THEN 1 ELSE $u END AS u$k
         |  FROM t$k)""".stripMargin
    }
    s"""WITH v(piece) AS (VALUES ${WordPieceEncode.vocabSql}),
       |words AS (
       |  SELECT DISTINCT word, CAST(len(word) AS BIGINT) AS n
       |  FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
       |  WHERE len(word) BETWEEN 1 AND $maxLen),
       |s0 AS (SELECT word, n, 1 AS p0, CAST(0 AS BIGINT) AS c0, 0 AS u0 FROM words),
       |${steps.mkString(",\n")}
       |SELECT word, n AS n_chars,
       |       CAST(CASE WHEN u$maxLen = 1 THEN 1 ELSE c$maxLen END AS BIGINT) AS n_pieces,
       |       CAST(u$maxLen AS BIGINT) AS is_unk
       |FROM s$maxLen ORDER BY word""".stripMargin
  }

  // ---- T25: stupid-backoff trigram scoring on a held-out split ----

  /** T25: trigram language-model scoring with Stupid Backoff (Brants et
    * al. EMNLP 2007 — the smoothing invented FOR distributed web-scale
    * LMs: no discount normalization, so counts shard freely). The model
    * trains on docs with doc_id % 7 ≠ 0 and scores the held-out % 7 = 0
    * docs — unlike t19/t22's self-scoring, unseen n-grams genuinely
    * occur, so every backoff tier fires. Per trigram instance:
    * S = c123/c12, backing off to 0.4·c23/c2, then 0.4²·c3/T, then a
    * 0.4³/T unseen-word floor; each tier's −ln S is ONE double
    * expression over exact integers rounded to e6 micro-nats (the
    * t14/t19 convention — the 0.4 factors fold into exact rationals:
    * ln(5·c2/(2·c23)), ln(25·T/(4·c3)), ln(125·T/8)). Emits per doc the
    * instance count, the per-tier hit counts (the backoff profile — how
    * far out-of-domain the doc is), and the mean NLL.
    *
    * Scale: model tables (trigram/bigram/unigram counts) derive from ONE
    * exploded train scan and are vocab-bounded; the held-out trigram
    * stream left-joins them on their n-gram keys (the two unigram
    * margins broadcast); no corpus×corpus surface anywhere. */
  private[graft] def stupidBackoffOf(train: DataFrame, test: DataFrame): DataFrame = {
    def tris(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 2), i -> struct(ws[i - 1] AS w1, ws[i] AS w2, ws[i + 1] AS w3))")).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0 && length(col("w3")) > 0)
    val trTri = tris(train)
    val c123 = trTri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))
    val c12 = trTri.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c23 = trTri.groupBy("w2", "w3").agg(count(lit(1)).as("c23"))
    val toks = train.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val c2 = toks.groupBy(col("w").as("w2")).agg(count(lit(1)).as("c2"))
    val c3 = toks.groupBy(col("w").as("w3")).agg(count(lit(1)).as("c3"))
    val t = toks.agg(count(lit(1)).as("t"))
    val scored = tris(test)
      .join(c123, Seq("w1", "w2", "w3"), "left")
      .join(c12, Seq("w1", "w2"), "left")
      .join(c23, Seq("w2", "w3"), "left")
      .join(broadcast(c2), Seq("w2"), "left")
      .join(broadcast(c3), Seq("w3"), "left")
      .crossJoin(broadcast(t))
      .withColumn("tier", expr(
        "CASE WHEN c123 IS NOT NULL THEN 0 WHEN c23 IS NOT NULL THEN 1 " +
          "WHEN c3 IS NOT NULL THEN 2 ELSE 3 END"))
      .withColumn("nll_e6_tok", expr(
        "CASE tier " +
          "WHEN 0 THEN CAST(round(ln(CAST(c12 AS DOUBLE) / CAST(c123 AS DOUBLE)) * 1000000) AS BIGINT) " +
          "WHEN 1 THEN CAST(round(ln(CAST(5 * c2 AS DOUBLE) / CAST(2 * c23 AS DOUBLE)) * 1000000) AS BIGINT) " +
          "WHEN 2 THEN CAST(round(ln(CAST(25 * t AS DOUBLE) / CAST(4 * c3 AS DOUBLE)) * 1000000) AS BIGINT) " +
          "ELSE CAST(round(ln(CAST(125 * t AS DOUBLE) / CAST(8 AS DOUBLE)) * 1000000) AS BIGINT) END"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("tier") === 0, 1L).otherwise(0L)).as("n_hit"),
        sum(when(col("tier") === 1, 1L).otherwise(0L)).as("n_bo1"),
        sum(when(col("tier") >= 2, 1L).otherwise(0L)).as("n_bo2"),
        expr("sum(nll_e6_tok) div count(1)").as("nll_e6"))
  }

  val t25: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    stupidBackoffOf(docs.filter(col("doc_id") % 7 =!= 0),
      docs.filter(col("doc_id") % 7 === 0)).orderBy("doc_id")
  }
  val t25Sql: String =
    """WITH tr AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents WHERE doc_id % 7 <> 0),
      |te AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents WHERE doc_id % 7 = 0),
      |trt AS (
      |  SELECT t.w1, t.w2, t.w3 FROM (
      |    SELECT unnest(list_transform(range(1, len(ws) - 1),
      |      i -> {'w1': ws[CAST(i AS INTEGER)], 'w2': ws[CAST(i AS INTEGER) + 1], 'w3': ws[CAST(i AS INTEGER) + 2]})) AS t
      |    FROM tr WHERE len(ws) >= 3)
      |  WHERE len(t.w1) > 0 AND len(t.w2) > 0 AND len(t.w3) > 0),
      |tet AS (
      |  SELECT doc_id, t.w1, t.w2, t.w3 FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
      |      i -> {'w1': ws[CAST(i AS INTEGER)], 'w2': ws[CAST(i AS INTEGER) + 1], 'w3': ws[CAST(i AS INTEGER) + 2]})) AS t
      |    FROM te WHERE len(ws) >= 3)
      |  WHERE len(t.w1) > 0 AND len(t.w2) > 0 AND len(t.w3) > 0),
      |c123 AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c123 FROM trt GROUP BY w1, w2, w3),
      |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM trt GROUP BY w1, w2),
      |c23 AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS c23 FROM trt GROUP BY w2, w3),
      |toks AS (SELECT unnest(str_split(text, ' ')) AS w FROM documents WHERE doc_id % 7 <> 0),
      |c2 AS (SELECT w AS w2, CAST(count(*) AS BIGINT) AS c2 FROM toks WHERE len(w) > 0 GROUP BY w),
      |c3 AS (SELECT w AS w3, CAST(count(*) AS BIGINT) AS c3 FROM toks WHERE len(w) > 0 GROUP BY w),
      |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM toks WHERE len(w) > 0),
      |sc AS (
      |  SELECT tet.doc_id,
      |         CASE WHEN c123.c123 IS NOT NULL THEN 0 WHEN c23.c23 IS NOT NULL THEN 1
      |              WHEN c3.c3 IS NOT NULL THEN 2 ELSE 3 END AS tier,
      |         CASE WHEN c123.c123 IS NOT NULL
      |                THEN CAST(round(ln(CAST(c12.c12 AS DOUBLE) / CAST(c123.c123 AS DOUBLE)) * 1000000) AS BIGINT)
      |              WHEN c23.c23 IS NOT NULL
      |                THEN CAST(round(ln(CAST(5 * c2.c2 AS DOUBLE) / CAST(2 * c23.c23 AS DOUBLE)) * 1000000) AS BIGINT)
      |              WHEN c3.c3 IS NOT NULL
      |                THEN CAST(round(ln(CAST(25 * tt.t AS DOUBLE) / CAST(4 * c3.c3 AS DOUBLE)) * 1000000) AS BIGINT)
      |              ELSE CAST(round(ln(CAST(125 * tt.t AS DOUBLE) / CAST(8 AS DOUBLE)) * 1000000) AS BIGINT) END AS nll_e6_tok
      |  FROM tet
      |  LEFT JOIN c123 USING (w1, w2, w3)
      |  LEFT JOIN c12 USING (w1, w2)
      |  LEFT JOIN c23 USING (w2, w3)
      |  LEFT JOIN c2 USING (w2)
      |  LEFT JOIN c3 USING (w3)
      |  CROSS JOIN tt)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
      |       CAST(sum(CASE WHEN tier = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |       CAST(sum(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bo1,
      |       CAST(sum(CASE WHEN tier >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bo2,
      |       CAST(sum(nll_e6_tok) AS BIGINT) // CAST(count(*) AS BIGINT) AS nll_e6
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "t25_stupid_backoff" -> t25,
    "mix3_unimax_alloc" -> mix3,
    "sel1_dsir_topk" -> sel1,
    "sel2_budget_select" -> sel2,
    "t18_char_entropy" -> t18,
    "bpe1_pair_stats" -> bpe1,
    "bpe2_merge_induction" -> bpe2,
    "t19_bigram_nll" -> t19,
    "t22_kneser_ney" -> t22,
    "fim1_split" -> fim1,
    "fim2_span_corruption" -> fim2,
    "rep1_adjacent_dedup" -> rep1,
    "batch1_length_buckets" -> batch1,
    "tok2_bpe_encode" -> tok2,
    "tok3_unigram_viterbi" -> tok3,
    "tok5_wordpiece" -> tok5,
    "tok6_piece_usage" -> tok6,
    "tok4_fertility" -> tok4,
    "mix4_data_constrained" -> mix4,
    "samp4_weighted_topk" -> samp4,
  )

  val oracle: Map[String, String] = Map(
    "t25_stupid_backoff" -> t25Sql,
    "mix3_unimax_alloc" -> mix3Sql,
    "sel1_dsir_topk" -> sel1Sql,
    "sel2_budget_select" -> sel2Sql,
    "t18_char_entropy" -> t18Sql,
    "bpe1_pair_stats" -> bpe1Sql,
    "bpe2_merge_induction" -> bpe2Sql,
    "tok2_bpe_encode" -> tok2Sql,
    "tok3_unigram_viterbi" -> tok3Sql,
    "tok5_wordpiece" -> tok5Sql,
    "tok6_piece_usage" -> tok6Sql,
    "tok4_fertility" -> tok4Sql,
    "mix4_data_constrained" -> mix4Sql,
    "t19_bigram_nll" -> t19Sql,
    "t22_kneser_ney" -> t22Sql,
    "fim1_split" -> fim1Sql,
    "fim2_span_corruption" -> fim2Sql,
    "rep1_adjacent_dedup" -> rep1Sql,
    "batch1_length_buckets" -> batch1Sql,
    "samp4_weighted_topk" -> samp4Sql,
  )
}
