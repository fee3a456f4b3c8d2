package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] Post-training data-curation operators: curriculum ordering,
  * pairwise source-preference aggregation, Bradley–Terry source
  * strengths, and privacy audits (k-anonymity / l-diversity). Not
  * derived from the reference — these are the operations an RLHF /
  * fine-tuning data pipeline runs between raw-corpus cleaning and
  * batch assembly.
  *
  * Exactness across engines: every score is bounded-integer (t5's
  * quality), every division is integer `div`/`//` with guarded
  * denominators, every shuffle key is a salted-md5 hex string — so
  * each query hash-matches its DuckDB oracle bit-for-bit.
  *
  * Scale notes per op are on the member Scaladocs; the common theme is
  * that everything heavier than one corpus scan is computed on
  * VALUE-DOMAIN-bounded aggregates (quality histograms, source pairs),
  * never on document pairs.
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  // ---- CUR1: curriculum ordering (quality quartiles, easy->hard) ----

  /** Curriculum epoch order over any documents frame: stage 1..4 by
    * quality quartile (stage 1 = top quartile — train on clean text
    * first), deterministic salted-md5 shuffle WITHIN each stage, and a
    * global stage-major position — the library entry point
    * ([[graft.api.GraftApi.curriculumOrder]]).
    *
    * Scale: quartile boundaries come from a VALUE histogram of the
    * bounded-integer quality score (≤ 10001 distinct values — a tiny,
    * corpus-size-independent frame; the two driver actions on it are
    * justified-small collects, the same contract as Clustering's k·dim
    * centroid fetch). The global position uses voc2's distributed
    * prefix-sum: range-partition by (stage, shuffle-key), rank locally
    * per partition, add broadcast per-partition offsets — NO
    * single-reducer global window anywhere. The ranged frame is
    * localCheckpoint-ed because range partitioning samples boundaries
    * nondeterministically: the offsets pass and the rank pass must see
    * the same physical partitioning. */
  private[graft] def curriculumOrderOf(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScoreOf(docs).select("doc_id", "quality")
    // Bounded value histogram -> exact quartile boundaries (percentile_disc
    // semantics: smallest value v with cum(v) >= ceil(k*n/4), i.e. 4*cum >= k*n).
    val hist = q.groupBy("quality").agg(count(lit(1)).as("c"))
      .coalesce(1).localCheckpoint(true)
    val n = hist.agg(coalesce(sum("c"), lit(0L))).first().getLong(0)
    val cum = hist.withColumn("cum",
      sum("c").over(Window.orderBy("quality")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bs = (1 to 3).map { k =>
      cum.filter(col("cum") * 4 >= lit(k.toLong) * n)
        .agg(min("quality")).first().getLong(0)
    }
    val staged = q.withColumn("stage", expr(
        s"CAST(4 - ((CASE WHEN quality > ${bs(0)} THEN 1 ELSE 0 END)" +
          s" + (CASE WHEN quality > ${bs(1)} THEN 1 ELSE 0 END)" +
          s" + (CASE WHEN quality > ${bs(2)} THEN 1 ELSE 0 END)) AS BIGINT)"))
      .withColumn("skey",
        substring(md5(concat(lit("cur1:"), col("doc_id").cast("string"))), 1, 8))
    // Distributed prefix-sum rank (PrefixSum.prefixRank — the shared
    // voc2/pack2/eval2 idiom): global order is (stage, skey, doc_id).
    PrefixSum.prefixRank(staged, Seq(col("stage"), col("skey"), col("doc_id"))).df
      .select(col("doc_id"), col("quality"), col("stage"),
        col("g_rank").as("pos"))
  }

  val cur1: Q = (s, d) =>
    curriculumOrderOf(Tables.documents(s, d)).orderBy("pos")
  val cur1Sql: String =
    s"""WITH ${TextAnalysis.qualityCte},
       |hist AS (SELECT quality, CAST(count(*) AS BIGINT) AS c FROM qual GROUP BY quality),
       |cum AS (SELECT quality, CAST(sum(c) OVER (ORDER BY quality) AS BIGINT) AS cum FROM hist),
       |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
       |b AS (SELECT
       |  (SELECT min(quality) FROM cum, n WHERE cum * 4 >= 1 * n) AS b1,
       |  (SELECT min(quality) FROM cum, n WHERE cum * 4 >= 2 * n) AS b2,
       |  (SELECT min(quality) FROM cum, n WHERE cum * 4 >= 3 * n) AS b3),
       |staged AS (
       |  SELECT doc_id, quality,
       |         CAST(4 - ((CASE WHEN quality > b1 THEN 1 ELSE 0 END)
       |                 + (CASE WHEN quality > b2 THEN 1 ELSE 0 END)
       |                 + (CASE WHEN quality > b3 THEN 1 ELSE 0 END)) AS BIGINT) AS stage,
       |         substr(md5('cur1:' || doc_id::VARCHAR), 1, 8) AS skey
       |  FROM qual, b)
       |SELECT doc_id, quality, stage,
       |       CAST(row_number() OVER (ORDER BY stage, skey, doc_id) AS BIGINT) AS pos
       |FROM staged ORDER BY pos""".stripMargin

  // ---- PREF1: pairwise source preference win-rates (rank-sum, no pairs) ----

  /** Pairwise quality-preference counts between sources within each lang
    * block: for sources a < b, how many (doc-from-a, doc-from-b) pairs
    * prefer a (higher quality grade), prefer b, or tie — the
    * Mann–Whitney rank-sum shape, and the input statistic Bradley–Terry
    * needs. The library entry point ([[graft.api.GraftApi.pairwiseWins]]).
    *
    * Scale: document PAIRS are never materialized. Quality is bucketed
    * to 101 grades (quality div 100) and aggregated to a per-(lang,
    * source, grade) histogram first — one corpus scan + one small
    * aggregate; win counts are then Σ c_a(g)·c_b(g') over the tiny
    * histogram join (bounded by langs · sourcePairs · 101², independent
    * of corpus size).
    *
    * INT64 BOUND (documented, not yet decimalized): c_a·c_b multiplies
    * two per-(lang, source) histogram counts, so wins wrap int64 once a
    * single (lang, source) cell passes ~3e9 docs — the eval2/t22 class
    * of bound. The fix is the same DECIMAL(38,0) accumulation, but wins
    * feed pref2's Bradley–Terry pooling as BIGINT columns, so the
    * upgrade must move both ops together; until then the bound is the
    * contract (a 100 TB corpus split over realistic lang×source cells
    * stays under it unless one cell dominates). */
  private[graft] def pairwiseWinsOf(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScoreOf(docs).select("doc_id", "quality")
    val g = docs.select("doc_id", "lang", "source").join(q, Seq("doc_id"))
      .select(col("lang"), col("source"), expr("quality div 100").as("grade"))
      .groupBy("lang", "source", "grade").agg(count(lit(1)).as("c"))
    val a = g.select(col("lang"), col("source").as("src_a"), col("grade").as("ga"), col("c").as("ca"))
    val b = g.select(col("lang").as("lang_b"), col("source").as("src_b"), col("grade").as("gb"), col("c").as("cb"))
    a.join(b, col("lang") === col("lang_b") && col("src_a") < col("src_b"))
      .groupBy("lang", "src_a", "src_b")
      .agg(
        sum(when(col("ga") > col("gb"), col("ca") * col("cb")).otherwise(0L)).as("wins_a"),
        sum(when(col("ga") < col("gb"), col("ca") * col("cb")).otherwise(0L)).as("wins_b"),
        sum(when(col("ga") === col("gb"), col("ca") * col("cb")).otherwise(0L)).as("ties"))
      .withColumn("winrate_a_bp",
        expr("wins_a * 10000 div greatest(wins_a + wins_b, 1)"))
  }

  val pref1: Q = (s, d) =>
    pairwiseWinsOf(Tables.documents(s, d)).orderBy("lang", "src_a", "src_b")
  private val pref1Ctes: String =
    s"""${TextAnalysis.qualityCte},
       |g AS MATERIALIZED (
       |  SELECT d.lang, d.source, q.quality // 100 AS grade, CAST(count(*) AS BIGINT) AS c
       |  FROM documents d JOIN qual q ON q.doc_id = d.doc_id
       |  GROUP BY d.lang, d.source, q.quality // 100),
       |wins AS MATERIALIZED (
       |  SELECT a.lang, a.source AS src_a, b.source AS src_b,
       |         CAST(sum(CASE WHEN a.grade > b.grade THEN a.c * b.c ELSE 0 END) AS BIGINT) AS wins_a,
       |         CAST(sum(CASE WHEN a.grade < b.grade THEN a.c * b.c ELSE 0 END) AS BIGINT) AS wins_b,
       |         CAST(sum(CASE WHEN a.grade = b.grade THEN a.c * b.c ELSE 0 END) AS BIGINT) AS ties
       |  FROM g a JOIN g b ON a.lang = b.lang AND a.source < b.source
       |  GROUP BY a.lang, a.source, b.source)""".stripMargin
  val pref1Sql: String =
    s"""WITH $pref1Ctes
       |SELECT lang, src_a, src_b, wins_a, wins_b, ties,
       |       wins_a * 10000 // greatest(wins_a + wins_b, 1) AS winrate_a_bp
       |FROM wins ORDER BY lang, src_a, src_b""".stripMargin

  // ---- PREF2: Bradley-Terry source strengths (3 MM iterations, integer) ----

  /** Bradley–Terry strength per source from pref1's pairwise wins pooled
    * over langs, via 3 fixed iterations of Hunter's MM update
    * β'_s = W_s / Σ_t n_st/(β_s+β_t), all in exact integer micro-units —
    * the library entry point ([[graft.api.GraftApi.bradleyTerry]]).
    *
    * Determinism/overflow contract: counts are first normalized to
    * parts-per-million of the total pair count (BT is invariant under
    * common scaling), β is clamped to ≥ 1000 (strength 0.001) so every
    * denominator is ≥ 2000 and every intermediate stays far below int64
    * range — both engines run the identical truncating-div recurrence.
    *
    * Scale: the iteration runs on the sources×sources matrix (pref1's
    * output, corpus-size-independent); the corpus is scanned exactly
    * once, inside pref1. */
  private[graft] def bradleyTerryOf(wins: DataFrame, iters: Int = 3): DataFrame = {
    // pooled directed matrix in ppm of total decisive pairs
    val pooled = wins.groupBy("src_a", "src_b")
      .agg(sum("wins_a").as("wa"), sum("wins_b").as("wb"))
    val dir = pooled.select(col("src_a").as("s"), col("src_b").as("t"),
        col("wa").as("w"), (col("wa") + col("wb")).as("n"))
      .unionAll(pooled.select(col("src_b").as("s"), col("src_a").as("t"),
        col("wb").as("w"), (col("wa") + col("wb")).as("n")))
    val total = math.max(
      pooled.agg(coalesce(sum(col("wa") + col("wb")), lit(0L))).first().getLong(0), 1L)
    val m = dir.select(col("s"), col("t"),
        expr(s"w * 1000000 div ${total}L").as("w_pm"),
        expr(s"n * 1000000 div ${total}L").as("n_pm"))
      .localCheckpoint(true) // tiny matrix; iterated over `iters` times
    var beta = m.select(col("s").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("b"))
    for (_ <- 1 to iters) {
      val bs = beta.select(col("node").as("s"), col("b").as("b_s"))
      val bt = beta.select(col("node").as("t"), col("b").as("b_t"))
      beta = m.join(bs, Seq("s")).join(bt, Seq("t"))
        .groupBy(col("s").as("node"))
        .agg(
          sum("w_pm").as("w_tot"),
          sum(expr("n_pm * 1000000000000 div greatest(b_s + b_t, 2000)")).as("den"))
        .select(col("node"),
          expr("greatest(w_tot * 1000000000000 div greatest(den, 1), 1000)").as("b"))
    }
    beta.select(col("node").as("source"), col("b").as("beta_e6"))
  }

  val pref2: Q = (s, d) =>
    bradleyTerryOf(pairwiseWinsOf(Tables.documents(s, d))).orderBy("source")
  val pref2Sql: String = {
    def iter(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT m.s AS node,
         |         greatest(CAST(sum(m.w_pm) AS BIGINT) * 1000000000000
         |           // greatest(CAST(sum(m.n_pm * 1000000000000
         |                // greatest(ps.b + pt.b, 2000)) AS BIGINT), 1), 1000) AS b
         |  FROM m JOIN $prev ps ON ps.node = m.s JOIN $prev pt ON pt.node = m.t
         |  GROUP BY m.s)""".stripMargin
    s"""WITH $pref1Ctes,
       |pooled AS MATERIALIZED (
       |  SELECT src_a, src_b, CAST(sum(wins_a) AS BIGINT) AS wa, CAST(sum(wins_b) AS BIGINT) AS wb
       |  FROM wins GROUP BY src_a, src_b),
       |total AS (SELECT greatest(CAST(coalesce(sum(wa + wb), 0) AS BIGINT), 1) AS tot FROM pooled),
       |dir AS (
       |  SELECT src_a AS s, src_b AS t, wa AS w, wa + wb AS n FROM pooled
       |  UNION ALL
       |  SELECT src_b AS s, src_a AS t, wb AS w, wa + wb AS n FROM pooled),
       |m AS MATERIALIZED (
       |  SELECT s, t, w * 1000000 // tot AS w_pm, n * 1000000 // tot AS n_pm
       |  FROM dir, total),
       |b0 AS MATERIALIZED (SELECT DISTINCT s AS node, CAST(1000000 AS BIGINT) AS b FROM m),
       |${iter("b0", "b1")},
       |${iter("b1", "b2")},
       |${iter("b2", "b3")}
       |SELECT node AS source, CAST(b AS BIGINT) AS beta_e6 FROM b3 ORDER BY source""".stripMargin
  }

  // ---- PRIV1/PRIV2: k-anonymity and l-diversity audits ----

  /** k-anonymity audit over a quasi-identifier grouping: group sizes per
    * QI tuple plus a k≥5 flag — the pre-release privacy check a training
    * corpus with user-derived records runs. Output cardinality is the
    * QI-domain size (bounded), never the row count; the plan is ONE
    * map-side-combined aggregate over the scan. */
  val priv1: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_nationkey"),
        col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("bal_k"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_k")
      .agg(count(lit(1)).as("group_n"))
      .withColumn("k_ge5", expr("CAST(CASE WHEN group_n >= 5 THEN 1 ELSE 0 END AS BIGINT)"))
      .orderBy("c_nationkey", "c_mktsegment", "bal_k")
  val priv1Sql: String =
    """SELECT c_nationkey, c_mktsegment,
      |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
      |       CAST(count(*) AS BIGINT) AS group_n,
      |       CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS BIGINT) AS k_ge5
      |FROM customer
      |GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT)
      |ORDER BY c_nationkey, c_mktsegment, bal_k""".stripMargin

  /** l-diversity audit: distinct sensitive values (market segment) per
    * QI group (nation, balance bucket) with an l≥3 flag. Same one-
    * aggregate plan as priv1; `count(DISTINCT)` partial-aggregates
    * map-side (Spark expands it to a two-phase exact distinct). */
  val priv2: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_nationkey"),
        expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("bal_k"),
        col("c_mktsegment"))
      .groupBy("c_nationkey", "bal_k")
      .agg(count(lit(1)).as("group_n"),
        countDistinct("c_mktsegment").as("l_div"))
      .withColumn("l_ge3", expr("CAST(CASE WHEN l_div >= 3 THEN 1 ELSE 0 END AS BIGINT)"))
      .orderBy("c_nationkey", "bal_k")
  val priv2Sql: String =
    """SELECT c_nationkey,
      |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
      |       CAST(count(*) AS BIGINT) AS group_n,
      |       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_div,
      |       CAST(CASE WHEN count(DISTINCT c_mktsegment) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS l_ge3
      |FROM customer
      |GROUP BY c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT)
      |ORDER BY c_nationkey, bal_k""".stripMargin

  // ---- PRIV5: t-closeness audit ----

  /** PRIV5: t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third leg of the release-audit trio: priv1 checks group SIZE
    * (k-anonymity), priv2 checks sensitive-value VARIETY (l-diversity),
    * this checks sensitive-value DISTRIBUTION: a group whose
    * market-segment mix diverges from the corpus-wide mix leaks
    * membership information even when k and l pass. For a categorical
    * sensitive attribute the distance is total variation
    * t = ½·Σ_j |p_j − q_j| (EMD under the uniform ground metric);
    * computed as exact integers over the common denominator n_g·N:
    * tv_e6 = 10⁶·Σ_j |c_gj·N − C_j·n_g| div (2·n_g·N), products in
    * DECIMAL(38,0)/HUGEINT (the eval2 convention — c·N reaches 10²⁴ at
    * a trillion rows, past int64 but inside decimal headroom). Segments
    * ABSENT from a group still contribute |0 − C_j·n_g| — the grid is
    * groups × the (bounded) segment universe, built by a broadcast
    * cross join, never by enumerating rows.
    *
    * Scale: one scan feeds both the (QI, segment) counts and the k-row
    * global segment histogram; the grid is |QI-domain|·|segments| rows
    * (bounded), the per-group fold map-side combines, and the 1-row
    * corpus total broadcasts. Emits per QI group (group_n, tv_e6,
    * t_le_0_2 flag). Library entry point:
    * [[graft.api.GraftApi.tClosenessAudit]]. */
  /** The t-closeness cut over a (QI..., sens, c) count table — factored
    * from [[tClosenessOf]] so the streaming twin (st23) can maintain the
    * ADDITIVE (QI, sens) counts per micro-batch and run the same cut:
    * the group sizes, the global histogram and the corpus total are all
    * sums over this one table. */
  private[graft] def tClosenessFromSegCounts(gseg: DataFrame,
      qiCols: Seq[String]): DataFrame = {
    val qi = qiCols.map(col)
    val grp = gseg.groupBy(qi: _*).agg(sum("c").as("n_g"))
    val glob = gseg.groupBy("sens").agg(sum("c").as("cg"))
    val total = gseg.agg(sum("c").as("n_tot"))
    grp.crossJoin(broadcast(glob))
      .join(gseg, qiCols :+ "sens", "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(total))
      .groupBy((qi :+ col("n_g") :+ col("n_tot")): _*)
      .agg(sum(expr(
        "abs(CAST(c AS DECIMAL(38,0)) * n_tot - CAST(cg AS DECIMAL(38,0)) * n_g)"))
        .as("tvd"))
      .select((qi :+ col("n_g").as("group_n") :+
        expr("CAST(1000000 * tvd div (2 * CAST(n_g AS DECIMAL(38,0)) * n_tot) AS BIGINT)")
          .as("tv_e6")): _*)
      .withColumn("t_le_0_2",
        expr("CAST(CASE WHEN tv_e6 <= 200000 THEN 1 ELSE 0 END AS BIGINT)"))
      .orderBy(qi: _*)
  }

  private[graft] def tClosenessOf(rows: DataFrame, qiCols: Seq[String],
      sensCol: String): DataFrame = {
    val qi = qiCols.map(col)
    val gseg = rows.select((qi :+ col(sensCol).as("sens")): _*)
      .groupBy((qi :+ col("sens")): _*).agg(count(lit(1)).as("c"))
    tClosenessFromSegCounts(gseg, qiCols)
  }

  val priv5: Q = (s, d) =>
    tClosenessOf(
      Tables.customer(s, d)
        .withColumn("bal_k", expr("CAST(floor(c_acctbal / 1000) AS BIGINT)")),
      Seq("c_nationkey", "bal_k"), "c_mktsegment")

  val priv5Sql: String =
    """WITH base AS (
      |  SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
      |         c_mktsegment AS sens
      |  FROM customer),
      |gseg AS (
      |  SELECT c_nationkey, bal_k, sens, CAST(count(*) AS BIGINT) AS c
      |  FROM base GROUP BY 1, 2, 3),
      |grp AS (
      |  SELECT c_nationkey, bal_k, CAST(sum(c) AS BIGINT) AS n_g
      |  FROM gseg GROUP BY 1, 2),
      |gsum AS (SELECT sens, CAST(count(*) AS BIGINT) AS cg FROM base GROUP BY sens),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM base),
      |grid AS (
      |  SELECT g.c_nationkey, g.bal_k, g.n_g, gl.cg, coalesce(s.c, 0) AS c
      |  FROM grp g CROSS JOIN gsum gl
      |  LEFT JOIN gseg s ON s.c_nationkey = g.c_nationkey
      |    AND s.bal_k = g.bal_k AND s.sens = gl.sens)
      |SELECT c_nationkey, bal_k, n_g AS group_n,
      |       CAST(1000000 * sum(abs(CAST(c AS HUGEINT) * n_tot - CAST(cg AS HUGEINT) * n_g))
      |         // (2 * CAST(n_g AS HUGEINT) * n_tot) AS BIGINT) AS tv_e6,
      |       CAST(CASE WHEN 1000000 * sum(abs(CAST(c AS HUGEINT) * n_tot - CAST(cg AS HUGEINT) * n_g))
      |         // (2 * CAST(n_g AS HUGEINT) * n_tot) <= 200000 THEN 1 ELSE 0 END AS BIGINT) AS t_le_0_2
      |FROM grid CROSS JOIN tot
      |GROUP BY c_nationkey, bal_k, n_g, n_tot
      |ORDER BY c_nationkey, bal_k""".stripMargin

  // ---- PRIV3: randomized response (deterministic local-DP mechanism) ----

  /** Warner-style randomized response over the market-segment column:
    * each customer reports their true segment with probability
    * p = 0.60, otherwise a uniformly-drawn OTHER segment — then the
    * exact unbiased frequency estimator inverts the mechanism. Both
    * draws are salted-md5 (the bernoulliKeep convention): RNG-free,
    * rerun-stable, map-side, and bit-identical in both engines — the
    * noise is real (no row's report is predictable from the aggregate)
    * but the pipeline stays replayable, which is what a training-data
    * release pipeline needs from its DP step.
    *
    * Estimator (k = #segments): E[reported_s] = p·n_s + (1−p)(N−n_s)/(k−1),
    * inverted in exact integer basis points:
    * est = (reported·10⁴·(k−1) − (10⁴−p_bp)·N) div (p_bp·(k−1) − (10⁴−p_bp)).
    *
    * Scale: one scan + two tiny broadcast joins against the k-row
    * segment table; output is k rows. */
  private[graft] def randomizedResponseOf(cust: DataFrame, pBp: Long = 6000L): DataFrame = {
    val segs = cust.select(col("c_mktsegment").as("seg")).distinct()
      .coalesce(1)
      .withColumn("idx", row_number().over(Window.orderBy("seg")).cast("long") - 1)
      .localCheckpoint(true)
    val k = segs.count()
    require(k >= 2, s"randomized response needs >= 2 categories, got $k")
    val drawn = cust.select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(broadcast(segs), Seq("seg"))
      .withColumn("keep", expr(
        "(CAST(conv(substring(md5(concat('priv3a:', CAST(c_custkey AS STRING))), 1, 4), 16, 10) AS BIGINT)" +
          s" % 10000) < $pBp"))
      .withColumn("alt", expr(
        "CAST(conv(substring(md5(concat('priv3b:', CAST(c_custkey AS STRING))), 1, 4), 16, 10) AS BIGINT)" +
          s" % ${k - 1}L"))
      .withColumn("ridx", expr(s"CASE WHEN keep THEN idx ELSE (idx + 1 + alt) % ${k}L END"))
    val trueN = drawn.groupBy("seg").agg(count(lit(1)).as("true_n"))
    val repN = drawn
      .join(broadcast(segs.select(col("idx").as("ridx"), col("seg").as("rseg"))), Seq("ridx"))
      .groupBy(col("rseg").as("seg")).agg(count(lit(1)).as("reported_n"))
    val total = cust.agg(count(lit(1)).as("n_total"))
    trueN.join(repN, Seq("seg")).crossJoin(broadcast(total))
      .select(col("seg").as("c_mktsegment"), col("true_n"), col("reported_n"),
        expr(s"(reported_n * 10000 * ${k - 1}L - (10000 - $pBp) * n_total)" +
          s" div (${pBp}L * ${k - 1}L - (10000 - $pBp))").as("est_n"))
  }

  val priv3: Q = (s, d) =>
    randomizedResponseOf(Tables.customer(s, d)).orderBy("c_mktsegment")
  val priv3Sql: String =
    """WITH segs AS MATERIALIZED (
      |  SELECT seg, CAST(row_number() OVER (ORDER BY seg) AS BIGINT) - 1 AS idx
      |  FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer)),
      |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM segs),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM customer),
      |drawn AS MATERIALIZED (
      |  SELECT c.c_custkey, c.c_mktsegment AS seg, s.idx,
      |         (('0x' || substr(md5('priv3a:' || c.c_custkey::VARCHAR), 1, 4))::BIGINT % 10000) < 6000 AS keep,
      |         ('0x' || substr(md5('priv3b:' || c.c_custkey::VARCHAR), 1, 4))::BIGINT % (kk.k - 1) AS alt
      |  FROM customer c JOIN segs s ON s.seg = c.c_mktsegment CROSS JOIN kk),
      |rep AS (
      |  SELECT d.seg, CASE WHEN d.keep THEN d.idx ELSE (d.idx + 1 + d.alt) % kk.k END AS ridx
      |  FROM drawn d CROSS JOIN kk),
      |tn AS (SELECT seg, CAST(count(*) AS BIGINT) AS true_n FROM drawn GROUP BY seg),
      |rn AS (SELECT s.seg, CAST(count(*) AS BIGINT) AS reported_n
      |       FROM rep r JOIN segs s ON s.idx = r.ridx GROUP BY s.seg)
      |SELECT tn.seg AS c_mktsegment, tn.true_n, rn.reported_n,
      |       (rn.reported_n * 10000 * (kk.k - 1) - (10000 - 6000) * tot.n_total)
      |         // (6000 * (kk.k - 1) - (10000 - 6000)) AS est_n
      |FROM tn JOIN rn ON rn.seg = tn.seg CROSS JOIN kk CROSS JOIN tot
      |ORDER BY c_mktsegment""".stripMargin

  // ---- PRIV4: Laplace-mechanism noisy count release (central DP) ----

  /** Central-DP count release: per-language document counts with Laplace
    * noise at sensitivity 1 (a document belongs to one language), scale
    * b = 1/ε, ε = 0.5 → b = 2. The draw is a salted-md5 uniform (the
    * priv3 convention) inverted through the Laplace CDF:
    * noise = −b·sign(u−½)·ln(1−2|u−½|), u = (h+½)/2¹⁶ ∈ (0,1) — RNG-free
    * and rerun-stable, so the released table is replayable while each
    * group's noise is unpredictable from the aggregate. The ln runs over
    * identical exact-integer-derived operands in both engines and is
    * rounded ONCE to an integer noise term (the mix2 convention).
    * true_n rides along as the AUDIT column — a production release
    * publishes only (lang, released_n, eps_bp).
    *
    * Scale: one map-side-combined count per group, then noise as a
    * projection over |groups| rows — corpus-size-independent after the
    * scan, any number of groups. */
  private[graft] def laplaceCountsOf(docs: DataFrame, grpCol: String,
      salt: String, bX2: Long = 4L): DataFrame =
    docs.groupBy(grpCol).agg(count(lit(1)).as("true_n"))
      .withColumn("u_h", expr(
        s"CAST(conv(substring(md5(concat('$salt', $grpCol)), 1, 4), 16, 10) AS BIGINT)"))
      .withColumn("noise_i", expr(
        // u = (u_h + 0.5)/65536; |2u−1| = |2·u_h + 1 − 65536|/65536 — the
        // numerator stays integer until ONE double division inside ln
        s"""CAST(round(-(CAST($bX2 AS DOUBLE) / 2.0)
           |  * CAST(sign(2 * u_h + 1 - 65536) AS DOUBLE)
           |  * ln(1.0 - CAST(abs(2 * u_h + 1 - 65536) AS DOUBLE) / 65536.0)) AS BIGINT)""".stripMargin))
      .select(col(grpCol), col("true_n"),
        (col("true_n") + col("noise_i")).as("released_n"),
        col("noise_i"), lit(5000L).as("eps_bp"))

  val priv4: Q = (s, d) =>
    laplaceCountsOf(Tables.documents(s, d), "lang", "priv4:").orderBy("lang")
  val priv4Sql: String =
    """WITH g AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS true_n,
      |         ('0x' || substr(md5('priv4:' || lang), 1, 4))::BIGINT AS u_h
      |  FROM documents GROUP BY lang),
      |n AS (
      |  SELECT lang, true_n,
      |         CAST(round(-(CAST(4 AS DOUBLE) / 2.0)
      |           * CAST(sign(2 * u_h + 1 - 65536) AS DOUBLE)
      |           * ln(1.0 - CAST(abs(2 * u_h + 1 - 65536) AS DOUBLE) / 65536.0)) AS BIGINT) AS noise_i
      |  FROM g)
      |SELECT lang, true_n, true_n + noise_i AS released_n, noise_i,
      |       CAST(5000 AS BIGINT) AS eps_bp
      |FROM n ORDER BY lang""".stripMargin

  // ---- TRAJ1: session trajectory assembly (events -> training samples) ----

  /** Assemble per-user event trajectories into training samples: 10-min
    * tumbling session buckets (exact epoch-µs integer division), turns
    * ordered by (ts, event_id), the turn sequence joined into one path
    * string — the step that turns a raw event log into sequence training
    * data. Emits (user_id, bkt, n_turns, first_type, last_type,
    * path_md5) — the md5 stands in for the sample payload so rows stay
    * narrow while still pinning the exact assembled sequence.
    *
    * Scale: ONE shuffle on (user_id, bkt); the in-group sort is
    * map-side inside the aggregate (array_sort over each session's own
    * turn list, bounded by per-session activity), never a global sort. */
  private[graft] def sessionPathsOf(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), expr("unix_micros(ts) div 600000000").as("bkt"),
        col("ts"), col("event_id"), col("event_type"))
      .groupBy("user_id", "bkt")
      .agg(count(lit(1)).as("n_turns"),
        expr("array_join(transform(array_sort(collect_list(struct(ts, event_id, event_type)))," +
          " x -> x.event_type), '>')").as("path"))
      .select(col("user_id"), col("bkt"), col("n_turns"),
        expr("element_at(split(path, '>'), 1)").as("first_type"),
        expr("element_at(split(path, '>'), -1)").as("last_type"),
        md5(col("path")).as("path_md5"))

  val traj1: Q = (s, d) =>
    sessionPathsOf(Tables.events(s, d)).orderBy("user_id", "bkt")
  val traj1Sql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) // 600000000 AS bkt,
      |         CAST(count(*) AS BIGINT) AS n_turns,
      |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |  FROM events GROUP BY user_id, epoch_us(ts) // 600000000)
      |SELECT user_id, bkt, n_turns,
      |       str_split(path, '>')[1] AS first_type,
      |       str_split(path, '>')[-1] AS last_type,
      |       md5(path) AS path_md5
      |FROM p ORDER BY user_id, bkt""".stripMargin

  // ---- MARKOV1: first-order transition matrix over event streams ----

  /** First-order Markov transition matrix of the per-user event-type
    * chain — the behavioral model a curation pipeline fits to decide
    * which trajectories are "typical" (and the generator for synthetic
    * session data): each user's events ordered by (ts, event_id), every
    * adjacent (state → next state) step counted globally, row-normalized
    * to exact basis points (`c·10⁴ div row_n` — pure integer, so the
    * matrix hash-matches DuckDB).
    *
    * Scale: ONE shuffle on user_id for the lead() window (per-user
    * partitions, never a global sort), then a map-side-combined count
    * into the |types|² transition domain; the row-normalizing window
    * runs on that value-domain-bounded frame, so everything after the
    * first shuffle is O(|event_type alphabet|²) regardless of corpus
    * size. The library entry point is
    * [[graft.api.GraftApi.markovTransitions]]. */
  private[graft] def markovTransitionsOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = events
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur_type"), col("nxt").as("nxt_type"))
      .agg(count(lit(1)).as("c"))
    val rowW = Window.partitionBy("cur_type")
    counts
      .withColumn("row_n", sum("c").over(rowW))
      .withColumn("p_bp", expr("c * 10000 div row_n"))
  }

  val markov1: Q = (s, d) =>
    markovTransitionsOf(Tables.events(s, d)).orderBy("cur_type", "nxt_type")
  val markov1Sql: String =
    """WITH s AS (
      |  SELECT event_type AS cur_type,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_type
      |  FROM events),
      |c AS (
      |  SELECT cur_type, nxt_type, CAST(count(*) AS BIGINT) AS c
      |  FROM s WHERE nxt_type IS NOT NULL GROUP BY cur_type, nxt_type)
      |SELECT cur_type, nxt_type, c,
      |       CAST(sum(c) OVER (PARTITION BY cur_type) AS BIGINT) AS row_n,
      |       c * 10000 // CAST(sum(c) OVER (PARTITION BY cur_type) AS BIGINT) AS p_bp
      |FROM c ORDER BY cur_type, nxt_type""".stripMargin

  // ---- DQ2: robust outlier audit (median / MAD, exact integer) ----

  /** Robust per-group outlier audit: median and MAD (median absolute
    * deviation) of line-item price in exact integer cents via the apx3
    * value-histogram percentile pick, then the |dev| > 3·MAD count — the
    * distribution-drift check a data pipeline runs per partition before
    * accepting a batch.
    *
    * Scale (round-16, guide §2.3 "aggregate before you shuffle" / §2.4):
    * the input is reduced ONCE to its (grp, v, f) value histogram — the
    * sufficient statistic for every downstream step — and the median,
    * the deviation histogram, the MAD and the outlier counts all derive
    * from that persisted frame. The previous shape re-joined the RAW
    * rows against the medians and re-scanned the base input four times
    * (median pass, dev build, MAD pass, final aggregate: 4 parquet scans
    * in the physical plan); now the base input is scanned exactly once
    * and everything after the first partial-aggregated shuffle is
    * O(distinct values), never O(rows). The ≤|groups|-row result is
    * collected and rebuilt as a local frame so the histogram persist can
    * be dropped before returning (no storage pinned on the session —
    * round-12 leak discipline). */
  /** Median/MAD outlier audit of any integer (grp, v) frame — the
    * library entry point ([[graft.api.GraftApi.madOutliers]]). */
  private[graft] def madOutliersOf(li: DataFrame): DataFrame = {
    // Everything below is WINDOW functions over the one partitioning the
    // problem has (grp), so the whole audit is a single linear plan:
    // scan → partial-agg histogram exchange → grp exchange → two in-
    // partition sorts (by v, then by dv) → final hash-agg. No joins, no
    // broadcasts, no persist. med = smallest v whose running frequency
    // reaches ceil(0.5·n) (identical double math to
    // ScaleOps.exactPercentilesOf); the running sum over ties uses
    // Spark's default RANGE frame, so equal dv values share one
    // cumulative — exactly the value-histogram cf. Null groups are
    // excluded up front, matching the old shape where the med/mad inner
    // joins dropped them. Per-group state is value-domain-bounded
    // (distinct cents), never O(rows), so the 3-task window stage at
    // local[32] is a property of |groups|, not a scale hazard.
    val wg = Window.partitionBy("grp")
    val target = ceil(lit(0.5d) * col("n"))
    val step = li
      .filter(col("grp").isNotNull)
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("f"))
      .withColumn("cf", sum("f").over(wg.orderBy("v")))
      .withColumn("n", sum("f").over(wg))
      .withColumn("med", min(when(col("cf") >= target, col("v"))).over(wg))
      .withColumn("dv", abs(col("v") - col("med")))
      .withColumn("cfd", sum("f").over(wg.orderBy("dv")))
      .withColumn("mad", min(when(col("cfd") >= target, col("dv"))).over(wg))
    step
      .groupBy(col("grp"), col("med"), col("mad"))
      .agg(sum(col("f")).as("n"),
        sum(when(col("dv") > col("mad") * 3, col("f")).otherwise(0L)).as("n_out"))
      .select(col("grp"), col("med").as("med_c"),
        col("mad").as("mad_c"), col("n"), col("n_out"),
        expr("n_out * 10000 div greatest(n, 1)").as("out_bp"))
  }

  val dq2: Q = (s, d) =>
    madOutliersOf(Tables.lineitem(s, d)
        .select(col("l_returnflag").as("grp"), Money.cents(col("l_extendedprice")).as("v")))
      .withColumnRenamed("grp", "l_returnflag")
      .orderBy("l_returnflag")
  /** The dq2 MAD chain over an arbitrary `li(grp, v)` CTE body — shared
    * with emb9 so both oracles replay the identical machinery. */
  private[graft] def madSqlOver(liBody: String, grpOut: String): String =
    s"""WITH $liBody,
       |freq AS MATERIALIZED (SELECT grp, v, count(*) AS f FROM li GROUP BY grp, v),
       |cum AS (
       |  SELECT grp, v, CAST(sum(f) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cf,
       |         CAST(sum(f) OVER (PARTITION BY grp) AS BIGINT) AS n
       |  FROM freq),
       |med AS MATERIALIZED (
       |  SELECT grp, min(v) AS med FROM cum WHERE cf >= ceil(0.5 * n) GROUP BY grp),
       |dev AS MATERIALIZED (
       |  SELECT li.grp, abs(li.v - med.med) AS dv, med.med AS med
       |  FROM li JOIN med ON med.grp = li.grp),
       |dfreq AS (SELECT grp, dv, count(*) AS f FROM dev GROUP BY grp, dv),
       |dcum AS (
       |  SELECT grp, dv, CAST(sum(f) OVER (PARTITION BY grp ORDER BY dv) AS BIGINT) AS cf,
       |         CAST(sum(f) OVER (PARTITION BY grp) AS BIGINT) AS n
       |  FROM dfreq),
       |mad AS MATERIALIZED (
       |  SELECT grp, min(dv) AS mad FROM dcum WHERE cf >= ceil(0.5 * n) GROUP BY grp)
       |SELECT d.grp AS $grpOut, any_value(d.med) AS med_c, any_value(m.mad) AS mad_c,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(CASE WHEN d.dv > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
       |       CAST(sum(CASE WHEN d.dv > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) * 10000
       |         // greatest(CAST(count(*) AS BIGINT), 1) AS out_bp
       |FROM dev d JOIN mad m ON m.grp = d.grp
       |GROUP BY d.grp ORDER BY $grpOut""".stripMargin

  val dq2Sql: String = madSqlOver(
    """li AS (
      |  SELECT l_returnflag AS grp, CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      |  FROM lineitem)""".stripMargin,
    "l_returnflag")

  // ---- STAT2: G-test of lang × source independence ----

  /** Per-cell G-test (likelihood-ratio) contributions for the lang ×
    * source contingency table: g = 2·o·ln(o·T/(r·c)) in rounded
    * micro-units — the corpus-balance audit that quantifies how far the
    * source mix skews per language (a balanced corpus has cells near 0).
    * Observed-only cells (o ≥ 1), so the ln argument is always positive;
    * the ln runs over identical integer operands in both engines and is
    * rounded once (the t14 PMI convention). Plan: one contingency
    * aggregate + two broadcast margin joins — a single scan at any
    * scale. */
  val stat2: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val o = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val r = docs.groupBy("lang").agg(count(lit(1)).as("r"))
    val c = docs.groupBy("source").agg(count(lit(1)).as("c"))
    val t = docs.agg(count(lit(1)).as("t"))
    o.join(broadcast(r), Seq("lang")).join(broadcast(c), Seq("source"))
      .crossJoin(broadcast(t))
      .select(col("lang"), col("source"), col("o"),
        expr("r * c div t").as("expected_floor"),
        expr("CAST(round(2.0 * CAST(o AS DOUBLE) * ln(CAST(o AS DOUBLE) * CAST(t AS DOUBLE)" +
          " / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))) * 1000000) AS BIGINT)").as("g_e6"))
      .orderBy("lang", "source")
  }
  val stat2Sql: String =
    """WITH o AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      |           FROM documents GROUP BY lang, source),
      |r AS (SELECT lang, CAST(count(*) AS BIGINT) AS r FROM documents GROUP BY lang),
      |c AS (SELECT source, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY source),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS t FROM documents)
      |SELECT o.lang, o.source, o.o,
      |       r.r * c.c // t.t AS expected_floor,
      |       CAST(round(2.0 * CAST(o.o AS DOUBLE) * ln(CAST(o.o AS DOUBLE) * CAST(t.t AS DOUBLE)
      |         / (CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE))) * 1000000) AS BIGINT) AS g_e6
      |FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t
      |ORDER BY lang, source""".stripMargin

  // ---- FS1: per-language keyness term selection ----

  /** FS1: the top-5 KEYNESS terms of every language — stat2's per-cell
    * G idiom applied to the (lang, term) document-contingency and turned
    * into a ranked feature-selection list (the classifier-feature /
    * corpus-characterization step: which words make `lang` look like
    * `lang`). Per (lang, term) over DISTINCT in-doc occurrence:
    * pmi_e6 = ln(a·T/(n_t·n_l)) rounded once (the t14 convention), and
    * keyness = a·pmi_e6 — the observed-cell log-likelihood term
    * 2·a·ln(O/E) up to the constant factor. The product is computed in
    * DECIMAL(38,0) and emitted as BIGINT: a ≤ 10¹¹ docs × |pmi| ≤
    * ln(10¹²)·10⁶ ≈ 2.8e7 stays under int64's 9.2e18 through the full
    * 100 TB design range. Positive-association terms only (keyness > 0);
    * ties break by term ascending.
    *
    * Scale: one distinct-token scan → one (term, lang) hash aggregate;
    * the term margin derives from that aggregate (no second scan) and
    * joins back SHUFFLE-side on the vocabulary frame (vocab-sized, not
    * corpus-sized); lang margins and T broadcast. The top-5 window
    * partitions |langs| ways over a vocab×langs frame. */
  private[graft] def keynessTermsOf(docs: DataFrame, topN: Int = 5): DataFrame = {
    val dl = docs
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
    val a = dl.groupBy("lang", "w").agg(count(lit(1)).as("a"))
    val nt = a.groupBy("w").agg(sum("a").as("n_t"))
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
    val t = docs.agg(count(lit(1)).as("t"))
    val scored = a.join(nt, Seq("w"))
      .join(broadcast(nl), Seq("lang")).crossJoin(broadcast(t))
      .withColumn("pmi_e6", expr(
        "CAST(round(ln(CAST(a AS DOUBLE) * CAST(t AS DOUBLE) / " +
          "(CAST(n_t AS DOUBLE) * CAST(n_l AS DOUBLE))) * 1000000) AS BIGINT)"))
      .withColumn("keyness", expr(
        "CAST(CAST(a AS DECIMAL(38,0)) * pmi_e6 AS BIGINT)"))
      .filter(col("keyness") > 0L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("keyness").desc, col("w").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= topN)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("w").as("term"),
        col("a"), col("n_t"), col("pmi_e6"), col("keyness"))
  }

  val fs1: Q = (s, d) =>
    keynessTermsOf(Tables.documents(s, d)).orderBy("lang", "rk")
  val fs1Sql: String =
    """WITH dl AS (
      |  SELECT DISTINCT doc_id, lang, w FROM (
      |    SELECT doc_id, lang, unnest(str_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0),
      |a AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS a FROM dl GROUP BY lang, w),
      |nt AS (SELECT w, CAST(sum(a) AS BIGINT) AS n_t FROM a GROUP BY w),
      |nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_l FROM documents GROUP BY lang),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS t FROM documents),
      |s AS (
      |  SELECT a.lang, a.w, a.a, nt.n_t,
      |         CAST(round(ln(CAST(a.a AS DOUBLE) * CAST(t.t AS DOUBLE) /
      |           (CAST(nt.n_t AS DOUBLE) * CAST(nl.n_l AS DOUBLE))) * 1000000) AS BIGINT) AS pmi_e6
      |  FROM a JOIN nt USING (w) JOIN nl USING (lang) CROSS JOIN t),
      |k AS (
      |  SELECT lang, w, a, n_t, pmi_e6,
      |         CAST(a::HUGEINT * pmi_e6 AS BIGINT) AS keyness
      |  FROM s WHERE a::HUGEINT * pmi_e6 > 0),
      |r AS (
      |  SELECT lang, w, a, n_t, pmi_e6, keyness,
      |         row_number() OVER (PARTITION BY lang ORDER BY keyness DESC, w) AS rk
      |  FROM k)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, w AS term, a, n_t, pmi_e6, keyness
      |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin

  // ---- FS2: Monroe "Fightin' Words" log-odds keyness ----

  /** FS2: word keyness between two corpus halves by log-odds with an
    * informative Dirichlet prior (Monroe, Colaresi & Quinn 2008) — THE
    * standard corpus-comparison statistic, fixing fs1/PMI's known bias
    * toward rare words: the prior (α_w = 1, α₀ = V) shrinks
    * low-evidence words toward no difference, and the z-score divides
    * each word's log-odds shift δ_w by its sampling noise
    * σ_w ≈ √(1/(y_aw+1) + 1/(y_bw+1)), so a word is "distinctive" only
    * when the evidence supports it. Split here: lang = 'en' vs the
    * rest; emits both tails (the 10 most en-leaning and 10 most
    * rest-leaning words).
    *
    * Exactness: δ_e6 is ONE four-ln double expression over exact token
    * counts, rounded once (the t14 convention); 1/σ is
    * floor(sqrt(ca·cb·10⁶ div (ca+cb))) over exact DECIMAL(38) integers
    * (the mix1 IEEE-sqrt convention), and z_e3 is the sign-split
    * integer product — every step identical in both engines.
    *
    * Scale: one exploded scan → one (word) hash aggregate carrying both
    * groups' counts (map-side combined); margins broadcast; the
    * two top-10 cuts run over the VOCAB-bounded scored frame (the fs1
    * window class). */
  private[graft] def logOddsKeynessOf(docs: DataFrame, isA: Column,
      topN: Int = 10): DataFrame = {
    val toks = docs
      .select(isA.cast("int").as("in_a"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = toks.groupBy("w").agg(
      sum(col("in_a").cast("long")).as("ya"),
      sum((lit(1) - col("in_a")).cast("long")).as("yb"))
    val margins = counts.agg(sum("ya").as("na"), sum("yb").as("nb"),
      count(lit(1)).as("v"))
    val scored = counts.crossJoin(broadcast(margins))
      .withColumn("ca", expr("ya + 1"))
      .withColumn("cb", expr("yb + 1"))
      .withColumn("delta_e6", expr(
        "CAST(round((ln(CAST(ca AS DOUBLE)) - ln(CAST(na + v - ca AS DOUBLE)) " +
          "- ln(CAST(cb AS DOUBLE)) + ln(CAST(nb + v - cb AS DOUBLE))) * 1000000) AS BIGINT)"))
      .withColumn("s_e3", expr(
        "CAST(floor(sqrt(CAST(CAST(ca AS DECIMAL(38,0)) * cb * 1000000 " +
          "div (CAST(ca AS DECIMAL(38,0)) + cb) AS DOUBLE))) AS BIGINT)"))
      .withColumn("z_e3", expr(
        "CASE WHEN delta_e6 >= 0 THEN delta_e6 * s_e3 div 1000000 " +
          "ELSE -((-delta_e6) * s_e3 div 1000000) END"))
      .select("w", "ya", "yb", "delta_e6", "z_e3")
    val aSide = scored.orderBy(col("z_e3").desc, col("w").asc).limit(topN)
      .withColumn("side", lit("a"))
    val bSide = scored.orderBy(col("z_e3").asc, col("w").asc).limit(topN)
      .withColumn("side", lit("b"))
    aSide.unionAll(bSide)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("side")
          .orderBy(when(col("side") === "a", -col("z_e3")).otherwise(col("z_e3")), col("w"))).cast("long"))
      .select("side", "rk", "w", "ya", "yb", "delta_e6", "z_e3")
      .orderBy("side", "rk")
  }

  val fs2: Q = (s, d) =>
    logOddsKeynessOf(Tables.documents(s, d), col("lang") === "en")
  val fs2Sql: String =
    """WITH toks AS (
      |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS in_a,
      |         unnest(str_split(text, ' ')) AS w
      |  FROM documents),
      |c AS (
      |  SELECT w, CAST(sum(in_a) AS BIGINT) AS ya,
      |         CAST(sum(1 - in_a) AS BIGINT) AS yb
      |  FROM toks WHERE len(w) > 0 GROUP BY w),
      |m AS (SELECT CAST(sum(ya) AS BIGINT) AS na, CAST(sum(yb) AS BIGINT) AS nb,
      |             CAST(count(*) AS BIGINT) AS v FROM c),
      |sc AS (
      |  SELECT w, ya, yb,
      |         CAST(round((ln(CAST(ya + 1 AS DOUBLE)) - ln(CAST(na + v - ya - 1 AS DOUBLE))
      |           - ln(CAST(yb + 1 AS DOUBLE)) + ln(CAST(nb + v - yb - 1 AS DOUBLE))) * 1000000) AS BIGINT) AS delta_e6,
      |         CAST(floor(sqrt(CAST(CAST(ya + 1 AS HUGEINT) * (yb + 1) * 1000000
      |           // (CAST(ya + 1 AS HUGEINT) + yb + 1) AS DOUBLE))) AS BIGINT) AS s_e3
      |  FROM c CROSS JOIN m),
      |z AS (
      |  SELECT w, ya, yb, delta_e6,
      |         CASE WHEN delta_e6 >= 0 THEN delta_e6 * s_e3 // 1000000
      |              ELSE -((-delta_e6) * s_e3 // 1000000) END AS z_e3
      |  FROM sc),
      |aa AS (
      |  SELECT 'a' AS side, CAST(row_number() OVER (ORDER BY z_e3 DESC, w) AS BIGINT) AS rk,
      |         w, ya, yb, delta_e6, z_e3
      |  FROM z ORDER BY z_e3 DESC, w LIMIT 10),
      |bb AS (
      |  SELECT 'b' AS side, CAST(row_number() OVER (ORDER BY z_e3 ASC, w) AS BIGINT) AS rk,
      |         w, ya, yb, delta_e6, z_e3
      |  FROM z ORDER BY z_e3 ASC, w LIMIT 10)
      |SELECT * FROM aa UNION ALL SELECT * FROM bb ORDER BY side, rk""".stripMargin

  // ---- PREF3: best-of-n scaling curve (rejection-sampling payoff) ----

  /** Expected best-of-n reward curve — the rejection-sampling (BoN)
    * payoff plot: for each prompt, samples are drawn in a DETERMINISTIC
    * pseudo-random order (salted-md5 of the sample id — the engine's
    * reproducible-shuffle convention), and for n ∈ {1, 2, 4, 8} the
    * curve reports how many prompts have ≥ n samples and the exact
    * average of max(reward over the first n draws). The gap between
    * consecutive rows is the marginal value of one more sample — the
    * statistic that sizes a BoN inference budget or a rejection-sampling
    * data-generation pass. The library entry point
    * ([[graft.api.GraftApi.bestOfNCurve]]).
    *
    * Exactness: rewards are exact cents; the running max over a
    * deterministic order is engine-independent; the average is integer
    * division TRUNCATING TOWARD ZERO — Spark's `div` and DuckDB's `//`
    * both truncate on integers ((-7) div 2 = (-7)//2 = -3, verified on
    * DuckDB 1.0.0), so the two engines agree on the full signed domain
    * with no correction. (Round 14 briefly shipped a floor-correction
    * CASE on the premise that DuckDB floors; that premise was wrong and
    * the CASE itself caused the only divergence — reverted.)
    *
    * Scale: ONE window partitioned by prompt — per-prompt state, never a
    * global sort; the post-filter keeps ≤ |ns| rows per prompt, so the
    * final aggregate is tiny. At 100 TB the shuffle key is the prompt
    * id, the natural partitioning of any sampled-generations table. */
  private[graft] def bestOfNCurveOf(samples: DataFrame,
      ns: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    val w = Window.partitionBy("prompt_id").orderBy(col("draw"), col("sample_id"))
    samples
      .withColumn("draw", md5(concat(lit("bon:"), col("sample_id").cast("string"))))
      .withColumn("rn", row_number().over(w))
      .withColumn("best_c", max(col("reward_c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rn").isin(ns.map(Integer.valueOf): _*))
      .groupBy(col("rn").cast("long").as("n"))
      .agg(count(lit(1)).as("n_prompts"), sum("best_c").as("sum_best_c"))
      // trunc-toward-zero on both engines (Spark div == DuckDB //)
      .withColumn("avg_best_c", expr("sum_best_c div n_prompts"))
      .orderBy("n")
  }

  /** Registry fixture: users as prompts, their events as samples, value
    * cents as the reward. */
  val pref3: Q = (s, d) =>
    bestOfNCurveOf(Tables.events(s, d).select(
      col("user_id").as("prompt_id"), col("event_id").as("sample_id"),
      Money.cents(col("value")).as("reward_c")))
  val pref3Sql: String =
    s"""WITH s AS (
       |  SELECT user_id AS prompt_id, event_id AS sample_id,
       |         ${Money.centsSql("value")} AS reward_c
       |  FROM events),
       |r AS (
       |  SELECT prompt_id, reward_c,
       |         row_number() OVER (PARTITION BY prompt_id
       |           ORDER BY md5('bon:' || sample_id::VARCHAR), sample_id) AS rn,
       |         max(reward_c) OVER (PARTITION BY prompt_id
       |           ORDER BY md5('bon:' || sample_id::VARCHAR), sample_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best_c
       |  FROM s)
       |SELECT CAST(rn AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_prompts,
       |       CAST(sum(best_c) AS BIGINT) AS sum_best_c,
       |       CAST(sum(best_c) // count(*) AS BIGINT) AS avg_best_c
       |FROM r WHERE rn IN (1, 2, 4, 8) GROUP BY rn ORDER BY n""".stripMargin

  // ---- MARKOV2: stationary distribution of the behavior chain ----

  /** MARKOV2: the chain's stationary distribution — three exact-integer
    * power-iteration steps of π′ = πP over markov1's bp-normalized
    * transition matrix, started uniform at 10⁶ per state. The
    * equilibrium occupancy share is the "where do users end up" summary that
    * complements markov1's local step probabilities (and the sampling
    * weight a trajectory generator draws start states from). States
    * with no outgoing transitions absorb only what one step hands them
    * (their row is missing from P — mass entering them leaves the
    * system), and each step loses ≤ |states| millionths to bp/div
    * truncation: both are part of the integer contract the oracle
    * replays exactly.
    *
    * Scale: after markov1's one corpus shuffle, every iteration runs on
    * the |types|²-bounded matrix joined to the |types|-row π — constant
    * work regardless of corpus size; pi·p_bp ≤ |states|·10¹⁰ stays in
    * int64 for any realistic event alphabet. Library entry point:
    * [[graft.api.GraftApi.markovStationary]]. */
  private[graft] def markovStationaryOf(events: DataFrame, iters: Int = 3): DataFrame = {
    val m = markovTransitionsOf(events)
      .select(col("cur_type"), col("nxt_type"), col("p_bp"))
    val states = m.select(col("cur_type").as("state"))
      .unionAll(m.select(col("nxt_type").as("state"))).distinct()
    var pi = states.select(col("state"), lit(1000000L).as("pi"))
    for (_ <- 1 to iters) {
      val flowed = m.join(pi, m("cur_type") === pi("state"))
        .groupBy(col("nxt_type").as("state2"))
        .agg(expr("CAST(sum(pi * p_bp) div 10000 AS BIGINT)").as("pin"))
      pi = states.join(flowed, states("state") === flowed("state2"), "left")
        .select(col("state"), coalesce(col("pin"), lit(0L)).as("pi"))
    }
    pi.select(col("state"), col("pi").as("pi_e6"))
  }

  val markov2: Q = (s, d) =>
    markovStationaryOf(Tables.events(s, d)).orderBy("state")
  val markov2Sql: String = {
    def step(n: Int): String =
      s"""p$n AS (
         |  SELECT st.state, CAST(coalesce(f.pin, 0) AS BIGINT) AS pi
         |  FROM st LEFT JOIN (
         |    SELECT m.nxt_type AS state, CAST(sum(p${n - 1}.pi * m.p_bp) // 10000 AS BIGINT) AS pin
         |    FROM m JOIN p${n - 1} ON p${n - 1}.state = m.cur_type
         |    GROUP BY m.nxt_type) f USING (state))""".stripMargin
    s"""WITH s AS (
       |  SELECT event_type AS cur_type,
       |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_type
       |  FROM events),
       |c AS (
       |  SELECT cur_type, nxt_type, CAST(count(*) AS BIGINT) AS c
       |  FROM s WHERE nxt_type IS NOT NULL GROUP BY cur_type, nxt_type),
       |m AS (
       |  SELECT cur_type, nxt_type,
       |         c * 10000 // CAST(sum(c) OVER (PARTITION BY cur_type) AS BIGINT) AS p_bp
       |  FROM c),
       |st AS (SELECT cur_type AS state FROM m UNION SELECT nxt_type FROM m),
       |p0 AS (SELECT state, CAST(1000000 AS BIGINT) AS pi FROM st),
       |${step(1)},
       |${step(2)},
       |${step(3)}
       |SELECT state, pi AS pi_e6 FROM p3 ORDER BY state""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "markov2_stationary" -> markov2,
    "pref3_best_of_n" -> pref3,
    "fs2_log_odds_keyness" -> fs2,
    "fs1_term_keyness" -> fs1,
    "stat2_gtest_independence" -> stat2,
    "cur1_curriculum_order" -> cur1,
    "pref1_pairwise_winrate" -> pref1,
    "pref2_bradley_terry" -> pref2,
    "priv1_k_anonymity" -> priv1,
    "priv2_l_diversity" -> priv2,
    "priv3_randomized_response" -> priv3,
    "priv4_laplace_counts" -> priv4,
    "priv5_t_closeness" -> priv5,
    "traj1_session_paths" -> traj1,
    "markov1_transition_matrix" -> markov1,
    "dq2_mad_outliers" -> dq2,
  )

  val oracle: Map[String, String] = Map(
    "markov2_stationary" -> markov2Sql,
    "pref3_best_of_n" -> pref3Sql,
    "fs2_log_odds_keyness" -> fs2Sql,
    "fs1_term_keyness" -> fs1Sql,
    "stat2_gtest_independence" -> stat2Sql,
    "cur1_curriculum_order" -> cur1Sql,
    "pref1_pairwise_winrate" -> pref1Sql,
    "pref2_bradley_terry" -> pref2Sql,
    "priv1_k_anonymity" -> priv1Sql,
    "priv2_l_diversity" -> priv2Sql,
    "priv3_randomized_response" -> priv3Sql,
    "priv4_laplace_counts" -> priv4Sql,
    "priv5_t_closeness" -> priv5Sql,
    "traj1_session_paths" -> traj1Sql,
    "markov1_transition_matrix" -> markov1Sql,
    "dq2_mad_outliers" -> dq2Sql,
  )
}
