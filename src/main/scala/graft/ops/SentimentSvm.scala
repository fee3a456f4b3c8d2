package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hand-rolled linear-SVM reproduced as declarative DataFrame queries —
  * SURVEY §2.4 F4, §2.5 A3/A4/A6, §2.6 J2, §2.10 M7/M8.
  *
  * Reference semantics (`Hadoop/SVM/SVM.java`): Pegasos-style SGD with
  * `eta_e = 0.1/(1 + e*0.01)` (SVM.java:49). Due to the epoch-path
  * off-by-one (SVM.java:50 reads `model_epoch_e`, which the loop hasn't
  * written yet), every epoch restarts from zero weights; with w=0 every
  * sample has margin 0 < 1, the L2-shrink term is 0, and the epoch's model
  * is exactly `eta_e · Σ label` per token occurrence. The tested model is
  * `model_epoch_5` (SVM.java:115) ⇒ weight(w) = (0.1/1.05) · m(w) where
  * m(w) = Σ(±1 labels) over the word's train occurrences (A3 gradient sum).
  * Scoring (M8, SVM.java:139-150): per-doc Σ weights (F4 sparse dot via the
  * broadcast-weights lookup J2, missing word ⇒ 0), `score >= 0 → POSITIVE`.
  *
  * Exactness: weights are `eta · m` with integer m, so we carry `m` (BIGINT)
  * through the per-doc aggregation and multiply by eta only at the end —
  * every predicate compares exact integers and the emitted doubles are the
  * same single multiplication in both engines. No rounding tolerance needed.
  *
  * Scale: weights table is the only small side → `broadcast()`; everything
  * else stays partition-parallel with map-side partial aggregation.
  */
object SentimentSvm {
  type Q = (SparkSession, String) => DataFrame

  private def eta(epoch: Int): Double = 0.1 / (1.0 + epoch * 0.01)
  private def etaSql(epoch: Int): String =
    s"(CAST(0.1 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + $epoch * CAST(0.01 AS DOUBLE)))"

  // =====================================================================
  //  A3/M7 — per-word gradient sum → epoch-5 weights
  // =====================================================================

  /** (word, m, weight): m = Σ(±1) over train occurrences; weight = eta_5·m. */
  def weights(s: SparkSession, d: String): DataFrame =
    Corpus.tokensSvm(s, d).filter(col("is_train"))
      .groupBy("word")
      .agg(sum(col("label").cast("long")).as("m"))
      .select(col("word"), col("m"), (lit(eta(5)) * col("m")).as("weight"))

  private val weightsBody: String =
    s"""weights AS (
       |  SELECT word, CAST(sum(label) AS BIGINT) AS m,
       |         ${etaSql(5)} * CAST(sum(label) AS BIGINT) AS weight
       |  FROM tokens WHERE is_train GROUP BY word)""".stripMargin

  /** CTE chain `cleaned → tokens → weights` (SVM dialect). */
  val weightsCte: String = s"${Corpus.tokensSvmCte},\n$weightsBody"

  val m7: Q = (s, d) => weights(s, d).orderBy("word")
  val m7Sql: String =
    s"""WITH $weightsCte
       |SELECT word, m, weight FROM weights ORDER BY word""".stripMargin

  /** A3 standalone: epoch-1 gradient sums (eta_1 = 0.1/1.01), the reduce of
    * SVM.java:99-106 for the first epoch. */
  val a3: Q = (s, d) =>
    Corpus.tokensSvm(s, d).filter(col("is_train"))
      .groupBy("word")
      .agg(sum(col("label").cast("long")).as("msum"))
      .select(col("word"), (lit(eta(1)) * col("msum")).as("grad"))
      .orderBy("word")
  val a3Sql: String =
    s"""WITH ${Corpus.tokensSvmCte}
       |SELECT word, ${etaSql(1)} * CAST(sum(label) AS BIGINT) AS grad
       |FROM tokens WHERE is_train GROUP BY word ORDER BY word""".stripMargin

  // =====================================================================
  //  J2/F4 — broadcast weight lookup + sparse dot product
  // =====================================================================

  /** Per-doc dot product over the test split: left join (missing word → 0,
    * the `getOrDefault` of SVM.java:83) then Σ; dot = eta_5 · Σm (exact).
    * The cleaned corpus is persisted for the query (the scoredDf
    * round-16 note): the train-side weights and the test-side probe
    * both tokenize from the cache instead of re-running the regexp
    * cleaning chain. */
  val f4: Q = (s, d) => {
    val cleaned = Corpus.cleanedSvm(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = Corpus.tokensFromCleaned(cleaned)
    val wts = toks.filter(col("is_train"))
      .groupBy("word")
      .agg(sum(col("label").cast("long")).as("m"))
      .select(col("word"), col("m"), (lit(eta(5)) * col("m")).as("weight"))
    toks.filter(!col("is_train"))
      .join(broadcast(wts), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("m"), lit(0L))).as("msum"), count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("msum"), col("n_tokens"),
        (lit(eta(5)) * col("msum")).as("dot"))
      .orderBy("doc_id")
  }
  val f4Sql: String =
    s"""WITH $weightsCte
       |SELECT t.doc_id, CAST(sum(coalesce(w.m, 0)) AS BIGINT) AS msum,
       |       CAST(count(*) AS BIGINT) AS n_tokens,
       |       ${etaSql(5)} * CAST(sum(coalesce(w.m, 0)) AS BIGINT) AS dot
       |FROM tokens t LEFT JOIN weights w USING (word)
       |WHERE NOT t.is_train GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // =====================================================================
  //  M8 — scoring + A4/A6 metrics (±1 label convention)
  // =====================================================================

  /** Internal: (doc_id, label ±1, prediction ±1) over the test split.
    * Empty/unmatched docs get msum 0 → `>= 0` → POSITIVE (SVM.java:150).
    * Round-16: the cleaned corpus is PERSISTED for the query — the
    * regexp cleaning used to re-run 3× (weights train pass, test probe,
    * final test projection); see the NB scoredDf note (same contract:
    * doc-level cache, MEMORY_AND_DISK, released by the harness's
    * between-entry sweep; per-doc sums are row-local so results are
    * bit-identical). */
  private def scoredDf(s: SparkSession, d: String): DataFrame = {
    val cleaned = Corpus.cleanedSvm(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = Corpus.tokensFromCleaned(cleaned)
    val wts = toks.filter(col("is_train"))
      .groupBy("word")
      .agg(sum(col("label").cast("long")).as("m"))
      .select(col("word"), col("m"), (lit(eta(5)) * col("m")).as("weight"))
    val perDoc = toks.filter(!col("is_train"))
      .join(broadcast(wts), "word")
      .groupBy("doc_id").agg(sum(col("m")).as("msum"))
    cleaned.filter(!col("is_train"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("label"),
        when(coalesce(col("msum"), lit(0L)) >= 0, 1).otherwise(-1).as("prediction"))
  }

  private val scoredCte: String =
    s"""$weightsCte,
       |perdoc AS (
       |  SELECT t.doc_id, CAST(sum(w.m) AS BIGINT) AS msum
       |  FROM tokens t JOIN weights w USING (word)
       |  WHERE NOT t.is_train GROUP BY t.doc_id),
       |scored AS (
       |  SELECT c.doc_id, c.label,
       |         CASE WHEN coalesce(p.msum, 0) >= 0 THEN 1 ELSE -1 END AS prediction
       |  FROM cleaned c LEFT JOIN perdoc p USING (doc_id)
       |  WHERE NOT c.is_train)""".stripMargin

  val m8: Q = (s, d) => scoredDf(s, d).orderBy("doc_id")
  val m8Sql: String =
    s"""WITH $scoredCte
       |SELECT doc_id, label, prediction FROM scored ORDER BY doc_id""".stripMargin

  val a4: Q = (s, d) =>
    scoredDf(s, d).groupBy("prediction", "label").agg(count(lit(1)).as("n"))
      .orderBy("prediction", "label")
  val a4Sql: String =
    s"""WITH $scoredCte
       |SELECT prediction, label, CAST(count(*) AS BIGINT) AS n
       |FROM scored GROUP BY prediction, label ORDER BY prediction, label""".stripMargin

  val a6: Q = (s, d) =>
    scoredDf(s, d).agg(
      sum(when(col("prediction") === 1 && col("label") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("prediction") === 1 && col("label") === -1, 1L).otherwise(0L)).as("fp"),
      sum(when(col("prediction") === -1 && col("label") === -1, 1L).otherwise(0L)).as("tn"),
      sum(when(col("prediction") === -1 && col("label") === 1, 1L).otherwise(0L)).as("fn"))
    .select(col("tp"), col("fp"), col("tn"), col("fn"),
      round((col("tp") + col("tn")) / nullif(col("tp") + col("fp") + col("tn") + col("fn"), lit(0L)), 6).as("accuracy"),
      round(col("tp") / nullif(col("tp") + col("fp"), lit(0L)), 6).as("precision"),
      round(col("tp") / nullif(col("tp") + col("fn"), lit(0L)), 6).as("recall"),
      round((lit(2L) * col("tp")) / nullif(lit(2L) * col("tp") + col("fp") + col("fn"), lit(0L)), 6).as("f1"))
  val a6Sql: String =
    s"""WITH $scoredCte,
       |cm AS (
       |  SELECT CAST(sum(CASE WHEN prediction = 1 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |         CAST(sum(CASE WHEN prediction = 1 AND label = -1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |         CAST(sum(CASE WHEN prediction = -1 AND label = -1 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |         CAST(sum(CASE WHEN prediction = -1 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM scored)
       |SELECT tp, fp, tn, fn,
       |       round((tp + tn) / nullif(tp + fp + tn + fn, 0), 6) AS accuracy,
       |       round(tp / nullif(tp + fp, 0), 6) AS precision,
       |       round(tp / nullif(tp + fn, 0), 6) AS recall,
       |       round((2 * tp) / nullif(2 * tp + fp + fn, 0), 6) AS f1
       |FROM cm""".stripMargin

  // =====================================================================
  //  registry
  // =====================================================================

  val queries: Map[String, Q] = Map(
    "m7_svm_weights" -> m7,
    "a3_gradient_sum" -> a3,
    "f4_dot_product" -> f4,
    "j2_weight_lookup" -> f4, // J2 is the left-join+coalesce inside F4
    "m8_svm_score" -> m8,
    "a4_svm_confusion" -> a4,
    "a6_svm_metrics" -> a6,
  )

  val oracle: Map[String, String] = Map(
    "m7_svm_weights" -> m7Sql,
    "a3_gradient_sum" -> a3Sql,
    "f4_dot_product" -> f4Sql,
    "j2_weight_lookup" -> f4Sql,
    "m8_svm_score" -> m8Sql,
    "a4_svm_confusion" -> a4Sql,
    "a6_svm_metrics" -> a6Sql,
  )
}
