package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps

/** Shared corpus conventions for the sentiment-pipeline queries over the
  * synthetic `documents` table (FIXTURES.md §2).
  *
  * The reference's corpus is labeled tweets (Sentiment140); the synthetic
  * fixture has no sentiment column, so the pipeline queries adopt a
  * deterministic, DuckDB-reproducible convention:
  *   - label     := 1.0 when `lang = 'en'` else 0.0  (binary, like P10)
  *   - train/test:= doc_id % 4 != 0 → train (75 %), else test (25 %) —
  *     mirrors the reference's 75/25 contract (`reference/README.md:17`)
  *     but deterministic so the DuckDB oracle can reproduce membership
  *     (the engine-RNG `randomSplit` variant is exercised separately, R1).
  */
object Corpus {
  // ---- Spark side ----
  def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  val label: Column   = when(col("lang") === "en", 1.0).otherwise(0.0)
  val isTrain: Column = col("doc_id") % 4 =!= 0

  /** (doc_id, label, is_train, clean) with the NB-dialect cleaner. */
  def cleanedNb(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"), label.as("label"), isTrain.as("is_train"),
      TextOps.cleanNb(col("text")).as("clean"))

  /** (doc_id, label, is_train, clean) with the SVM-dialect cleaner;
    * label is ±1 per the SVM convention (`SVM.java:75`). */
  def cleanedSvm(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"),
      when(col("lang") === "en", 1).otherwise(-1).as("label"),
      isTrain.as("is_train"),
      TextOps.cleanSvm(col("text")).as("clean"))

  /** One row per token occurrence: (doc_id, label, is_train, word).
    * T1 semantics: split on single space (`NB.java:92`). */
  def tokensNb(s: SparkSession, d: String): DataFrame =
    tokensFromCleaned(cleanedNb(s, d))

  /** Token derivation over an already-built cleaned frame — split out
    * (round 16) so a scoring pipeline that PERSISTS the cleaned frame
    * can tokenize from the cache instead of re-running the regexp
    * cleaning chain per consumer. */
  def tokensFromCleaned(cleaned: DataFrame): DataFrame =
    cleaned
      .filter(length(trim(col("clean"))) > 0) // P3 empty-text guard
      .select(col("doc_id"), col("label"), col("is_train"),
        explode(TextOps.tokenizeSpace(col("clean"))).as("word"))

  def tokensSvm(s: SparkSession, d: String): DataFrame =
    cleanedSvm(s, d)
      .filter(length(trim(col("clean"))) > 0)
      .select(col("doc_id"), col("label"), col("is_train"),
        explode(TextOps.tokenizeSpace(col("clean"))).as("word"))

  // ---- DuckDB-oracle side (same conventions as SQL fragments) ----
  val labelSql   = "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END"
  val isTrainSql = "doc_id % 4 <> 0"

  /** CTE text: cleaned docs (NB dialect) as `cleaned(doc_id, label, is_train, clean)`. */
  val cleanedNbCte: String =
    s"""cleaned AS (
       |  SELECT doc_id, $labelSql AS label, $isTrainSql AS is_train,
       |         ${TextOps.cleanNbSql("text")} AS clean
       |  FROM documents)""".stripMargin

  val cleanedSvmCte: String =
    s"""cleaned AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS label,
       |         $isTrainSql AS is_train, ${TextOps.cleanSvmSql("text")} AS clean
       |  FROM documents)""".stripMargin

  /** CTE: one row per token occurrence `tokens(doc_id, label, is_train, word)`. */
  val tokensNbCte: String =
    s"""$cleanedNbCte,
       |tokens AS (
       |  SELECT doc_id, label, is_train, unnest(str_split(clean, ' ')) AS word
       |  FROM cleaned WHERE length(trim(clean)) > 0)""".stripMargin

  val tokensSvmCte: String =
    s"""$cleanedSvmCte,
       |tokens AS (
       |  SELECT doc_id, label, is_train, unnest(str_split(clean, ' ')) AS word
       |  FROM cleaned WHERE length(trim(clean)) > 0)""".stripMargin
}
