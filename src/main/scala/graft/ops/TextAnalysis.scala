package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] Text-analysis operators for training-data pipelines (SURVEY §7.8):
  * dictionary language-ID, quality scoring, token counting, and document
  * fingerprinting. Not derived from the reference.
  *
  * All scores are exact integers (basis points via integer division) and
  * the fingerprint is a 31-bit rolling polynomial hash seeded from md5 —
  * every query is bit-exact against the DuckDB oracle.
  *
  * Scale: per-doc map-side expressions + one hash aggregate each; the
  * language-ID join broadcasts a constant dictionary.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  /** Tiny deterministic word→language dictionary (shared by Spark + SQL). */
  private val LangDict: Seq[(String, String)] = Seq(
    "the" -> "en", "a" -> "en", "data" -> "en",
    "join" -> "fr", "merge" -> "fr",
    "fast" -> "de", "hash" -> "de",
    "table" -> "es", "sort" -> "es",
    "scan" -> "zh", "stream" -> "zh")

  private val StopWords: Seq[String] =
    Seq("the", "a", "data", "value", "row")

  private def dictDf(s: SparkSession): DataFrame = {
    val sp = s
    import sp.implicits._
    LangDict.toDF("word", "dlang")
  }
  private val dictSql: String =
    LangDict.map { case (w, l) => s"('$w', '$l')" }.mkString("(VALUES ", ", ", ") AS dict(word, dlang)")

  private[ops] val stopListSql: String = StopWords.map(w => s"'$w'").mkString("(", ", ", ")")

  // ---- T4: language identification (dictionary-hit argmax) ----

  /** Dictionary language-ID over any (doc_id, text) frame: per-doc argmax
    * of word hits against a broadcast (word → lang) dictionary, 'und' when
    * nothing hits — the library entry point
    * ([[graft.api.GraftApi.languageId]]). */
  private[graft] def languageIdOf(
      docs: DataFrame, dict: Seq[(String, String)] = LangDict): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val hits = toks.join(broadcast(dict.toDF("word", "dlang")), "word")
      .groupBy("doc_id", "dlang").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(col("n").desc, col("dlang"))
    val best = hits.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("doc_id"), col("dlang"), col("n").as("n_hits"))
    docs.select("doc_id").join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dlang"), lit("und")).as("lang_pred"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  val t4: Q = (s, d) =>
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .join(languageIdOf(Tables.documents(s, d).select("doc_id", "text")), Seq("doc_id"))
      .select("doc_id", "lang", "lang_pred", "n_hits")
      .orderBy("doc_id")
  val t4Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
       |hits AS (
       |  SELECT t.doc_id, dict.dlang, CAST(count(*) AS BIGINT) AS n
       |  FROM toks t JOIN $dictSql ON t.word = dict.word
       |  GROUP BY t.doc_id, dict.dlang),
       |best AS (
       |  SELECT doc_id, dlang, n AS n_hits FROM (
       |    SELECT doc_id, dlang, n,
       |           row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, dlang) AS rk
       |    FROM hits)
       |  WHERE rk = 1)
       |SELECT doc.doc_id, doc.lang,
       |       coalesce(b.dlang, 'und') AS lang_pred,
       |       coalesce(b.n_hits, 0) AS n_hits
       |FROM documents doc LEFT JOIN best b ON doc.doc_id = b.doc_id
       |ORDER BY doc.doc_id""".stripMargin

  // ---- T5: quality scoring (length / word-shape / stopword ratios) ----

  /** Quality columns appended to any (…, text, n_chars) frame as a PURE
    * PROJECTION — no explode, no aggregation, no join (round-16, guide
    * §2.4 "remove shuffles outright"): the stopword count is
    * `size(filter(split(text), w -> w IN stoplist))` over the 5-word
    * stoplist, which counts token OCCURRENCES exactly like the old
    * explode → filter → groupBy → join-back (and the 0-stopword doc needs
    * no coalesce — filter yields an empty array, size 0). Every quality
    * consumer (t5, pipe1-4/st32, cur1, pref1/pref2, eval/dq entries) now
    * pays one map over its input instead of two exchanges and a join. */
  private[graft] def withQuality(docs: DataFrame): DataFrame = {
    val stopList = StopWords.map(w => s"'$w'").mkString(", ")
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_alpha",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("long"))
      .withColumn("sum_tok_len",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(split(text, ' '), w -> w IN ($stopList))) AS BIGINT)"))
      .withColumn("mean_tok_len_x100", expr("sum_tok_len * 100 div n_tokens"))
      .withColumn("alpha_bp", expr("n_alpha * 10000 div greatest(n_chars, 1)"))
      .withColumn("stop_bp", expr("n_stop * 10000 div n_tokens"))
      .withColumn("quality",
        expr("(CASE WHEN n_tokens >= 20 THEN 2500 ELSE n_tokens * 125 END)" +
          " + alpha_bp div 4 + stop_bp div 4" +
          " + (CASE WHEN mean_tok_len_x100 BETWEEN 300 AND 800 THEN 2500 ELSE 0 END)"))
  }

  /** Integer quality scores over any (doc_id, text, n_chars) frame — the
    * library entry point ([[graft.api.GraftApi.qualityScore]]). */
  private[graft] def qualityScoreOf(docs: DataFrame): DataFrame =
    withQuality(docs).select(col("doc_id"), col("n_tokens"),
      col("mean_tok_len_x100"), col("alpha_bp"), col("stop_bp"), col("quality"))

  val t5: Q = (s, d) =>
    qualityScoreOf(Tables.documents(s, d)).orderBy("doc_id")
  val t5Sql: String =
    s"""WITH base AS (
       |  SELECT doc_id, n_chars,
       |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |         CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS sum_tok_len
       |  FROM documents),
       |stops AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_stop FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents)
       |  WHERE word IN $stopListSql GROUP BY doc_id),
       |m AS (
       |  SELECT b.doc_id, b.n_tokens,
       |         b.sum_tok_len * 100 // b.n_tokens AS mean_tok_len_x100,
       |         b.n_alpha * 10000 // greatest(b.n_chars, 1) AS alpha_bp,
       |         coalesce(s.n_stop, 0) * 10000 // b.n_tokens AS stop_bp
       |  FROM base b LEFT JOIN stops s ON b.doc_id = s.doc_id)
       |SELECT doc_id, n_tokens, mean_tok_len_x100, alpha_bp, stop_bp,
       |       (CASE WHEN n_tokens >= 20 THEN 2500 ELSE n_tokens * 125 END)
       |       + alpha_bp // 4 + stop_bp // 4
       |       + (CASE WHEN mean_tok_len_x100 BETWEEN 300 AND 800 THEN 2500 ELSE 0 END) AS quality
       |FROM m ORDER BY doc_id""".stripMargin

  /** t5's quality computation as a reusable CTE chain ending in
    * `qual(doc_id, quality)` — consumed by the Curation oracles (cur1,
    * pref1, pref2) so curriculum/preference SQL stays textually in sync
    * with the one quality definition. */
  private[ops] val qualityCte: String =
    s"""qbase AS (
       |  SELECT doc_id, n_chars,
       |         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |         CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS sum_tok_len
       |  FROM documents),
       |qstops AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_stop FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents)
       |  WHERE word IN $stopListSql GROUP BY doc_id),
       |qm AS (
       |  SELECT b.doc_id, b.n_tokens,
       |         b.sum_tok_len * 100 // b.n_tokens AS mean_tok_len_x100,
       |         b.n_alpha * 10000 // greatest(b.n_chars, 1) AS alpha_bp,
       |         coalesce(s.n_stop, 0) * 10000 // b.n_tokens AS stop_bp
       |  FROM qbase b LEFT JOIN qstops s ON b.doc_id = s.doc_id),
       |qual AS (
       |  SELECT doc_id,
       |         CAST((CASE WHEN n_tokens >= 20 THEN 2500 ELSE n_tokens * 125 END)
       |         + alpha_bp // 4 + stop_bp // 4
       |         + (CASE WHEN mean_tok_len_x100 BETWEEN 300 AND 800 THEN 2500 ELSE 0 END)
       |         AS BIGINT) AS quality
       |  FROM qm)""".stripMargin

  // ---- T6: token counting (whitespace, BPE-ish regex, chars/4 heuristic) ----

  private val BpeRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Token-count estimators over any (doc_id, text, n_chars) frame — the
    * library entry point ([[graft.api.GraftApi.tokenCounts]]). */
  private[graft] def tokenCountsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
      size(expr(s"regexp_extract_all(text, '${BpeRe.replace("\\", "\\\\")}', 0)")).cast("long").as("n_bpe_tokens"),
      expr("n_chars div 4").as("n_chars_div4"))

  val t6: Q = (s, d) =>
    tokenCountsOf(Tables.documents(s, d)).orderBy("doc_id")
  val t6Sql: String =
    s"""SELECT doc_id,
       |       CAST(len(str_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |       CAST(len(regexp_extract_all(text, '$BpeRe')) AS BIGINT) AS n_bpe_tokens,
       |       n_chars // 4 AS n_chars_div4
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- T7: document fingerprint (31-bit rolling polynomial hash) ----

  private val FpMod = 2147483647L // 2^31 - 1

  /** Order-sensitive rolling-hash fingerprints over any (doc_id, text)
    * frame — the library entry point ([[graft.api.GraftApi.fingerprints]]). */
  private[graft] def fingerprintsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr("aggregate(" +
        s"transform(split(text, ' '), w -> CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT) % $FpMod)," +
        s" 0L, (acc, v) -> (acc * 131 + v) % $FpMod)").as("fingerprint"))

  val t7: Q = (s, d) =>
    fingerprintsOf(Tables.documents(s, d)).orderBy("doc_id")
  val t7Sql: String =
    s"""SELECT doc_id,
       |       list_reduce(
       |         list_prepend(0, list_transform(str_split(text, ' '),
       |           w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % $FpMod)),
       |         (a, b) -> (a * 131 + b) % $FpMod) AS fingerprint
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- T9: PII detection + redaction ----

  /** RE2-compatible patterns (identical match semantics in Java regex and
    * DuckDB's RE2): ASCII classes only, no lookaround. */
  private val EmailRe = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Full PII redaction of a text column (email → [EMAIL], phone →
    * [PHONE], IPv4 → [IP]) — the library column transform
    * ([[graft.api.GraftApi.redactPii]]). */
  private[graft] def redactPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      IpRe, "[IP]")

  /** PII detector over any (doc_id, <textCol>) frame: per-pattern counts
    * plus the md5 of the redaction. Pure map-side projection. */
  private[graft] def piiStatsOf(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(col(textCol), lit(IpRe)).cast("long").as("n_ips"),
      md5(redactPii(col(textCol))).as("redacted_md5"))

  /** The fixture corpus is synthetic word soup with no natural PII, so the
    * query PLANTS deterministic spans (email / phone / IPv4 keyed on
    * doc_id % 4 — the same construction in the oracle SQL) and then runs
    * the real detector: per-pattern match counts + a full redaction whose
    * md5 is the hash-checked witness that the rewrite is byte-identical
    * across engines. Scale: pure map-side projection, no shuffle below the
    * final presentation sort. */
  val t9: Q = (s, d) =>
    piiStatsOf(
      Tables.documents(s, d)
        .withColumn("pii", expr(
          """CASE CAST(doc_id % 4 AS INT)
            | WHEN 0 THEN concat(text, ' reach me at user', CAST(doc_id AS STRING), '@mail.example.com now')
            | WHEN 1 THEN concat(text, ' call 555-', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'),
            |                    '-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' today')
            | WHEN 2 THEN concat(text, ' from host 10.', CAST(doc_id % 256 AS STRING),
            |                    '.0.', CAST((doc_id div 256) % 256 AS STRING), ' logged')
            | ELSE text END""".stripMargin)),
      textCol = "pii")
      .orderBy("doc_id")
  val t9Sql: String =
    s"""WITH pii AS (
       |  SELECT doc_id,
       |         CASE CAST(doc_id % 4 AS INT)
       |          WHEN 0 THEN concat(text, ' reach me at user', CAST(doc_id AS VARCHAR), '@mail.example.com now')
       |          WHEN 1 THEN concat(text, ' call 555-', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
       |                             '-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' today')
       |          WHEN 2 THEN concat(text, ' from host 10.', CAST(doc_id % 256 AS VARCHAR),
       |                             '.0.', CAST((doc_id // 256) % 256 AS VARCHAR), ' logged')
       |          ELSE text END AS pii
       |  FROM documents)
       |SELECT doc_id,
       |       CAST(len(regexp_extract_all(pii, '$EmailRe')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(pii, '$PhoneRe')) AS BIGINT) AS n_phones,
       |       CAST(len(regexp_extract_all(pii, '$IpRe')) AS BIGINT) AS n_ips,
       |       md5(regexp_replace(regexp_replace(regexp_replace(pii,
       |             '$EmailRe', '[EMAIL]', 'g'),
       |             '$PhoneRe', '[PHONE]', 'g'),
       |             '$IpRe', '[IP]', 'g')) AS redacted_md5
       |FROM pii ORDER BY doc_id""".stripMargin

  // ---- T10: repetition ratio (Gopher-style quality signal) ----

  /** T10: within-document repetition — the fraction of duplicated words
    * and duplicated word-trigrams, in basis points (integer math, exact
    * oracle). High-repetition documents are a classic pretraining-quality
    * cut (boilerplate, keyword stuffing, generation loops). Scale: the
    * n-gram set is built per row with array expressions — no explode, no
    * shuffle below the presentation sort. */
  /** Repetition ratios over any (doc_id, text) frame — the library entry
    * point ([[graft.api.GraftApi.repetitionStats]]). */
  private[graft] def repetitionStatsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("tris", expr(
        "CASE WHEN size(ws) >= 3 THEN transform(sequence(1, size(ws) - 2)," +
          " i -> array_join(slice(ws, i, 3), ' ')) ELSE slice(ws, 1, 0) END"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        expr("CAST((size(ws) - size(array_distinct(ws))) * 10000 div size(ws) AS BIGINT)")
          .as("dup_word_bp"),
        size(col("tris")).cast("long").as("n_trigrams"),
        expr("CAST((size(tris) - size(array_distinct(tris))) * 10000" +
          " div greatest(size(tris), 1) AS BIGINT)").as("dup_tri_bp"))

  val t10: Q = (s, d) =>
    repetitionStatsOf(Tables.documents(s, d)).orderBy("doc_id")
  val t10Sql: String =
    """WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
      |t AS (
      |  SELECT doc_id, ws,
      |         CASE WHEN len(ws) >= 3
      |              THEN list_transform(range(1, len(ws) - 1),
      |                     i -> array_to_string(ws[i:i+2], ' '))
      |              ELSE [] END AS tris
      |  FROM w)
      |SELECT doc_id,
      |       CAST(len(ws) AS BIGINT) AS n_tokens,
      |       CAST((len(ws) - len(list_distinct(ws))) * 10000 // len(ws) AS BIGINT) AS dup_word_bp,
      |       CAST(len(tris) AS BIGINT) AS n_trigrams,
      |       CAST((len(tris) - len(list_distinct(tris))) * 10000
      |            // greatest(len(tris), 1) AS BIGINT) AS dup_tri_bp
      |FROM t ORDER BY doc_id""".stripMargin

  // ---- T11: HTML/boilerplate strip ----

  /** Strip markup from scraped text: tags → space, the 5 core character
    * entities decoded, whitespace squeezed — the standard pre-tokenization
    * cleanup for web-crawl corpora. Pure regexp_replace chain (RE2-safe,
    * map-side, codegen'd); the library entry point
    * ([[graft.api.GraftApi.stripHtml]]). */
  private[graft] def stripHtml(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      noTags, "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    trim(regexp_replace(decoded, " +", " "))
  }

  /** T11 binds [[stripHtml]] to a deterministic HTML-wrapped variant of
    * the fixture corpus (the raw corpus has no markup to strip). */
  val t11: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("html", expr(
        """concat('<html><body class="c', CAST(doc_id % 7 AS STRING), '">',
          |'<h1>Doc &amp; entry #', CAST(doc_id AS STRING), '</h1><p>', text,
          |'</p><br/>&lt;end&gt; &quot;fin&quot;</body></html>')""".stripMargin))
      .select(col("doc_id"), stripHtml(col("html")).as("clean"))
      .orderBy("doc_id")
  val t11Sql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |         concat('<html><body class="c', CAST(doc_id % 7 AS VARCHAR), '">',
      |                '<h1>Doc &amp; entry #', CAST(doc_id AS VARCHAR), '</h1><p>', text,
      |                '</p><br/>&lt;end&gt; &quot;fin&quot;</body></html>') AS html
      |  FROM documents)
      |SELECT doc_id,
      |       trim(regexp_replace(
      |         replace(replace(replace(replace(replace(
      |           regexp_replace(html, '<[^>]*>', ' ', 'g'),
      |           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
      |         ' +', ' ', 'g')) AS clean
      |FROM h ORDER BY doc_id""".stripMargin

  // ---- VOC1: vocabulary induction + OOV accounting ----

  /** VOC1: min-frequency vocabulary induction and per-document
    * out-of-vocabulary rate — the tokenizer-prep pass every pretraining
    * corpus runs. The vocab is ONE hash aggregate over the exploded
    * tokens (freq ≥ 5 cutoff); the per-doc OOV rate comes from a left
    * join of tokens against that vocab (at 100 TB the vocab is the small
    * side by construction — a frequency cutoff bounds it — so the probe
    * broadcasts and the token stream never shuffles twice). Integer
    * basis-point rates. */
  private[graft] def vocabOovOf(docs: DataFrame, minFreq: Long): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(vocab, Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_toks"), col("n_oov"),
        expr("n_oov * 10000 div n_toks").as("oov_bp"))
  }

  val voc1: Q = (s, d) =>
    vocabOovOf(Tables.documents(s, d), minFreq = 5).orderBy("doc_id")
  val voc1Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
      |tk AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
      |vocab AS (SELECT tok FROM tk GROUP BY tok HAVING count(*) >= 5)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
      |       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000
      |         // CAST(count(*) AS BIGINT) AS oov_bp
      |FROM tk LEFT JOIN vocab v USING (tok)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- VOC2: vocabulary coverage curve (choose-your-vocab-size tool) ----

  /** VOC2: cumulative corpus coverage by frequency-ranked vocabulary —
    * "how many tokens does a size-k vocab cover?", the curve every
    * tokenizer-budget decision reads off. Rank and running sum over the
    * (freq DESC, tok) total order are computed as a TWO-PASS DISTRIBUTED
    * PREFIX SUM, not a global window (rounds ≤7 used
    * `Window.orderBy(...)` with no partition key — a single-task funnel
    * once the vocab is web-scale: URLs, typos, code tokens reach 10⁸–10⁹
    * distinct): range-partition by the order key so partition k's rows
    * all rank before partition k+1's, rank/cumsum LOCALLY per partition
    * (the window below is partitioned by `spark_partition_id` —
    * parallel), then the tiny per-partition (rows, Σc) totals — one row
    * per shuffle partition, a justified small collect — become exclusive
    * prefix offsets broadcast back and added map-side. The ranged frame
    * is eagerly localCheckpoint-ed because range partitioning samples
    * its boundaries with an RDD-id-derived seed: the offsets pass and
    * the rank pass MUST see the same physical partitioning, which only
    * a materialized snapshot guarantees (checkpoint blocks are freed by
    * the ContextCleaner on GC — no session-lifetime cache leak for
    * library callers). Coverage stays exact integer millionths
    * (cum·1e6 div N), and N falls out of the offset totals for free —
    * the old plan's second scan of the token stream is gone. */
  private[graft] def vocabCoverageOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    // PrefixSum.prefixRank — the shared distributed prefix-sum idiom
    // (range partition, frozen by localCheckpoint; per-partition totals
    // broadcast back as exclusive offsets; every window pid-partitioned).
    // sumTotal (= Σc = N) falls out of the offsets pass for free.
    val ranked = PrefixSum.prefixRank(
      vocab, Seq(col("c").desc, col("tok")), Some("c"))
    val nTotal = math.max(ranked.sumTotal, 1L) // 0 rows => divisor never evaluated
    // DECIMAL ratio: cum·10⁶ wraps int64 past ~9e12 tokens (a 100 TB
    // corpus holds ~2.5e13) — the cumulative count stays int64, only the
    // e6 scaling divides in decimal
    ranked.df.select(col("g_rank").cast("int").as("rank"),
      col("tok"), col("c"),
      expr(s"CAST(CAST(g_cum_excl + c AS DECIMAL(38,0)) * 1000000 div ${nTotal}L AS BIGINT)")
        .as("coverage_e6"))
  }

  val voc2: Q = (s, d) =>
    vocabCoverageOf(Tables.documents(s, d)).orderBy("rank")
  val voc2Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
      |tk AS (SELECT tok FROM toks WHERE len(tok) > 0),
      |vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY tok),
      |ranked AS (
      |  SELECT tok, c,
      |         CAST(row_number() OVER (ORDER BY c DESC, tok) AS INTEGER) AS rank,
      |         CAST(sum(c) OVER (ORDER BY c DESC, tok
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c
      |  FROM vocab)
      |SELECT rank, tok, c,
      |       CAST(CAST(cum_c AS HUGEINT) * 1000000
      |         // (SELECT CAST(count(*) AS BIGINT) FROM tk) AS BIGINT) AS coverage_e6
      |FROM ranked ORDER BY rank""".stripMargin

  // ---- T15: unigram-LM negative log-likelihood (CCNet-style quality) ----

  /** T15: per-document average unigram negative log-likelihood — the
    * CCNet-family quality signal (Wenzek et al. 2020, arXiv:1911.00359,
    * scores documents with an LM and filters by perplexity band; a
    * unigram LM is its aggregate-only degenerate case, trainable in ONE
    * hash aggregate). Add-1 smoothed: p(w) = (c(w)+1) / (N+V). Each
    * DISTINCT token's surprisal ln(1/p) is rounded to an e6 integer
    * FIRST, so the per-document sum is exact integer arithmetic —
    * order-independent and engine-portable (a double Σln over tokens
    * would be partition-order-dependent, the trap stat1 avoids for
    * covariances). Plan: one vocab aggregate, a 1-row (N,V) scalar
    * broadcast onto it, then the token stream re-joins the weighted
    * vocab on `tok` — at 100 TB the vocab is the (frequency-bounded)
    * small side and the token stream shuffles once. */
  private[graft] def unigramNllOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val scal = vocab.agg(sum("c").as("n_total"), count(lit(1)).as("v_size"))
    val weighted = vocab.crossJoin(broadcast(scal))
      .select(col("tok"),
        expr("CAST(round(ln(CAST(n_total + v_size AS DOUBLE) / CAST(c + 1 AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("tok_nll_e6"))
    toks.join(weighted, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum("tok_nll_e6").as("sum_nll_e6"))
      .select(col("doc_id"), col("n_toks"),
        expr("sum_nll_e6 div n_toks").as("nll_e6"))
  }

  val t15: Q = (s, d) =>
    unigramNllOf(Tables.documents(s, d)).orderBy("doc_id")
  val t15Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
      |tk AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
      |vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY tok),
      |scal AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
      |                CAST(count(*) AS BIGINT) AS v_size FROM vocab),
      |w AS (SELECT tok,
      |             CAST(round(ln(CAST(n_total + v_size AS DOUBLE) / CAST(c + 1 AS DOUBLE)) * 1000000) AS BIGINT)
      |               AS tok_nll_e6
      |      FROM vocab, scal)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
      |       CAST(sum(tok_nll_e6) AS BIGINT) // CAST(count(*) AS BIGINT) AS nll_e6
      |FROM tk JOIN w USING (tok)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- CHUNK1: sliding-window document chunking ----

  /** CHUNK1: long-document chunking with overlap (window 128 tokens,
    * stride 96 = 32-token overlap) — the context-window prep step. Chunk
    * starts come from an integer `sequence` (map-side, no join); a tail
    * chunk is kept only if it adds content beyond the overlap
    * (start = 0 or start + 32 < n). Emits (doc_id, chunk_idx, start_tok,
    * chunk_toks). */
  private[graft] def slidingChunksOf(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    val overlap = window - stride
    docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .select(col("doc_id"), col("n"),
        explode(expr(s"sequence(0, greatest(n - 1, 0), $stride)")).as("start_tok"))
      .filter(col("start_tok") === 0 || col("start_tok") + overlap < col("n"))
      .withColumn("chunk_idx", expr(s"start_tok div $stride"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        least(lit(window), col("n") - col("start_tok")).as("chunk_toks"))
  }

  // ---- T16: Gopher quality-rule battery ----

  /** T16: the Gopher repetition/shape rule battery (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1) as one map-side projection: per document —
    * word count bounds, mean word length band, symbol-to-word ratio,
    * bullet-line and ellipsis-line fractions, alphabetic-word fraction,
    * and a minimum distinct-stopword hit count, conjoined into a keep
    * flag. The synthetic corpus is single-line `[a-z ]` word soup, so
    * (like t9's planted PII) the query PLANTS deterministic structure
    * first: lines of `5 + doc_id % 7` words, a `- ` bullet on line i iff
    * (doc_id+1+i) % 9 = 0, a ` ...` suffix iff (doc_id+1+i) % 7 = 3 —
    * the same construction in the oracle SQL, so the rule arithmetic is
    * hash-checked end-to-end. All integer math (basis points via `div`).
    *
    * Scale: zero joins, zero explodes — line/bullet/ellipsis counts come
    * from closed-form `filter(sequence(...))` lengths, so the whole
    * battery is one whole-stage-codegen projection over the corpus scan;
    * at 100 TB it runs at IO speed and the keep flag feeds a pushdown-
    * friendly `WHERE keep = 1` downstream. */
  private[graft] def gopherRulesOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("k", expr("5 + doc_id % 7"))
      .withColumn("n", expr("CAST(size(ws) AS BIGINT)"))
      .withColumn("n_lines", expr("(n + k - 1) div k"))
      .withColumn("n_bul", expr(
        "CAST(size(filter(sequence(0L, n_lines - 1), i -> (doc_id + 1 + i) % 9 = 0)) AS BIGINT)"))
      .withColumn("n_ell", expr(
        "CAST(size(filter(sequence(0L, n_lines - 1), i -> (doc_id + 1 + i) % 7 = 3)) AS BIGINT)"))
      .withColumn("n_words", expr("n + n_bul + n_ell"))
      .select(col("doc_id"),
        col("n_words"),
        col("n_lines"),
        expr("((n_chars - n + 1) + n_bul + 3 * n_ell) * 100 div n_words").as("mean_word_len_x100"),
        expr("n_ell * 10000 div n_words").as("symbol_bp"),
        expr("n_bul * 10000 div n_lines").as("bullet_bp"),
        expr("n_ell * 10000 div n_lines").as("ellipsis_bp"),
        expr("n * 10000 div n_words").as("alpha_bp"),
        expr(s"CAST(size(array_intersect(ws, ${StopWords.map(w => s"'$w'").mkString("array(", ", ", ")")})) AS BIGINT)").as("n_stop"))
      .withColumn("keep", expr(
        """CAST(n_words BETWEEN 50 AND 100000
          | AND mean_word_len_x100 BETWEEN 300 AND 1000
          | AND symbol_bp <= 1000
          | AND bullet_bp < 9000
          | AND ellipsis_bp < 3000
          | AND alpha_bp >= 8000
          | AND n_stop >= 2 AS INT)""".stripMargin))

  val t16: Q = (s, d) =>
    gopherRulesOf(Tables.documents(s, d)).orderBy("doc_id")
  val t16Sql: String =
    s"""WITH b AS (
       |  SELECT doc_id, n_chars, str_split(text, ' ') AS ws,
       |         5 + doc_id % 7 AS k
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_chars, ws, k, CAST(len(ws) AS BIGINT) AS n,
       |         (CAST(len(ws) AS BIGINT) + k - 1) // k AS n_lines
       |  FROM b),
       |e AS (
       |  SELECT *,
       |    CAST(len(list_filter(range(0, n_lines), i -> (doc_id + 1 + i) % 9 = 0)) AS BIGINT) AS n_bul,
       |    CAST(len(list_filter(range(0, n_lines), i -> (doc_id + 1 + i) % 7 = 3)) AS BIGINT) AS n_ell
       |  FROM c),
       |m AS (
       |  SELECT doc_id,
       |         n + n_bul + n_ell AS n_words,
       |         n_lines,
       |         ((n_chars - n + 1) + n_bul + 3 * n_ell) * 100 // (n + n_bul + n_ell) AS mean_word_len_x100,
       |         n_ell * 10000 // (n + n_bul + n_ell) AS symbol_bp,
       |         n_bul * 10000 // n_lines AS bullet_bp,
       |         n_ell * 10000 // n_lines AS ellipsis_bp,
       |         n * 10000 // (n + n_bul + n_ell) AS alpha_bp,
       |         CAST(len(list_distinct(list_intersect(ws, [${StopWords.map(w => s"'$w'").mkString(", ")}]))) AS BIGINT) AS n_stop
       |  FROM e)
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |       CAST(n_lines AS BIGINT) AS n_lines,
       |       CAST(mean_word_len_x100 AS BIGINT) AS mean_word_len_x100,
       |       CAST(symbol_bp AS BIGINT) AS symbol_bp,
       |       CAST(bullet_bp AS BIGINT) AS bullet_bp,
       |       CAST(ellipsis_bp AS BIGINT) AS ellipsis_bp,
       |       CAST(alpha_bp AS BIGINT) AS alpha_bp,
       |       n_stop,
       |       CAST(n_words BETWEEN 50 AND 100000
       |        AND mean_word_len_x100 BETWEEN 300 AND 1000
       |        AND symbol_bp <= 1000
       |        AND bullet_bp < 9000
       |        AND ellipsis_bp < 3000
       |        AND alpha_bp >= 8000
       |        AND n_stop >= 2 AS INTEGER) AS keep
       |FROM m ORDER BY doc_id""".stripMargin

  // ---- T17: C4-style line/document filtering ----

  /** T17: the C4 cleaning pass (Raffel et al. 2020, arXiv:1910.10683
    * §2.2): keep only lines that end in terminal punctuation, have ≥ 5
    * words, and don't mention javascript; drop whole documents containing
    * "lorem ipsum" or a curly brace, or with fewer than 3 surviving
    * lines. The corpus is line-less word soup, so the query plants the
    * structure it filters (same construction in the oracle): lines of
    * `4 + doc_id % 5` words, a terminal '.' on line i unless
    * (doc_id + i) % 3 = 1, ' javascript required' appended to line 0 of
    * every 17th doc, and trailing 'lorem ipsum' / '{' lines on every
    * 23rd / 29th doc. The cleaned document's md5 is the hash-checked
    * witness that the surviving text is byte-identical across engines.
    *
    * Scale: like t16 — pure array expressions over one corpus scan, no
    * explode, no shuffle below the presentation sort. */
  private[graft] def c4FiltersOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("k", expr("4 + doc_id % 5"))
      .withColumn("n", expr("CAST(size(ws) AS BIGINT)"))
      .withColumn("n_lines", expr("(n + k - 1) div k"))
      .withColumn("lines", expr(
        """transform(sequence(0L, n_lines - 1), i ->
          |  concat(array_join(slice(ws, CAST(i * k + 1 AS INT), CAST(k AS INT)), ' '),
          |         CASE WHEN doc_id % 17 = 0 AND i = 0 THEN ' javascript required' ELSE '' END,
          |         CASE WHEN (doc_id + i) % 3 = 1 THEN '' ELSE '.' END))""".stripMargin))
      .withColumn("all_lines", expr(
        """concat(lines,
          |  CASE WHEN doc_id % 23 = 0 THEN array('lorem ipsum dolor sit amet.') ELSE array() END,
          |  CASE WHEN doc_id % 29 = 0 THEN array('var f = function() {') ELSE array() END)""".stripMargin))
      .withColumn("full", expr("array_join(all_lines, char(10))"))
      .withColumn("kept", expr(
        """filter(all_lines, l -> endswith(l, '.')
          |  AND size(split(l, ' ')) >= 5
          |  AND NOT contains(l, 'javascript'))""".stripMargin))
      .select(col("doc_id"),
        expr("CAST(size(all_lines) AS BIGINT)").as("n_lines_total"),
        expr("CAST(size(kept) AS BIGINT)").as("n_kept_lines"),
        expr("aggregate(kept, 0L, (a, l) -> a + size(split(l, ' ')))").as("n_kept_words"),
        expr("CAST(contains(full, 'lorem ipsum') AS INT)").as("has_lorem"),
        expr("CAST(contains(full, '{') AS INT)").as("has_brace"),
        expr("""CAST(NOT contains(full, 'lorem ipsum')
                |  AND NOT contains(full, '{')
                |  AND size(kept) >= 3 AS INT)""".stripMargin).as("doc_kept"),
        expr("md5(array_join(kept, char(10)))").as("clean_md5"))

  val t17: Q = (s, d) =>
    c4FiltersOf(Tables.documents(s, d)).orderBy("doc_id")
  val t17Sql: String =
    """WITH b AS (
      |  SELECT doc_id, str_split(text, ' ') AS ws, 4 + doc_id % 5 AS k
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, ws, k, CAST(len(ws) AS BIGINT) AS n,
      |         (CAST(len(ws) AS BIGINT) + k - 1) // k AS n_lines
      |  FROM b),
      |e AS (
      |  SELECT doc_id,
      |    list_concat(list_concat(
      |      list_transform(range(0, n_lines), i ->
      |        array_to_string(ws[i * k + 1 : (i + 1) * k], ' ')
      |        || (CASE WHEN doc_id % 17 = 0 AND i = 0 THEN ' javascript required' ELSE '' END)
      |        || (CASE WHEN (doc_id + i) % 3 = 1 THEN '' ELSE '.' END)),
      |      CASE WHEN doc_id % 23 = 0 THEN ['lorem ipsum dolor sit amet.'] ELSE [] END),
      |      CASE WHEN doc_id % 29 = 0 THEN ['var f = function() {'] ELSE [] END) AS all_lines
      |  FROM c),
      |f AS (
      |  SELECT doc_id, all_lines,
      |         array_to_string(all_lines, chr(10)) AS full_txt,
      |         list_filter(all_lines, l -> suffix(l, '.')
      |           AND len(str_split(l, ' ')) >= 5
      |           AND NOT contains(l, 'javascript')) AS kept
      |  FROM e)
      |SELECT doc_id,
      |       CAST(len(all_lines) AS BIGINT) AS n_lines_total,
      |       CAST(len(kept) AS BIGINT) AS n_kept_lines,
      |       CAST(coalesce(list_sum(list_transform(kept, l -> len(str_split(l, ' ')))), 0) AS BIGINT) AS n_kept_words,
      |       CAST(contains(full_txt, 'lorem ipsum') AS INTEGER) AS has_lorem,
      |       CAST(contains(full_txt, '{') AS INTEGER) AS has_brace,
      |       CAST(NOT contains(full_txt, 'lorem ipsum')
      |        AND NOT contains(full_txt, '{')
      |        AND len(kept) >= 3 AS INTEGER) AS doc_kept,
      |       md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
      |FROM f ORDER BY doc_id""".stripMargin

  val chunk1: Q = (s, d) =>
    slidingChunksOf(Tables.documents(s, d), window = 128, stride = 96)
      .orderBy("doc_id", "chunk_idx")
  val chunk1Sql: String =
    """WITH n AS (SELECT doc_id, len(str_split(text, ' ')) AS n FROM documents),
      |starts AS (
      |  SELECT doc_id, n, unnest(range(0, greatest(n, 1), 96)) AS start_tok FROM n)
      |SELECT doc_id, CAST(start_tok // 96 AS BIGINT) AS chunk_idx,
      |       CAST(start_tok AS INTEGER) AS start_tok,
      |       CAST(least(128, n - start_tok) AS INTEGER) AS chunk_toks
      |FROM starts
      |WHERE start_tok = 0 OR start_tok + 32 < n
      |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- T13: Unicode NFC normalization (native expression) ----

  /** T13: Unicode normalization as a pipeline step — the fixture corpus is
    * ASCII, so a deterministic decomposition (every 'a' → 'a' + combining
    * grave U+0300) plants real multi-codepoint sequences, then the native
    * [[graft.functions.NfcNormalize]] expression recomposes them ('à',
    * U+00E0). Emits per-doc codepoint counts before/after (strictly fewer
    * after ⟺ composition happened), an md5 witness of the normalized
    * bytes, and an idempotence check (NFC∘NFC = NFC). Map-side, fully
    * codegen'd; the oracle is DuckDB's utf8proc `nfc_normalize` — two
    * independent UAX #15 implementations agreeing byte-for-byte. */
  val t13: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"), expr("replace(text, 'a', 'à')").as("deco"))
      .select(col("doc_id"), expr("graft_nfc(deco)").as("nfc"), col("deco"))
      .select(col("doc_id"),
        length(col("deco")).cast("long").as("n_deco"),
        length(col("nfc")).cast("long").as("n_nfc"),
        substring(md5(col("nfc")), 1, 16).as("digest"),
        (expr("graft_nfc(nfc)") === col("nfc")).as("stable"))
      .orderBy("doc_id")
  }
  val t13Sql: String =
    """WITH deco AS (
      |  SELECT doc_id, replace(text, 'a', 'a' || chr(768)) AS deco FROM documents),
      |n AS (SELECT doc_id, deco, nfc_normalize(deco) AS nfc FROM deco)
      |SELECT doc_id,
      |       CAST(length(deco) AS BIGINT) AS n_deco,
      |       CAST(length(nfc) AS BIGINT) AS n_nfc,
      |       substr(md5(nfc), 1, 16) AS digest,
      |       nfc_normalize(nfc) = nfc AS stable
      |FROM n ORDER BY doc_id""".stripMargin

  // ---- T14: word co-occurrence + PMI ----

  /** T14: corpus-level word association — document co-occurrence counts
    * and pointwise mutual information for every within-doc word pair with
    * support ≥ 20 docs. The pair space is bounded PER DOCUMENT by the
    * distinct-token count (the self-join is on doc_id, so fanout is
    * |tokens|² per doc, a constant for bounded-length docs — linear in
    * corpus size, never corpus×corpus), then one hash aggregate on the
    * pair key. Unigram doc-counts are a vocabulary-sized frame
    * (broadcast); PMI = ln(N·c_xy/(c_x·c_y)) is computed from identical
    * integer counts with an identical expression in both engines and
    * rounded to micro-units; output ordered by the pair key, so ranking
    * never depends on float comparison. */
  private[graft] def pmiCooccurrenceOf(docs: DataFrame, minSupport: Long): DataFrame = {
    // Round-17 note: persisting this distinct (doc_id, w) frame was tried
    // (it is consumed by the unigram aggregate and both self-join sides)
    // and MEASURED SLOWER at sf0.1 (t14 1.07-1.35×, ret3 1.28-1.51× —
    // plans/r17/scoped_after{1,2}.json): the columnar cache write of the
    // wide exploded string frame costs more than the extra codegen'd
    // explode pass, and AQE exchange reuse already merges the two
    // identical self-join sides. Left unpersisted on the measurement.
    val toksD = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
    val cx = toksD.groupBy("w").agg(count(lit(1)).as("c"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val pairs = toksD.as("a")
      .join(toksD.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("wa"), col("b.w").as("wb"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minSupport)
    pairs
      .join(broadcast(cx.select(col("w").as("wa"), col("c").as("c_x"))), Seq("wa"))
      .join(broadcast(cx.select(col("w").as("wb"), col("c").as("c_y"))), Seq("wb"))
      .crossJoin(broadcast(n))
      .select(col("wa"), col("wb"), col("c_xy"),
        expr("CAST(round(ln((CAST(c_xy AS DOUBLE) * CAST(n_docs AS DOUBLE)) / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))) * 1000000) AS BIGINT)")
          .as("pmi_e6"))
  }

  val t14: Q = (s, d) =>
    pmiCooccurrenceOf(Tables.documents(s, d), minSupport = 20L)
      .orderBy("wa", "wb")
  val t14Sql: String =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id, w FROM (
      |    SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0),
      |cx AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |pairs AS (
      |  SELECT a.w AS wa, b.w AS wb, CAST(count(*) AS BIGINT) AS c_xy
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.w < b.w
      |  GROUP BY a.w, b.w HAVING count(*) >= 20)
      |SELECT wa, wb, c_xy,
      |       CAST(round(ln((CAST(c_xy AS DOUBLE) * CAST(n_docs AS DOUBLE)) / (CAST(x.c AS DOUBLE) * CAST(y.c AS DOUBLE))) * 1000000) AS BIGINT) AS pmi_e6
      |FROM pairs
      |JOIN cx x ON x.w = wa
      |JOIN cx y ON y.w = wb
      |CROSS JOIN n
      |ORDER BY wa, wb""".stripMargin

  // ---- PACK1: sequence packing (concat-and-chunk) fragmentation stats ----

  /** PACK2: GPT-style training-example packing over the GLOBAL corpus
    * stream (ScaleOps.pack1 is the per-language-shard variant; this one
    * has no shard key, which is exactly what makes its prefix sum the
    * interesting part) — concatenate the corpus
    * token stream in doc_id order and cut every `window` tokens; report
    * per context-window chunk how many documents it touches, how many
    * START inside it, and its token fill (== window everywhere but the
    * tail). This is the fragmentation profile a pretrain data loader
    * needs to size attention-masking / document-boundary handling.
    *
    * Scale: document start offsets are a DISTRIBUTED PREFIX SUM — the
    * voc2 idiom (range-partition by doc_id, rank/cumsum locally per
    * partition, broadcast the tiny per-partition totals back as
    * exclusive offsets), never a single-task global window. Each doc
    * then explodes to its (usually 1-2) overlapping chunks and one hash
    * aggregate keyed on chunk_id finishes — the exchange carries one row
    * per doc-chunk overlap, nothing quadratic. */
  private[graft] def packingStatsOf(docs: DataFrame, window: Long): DataFrame = {
    val lens = docs
      .select(col("doc_id"), expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n"))
      .filter(col("n") > 0)
    // PrefixSum.prefixRank — the shared distributed prefix-sum idiom;
    // g_cum_excl of n over ascending doc_id IS the document start offset.
    PrefixSum.prefixRank(lens, Seq(col("doc_id")), Some("n")).df
      .select(col("doc_id"), col("n"), col("g_cum_excl").as("start"))
      .withColumn("endo", col("start") + col("n"))
      .select(col("doc_id"), col("start"), col("endo"),
        explode(expr(s"sequence(start div $window, (endo - 1) div $window)")).as("chunk_id"))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr(s"start div $window") === col("chunk_id"), 1L).otherwise(0L)).as("n_starting"),
        sum(least(col("endo"), (col("chunk_id") + 1L) * window) -
          greatest(col("start"), col("chunk_id") * window)).as("n_tokens"))
  }

  val pack2: Q = (s, d) =>
    packingStatsOf(Tables.documents(s, d), window = 2048L).orderBy("chunk_id")
  val pack2Sql: String =
    """WITH lens AS (
      |  SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents WHERE len(str_split(text, ' ')) > 0),
      |s AS (
      |  SELECT doc_id, n,
      |         CAST(coalesce(sum(n) OVER (ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM lens),
      |x AS (
      |  SELECT doc_id, start, start + n AS endo,
      |         unnest(range(start // 2048, (start + n - 1) // 2048 + 1)) AS chunk_id
      |  FROM s)
      |SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN start // 2048 = chunk_id THEN 1 ELSE 0 END) AS BIGINT) AS n_starting,
      |       CAST(sum(least(endo, (chunk_id + 1) * 2048) - greatest(start, chunk_id * 2048)) AS BIGINT) AS n_tokens
      |FROM x GROUP BY chunk_id ORDER BY chunk_id""".stripMargin

  // ---- T20: hashed-feature linear quality classifier (inference) ----

  /** T20: classifier-based quality filtering in the fastText shape —
    * per-doc score = Σ w[h(unigram)] + Σ w[h(bigram)] over hashed
    * feature buckets, keep iff score > 0. The weight table here is a
    * DETERMINISTIC stand-in (w(f) = md5-bucket % 2001 − 1000 ∈
    * [−1000, 1000]); a production deployment broadcasts its learned
    * weight vector into exactly this plan — the point of the op is the
    * SCORING shape, which is the expensive part at 100 TB.
    *
    * Scale: scoring is a ZERO-SHUFFLE projection riding the scan — the
    * token array is folded map-side (`aggregate(transform(...))`), no
    * explode, no join, and the hash-trick means no vocabulary state at
    * all (the classic reason fastText inference scales). The only
    * exchange is the final per-source aggregate. All math is integer
    * (md5 buckets, integer weights, integer sums) — engine-exact. */
  private[graft] def hashedLinearScoreOf(docs: DataFrame): DataFrame = {
    val uniW = "CAST(conv(substring(md5(concat('t20:', w)), 1, 4), 16, 10) AS BIGINT) % 2001 - 1000"
    val biW = "CAST(conv(substring(md5(concat('t20b:', element_at(ws, i), '_', element_at(ws, i + 1))), 1, 4), 16, 10) AS BIGINT) % 2001 - 1000"
    docs
      .withColumn("ws", expr("filter(split(text, ' '), w -> length(w) > 0)"))
      .withColumn("uni_score", expr(
        s"aggregate(transform(ws, w -> $uniW), 0L, (acc, x) -> acc + x)"))
      .withColumn("bi_score", expr(
        // filter-not-CASE keeps the index array well-typed when size(ws)=1
        s"""aggregate(transform(
           |  filter(sequence(1, size(ws)), i -> i < size(ws)),
           |  i -> $biW), 0L, (acc, x) -> acc + x)""".stripMargin))
      .withColumn("score", col("uni_score") + col("bi_score"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_keep"),
        sum("score").as("sum_score"))
      .withColumn("keep_bp", expr("n_keep * 10000 div n_docs"))
  }

  val t20: Q = (s, d) =>
    hashedLinearScoreOf(Tables.documents(s, d)).orderBy("source")
  val t20Sql: String =
    """WITH s AS (
      |  SELECT source,
      |         coalesce(list_sum(list_transform(ws,
      |           w -> (('0x' || substr(md5('t20:' || w), 1, 4))::BIGINT % 2001 - 1000))), 0)
      |         + coalesce(list_sum(list_transform(range(1, greatest(len(ws), 1)),
      |           i -> (('0x' || substr(md5('t20b:' || ws[i] || '_' || ws[i + 1]), 1, 4))::BIGINT % 2001 - 1000))), 0)
      |           AS score
      |  FROM (SELECT source, list_filter(str_split(text, ' '), w -> len(w) > 0) AS ws
      |        FROM documents))
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |       CAST(sum(score) AS BIGINT) AS sum_score,
      |       CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) * 10000
      |         // CAST(count(*) AS BIGINT) AS keep_bp
      |FROM s GROUP BY source ORDER BY source""".stripMargin

  // ---- T21: winnowing fingerprints (local, guaranteed-overlap) ----

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD
    * 2003 — the MOSS algorithm) over any (doc_id, text) frame: hash every
    * word k-gram, slide a window of `w` hashes, keep the MINIMUM of each
    * window (rightmost on ties). Unlike t7's single whole-document hash,
    * the selected set is LOCAL — any shared run of ≥ w+k−1 tokens between
    * two documents is guaranteed to share a fingerprint (the winnowing
    * guarantee, pinned in `TextAnalysisSpec`), which is what makes it the
    * standard primitive for partial-overlap contamination and clone
    * detection. Entirely array HOFs riding the scan — ZERO exchanges
    * except the presentation sort (the t18 shape); the k-gram hash is
    * salted-md5 so both engines build identical sketches. Per doc:
    * n_grams, n_sel (distinct selected (pos, hash) pairs — the density
    * audit, expected ≈ 2·n_grams/(w+1)), and the sorted distinct selected
    * hash set. */
  private[graft] def winnowingOf(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    docs
      .withColumn("toks", expr("filter(split(text, ' '), x -> length(x) > 0)"))
      .withColumn("gidx", expr(
        s"CASE WHEN size(toks) >= $k THEN sequence(1, size(toks) - ${k - 1}) " +
          "ELSE CAST(array() AS ARRAY<INT>) END"))
      .withColumn("grams", expr(
        s"transform(gidx, i -> CAST(conv(substr(md5(array_join(slice(toks, i, $k), ' ')), 1, 15), 16, 10) AS BIGINT))"))
      .withColumn("widx", expr(
        s"CASE WHEN size(grams) >= $w THEN sequence(1, size(grams) - ${w - 1}) " +
          "ELSE CAST(array() AS ARRAY<INT>) END"))
      .withColumn("selp", expr(
        // (pos, fp) pairs as 'pos:fp' strings — DuckDB's list_distinct
        // cannot histogram struct elements, so both engines dedupe strings
        s"""transform(widx, j -> concat(
           |  CAST(array_max(filter(sequence(j, j + ${w - 1}),
           |         p -> element_at(grams, p) = array_min(slice(grams, j, $w)))) AS STRING),
           |  ':', CAST(array_min(slice(grams, j, $w)) AS STRING)))""".stripMargin))
      .withColumn("self", expr(s"transform(widx, j -> array_min(slice(grams, j, $w)))"))
      .select(col("doc_id"),
        expr("CAST(size(grams) AS BIGINT)").as("n_grams"),
        expr("CAST(size(array_distinct(selp)) AS BIGINT)").as("n_sel"),
        expr("array_sort(array_distinct(self))").as("fps"))

  val t21: Q = (s, d) =>
    // fps stringified (not a raw array column) so the driver's pandas-based
    // oracle harness can sort/hash the frame; d19 keeps the array form.
    winnowingOf(Tables.documents(s, d))
      .withColumn("fps", expr("array_join(fps, ',')"))
      .orderBy("doc_id")

  /** Winnowing CTE chain ending in `s(doc_id, grams, selp, self)` —
    * shared by t21Sql and d19Sql (a constant, not string surgery). */
  private val winnowCtes: String =
    """WITH base AS (
      |  SELECT doc_id, list_filter(str_split(text, ' '), x -> len(x) > 0) AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |         CASE WHEN len(toks) >= 3
      |              THEN list_transform(generate_series(1, len(toks) - 2),
      |                i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 15))::BIGINT)
      |              ELSE [] END AS grams
      |  FROM base),
      |s AS (
      |  SELECT doc_id, grams,
      |         CASE WHEN len(grams) >= 4
      |              THEN list_transform(generate_series(1, len(grams) - 3),
      |                j -> CAST(list_max(list_filter(generate_series(j, j + 3),
      |                       p -> grams[p] = list_min(list_slice(grams, j, j + 3)))) AS VARCHAR)
      |                     || ':' || CAST(list_min(list_slice(grams, j, j + 3)) AS VARCHAR))
      |              ELSE [] END AS selp,
      |         CASE WHEN len(grams) >= 4
      |              THEN list_transform(generate_series(1, len(grams) - 3),
      |                j -> list_min(list_slice(grams, j, j + 3)))
      |              ELSE [] END AS self
      |  FROM g)""".stripMargin

  val t21Sql: String = winnowCtes +
    """
      |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
      |       CAST(len(list_distinct(selp)) AS BIGINT) AS n_sel,
      |       array_to_string(list_sort(list_distinct(self)), ',') AS fps
      |FROM s ORDER BY doc_id""".stripMargin

  // ---- D19: winnowing-sketch decontamination ----

  /** D19: decontamination by FINGERPRINT SKETCH — d9 semi-joins every
    * train 3-gram against the eval set (exact, but the probe side is
    * every shingle); d19 probes only the winnowing-SELECTED fingerprints
    * (≈ 2/(w+1) of the grams), inheriting t21's guarantee: any train/eval
    * overlap of ≥ w+k−1 tokens still shares a selected fingerprint, so a
    * contiguous-plagiarism contamination cannot slip through while the
    * index is ~2.5× smaller — the sketch-vs-exact trade the MOSS design
    * exists for. The eval slice (doc_id % 97 = 0, the d9 convention) is
    * tiny, so its distinct fingerprint set broadcasts at 100 TB and the
    * train scan never shuffles for the probe; per-doc accounting rides
    * the one explode. */
  /** (doc_id, fp) exploded fingerprint rows, with the winnowing frame
    * MATERIALIZED first (eager localCheckpoint). The barrier is load-
    * bearing: when a consumer prunes to `fps` alone, CollapseProject
    * inlines toks→grams→windows into ONE nested expression whose
    * evaluation re-derives the whole gram array per window — measured
    * at sf10 as a 25+ min scan vs seconds with the barrier (t21 itself
    * is safe only because its 3-column output keeps `grams` multi-
    * referenced, which blocks the collapse). Materializing the per-doc
    * fingerprint frame is also the production shape — a fingerprint
    * INDEX is stored once and probed many times, never recomputed per
    * probe. */
  private[graft] def fingerprintRowsOf(docs: DataFrame): DataFrame =
    // LAZY checkpoint (round-17): the barrier only needs to be a PLAN
    // barrier (LogicalRDD blocks CollapseProject identically whether the
    // blocks exist yet or not), so the first consumer's action computes
    // the winnow frame once into the checkpoint blocks and every later
    // consumer reads them — the old eager form paid a separate driver
    // action per call, which st17 re-paid on EVERY micro-batch. The
    // single-compute guarantee is unchanged (d19's broadcast side builds
    // before its probe stage runs).
    winnowingOf(docs).select(col("doc_id"), col("fps")).localCheckpoint(false)
      .select(col("doc_id"), explode(col("fps")).as("fp"))

  val d19: Q = (s, d) => {
    val fps = fingerprintRowsOf(Tables.documents(s, d))
    val evalFps = fps.filter(col("doc_id") % 97 === 0)
      .select(col("fp")).distinct()
    fps.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalFps.withColumn("hit", lit(1))), Seq("fp"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fps"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("flagged", when(col("n_hits") > 0, 1).otherwise(0))
      .select("doc_id", "n_fps", "n_hits", "flagged")
      .orderBy("doc_id")
  }
  val d19Sql: String = winnowCtes +
    """,
      |fps AS MATERIALIZED (
      |  SELECT doc_id, unnest(list_distinct(self)) AS fp FROM s),
      |evalfps AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 97 = 0)
      |SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_fps,
      |       CAST(sum(CASE WHEN e.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      |       CASE WHEN sum(CASE WHEN e.fp IS NOT NULL THEN 1 ELSE 0 END) > 0
      |            THEN 1 ELSE 0 END AS flagged
      |FROM fps f LEFT JOIN evalfps e USING (fp)
      |WHERE f.doc_id % 97 <> 0
      |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin

  // ---- T24: lexical diversity (TTR + hapax share) ----

  /** Type-token ratio and hapax-legomenon share per document — the
    * lexical-diversity face of quality filtering: templated/spun text
    * repeats its vocabulary (low TTR), scraped boilerplate shows few
    * once-only words (low hapax share); Gopher-style pipelines cut on
    * both. All exact integers: (n_tokens, n_types, n_hapax) from one
    * (doc_id, word) count pass, ratios as basis points by integral
    * division.
    *
    * Scale: two map-side-combined aggregates on the (doc_id, word) and
    * doc_id keys — corpus-linear, no joins, no windows. The library
    * entry point is [[graft.api.GraftApi.lexicalDiversity]]. */
  private[graft] def lexicalDiversityOf(docs: DataFrame): DataFrame = {
    val wc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    wc.groupBy("doc_id")
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr_bp", expr("n_types * 10000 div n_tokens"))
      .withColumn("hapax_bp", expr("n_hapax * 10000 div n_types"))
  }

  val t24: Q = (s, d) =>
    lexicalDiversityOf(Tables.documents(s, d)).orderBy("doc_id")
  val t24Sql: String =
    """WITH wc AS (
      |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents)
      |  GROUP BY doc_id, word)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |       CAST(count(*) AS BIGINT) AS n_types,
      |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |       CAST(count(*) AS BIGINT) * 10000 // CAST(sum(c) AS BIGINT) AS ttr_bp,
      |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000
      |         // CAST(count(*) AS BIGINT) AS hapax_bp
      |FROM wc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- ZIPF1: rank-frequency slope audit (corpus naturalness) ----

  /** Zipf rank-frequency slope per source — the corpus-naturalness
    * audit: natural text follows freq ∝ rank^(-s) with s ≈ 1, so an
    * OLS fit of ln(freq) on ln(rank) over the top `topR` ranks flags
    * machine-generated / templated sources whose slope is far from −1
    * (Piantadosi 2014). Per the t14/stat2 exactness convention, each
    * (rank, freq) point's logs are rounded ONCE to e6 integers; the OLS
    * slope is then a pure integer expression — numerator and
    * denominator exceed int64 only at the final ×10⁶ rescale, which
    * runs in DECIMAL(38,0) (HUGEINT in the oracle). The slope is
    * emitted NEGATED (`slope_neg_e6` ≥ 0, ~1e6 for natural text):
    * covariance of a rank-sorted frequency list is never positive, and
    * keeping the integer division non-negative sidesteps the
    * truncate-vs-floor divergence between Spark's `div` and DuckDB's
    * `//` on negatives.
    *
    * Scale: one corpus scan → map-side-combined (source, word) counts;
    * the top-`topR` cut rides [[graft.plans.TopKPerGroup]] (bounded
    * per-partition heaps + one bounded exchange — never a vocab-sized
    * per-source window sort), and the rank window + OLS fold then run
    * on ≤ topR rows per source. The library entry point is
    * [[graft.api.GraftApi.zipfSlope]]. */
  private[graft] def zipfSlopeOf(docs: DataFrame, topR: Int = 100): DataFrame = {
    val wc = docs
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
    val top = graft.plans.TopKPerGroup(
      wc, Seq("source"), Seq(("c", true), ("word", false)), topR)
    val w = Window.partitionBy("source").orderBy(col("c").desc, col("word"))
    top
      .withColumn("rk", row_number().over(w))
      .withColumn("x_e6", expr("CAST(round(1000000 * ln(CAST(rk AS DOUBLE))) AS BIGINT)"))
      .withColumn("y_e6", expr("CAST(round(1000000 * ln(CAST(c AS DOUBLE))) AS BIGINT)"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_ranks"),
        sum("x_e6").as("sx"), sum("y_e6").as("sy"),
        sum(expr("x_e6 * y_e6")).as("sxy"), sum(expr("x_e6 * x_e6")).as("sxx"))
      .withColumn("slope_neg_e6", expr(
        """CAST((CAST(sx AS DECIMAL(38,0)) * sy - CAST(n_ranks AS DECIMAL(38,0)) * sxy) * 1000000
          | div (CAST(n_ranks AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)""".stripMargin))
      .select("source", "n_ranks", "slope_neg_e6")
  }

  val zipf1: Q = (s, d) =>
    zipfSlopeOf(Tables.documents(s, d)).orderBy("source")
  val zipf1Sql: String =
    """WITH wc AS (
      |  SELECT source, unnest(str_split(text, ' ')) AS word FROM documents),
      |c AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c FROM wc GROUP BY source, word),
      |r AS (SELECT source, word, c,
      |             row_number() OVER (PARTITION BY source ORDER BY c DESC, word) AS rk
      |      FROM c),
      |t AS (SELECT source,
      |             CAST(round(1000000 * ln(CAST(rk AS DOUBLE))) AS BIGINT) AS x,
      |             CAST(round(1000000 * ln(CAST(c AS DOUBLE))) AS BIGINT) AS y
      |      FROM r WHERE rk <= 100),
      |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * y) AS HUGEINT) AS sxy, CAST(sum(x * x) AS HUGEINT) AS sxx
      |      FROM t GROUP BY source)
      |SELECT source, n_ranks,
      |       CAST((CAST(sx AS HUGEINT) * sy - n_ranks * sxy) * 1000000
      |            // (n_ranks * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS slope_neg_e6
      |FROM a ORDER BY source""".stripMargin

  // ---- KW1: per-document TF-IDF keyword extraction ----

  /** KW1: the top-3 TF-IDF keywords of every document — the classic
    * per-doc salience signal (tag suggestion, weak topic labels, index
    * terms). TF is the exact in-doc term count; IDF is ln(N/df) over
    * document frequency, rounded to micro-units (the t14 convention:
    * identical integer counts → identical double expression → one
    * rounded integer in both engines); the score is the exact integer
    * product tf·idf_e6 so ranking never compares doubles. Ties break by
    * term text ascending, so the top-3 is fully deterministic.
    *
    * Scale: one token scan → one (doc_id, w) hash aggregate (map-side
    * combined) for TF; DF is a vocabulary-sized frame derived from the
    * same aggregate (never a second corpus scan) and broadcast back; the
    * per-doc top-3 window partitions by doc_id — thousands of tiny
    * partitions, no global sort. tf ≤ doc length and idf_e6 ≤ ln(N)·10⁶
    * (~2.8e7 at 10¹² docs), so tf·idf_e6 fits int64 with ~5 orders of
    * headroom at 100 TB. */
  private[graft] def tfidfKeywordsOf(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(df), Seq("w"))
      .crossJoin(broadcast(n))
      .withColumn("idf_e6",
        expr("CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1000000) AS BIGINT)"))
      .withColumn("score", col("tf") * col("idf_e6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("w").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("w").as("term"),
        col("tf"), col("df"), col("idf_e6"), col("score"))
  }

  val kw1: Q = (s, d) =>
    tfidfKeywordsOf(Tables.documents(s, d)).orderBy("doc_id", "rk")
  val kw1Sql: String =
    """WITH tf AS (
      |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0 GROUP BY doc_id, w),
      |df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |s AS (
      |  SELECT tf.doc_id, tf.w, tf.tf, df.df,
      |         CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1000000) AS BIGINT) AS idf_e6
      |  FROM tf JOIN df USING (w) CROSS JOIN n),
      |r AS (
      |  SELECT doc_id, w, tf, df, idf_e6, tf * idf_e6 AS score,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY tf * idf_e6 DESC, w) AS rk
      |  FROM s)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, w AS term, tf, df, idf_e6, score
      |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  // ---- W2V1: skip-gram training-pair counts ----

  /** W2V1: the (center, context) skip-gram pair frequency table at
    * window 2 — the input word2vec/SGNS (and any co-occurrence-matrix
    * embedding: GloVe, PPMI-SVD) trains from. Both directions of each
    * within-window pair are emitted (center→context and context→center),
    * exactly as a symmetric-window SGNS sampler walks the corpus; pairs
    * below `minSupport` are dropped. Unlike t14 (document-level distinct
    * co-occurrence for PMI), this counts every positional occurrence
    * inside a ±2 token window — the multiset the gradient actually sees.
    *
    * Scale: pair generation is ROW-LOCAL — two zips of shifted array
    * slices per document (the d2 constant-splits lesson; no self-join,
    * no posexplode shuffle), then one hash aggregate on the pair key
    * (map-side combined, vocabulary²-bounded output). At 100 TB this is
    * one corpus scan + one bounded shuffle. */
  private[graft] def skipgramPairsOf(docs: DataFrame, minSupport: Long): DataFrame = {
    val pairsArr =
      "concat(" +
        "transform(arrays_zip(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)), s -> struct(s['0'] AS a, s['1'] AS b)), " +
        "transform(arrays_zip(slice(ws, 1, size(ws) - 2), slice(ws, 3, size(ws) - 2)), s -> struct(s['0'] AS a, s['1'] AS b)))"
    val p = docs
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(pairsArr)).as("pr"))
      .select(col("pr.a").as("a"), col("pr.b").as("b"))
      .filter(length(col("a")) > 0 && length(col("b")) > 0)
    p.select(col("a").as("center"), col("b").as("context"))
      .union(p.select(col("b").as("center"), col("a").as("context")))
      .groupBy("center", "context").agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minSupport)
  }

  val w2v1: Q = (s, d) =>
    skipgramPairsOf(Tables.documents(s, d), minSupport = 30L)
      .orderBy("center", "context")
  val w2v1Sql: String =
    """WITH ws AS (SELECT str_split(text, ' ') AS ws FROM documents WHERE len(str_split(text, ' ')) >= 2),
      |p AS (
      |  SELECT pr.a AS a, pr.b AS b FROM (
      |    SELECT unnest(list_concat(
      |      list_transform(range(1, len(ws)), i -> {'a': ws[i], 'b': ws[i + 1]}),
      |      list_transform(range(1, len(ws) - 1), i -> {'a': ws[i], 'b': ws[i + 2]}))) AS pr
      |    FROM ws)
      |  WHERE len(pr.a) > 0 AND len(pr.b) > 0),
      |u AS (
      |  SELECT a AS center, b AS context FROM p
      |  UNION ALL
      |  SELECT b AS center, a AS context FROM p)
      |SELECT center, context, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM u GROUP BY center, context HAVING count(*) >= 30
      |ORDER BY center, context""".stripMargin

  // ---- T26: FORCAST readability (syllable-profile grade) ----

  /** FORCAST readability grade per document (Caylor et al. 1973) — the
    * readability formula built for NON-PROSE text (forms, listings,
    * fragments): unlike Flesch-Kincaid it uses no sentence count, only
    * the monosyllabic-word share, so it stays meaningful on corpora
    * where punctuation was stripped upstream (exactly this pipeline's
    * P7 output). grade = 20 − (monosyllables per 150 words)/10
    * = 20 − 15·mono/words, emitted as exact e3 fixed point by integral
    * division; the syllable proxy is the standard vowel-group count
    * (runs of [aeiouy], min 1 per word), identical regex semantics in
    * both engines (split keeps boundary empties: groups = parts − 1).
    * Also emits syllables-per-word (e3) — the vocabulary-complexity
    * companion signal quality filters cut on.
    *
    * Scale: one exploded scan → per-doc map-side-combined aggregate;
    * corpus-linear, no joins. Library entry point:
    * [[graft.api.GraftApi.forcastReadability]]. */
  private[graft] def forcastReadabilityOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .select(col("doc_id"),
        greatest(lit(1), size(split(col("word"), "[aeiouy]+")) - 1).as("syl"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("syl") === 1, 1L).otherwise(0L)).as("n_mono"),
        sum(col("syl").cast("long")).as("n_syll"))
      .withColumn("grade_e3", lit(20000L) - expr("15000 * n_mono div n_words"))
      .withColumn("spw_e3", expr("1000 * n_syll div n_words"))

  val t26: Q = (s, d) =>
    forcastReadabilityOf(Tables.documents(s, d)).orderBy("doc_id")
  val t26Sql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |         greatest(1, len(regexp_split_to_array(word, '[aeiouy]+')) - 1) AS syl
      |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents)
      |  WHERE length(word) > 0)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(CASE WHEN syl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_mono,
      |       CAST(sum(syl) AS BIGINT) AS n_syll,
      |       20000 - 15000 * CAST(sum(CASE WHEN syl = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         // CAST(count(*) AS BIGINT) AS grade_e3,
      |       1000 * CAST(sum(syl) AS BIGINT) // CAST(count(*) AS BIGINT) AS spw_e3
      |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- T27: term burstiness (variance-to-mean dispersion) ----

  private val T27MinDf = 50L
  private val T27TopK = 20

  /** T27: term burstiness — the variance-to-mean ratio (Fisher's index
    * of dispersion) of each term's per-document count across the WHOLE
    * corpus (absent docs count as zero, which the sufficient-statistics
    * form gets for free). VMR = 1 is Poisson scatter; VMR ≫ 1 marks
    * bursty terms that pile into few documents — boilerplate, templated
    * spam, topical jargon — exactly the terms Church & Gale (1995)
    * showed IDF mis-scores, and a standard screen beside t14's PMI and
    * kw1's TF-IDF when building stopword/boilerplate lists.
    * vmr_e6 = 10⁶·(n·S2 − S1²) div (n·S1) with S1 = Σc, S2 = Σc²
    * per term — non-negative by Cauchy–Schwarz, exact integers in both
    * engines. The products run in DECIMAL(38,0)/HUGEINT (the eval2
    * convention): int64 wraps once S1 > ~3e9, and the decimal headroom
    * holds to S1 ≈ 10¹⁶ occurrences — past any 100 TB corpus.
    *
    * Scale: one exploded scan → (doc, w) map-side-combined counts →
    * vocab-sized per-term aggregate; the doc-count scalar broadcasts;
    * the top-k plans as TakeOrderedAndProject (no global sort). Library
    * entry point: [[graft.api.GraftApi.termBurstiness]]. */
  /** Per-term sufficient statistics (w → df, S1 = Σc, S2 = Σc²) for the
    * dispersion measure. ADDITIVE across disjoint document sets (each
    * doc's counts are complete within its set), which is what lets the
    * streaming twin (st21) maintain them per micro-batch and stay
    * bit-identical to batch. */
  private[graft] def burstinessStatsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("w")
      .agg(count(lit(1)).as("df"), sum("c").as("s1"), sum(expr("c * c")).as("s2"))

  /** Final cut shared by t27 and st21: threshold, exact VMR, top-k.
    * `nDf` is a 1-row (n_docs) frame so the corpus size rides the same
    * broadcast in both the batch and streaming paths. */
  private[graft] def burstinessFromStats(stats: DataFrame, nDf: DataFrame,
      minDf: Long, k: Int): DataFrame =
    stats
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(nDf))
      .withColumn("vmr_e6", expr(
        """CAST(1000000 * (CAST(n_docs AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)
          |  div (CAST(n_docs AS DECIMAL(38,0)) * s1) AS BIGINT)""".stripMargin))
      .orderBy(col("vmr_e6").desc, col("w"))
      .limit(k)
      .select("w", "df", "s1", "vmr_e6")

  private[graft] def burstinessOf(docs: DataFrame, minDf: Long = T27MinDf,
      k: Int = T27TopK): DataFrame =
    burstinessFromStats(burstinessStatsOf(docs),
      docs.agg(count(lit(1)).as("n_docs")), minDf, k)

  val t27: Q = (s, d) => burstinessOf(Tables.documents(s, d))
  val t27Sql: String =
    s"""WITH c AS (
       |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY doc_id, w),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |v AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS df, CAST(sum(c) AS BIGINT) AS s1,
       |         CAST(sum(c * c) AS BIGINT) AS s2
       |  FROM c GROUP BY w HAVING count(*) >= $T27MinDf)
       |SELECT w, df, s1,
       |       CAST(1000000 * (CAST(n_docs AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
       |         // (CAST(n_docs AS HUGEINT) * s1) AS BIGINT) AS vmr_e6
       |FROM v CROSS JOIN n
       |ORDER BY vmr_e6 DESC, w LIMIT $T27TopK""".stripMargin

  // ---- VOC3: Heaps'-law vocabulary growth exponent ----

  /** VOC3: the Heaps'-law growth exponent β (types ≈ K·tokensᵝ,
    * Heaps 1978) from the two-point estimate between the deterministic
    * half corpus (doc_id % 2 = 0) and the full corpus:
    * β = ln(T_full/T_half) / ln(N_full/N_half). The tokenizer-sizing /
    * dedup-health audit: natural corpora sit at β ≈ 0.4–0.6 — β near 0
    * means the vocabulary has saturated (template/boilerplate-dominated
    * text), β near 1 means type growth tracks token growth (unjoined
    * IDs, noise, or OCR garbage). Exactness: both ln arguments are
    * ratios of exact int64 counts (identical doubles in both engines),
    * each ln rounds to e6 micro-nats before ONE integral division — the
    * t15/sel1 convention.
    *
    * Scale: one exploded scan, two exact count-distincts (two-phase
    * hash distinct, map-side partials), 1-row output. Library entry
    * point: [[graft.api.GraftApi.heapsLaw]]. */
  private[graft] def heapsLawOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_half"),
        countDistinct(when(col("doc_id") % 2 === 0, col("w"))).as("t_half"),
        count(lit(1)).as("n_full"),
        countDistinct(col("w")).as("t_full"))
      .withColumn("beta_e6", expr(
        // Degenerate-corpus guard (no even doc_ids, or half == full): the
        // denominator ln would be 0/±Inf — Spark's `div` nulls silently
        // while DuckDB's `//` errors, so emit NULL explicitly in BOTH.
        "CASE WHEN n_half = 0 OR t_half = 0 OR n_half = n_full THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(round(ln(CAST(t_full AS DOUBLE) / t_half) * 1000000) AS BIGINT) * 1000000 div " +
          "nullif(CAST(round(ln(CAST(n_full AS DOUBLE) / n_half) * 1000000) AS BIGINT), 0) END"))

  val voc3: Q = (s, d) => heapsLawOf(Tables.documents(s, d))
  val voc3Sql: String =
    """WITH ww AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0)
      |SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_half,
      |       CAST(count(DISTINCT CASE WHEN doc_id % 2 = 0 THEN w END) AS BIGINT) AS t_half,
      |       CAST(count(*) AS BIGINT) AS n_full,
      |       CAST(count(DISTINCT w) AS BIGINT) AS t_full,
      |       CASE WHEN sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) = 0
      |              OR count(DISTINCT CASE WHEN doc_id % 2 = 0 THEN w END) = 0
      |              OR sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) = count(*)
      |            THEN CAST(NULL AS BIGINT)
      |            ELSE CAST(round(ln(CAST(count(DISTINCT w) AS DOUBLE)
      |              / count(DISTINCT CASE WHEN doc_id % 2 = 0 THEN w END)) * 1000000) AS BIGINT)
      |              * 1000000
      |              // nullif(CAST(round(ln(CAST(count(*) AS DOUBLE)
      |              / sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)) * 1000000) AS BIGINT), 0)
      |       END AS beta_e6
      |FROM ww""".stripMargin

  // ---- VOC4: cross-source vocabulary-overlap matrix ----

  /** VOC4: the type-set Jaccard matrix between sources — the
    * domain-similarity audit behind mixture design (mix1/mix2/mix3
    * decide HOW MUCH of each source; voc4 measures how REDUNDANT two
    * sources are lexically: near-identical vocabularies mean the
    * mixture buys less diversity than the source count suggests; it is
    * also the cheap screen run before the expensive cross-source dup
    * matrix d21). Per unordered source pair: type counts, intersection
    * size, Jaccard (bp) and the larger directional containment (bp —
    * catches a source whose vocabulary is swallowed by a bigger one).
    *
    * Scale: distinct (source, type) is map-side combined off one
    * exploded scan; the self-join key is the TYPE, and each type
    * expands to at most |sources|² pairs — bounded by the SOURCE DOMAIN
    * (tens), not the corpus, so the pair space is O(V·S²) with V the
    * vocabulary: no all-pairs document surface anywhere. All-integer
    * output. */
  private[graft] def sourceVocabOverlapOf(docs: DataFrame): DataFrame = {
    val types = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
    val sizes = types.groupBy("source").agg(count(lit(1)).as("n_types"))
    val inter = types.as("a").join(types.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("source").as("src_a"), col("n_types").as("types_a")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n_types").as("types_b")), "src_b")
      .withColumn("jaccard_bp", expr(
        "n_common * 10000 div (types_a + types_b - n_common)"))
      .withColumn("contain_bp", expr(
        "n_common * 10000 div least(types_a, types_b)"))
      .select("src_a", "src_b", "types_a", "types_b", "n_common",
        "jaccard_bp", "contain_bp")
      .orderBy("src_a", "src_b")
  }

  // ---- VOC5: Jensen–Shannon divergence between source unigram LMs ----

  /** VOC5: the DISTRIBUTIONAL complement of voc4's type-set overlap —
    * per unordered source pair, the Jensen–Shannon divergence (in nats,
    * e9) between the two sources' unigram token distributions. Two
    * feeds can share most of their vocabulary (high voc4 Jaccard) yet
    * USE it with wildly different frequencies; JSD is the symmetric,
    * bounded (≤ ln 2) statistic mixture design actually wants when
    * deciding whether two sources are redundant or complementary
    * (cf. DoReMi/DSIR-style domain weighting, mix2/sel1).
    *
    * JSD(P‖Q) = ½Σ_w [p·ln(2p/(p+q)) + q·ln(2q/(p+q))]; words
    * exclusive to one side contribute their ln 2 mass via the same
    * expression's degenerate branch. Exactness: counts and totals are
    * exact integers; each word's contribution is ONE double expression
    * over identical integer operands in both engines, rounded ONCE to
    * e9 (the t14/fs2 transcendental convention — per-word convexity
    * makes every term ≥ 0, so the summed integers divide by 2
    * truncation-safely).
    *
    * Scale: token counts are one exploded scan; the pair expansion
    * joins each (source, word) count against the SOURCE DOMAIN (≤ S−1
    * copies per row, S a schema constant — the voc4 bound), never
    * word×word or doc×doc. Library entry point:
    * [[graft.api.GraftApi.sourceJsd]]. */
  private[graft] def sourceJsdOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val cnt = toks.groupBy("source", "w").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("source").agg(sum("c").as("n_tok"))
    val srcs = tot.select(col("source").as("other"))
    val sided = cnt.join(broadcast(srcs), col("source") =!= col("other"))
      .select(least(col("source"), col("other")).as("src_a"),
        greatest(col("source"), col("other")).as("src_b"), col("w"),
        when(col("source") < col("other"), col("c")).otherwise(lit(0L)).as("ca0"),
        when(col("source") > col("other"), col("c")).otherwise(lit(0L)).as("cb0"))
    val merged = sided.groupBy("src_a", "src_b", "w")
      .agg(sum("ca0").as("ca"), sum("cb0").as("cb"))
    val contrib =
      "CASE WHEN ca > 0 AND cb > 0 THEN CAST(round((" +
        "(CAST(ca AS DOUBLE) / na) * ln(2.0 * (CAST(ca AS DOUBLE) / na) / ((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb))) + " +
        "(CAST(cb AS DOUBLE) / nb) * ln(2.0 * (CAST(cb AS DOUBLE) / nb) / ((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb)))" +
        ") * 1000000000) AS BIGINT) " +
        "WHEN ca > 0 THEN CAST(round((CAST(ca AS DOUBLE) / na) * ln(2.0) * 1000000000) AS BIGINT) " +
        "ELSE CAST(round((CAST(cb AS DOUBLE) / nb) * ln(2.0) * 1000000000) AS BIGINT) END"
    merged
      .join(broadcast(tot.select(col("source").as("src_a"), col("n_tok").as("na"))), Seq("src_a"))
      .join(broadcast(tot.select(col("source").as("src_b"), col("n_tok").as("nb"))), Seq("src_b"))
      .withColumn("contrib_e9", expr(contrib))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_union"),
        sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L)).as("n_common"),
        sum("contrib_e9").as("c2"))
      .withColumn("jsd_e9", expr("c2 div 2"))
      .select("src_a", "src_b", "n_union", "n_common", "jsd_e9")
      .orderBy("src_a", "src_b")
  }

  val voc5: Q = (s, d) => sourceJsdOf(Tables.documents(s, d))
  val voc5Sql: String =
    """WITH toks AS (
      |  SELECT source, w FROM (
      |    SELECT source, unnest(str_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0),
      |cnt AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY source, w),
      |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok FROM cnt GROUP BY source),
      |sided AS (
      |  SELECT least(cnt.source, o.source) AS src_a,
      |         greatest(cnt.source, o.source) AS src_b, cnt.w,
      |         CASE WHEN cnt.source < o.source THEN cnt.c ELSE 0 END AS ca0,
      |         CASE WHEN cnt.source > o.source THEN cnt.c ELSE 0 END AS cb0
      |  FROM cnt JOIN tot o ON cnt.source <> o.source),
      |merged AS (
      |  SELECT src_a, src_b, w, CAST(sum(ca0) AS BIGINT) AS ca, CAST(sum(cb0) AS BIGINT) AS cb
      |  FROM sided GROUP BY src_a, src_b, w),
      |scored AS (
      |  SELECT src_a, src_b, ca, cb,
      |         CASE WHEN ca > 0 AND cb > 0 THEN CAST(round((
      |             (CAST(ca AS DOUBLE) / na) * ln(2.0 * (CAST(ca AS DOUBLE) / na) / ((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb))) +
      |             (CAST(cb AS DOUBLE) / nb) * ln(2.0 * (CAST(cb AS DOUBLE) / nb) / ((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb)))
      |           ) * 1000000000) AS BIGINT)
      |              WHEN ca > 0 THEN CAST(round((CAST(ca AS DOUBLE) / na) * ln(2.0) * 1000000000) AS BIGINT)
      |              ELSE CAST(round((CAST(cb AS DOUBLE) / nb) * ln(2.0) * 1000000000) AS BIGINT) END AS contrib_e9
      |  FROM merged
      |  JOIN (SELECT source AS src_a, n_tok AS na FROM tot) ta USING (src_a)
      |  JOIN (SELECT source AS src_b, n_tok AS nb FROM tot) tb USING (src_b))
      |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_union,
      |       CAST(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
      |       CAST(sum(contrib_e9) AS BIGINT) // 2 AS jsd_e9
      |FROM scored GROUP BY src_a, src_b
      |ORDER BY src_a, src_b""".stripMargin

  val voc4: Q = (s, d) => sourceVocabOverlapOf(Tables.documents(s, d))
  val voc4Sql: String =
    """WITH t AS (
      |  SELECT DISTINCT source, w FROM (
      |    SELECT source, unnest(str_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0),
      |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types FROM t GROUP BY source),
      |i AS (
      |  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_common
      |  FROM t a JOIN t b ON a.w = b.w AND a.source < b.source
      |  GROUP BY a.source, b.source)
      |SELECT i.src_a, i.src_b, sa.n_types AS types_a, sb.n_types AS types_b,
      |       i.n_common,
      |       i.n_common * 10000 // (sa.n_types + sb.n_types - i.n_common) AS jaccard_bp,
      |       i.n_common * 10000 // least(sa.n_types, sb.n_types) AS contain_bp
      |FROM i
      |JOIN sz sa ON sa.source = i.src_a
      |JOIN sz sb ON sb.source = i.src_b
      |ORDER BY i.src_a, i.src_b""".stripMargin

  // ---- T23: cross-document n-gram novelty ----

  /** T23: n-gram novelty — per document, the share of its distinct word
    * 3-gram shingles that appear in NO other document (novelty_bp), the
    * memorization-risk / boilerplate signal data-curation pipelines
    * report next to dedup: a doc with low novelty is made of phrases the
    * corpus already contains even when no single pair-level duplicate
    * fires (template fragments, licence headers, quoted chains). Uses
    * the SAME shingle definition as the d2/d3 dedup family, so its
    * numbers are directly comparable with the near-dup reports. The
    * library entry point ([[graft.api.GraftApi.ngramNovelty]]).
    *
    * Scale: one shuffle keyed by shingle (hash-agg document frequency —
    * the shingle frame was already shuffled on that key, so the join
    * back reuses the exchange), one hash-agg back on doc_id. No pair
    * space, no windows; pure integer output. */
  private[graft] def ngramNoveltyOf(docs: DataFrame): DataFrame = {
    val sh = Dedup.shinglesOf(docs)
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    sh.join(df, Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("novelty_bp",
        expr("(n_shingles - n_shared) * 10000 div n_shingles"))
  }

  val t23: Q = (s, d) =>
    ngramNoveltyOf(Tables.documents(s, d).select("doc_id", "text"))
      .orderBy("doc_id")
  val t23Sql: String =
    s"""WITH ${Dedup.shinglesCteBody("shing", "documents")},
       |df AS (
       |  SELECT shingle, CAST(count(*) AS BIGINT) AS df
       |  FROM shing GROUP BY shingle)
       |SELECT s.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_shingles,
       |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |       CAST((count(*) - sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)) * 10000
       |            // count(*) AS BIGINT) AS novelty_bp
       |FROM shing s JOIN df USING (shingle)
       |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin

  // ---- VOC6: vocabulary-size / OOV-rate curve over cutoffs ----

  /** VOC6: the vocabulary sizing curve — for each min-frequency cutoff
    * c ∈ {1, 2, 4, 8, 16}, the induced vocabulary size (types with
    * freq ≥ c), the token mass it keeps, and the OOV token share in
    * basis points. voc1 reports the per-doc OOV rate at ONE cutoff;
    * this is the sweep a tokenizer design actually reads (vocab size vs
    * coverage trade-off — pick the knee). The library entry point
    * ([[graft.api.GraftApi.vocabCurve]]).
    *
    * Scale: one exploded-token hash aggregate builds the term-frequency
    * table (the corpus's only scan and only data-sized shuffle); the
    * cutoff sweep cross-joins the VOCAB-sized frame against a 5-row
    * literal — value-domain-bounded work, one tiny final aggregate. */
  /** voc6's term-frequency table — an additive monoid, which is what
    * lets the streaming twin (st31) maintain it by summed per-batch
    * deltas. */
  private[graft] def termFreqOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("tf"))

  /** The cutoff sweep over a merged tf table — shared by voc6 and st31
    * so both compute the curve through the same code path. */
  private[graft] def curveFromTf(tf: DataFrame,
      cutoffs: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L)): DataFrame = {
    val sp = tf.sparkSession
    import sp.implicits._
    tf.crossJoin(broadcast(cutoffs.toDF("cutoff")))
      .groupBy("cutoff")
      .agg(
        sum(when(col("tf") >= col("cutoff"), 1L).otherwise(0L)).as("vocab_size"),
        sum(when(col("tf") >= col("cutoff"), col("tf")).otherwise(0L)).as("kept_tokens"),
        sum("tf").as("total_tokens"))
      .withColumn("oov_bp",
        expr("(total_tokens - kept_tokens) * 10000 div total_tokens"))
      .orderBy("cutoff")
  }

  private[graft] def vocabCurveOf(docs: DataFrame,
      cutoffs: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L)): DataFrame =
    curveFromTf(termFreqOf(docs), cutoffs)

  val voc6: Q = (s, d) => vocabCurveOf(Tables.documents(s, d))
  val voc6Sql: String =
    """WITH tf AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT unnest(str_split(text, ' ')) AS tok FROM documents)
      |  WHERE len(tok) > 0 GROUP BY tok),
      |cu AS (SELECT CAST(unnest([1, 2, 4, 8, 16]) AS BIGINT) AS cutoff)
      |SELECT cutoff,
      |       CAST(sum(CASE WHEN tf >= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS vocab_size,
      |       CAST(sum(CASE WHEN tf >= cutoff THEN tf ELSE 0 END) AS BIGINT) AS kept_tokens,
      |       CAST(sum(tf) AS BIGINT) AS total_tokens,
      |       CAST((sum(tf) - sum(CASE WHEN tf >= cutoff THEN tf ELSE 0 END)) * 10000
      |            // sum(tf) AS BIGINT) AS oov_bp
      |FROM tf CROSS JOIN cu
      |GROUP BY cutoff ORDER BY cutoff""".stripMargin

  // ---- T28: boilerplate n-gram extraction per source ----

  /** T28: boilerplate candidates — per source, the top-5 word 3-gram
    * shingles by document frequency (df ≥ 2): licence headers, cookie
    * banners, navigation chrome and template fragments surface here
    * long before any pair-level duplicate fires, and the output is the
    * seed list a template-stripping cleaning rule starts from.
    * Same shingle definition as the dedup family and t23's novelty, so
    * all three reports compose. The library entry point
    * ([[graft.api.GraftApi.boilerplateNgrams]]).
    *
    * Scale: one shingle-keyed shuffle into (source × shingle) document
    * frequencies, then the top-5 cut runs through the bounded-exchange
    * [[graft.plans.TopKPerGroup]] custom operator — the exchange
    * carries ≤ k rows per source per partition, never the shingle
    * table (the x1 contract; source domain is bounded). */
  private[graft] def boilerplateNgramsOf(docs: DataFrame, k: Int = 5): DataFrame = {
    val sh = Dedup.shinglesOf(docs.select("doc_id", "text"))
    val df = sh.join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source", "shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    val top = graft.plans.TopKPerGroup(df, Seq("source"),
      Seq(("df", true), ("shingle", false)), k)
    top.withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("df").desc, col("shingle"))).cast("long"))
      .select(col("source"), col("rk"), col("shingle"), col("df"))
  }

  val t28: Q = (s, d) =>
    boilerplateNgramsOf(Tables.documents(s, d)).orderBy("source", "rk")
  val t28Sql: String =
    s"""WITH ${Dedup.shinglesCteBody("shing", "documents")},
       |df AS (
       |  SELECT d.source, s.shingle, CAST(count(*) AS BIGINT) AS df
       |  FROM shing s JOIN documents d USING (doc_id)
       |  GROUP BY d.source, s.shingle HAVING count(*) >= 2),
       |r AS (
       |  SELECT source, shingle, df,
       |         CAST(row_number() OVER (PARTITION BY source
       |           ORDER BY df DESC, shingle) AS BIGINT) AS rk
       |  FROM df)
       |SELECT source, rk, shingle, df FROM r WHERE rk <= 5
       |ORDER BY source, rk""".stripMargin

  val queries: Map[String, Q] = Map(
    "t28_boilerplate_ngrams" -> t28,
    "voc6_vocab_curve" -> voc6,
    "t23_ngram_novelty" -> t23,
    "voc4_source_overlap" -> voc4,
    "voc5_source_jsd" -> voc5,
    "t26_forcast_readability" -> t26,
    "t27_burstiness" -> t27,
    "voc3_heaps_law" -> voc3,
    "kw1_tfidf_keywords" -> kw1,
    "w2v1_skipgram_pairs" -> w2v1,
    "t21_winnowing" -> t21,
    "zipf1_rank_slope" -> zipf1,
    "t24_lexical_diversity" -> t24,
    "d19_winnowing_decontamination" -> d19,
    "t20_hashed_linear_filter" -> t20,
    "voc2_vocab_coverage" -> voc2,
    "t15_unigram_nll" -> t15,
    "t14_pmi_cooccurrence" -> t14,
    "t13_nfc_normalize" -> t13,
    "voc1_vocab_oov" -> voc1,
    "chunk1_sliding_chunks" -> chunk1,
    "t11_html_strip" -> t11,
    "t4_language_id" -> t4,
    "t5_quality_score" -> t5,
    "t6_token_counts" -> t6,
    "t7_fingerprint" -> t7,
    "t9_pii_redact" -> t9,
    "t10_repetition_ratio" -> t10,
    "t16_gopher_rules" -> t16,
    "t17_c4_filters" -> t17,
    "pack2_packing_fragmentation" -> pack2,
  )

  val oracle: Map[String, String] = Map(
    "t28_boilerplate_ngrams" -> t28Sql,
    "voc6_vocab_curve" -> voc6Sql,
    "t23_ngram_novelty" -> t23Sql,
    "voc4_source_overlap" -> voc4Sql,
    "voc5_source_jsd" -> voc5Sql,
    "t26_forcast_readability" -> t26Sql,
    "t27_burstiness" -> t27Sql,
    "voc3_heaps_law" -> voc3Sql,
    "kw1_tfidf_keywords" -> kw1Sql,
    "w2v1_skipgram_pairs" -> w2v1Sql,
    "t21_winnowing" -> t21Sql,
    "zipf1_rank_slope" -> zipf1Sql,
    "t24_lexical_diversity" -> t24Sql,
    "d19_winnowing_decontamination" -> d19Sql,
    "t20_hashed_linear_filter" -> t20Sql,
    "voc2_vocab_coverage" -> voc2Sql,
    "t15_unigram_nll" -> t15Sql,
    "t14_pmi_cooccurrence" -> t14Sql,
    "t13_nfc_normalize" -> t13Sql,
    "voc1_vocab_oov" -> voc1Sql,
    "chunk1_sliding_chunks" -> chunk1Sql,
    "t11_html_strip" -> t11Sql,
    "t4_language_id" -> t4Sql,
    "t5_quality_score" -> t5Sql,
    "t6_token_counts" -> t6Sql,
    "t7_fingerprint" -> t7Sql,
    "t9_pii_redact" -> t9Sql,
    "t10_repetition_ratio" -> t10Sql,
    "t16_gopher_rules" -> t16Sql,
    "t17_c4_filters" -> t17Sql,
    "pack2_packing_fragmentation" -> pack2Sql,
  )
}
