package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization expression library (SURVEY §2.2 P1–P11, §2.3 T1–T2).
  *
  * Everything here is a pure Catalyst `Column` expression — no UDFs — so the
  * whole clean/tokenize chain stays inside WholeStageCodegen and predicates
  * referencing cleaned text can still be pushed/pruned by the optimizer.
  *
  * Two cleaning dialects exist in the reference and differ deliberately:
  *  - NB dialect (reference `Hadoop/NB/NB.java:67-73`, mirrored by
  *    `Spark/NaiveBayes/python/NaiveBayes.py:21-28`): url → "", mention/
  *    hashtag/entity → "", digits → "", non-alpha → " ", THEN lowercase,
  *    trim, whitespace-squeeze.
  *  - SVM dialect (reference `Hadoop/SVM/SVM.java:39-40,76-79`): lowercase
  *    FIRST, simpler url regex → " ", non-alpha → " ", squeeze, trim. No
  *    mention/digit strip.
  */
object TextOps {

  /** 4-alternative URL regex, case-insensitive (`NB.java:67`). Contains a
    * negative lookahead `(?!www)` — Java-only; RE2 engines (DuckDB) silently
    * never match it, so DuckDB-checked queries use [[SvmUrlRe]] instead.
    */
  val NbUrlRe: String =
    "(?i)(https?:\\/\\/(?:www\\.|(?!www))[a-zA-Z0-9][a-zA-Z0-9-]+[a-zA-Z0-9]\\.[^\\s]{2,}" +
      "|www\\.[a-zA-Z0-9][a-zA-Z0-9-]+[a-zA-Z0-9]\\.[^\\s]{2,}" +
      "|https?:\\/\\/(?:www\\.|(?!www))[a-zA-Z0-9]+\\.[^\\s]{2,}" +
      "|www\\.[a-zA-Z0-9]+\\.[^\\s]{2,})"

  /** Simple URL regex (`SVM.java:39`); RE2-compatible. */
  val SvmUrlRe: String = "(?i)(https?:\\/\\/\\S+)"

  /** Mention/hashtag/entity strip (`NB.java:68`): lazy match, RE2-ok. */
  val MentionRe: String = "(#|@|&).*?\\w+"

  // ---- individual steps (P4..P9) ----
  def stripUrlNb(c: Column): Column   = regexp_replace(c, NbUrlRe, "")
  def stripUrlSvm(c: Column): Column  = regexp_replace(c, SvmUrlRe, " ")
  def stripMention(c: Column): Column = regexp_replace(c, MentionRe, "")
  def stripDigits(c: Column): Column  = regexp_replace(c, "\\d+", "")
  def nonAlphaToSpace(c: Column): Column = regexp_replace(c, "[^a-zA-Z ]", " ")
  def squeezeWs(c: Column): Column    = regexp_replace(c, "\\s+", " ")

  /** NB-dialect clean chain, exact step order of `NB.java:67-73`:
    * url → mention → digits → non-alpha → lower → trim → squeeze.
    */
  def cleanNb(c: Column): Column =
    squeezeWs(trim(lower(nonAlphaToSpace(stripDigits(stripMention(stripUrlNb(c)))))))

  /** SVM-dialect clean chain, exact step order of `SVM.java:76-79`:
    * lower → url→" " → non-alpha→" " → squeeze → trim.
    */
  def cleanSvm(c: Column): Column =
    trim(squeezeWs(nonAlphaToSpace(stripUrlSvm(lower(c)))))

  /** T1: single-space tokenize (`NB.java:92`, `text.split(" ")`) — keeps
    * empty tokens if doubled spaces survive (they don't, post-squeeze). */
  def tokenizeSpace(c: Column): Column = split(c, " ")

  /** T2: whitespace-run tokenize (`SVM.java:80` StringTokenizer ≈ `\s+`). */
  def tokenizeWs(c: Column): Column = split(c, "\\s+")

  // ---- P1: naive CSV split + comma-dropping stitch ----

  /** Parses a raw line with the reference's naive positional CSV semantics
    * (`NB.java:52-64`): split on every comma — quoting NOT honored — then
    * stitch columns 4.. back onto column 3 WITH THE COMMAS DROPPED.
    * Returns a struct (id, label, source, text).
    *
    * NOTE Java's `String.split(",")` drops trailing empty fields; Spark's
    * `split` keeps them. Identical whenever the text doesn't end in ','.
    */
  def csvSplitStitch(line: Column): Column = {
    val parts = split(line, ",")
    struct(
      element_at(parts, 1).as("id"),
      element_at(parts, 2).as("label"),
      element_at(parts, 3).as("source"),
      concat_ws("", slice(parts, 4, 1000000)).as("text"))
  }

  /** P2: malformed-row predicate (`SVM.java:74`): at least 4 CSV columns. */
  def wellFormed(line: Column): Column = size(split(line, ",")) >= 4

  /** P10: label normalization — "1" → 1.0 else 0.0 (`NaiveBayes.py:43`);
    * pass negative = -1.0 for the SVM ±1 convention (`SVM.java:75`). */
  def normLabel(c: Column, negative: Double = 0.0): Column =
    when(c === "1", 1.0).otherwise(negative)

  // ====================================================================
  // DuckDB-oracle SQL fragments — the same transformations expressed in
  // DuckDB SQL (RE2 regex, explicit 'g' flag). Kept adjacent to the Column
  // versions so the two dialects evolve in lockstep.
  // ====================================================================

  /** SVM URL regex for RE2/DuckDB. */
  val SvmUrlReSql: String = SvmUrlRe

  def stripUrlSvmSql(c: String): String  = s"regexp_replace($c, '$SvmUrlReSql', ' ', 'g')"
  def stripMentionSql(c: String): String = s"regexp_replace($c, '(#|@|&).*?\\w+', '', 'g')"
  def stripDigitsSql(c: String): String  = s"regexp_replace($c, '\\d+', '', 'g')"
  def nonAlphaToSpaceSql(c: String): String = s"regexp_replace($c, '[^a-zA-Z ]', ' ', 'g')"
  def squeezeWsSql(c: String): String    = s"regexp_replace($c, '\\s+', ' ', 'g')"

  /** NB-dialect clean in DuckDB SQL. The NB URL regex is omitted (RE2 can't
    * express its lookahead); callers must guarantee a URL-free input column
    * (true for the synthetic `documents` corpus — lowercase alpha + spaces).
    */
  def cleanNbSql(c: String): String =
    squeezeWsSql(s"trim(lower(${nonAlphaToSpaceSql(stripDigitsSql(stripMentionSql(c)))}))")

  /** SVM-dialect clean in DuckDB SQL. */
  def cleanSvmSql(c: String): String =
    s"trim(${squeezeWsSql(nonAlphaToSpaceSql(stripUrlSvmSql(s"lower($c)")))})"
}
