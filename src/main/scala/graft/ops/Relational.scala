package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.text.TextOps

/** Relational operator surface (SURVEY §2.1–2.3, §2.7–2.8) plus the
  * [EXT] relational operators Catalyst gives us for free (windows, rollup,
  * set ops, semi/anti joins, top-k) declared over the synthetic star schema.
  *
  * Every query here is a declarative DataFrame plan — filters and column
  * selections reach the parquet scan (PushedFilters/ReadSchema), aggregates
  * get map-side partial aggregation, and small-dimension joins broadcast.
  *
  * EXACTNESS CONTRACT with the DuckDB oracle: all money columns in the
  * fixtures are exact 2-decimal doubles, so monetary aggregates are computed
  * in integer cents (`CAST(round(x*100) AS BIGINT)`), making sums
  * order-independent and bit-exact across engines. Ratios/averages are
  * rounded to fixed decimals in BOTH dialects.
  */
object Relational {

  // integer-cents helper (exact: inputs are 2-decimal doubles)
  private def cents(c: Column): Column = Money.cents(c)
  private def centsSql(c: String): String = Money.centsSql(c)

  // deterministic "dirty text" builders used by the regex-step queries —
  // the synthetic corpus is pure lowercase alpha, so the URL/mention/digit
  // strip operators need synthesized input to have anything to do.
  private def dirty(spec: (String, Column)*): Column = concat(spec.map(_._2): _*)

  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  // =====================================================================
  //  §2.1 scans / sources / sinks
  // =====================================================================

  /** S1: projected+filtered scan; predicate and 2-column ReadSchema reach
    * the parquet reader (reference analogue: line-oriented text scan,
    * `NB.java:300-301`). */
  val s1: Q = (s, d) =>
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .filter(col("n_chars") > 0).orderBy("doc_id")
  val s1Sql =
    "SELECT doc_id, text FROM documents WHERE n_chars > 0 ORDER BY doc_id"

  /** S2: scan with explicit partitioning knob (`minPartitions=3`,
    * `NaiveBayes.py:40`) → `repartition(3)`; result is partition-invariant. */
  val s2: Q = (s, d) =>
    li(s, d).repartition(3).agg(count(lit(1)).as("n"))
  val s2Sql = "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem"

  /** S3: multi-directory scan = UNION ALL of scans (`SVM.java:180-182`). */
  val s3: Q = (s, d) => {
    val o = ord(s, d)
    o.filter(col("o_orderstatus") === "F")
      .unionAll(o.filter(col("o_orderstatus") === "O"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }
  val s3Sql =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT * FROM orders WHERE o_orderstatus = 'F'
      |  UNION ALL
      |  SELECT * FROM orders WHERE o_orderstatus = 'O'
      |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** S5: tab-separated text-sink lines, NB model-file format
    * `word \t pos@neg` (`NB.java:122`). */
  val s5: Q = (s, d) =>
    SentimentNb.model(s, d)
      .select(concat(col("word"), lit("\t"),
        col("pos").cast("string"), lit("@"), col("neg").cast("string")).as("line"))
      .orderBy("line")
  val s5Sql =
    s"""WITH ${SentimentNb.modelCte}
       |SELECT word || chr(9) || CAST(pos AS VARCHAR) || '@' || CAST(neg AS VARCHAR) AS line
       |FROM model ORDER BY line""".stripMargin

  /** S6: destructive overwrite sink (`fs.delete` + rewrite,
    * `NB.java:284-287`) → `mode("overwrite")`, written twice to prove
    * idempotence, then read back. Not SQL-expressible (side effect). */
  val s6: Q = (s, d) => {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_s6_sink_" + d.replaceAll("[^A-Za-z0-9]", "_")
    val m = SentimentNb.model(s, d)
    m.write.mode("overwrite").parquet(dir)
    m.write.mode("overwrite").parquet(dir) // second write must replace, not append
    s.read.parquet(dir).agg(count(lit(1)).as("n_rows"))
  }

  /** S8: native CSV source — stage a deterministic CSV from `documents`,
    * read it back through `spark.read.csv` with an explicit schema and
    * PERMISSIVE mode (the DataSource-API face of the reference's
    * line-splitting P1 path), and aggregate. Oracle = the same aggregate
    * straight off the parquet table. */
  val s8: Q = (s, d) => {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_s8_csv_" + d.replaceAll("[^A-Za-z0-9]", "_")
    Tables.documents(s, d)
      .select(concat_ws(",", col("doc_id"), col("lang"), col("n_chars")).as("value"))
      .write.mode("overwrite").text(dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, lang STRING, n_chars BIGINT")
    s.read.schema(schema).option("mode", "PERMISSIVE").csv(dir)
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")
  }
  val s8Sql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** S9: native JSON-lines source — `to_json` staging + `spark.read.json`
    * with explicit schema (schema-on-read, no inference scan). */
  val s9: Q = (s, d) => {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_s9_json_" + d.replaceAll("[^A-Za-z0-9]", "_")
    Tables.documents(s, d)
      .select(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("value"))
      .write.mode("overwrite").text(dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, lang STRING, n_chars BIGINT")
    s.read.schema(schema).json(dir)
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_doc"))
      .orderBy("lang")
  }
  val s9Sql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       min(doc_id) AS min_doc
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** S7: metrics/stdout sink — collects the 1-row metrics DF to the driver
    * and prints it (`NB.java:343-349`); returns the DF for verification. */
  val s7: Q = (s, d) => {
    val m = SentimentNb.binaryMetrics(s, d)
    m.collect().foreach(r => println(s"[graft.metrics] $r"))
    m
  }
  val s7Sql = SentimentNb.binaryMetricsSql

  // =====================================================================
  //  §2.2 projections / filters / row transforms
  // =====================================================================

  // reconstructable CSV line with commas injected into the text column
  private def csvLine(withCommas: Boolean): Column = {
    val text = if (withCommas) expr("replace(text, 'table', 'ta,ble')") else col("text")
    concat(col("doc_id").cast("string"), lit(","),
      when(col("lang") === "en", "1").otherwise("0"), lit(","),
      col("source"), lit(","), text)
  }
  private val csvLineSql =
    "doc_id::VARCHAR || ',' || (CASE WHEN lang = 'en' THEN '1' ELSE '0' END) || ',' || source || ',' || replace(text, 'table', 'ta,ble')"

  /** P1: naive CSV split + comma-dropping stitch (`NB.java:53-64`). The
    * injected `ta,ble` commas are dropped by the stitch, restoring `table`. */
  val p1: Q = (s, d) =>
    Tables.documents(s, d)
      .select(TextOps.csvSplitStitch(csvLine(withCommas = true)).as("r"))
      .select(col("r.id").as("id"), col("r.label").as("label"),
        col("r.source").as("source"), col("r.text").as("text"))
      .orderBy(col("id").cast("long"))
  val p1Sql =
    s"""SELECT parts[1] AS id, parts[2] AS label, parts[3] AS source,
       |       array_to_string(parts[4:], '') AS text
       |FROM (SELECT str_split($csvLineSql, ',') AS parts FROM documents)
       |ORDER BY CAST(id AS BIGINT)""".stripMargin

  /** P2: malformed-row filter — keep only lines with ≥4 CSV columns
    * (`SVM.java:74`). Every 10th line is truncated to 2 columns. */
  val p2: Q = (s, d) => {
    val line = when(col("doc_id") % 10 === 0, concat(col("doc_id").cast("string"), lit(",oops")))
      .otherwise(csvLine(withCommas = false))
    Tables.documents(s, d).select(col("doc_id"), line.as("line"))
      .filter(TextOps.wellFormed(col("line")))
      .select(col("doc_id")).orderBy("doc_id")
  }
  val p2Sql =
    """SELECT doc_id FROM (
      |  SELECT doc_id, CASE WHEN doc_id % 10 = 0 THEN doc_id::VARCHAR || ',oops'
      |         ELSE doc_id::VARCHAR || ',' || (CASE WHEN lang = 'en' THEN '1' ELSE '0' END) || ',' || source || ',' || text END AS line
      |  FROM documents)
      |WHERE len(str_split(line, ',')) >= 4 ORDER BY doc_id""".stripMargin

  /** P3: empty-text guard (`NB.java:90`): rows whose cleaned text is blank
    * are dropped before tokenization. Every 5th doc is made all-digits so
    * it cleans to empty. */
  val p3: Q = (s, d) => {
    val t = when(col("doc_id") % 5 === 0, lit("  123 456 !! ")).otherwise(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.cleanNb(t).as("clean"))
      .filter(length(trim(col("clean"))) > 0)
      .orderBy("doc_id")
  }
  val p3Sql = {
    val t = "CASE WHEN doc_id % 5 = 0 THEN '  123 456 !! ' ELSE text END"
    s"""SELECT doc_id, ${TextOps.cleanNbSql(t)} AS clean FROM documents
       |WHERE length(trim(${TextOps.cleanNbSql(t)})) > 0 ORDER BY doc_id""".stripMargin
  }

  /** P4: URL strip, SVM pattern `(?i)(https?://\S+)` → " " (`SVM.java:39,77`).
    * (The NB 4-alternative pattern uses a lookahead RE2 can't run; it is
    * exercised Java-side in the test suite instead.) */
  val p4: Q = (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      TextOps.stripUrlSvm(dirty(
        "u" -> lit("see https://s"), "n" -> (col("doc_id") % 10).cast("string"),
        "h" -> lit(".com/x ok "), "t" -> col("text"))).as("t"))
      .orderBy("doc_id")
  val p4Sql =
    s"""SELECT doc_id, ${TextOps.stripUrlSvmSql("'see https://s' || (doc_id % 10)::VARCHAR || '.com/x ok ' || text")} AS t
       |FROM documents ORDER BY doc_id""".stripMargin

  /** P4b: the NB-dialect URL strip (`NB.java:67`) against a COMMITTED
    * golden — the 4-alternative pattern carries a `(?!www)` negative
    * lookahead that Java regex (Spark) runs and RE2 (DuckDB) cannot, so
    * the oracle is not a re-derivation: it is the replaceAll output of
    * the reference's own engine (java.lang.String.replaceAll with the
    * verbatim `NB.java:67` pattern) over a planted corpus that exercises
    * every alternative, the lookahead (case 4 must SURVIVE), (?i) case
    * folding, greedy `[^\s]{2,}` tails, and multiple URLs per line —
    * frozen below as VALUES literals. Any drift in
    * [[graft.text.TextOps.NbUrlRe]] breaks the hash match loudly. */
  private val P4bCases: Seq[(Long, String)] = Seq(
    1L -> "check https://example.com/page now",
    2L -> "go to http://www.foo-bar.com/x quickly",
    3L -> "see www.example.org/path here",
    4L -> "https://wwwx.com/abc survives the lookahead",
    5L -> "HTTPS://WWW.EXAMPLE.COM/PAGE case folded",
    6L -> "WWW.TEST.COM leading caps",
    7L -> "visit https://ab.co short host",
    8L -> "https://a.co single-char host",
    9L -> "link https://t.co/abc123! trailing punct eaten",
    10L -> "plain text without links",
    11L -> "www alone is kept",
    12L -> "http://example.com bare scheme no www",
    13L -> "double www.first.com and www.second.org strip twice",
    14L -> "tab\tthen www.x9.io/path end")
  /** Golden `String.replaceAll(NbUrlRe, "")` outputs for [[P4bCases]]. */
  private val P4bGolden: Seq[(Long, String)] = Seq(
    1L -> "check  now",
    2L -> "go to  quickly",
    3L -> "see  here",
    4L -> "https://wwwx.com/abc survives the lookahead",
    5L -> " case folded",
    6L -> " leading caps",
    7L -> "visit  short host",
    8L -> " single-char host",
    9L -> "link  trailing punct eaten",
    10L -> "plain text without links",
    11L -> "www alone is kept",
    12L -> " bare scheme no www",
    13L -> "double  and  strip twice",
    14L -> "tab\tthen  end")
  val p4b: Q = (s, _) => {
    val sp = s
    import sp.implicits._
    P4bCases.toDF("id", "raw")
      .select(col("id"), TextOps.stripUrlNb(col("raw")).as("cleaned"))
      .orderBy("id")
  }
  val p4bSql: String = {
    val rows = P4bGolden
      .map { case (i, t) => s"($i, '${t.replace("'", "''")}')" }
      .mkString(",\n       ")
    s"""SELECT CAST(id AS BIGINT) AS id, cleaned FROM (VALUES
       |$rows) AS t(id, cleaned) ORDER BY id""".stripMargin
  }

  /** P5: mention/hashtag/entity strip `(#|@|&).*?\w+` (`NB.java:68`). */
  val p5: Q = (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      TextOps.stripMention(dirty(
        "a" -> lit("hi @user"), "n" -> (col("doc_id") % 7).cast("string"),
        "b" -> lit(" #tag ok & rest "), "t" -> col("text"))).as("t"))
      .orderBy("doc_id")
  val p5Sql =
    s"""SELECT doc_id, ${TextOps.stripMentionSql("'hi @user' || (doc_id % 7)::VARCHAR || ' #tag ok & rest ' || text")} AS t
       |FROM documents ORDER BY doc_id""".stripMargin

  /** P6: digit strip `\d+` → "" (`NB.java:69`). */
  val p6: Q = (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      TextOps.stripDigits(dirty(
        "a" -> lit("n"), "n" -> (col("doc_id") % 100).cast("string"),
        "b" -> lit(" mid42dle "), "t" -> col("text"))).as("t"))
      .orderBy("doc_id")
  val p6Sql =
    s"""SELECT doc_id, ${TextOps.stripDigitsSql("'n' || (doc_id % 100)::VARCHAR || ' mid42dle ' || text")} AS t
       |FROM documents ORDER BY doc_id""".stripMargin

  /** P7: non-alpha → space `[^a-zA-Z ]` (`NB.java:70`). */
  val p7: Q = (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      TextOps.nonAlphaToSpace(concat(lit("x! y? z."), col("text"))).as("t"))
      .orderBy("doc_id")
  val p7Sql =
    s"""SELECT doc_id, ${TextOps.nonAlphaToSpaceSql("'x! y? z.' || text")} AS t
       |FROM documents ORDER BY doc_id""".stripMargin

  /** P8: lowercase (`NB.java:71`). */
  val p8: Q = (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      lower(concat(upper(col("lang")), lit(" "), col("text"))).as("t"))
      .orderBy("doc_id")
  val p8Sql =
    "SELECT doc_id, lower(upper(lang) || ' ' || text) AS t FROM documents ORDER BY doc_id"

  /** P9: trim + whitespace squeeze (`NB.java:72-73`, trim THEN `\s+`→" "). */
  val p9: Q = (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      TextOps.squeezeWs(trim(concat(lit("  "), col("lang"), lit("   "), col("text"), lit("  ")))).as("t"))
      .orderBy("doc_id")
  val p9Sql =
    s"""SELECT doc_id, ${TextOps.squeezeWsSql("trim('  ' || lang || '   ' || text || '  ')")} AS t
       |FROM documents ORDER BY doc_id""".stripMargin

  /** P10: label normalization, both conventions (`NB.java:75-87`, `SVM.java:75`). */
  val p10: Q = (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      when(col("lang") === "en", "1").otherwise(col("lang")).as("raw"))
      .select(col("doc_id"), col("raw"),
        TextOps.normLabel(col("raw")).as("label_01"),
        TextOps.normLabel(col("raw"), negative = -1.0).as("label_pm"))
      .orderBy("doc_id")
  val p10Sql =
    """SELECT doc_id, raw,
      |       CAST(CASE WHEN raw = '1' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS label_01,
      |       CAST(CASE WHEN raw = '1' THEN 1.0 ELSE -1.0 END AS DOUBLE) AS label_pm
      |FROM (SELECT doc_id, CASE WHEN lang = 'en' THEN '1' ELSE lang END AS raw FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** P11: output-key concat `id@cleanedText` (`NB.java:257`). */
  val p11: Q = (s, d) =>
    Corpus.cleanedNb(s, d)
      .select(concat(col("doc_id").cast("string"), lit("@"), col("clean")).as("k"))
      .orderBy("k")
  val p11Sql =
    s"""WITH ${Corpus.cleanedNbCte}
       |SELECT doc_id::VARCHAR || '@' || clean AS k FROM cleaned ORDER BY k""".stripMargin

  // =====================================================================
  //  §2.3 tokenization / lateral
  // =====================================================================

  /** T1: explode on single-space split of cleaned text (`NB.java:92-95`) —
    * the map-side flatMap; word counts prove the emission multiset. */
  val t1: Q = (s, d) =>
    Corpus.tokensNb(s, d).groupBy("word").agg(count(lit(1)).as("n")).orderBy("word")
  val t1Sql =
    s"""WITH ${Corpus.tokensNbCte}
       |SELECT word, CAST(count(*) AS BIGINT) AS n FROM tokens GROUP BY word ORDER BY word""".stripMargin

  /** T2: whitespace-run tokenizer (StringTokenizer ≈ `\s+`, `SVM.java:80`). */
  val t2: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n")).orderBy("word")
  val t2Sql =
    """SELECT word, CAST(count(*) AS BIGINT) AS n
      |FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents)
      |GROUP BY word ORDER BY word""".stripMargin

  /** T3: `ml.feature.Tokenizer` semantics — lowercase + split on `\s`
    * (`NaiveBayes.py:50`). Verified through an explode to stay relational. */
  val t3: Q = (s, d) => {
    import org.apache.spark.ml.feature.Tokenizer
    val tok = new Tokenizer().setInputCol("t").setOutputCol("words")
    val in = Tables.documents(s, d).select(col("doc_id"), trim(col("text")).as("t"))
    tok.transform(in)
      .select(explode(col("words")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n")).orderBy("word")
  }
  val t3Sql =
    """SELECT word, CAST(count(*) AS BIGINT) AS n
      |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s')) AS word FROM documents)
      |GROUP BY word ORDER BY word""".stripMargin

  // =====================================================================
  //  §2.7 sort / export (O1)
  // =====================================================================

  /** O1: model export sorted by word — the reference's sort is an artifact
    * of the MR shuffle with 3 reducers (`NB.java:294-295`); we mirror the
    * partition-then-sort then impose a total order for determinism. */
  val o1: Q = (s, d) =>
    SentimentNb.model(s, d)
      .repartition(3, col("word")).sortWithinPartitions("word")
      .orderBy("word")
  val o1Sql =
    s"""WITH ${SentimentNb.modelCte}
       |SELECT word, pos, neg FROM model ORDER BY word""".stripMargin

  /** O1B: BYTE-parity model export (round-13, closing the last O1 gap) —
    * the reference writes THREE part files, each sorted within, with
    * words routed by Hadoop's default partitioner
    * `(word.hashCode() & Integer.MAX_VALUE) % numReduceTasks`
    * (`NB.java:294-295`, numReduceTasks = 3). Java's `String.hashCode`
    * (h = Σ c_i·31^(n-1-i), 32-bit wrap) is replayed IDENTICALLY in both
    * engines as an explicit fold in 64-bit arithmetic mod 2^32 — model
    * words are cleaned ASCII, so `ascii(char)` equals the UTF-16 unit
    * Java folds. Emitting (part, word, …) ordered by (part, word) IS the
    * concatenation of the reference's three reducer files in file order,
    * so the hash gate checks the exact on-disk layout. */
  private val JHashExpr =
    "aggregate(split(word, ''), 0L, (h, c) -> pmod(h * 31 + ascii(c), 4294967296L))"
  val o1b: Q = (s, d) =>
    SentimentNb.model(s, d)
      .withColumn("part",
        expr(s"CAST(pmod(pmod($JHashExpr, 2147483648L), 3) AS BIGINT)"))
      .select(col("part"), col("word"), col("pos"), col("neg"))
      .orderBy("part", "word")
  val o1bSql =
    s"""WITH ${SentimentNb.modelCte},
       |h AS (
       |  SELECT word, pos, neg,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(string_split(word, ''), c -> CAST(ascii(c) AS BIGINT))),
       |           (h, c) -> (h * 31 + c) % 4294967296) AS jh
       |  FROM model)
       |SELECT CAST(jh % 2147483648 % 3 AS BIGINT) AS part, word, pos, neg
       |FROM h ORDER BY part, word""".stripMargin

  // =====================================================================
  //  TPC-H-style analytics (scale-oriented headline queries)
  // =====================================================================

  /** Q1-style pricing summary: single-pass hash aggregate over the fact
    * table; all money math in exact integer cents/e4/e6 units. */
  val q1: Q = (s, d) =>
    li(s, d)
      .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_base_c"),
        sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("sum_disc_e4"),
        sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))
          * (lit(100) + cents(col("l_tax")))).as("sum_charge_e6"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
       |  CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_c,
       |  CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS sum_disc_e4,
       |  CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}) * (100 + ${centsSql("l_tax")})) AS BIGINT) AS sum_charge_e6,
       |  round(avg(l_quantity), 4) AS avg_qty,
       |  round(avg(l_extendedprice), 4) AS avg_price,
       |  round(avg(l_discount), 6) AS avg_disc,
       |  CAST(count(*) AS BIGINT) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
       |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q3-style shipping priority: 3-way join (customer ⋈ orders ⋈ lineitem)
    * with both dimension filters pushed below the join, top-10 by revenue.
    * customer is broadcast (small); orders⋈lineitem shuffles on orderkey. */
  val q3: Q = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = ord(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = li(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // no broadcast hint on customer: a 1/5 segment of a TPC-H-scale
    // customer table exceeds broadcast memory — AQE picks BHJ by size
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("l_orderkey"))
      .limit(10)
  }
  val q3Sql =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS revenue_e4
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q5-style local-supplier revenue: 6-table join where every dimension
    * (region→nation→{customer,supplier}) is broadcast; only the
    * orders⋈lineitem edge shuffles. Co-located nation test c=s. */
  val q5: Q = (s, d) => {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d).join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val c = Tables.customer(s, d).join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val sp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val o = ord(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = li(s, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    // customer/supplier are NOT hinted: they scale with SF and would
    // force-broadcast past memory at 100 TB; region/nation stay hinted
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("n_name"))
  }
  val q5Sql =
    s"""SELECT n_name,
       |  CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS revenue_e4
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation   ON s_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name ORDER BY revenue_e4 DESC, n_name""".stripMargin

  // =====================================================================
  //  [EXT] windows / rollup / set ops / semi-anti (free from Catalyst)
  // =====================================================================

  /** W1: running revenue per supplier (window aggregate, no shuffle beyond
    * the hash partition on l_suppkey). The fixture lineitem is NOT
    * TPC-H-unique on (l_orderkey, l_linenumber) — 118k duplicate key
    * pairs at sf0.1 — so the ROWS frame needs `rev_e4` as the final
    * tie-breaker to be a well-defined total order: after it, any still-
    * tied rows are identical in every frame-relevant field and their
    * order cannot change the running sum (found by the round-15 full-sf1
    * oracle sweep: ONE tied pair at sf0.1 replicates 10x at sf1 and the
    * engines split 3/10 on the intermediate sum without the tiebreak). */
  val w1: Q = (s, d) => {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("rev_e4"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li(s, d).select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("rev_e4"),
      col("l_shipdate"))
      .withColumn("running_e4", sum(col("rev_e4")).over(w))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_e4")
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }
  val w1Sql =
    s"""SELECT l_suppkey, l_orderkey, l_linenumber,
       |  CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}))
       |    OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber,
       |          ${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_e4
       |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** W2: top-3 parts by revenue within each brand (row_number top-k —
    * the scalable alternative to a global sort). */
  val w2: Q = (s, d) => {
    val p = Tables.part(s, d).select("p_partkey", "p_brand")
    val rev = li(s, d).groupBy("l_partkey")
      .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("revenue_e4"))
    val w = Window.partitionBy("p_brand").orderBy(col("revenue_e4").desc, col("p_partkey"))
    rev.join(p, col("l_partkey") === col("p_partkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("p_brand", "p_partkey", "revenue_e4", "rk")
      .orderBy("p_brand", "rk")
  }
  val w2Sql =
    s"""SELECT p_brand, p_partkey, revenue_e4, rk FROM (
       |  SELECT p_brand, p_partkey, revenue_e4,
       |    CAST(row_number() OVER (PARTITION BY p_brand ORDER BY revenue_e4 DESC, p_partkey) AS INTEGER) AS rk
       |  FROM (
       |    SELECT p_brand, p_partkey,
       |      CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS revenue_e4
       |    FROM lineitem JOIN part ON l_partkey = p_partkey
       |    GROUP BY p_brand, p_partkey))
       |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin

  /** G2: CUBE over returnflag/linestatus — all grouping-set combinations. */
  val g2: Q = (s, d) =>
    li(s, d).cube("l_returnflag", "l_linestatus")
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  val g2Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** GS1: explicit GROUPING SETS — the independent-marginals shape
    * ((returnflag), (linestatus)) that neither ROLLUP nor CUBE expresses;
    * one scan feeds both marginal aggregates (Spark plans Expand + a
    * single hash aggregate, not two scans). Grouping markers emitted as
    * 'ALL' coalesces so the cross-engine comparison has no NULL-ordering
    * ambiguity. */
  val gs1: Q = (s, d) =>
    li(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty_c"), col("n"))
      .orderBy("flag", "status")
  val gs1Sql: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
       |       coalesce(l_linestatus, 'ALL') AS status,
       |  CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
       |ORDER BY flag, status""".stripMargin

  /** PV1: pivot — returnflag rows × linestatus columns (wide aggregation);
    * fixed pivot values so the plan is single-pass (no distinct-scan). */
  val pv1: Q = (s, d) =>
    li(s, d).groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(cents(col("l_quantity"))))
      .na.fill(0L)
      .withColumnsRenamed(Map("F" -> "qty_f_c", "O" -> "qty_o_c"))
      .orderBy("l_returnflag")
  val pv1Sql: String =
    s"""SELECT l_returnflag,
       |  CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN ${centsSql("l_quantity")} END), 0) AS BIGINT) AS qty_f_c,
       |  CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN ${centsSql("l_quantity")} END), 0) AS BIGINT) AS qty_o_c
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** PV2: UNPIVOT (melt) — the inverse of pv1: per-returnflag wide columns
    * back to (flag, status, qty) long form via `unpivot`; wide→long is the
    * standard normalization step before a groupBy over the melted key. */
  val pv2: Q = (s, d) =>
    pv1(s, d) // (l_returnflag, qty_f_c, qty_o_c)
      .unpivot(Array(col("l_returnflag")), Array(col("qty_f_c"), col("qty_o_c")),
        "status_col", "qty_c")
      .select(col("l_returnflag"),
        when(col("status_col") === "qty_f_c", "F").otherwise("O").as("l_linestatus"),
        col("qty_c"))
      .orderBy("l_returnflag", "l_linestatus")
  val pv2Sql: String =
    s"""SELECT l_returnflag, want AS l_linestatus,
       |       CAST(coalesce(sum(CASE WHEN l_linestatus = want THEN ${centsSql("l_quantity")} END), 0) AS BIGINT) AS qty_c
       |FROM lineitem CROSS JOIN (SELECT unnest(['F', 'O']) AS want) w
       |GROUP BY l_returnflag, want
       |ORDER BY l_returnflag, want""".stripMargin

  /** G1: ROLLUP over returnflag/linestatus (grouping sets). */
  val g1: Q = (s, d) =>
    li(s, d).rollup("l_returnflag", "l_linestatus")
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  val g1Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** SET1: INTERSECT / EXCEPT — customers ordering in both/only-one of two
    * years (distinct set semantics). */
  val set1: Q = (s, d) => {
    val y96 = ord(s, d).filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    val y97 = ord(s, d).filter(year(col("o_orderdate")) === 1997).select("o_custkey")
    val both = y96.intersect(y97).agg(count(lit(1)).as("n")).select(lit("both").as("bucket"), col("n"))
    val only96 = y96.except(y97).agg(count(lit(1)).as("n")).select(lit("only96").as("bucket"), col("n"))
    both.unionAll(only96).orderBy("bucket")
  }
  val set1Sql =
    """SELECT 'both' AS bucket, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      |UNION ALL
      |SELECT 'only96' AS bucket, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      |ORDER BY bucket""".stripMargin

  /** SJ1: left-semi / left-anti joins — customer segments by whether they
    * have any urgent order (EXISTS / NOT EXISTS). */
  val sj1: Q = (s, d) => {
    val urgent = ord(s, d).filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val c = Tables.customer(s, d)
    val withU = c.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n")).withColumn("bucket", lit("has_urgent"))
    val withoutU = c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n")).withColumn("bucket", lit("no_urgent"))
    withU.unionAll(withoutU).select("bucket", "c_mktsegment", "n").orderBy("bucket", "c_mktsegment")
  }
  val sj1Sql =
    """SELECT 'has_urgent' AS bucket, c_mktsegment, CAST(count(*) AS BIGINT) AS n
      |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |UNION ALL
      |SELECT 'no_urgent' AS bucket, c_mktsegment, CAST(count(*) AS BIGINT) AS n
      |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY bucket, c_mktsegment""".stripMargin

  /** Q2-style min-per-group correlated lookup: cheapest supplier per part
    * via window-min (the scalable rewrite of TPC-H Q2's correlated
    * subquery — one shuffle on partkey, no per-row re-scan). */
  val q2: Q = (s, d) => {
    val l = li(s, d).select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val w = Window.partitionBy("l_partkey")
    l.withColumn("min_price_c", min(cents(col("l_extendedprice"))).over(w))
      .filter(cents(col("l_extendedprice")) === col("min_price_c"))
      .groupBy("l_partkey")
      .agg(min(col("l_suppkey")).as("cheapest_supp"), min(col("min_price_c")).as("min_price_c"))
      .orderBy("l_partkey")
  }
  val q2Sql: String =
    s"""SELECT l_partkey, min(l_suppkey) AS cheapest_supp, min(pc) AS min_price_c FROM (
       |  SELECT l_partkey, l_suppkey, ${centsSql("l_extendedprice")} AS pc,
       |         min(${centsSql("l_extendedprice")}) OVER (PARTITION BY l_partkey) AS mpc
       |  FROM lineitem)
       |WHERE pc = mpc GROUP BY l_partkey ORDER BY l_partkey""".stripMargin

  /** Q7-style cross-nation volume: supplier-nation × customer-nation pairs,
    * dimensions broadcast, yearly revenue rollup. */
  val q7: Q = (s, d) => {
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    li(s, d).select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"), year(col("l_shipdate")).as("l_year"))
      .join(ord(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") < col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("revenue_e4"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }
  val q7Sql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       |       CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS revenue_e4
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |WHERE sn.n_name < cn.n_name
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Q17-style correlated-average filter: lineitems below 20% of their
    * part's average quantity — the correlated scalar subquery decorrelated
    * into a window average (one shuffle on partkey, no per-row rescan).
    * Predicate in exact integer cents: 5·qty < avg ⟺ 5·qty·n < sum. */
  val q17: Q = (s, d) =>
    li(s, d).select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        cents(col("l_quantity")).as("qc"))
      .withColumn("sum_qc", sum(col("qc")).over(Window.partitionBy("l_partkey")))
      .withColumn("n_li", count(lit(1)).over(Window.partitionBy("l_partkey")))
      .filter(col("qc") * 5 * col("n_li") < col("sum_qc"))
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("qc"))
      .orderBy("l_partkey", "l_orderkey", "l_linenumber")
  val q17Sql: String =
    s"""SELECT l_partkey, l_orderkey, l_linenumber, qc FROM (
       |  SELECT l_partkey, l_orderkey, l_linenumber,
       |         ${centsSql("l_quantity")} AS qc,
       |         sum(${centsSql("l_quantity")}) OVER (PARTITION BY l_partkey) AS sum_qc,
       |         CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n_li
       |  FROM lineitem)
       |WHERE qc * 5 * n_li < sum_qc
       |ORDER BY l_partkey, l_orderkey, l_linenumber""".stripMargin

  /** Q18: large-volume orders — the HAVING-IN decorrelation shape (TPC-H
    * Q18): an aggregated subquery feeds the probe side of an equi-join
    * instead of a per-row IN evaluation. The aggregate runs FIRST (one
    * partial+final pass over lineitem), its survivor set (~0.1% of orders)
    * drives the joins, and customer broadcasts. Exact-cents quantities. */
  val q18: Q = (s, d) => {
    val big = li(s, d).groupBy("l_orderkey")
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"))
      .filter(col("sum_qty_c") > 250 * 100)
    ord(s, d).join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_c"), col("sum_qty_c"))
      .orderBy(col("price_c").desc, col("o_orderkey"))
  }
  val q18Sql: String =
    s"""SELECT c_custkey, o_orderkey,
       |       ${centsSql("o_totalprice")} AS price_c, sum_qty_c
       |FROM orders
       |JOIN (SELECT l_orderkey,
       |             CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c
       |      FROM lineitem GROUP BY 1
       |      HAVING CAST(sum(${centsSql("l_quantity")}) AS BIGINT) > 25000) b
       |  ON o_orderkey = b.l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |ORDER BY price_c DESC, o_orderkey""".stripMargin

  /** HLL1: sketch-based distinct (approx_count_distinct / HyperLogLog++).
    * The estimate itself is engine-defined (HLL++ register layout), so —
    * the apx1 tolerance-oracle pattern, applied here in round 11 — it
    * stays OUT of the hashed output; what the gate checks is the exact
    * count plus a `within_6pct` flag (3σ at rsd 0.02) whose oracle
    * asserts the literal 1. Sketch drift beyond the bound turns the
    * driver gate red instead of hiding behind a rows-only row. */
  val hll1: Q = (s, d) =>
    li(s, d).agg(
      approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
      countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("exact_orders"),
        (abs(col("approx_orders") - col("exact_orders")) * 100 <=
          col("exact_orders") * 6).cast("int").as("within_6pct"))
  val hll1Sql: String =
    """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |       1 AS within_6pct
      |FROM lineitem""".stripMargin

  /** APX1: approximate percentiles (Greenwald-Khanna sketch via
    * `approx_percentile`) audited against the EXACT distributed
    * percentiles (apx2's path) — the single-pass mergeable-sketch path a
    * 100 TB profile job uses instead of an exact full sort. The sketch
    * value itself is engine-defined, so it stays OUT of the hashed
    * output; instead the TOLERANCE is the oracle: per percentile, the
    * exact cents value plus `within_100bp` = 1 iff the sketch lands
    * within 1% relative error. The DuckDB side asserts the literal 1 —
    * a sketch drifting past the bound flips the Spark flag to 0 and the
    * gate hash goes red (tolerance checking under an exact-hash
    * harness). ScalePathSpec keeps the raw-error assertion. */
  val apx1: Q = (s, d) => {
    val apx = li(s, d)
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)").as("apx_a"))
      .select(posexplode(expr("array(0.5D, 0.95D, 0.99D)")).as(Seq("i", "pct")), col("apx_a"))
      .select(col("pct"), cents(expr("apx_a[i]")).as("apx_c"))
    apx2(s, d).join(broadcast(apx), Seq("pct"))
      .select(col("pct"), col("exact_pct_c"),
        when(abs(col("apx_c") - col("exact_pct_c")) * 10000 <= lit(100L) * col("exact_pct_c"), 1)
          .otherwise(0).as("within_100bp"))
      .orderBy("pct")
  }
  // lazy: apx2Sql is declared further down this object; a strict val here
  // would interpolate null during object init
  lazy val apx1Sql: String =
    s"""SELECT pct, exact_pct_c, CAST(1 AS INTEGER) AS within_100bp
       |FROM ($apx2Sql) ORDER BY pct""".stripMargin

  /** APX2: EXACT distributed percentiles, oracle-checked — aggregate to
    * (value, frequency) pairs first (one hash-agg shuffle; the heavy
    * lifting), then a DISTRIBUTED PREFIX SUM over the distinct values:
    * a global `Window.orderBy` would drag every distinct value to ONE
    * partition (Spark's "No Partition Defined" warning — the single-
    * reducer anti-pattern), so instead the values are range-bucketed
    * (price div 10⁵ ⇒ ~val-range/10⁵ buckets), per-bucket totals form a
    * TINY frame whose running sum is the bucket prefix, and the
    * within-bucket cumsum runs as a window PARTITIONED BY bucket — fully
    * parallel; cf = bucket_prefix + within-bucket cumsum. The rank pick
    * (first value whose cf reaches ceil(pct·n)) is unchanged. Money in
    * integer cents and the identical double `ceil(pct·n)` on both
    * engines ⇒ bit-exact. At 100 TB the sketch (apx1) is the everyday
    * path; this is the exact audit path. */
  val apx2: Q = (s, d) => {
    // round-16 (guide §2.4): the (price_c, f) histogram feeds THREE
    // consumers (bucket prefix, total n, within-bucket cumsum) — persist
    // it so lineitem is scanned once instead of three times; the ≤3-row
    // result is collected and rebuilt locally so the persist drops
    // before returning (no storage pinned on the session)
    val freq = li(s, d)
      .groupBy(cents(col("l_extendedprice")).as("price_c"))
      .agg(count(lit(1)).as("f"))
      .withColumn("bkt", expr("price_c div 100000"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bucket totals: one row per range bucket — small enough that ITS
    // running sum can safely run on a single partition
    val bktPrefix = freq.groupBy("bkt").agg(sum("f").as("bf"))
      .withColumn("bprefix", coalesce(sum("bf").over(
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bkt", "bprefix")
    val n = freq.agg(sum("f").as("n"))
    val cum = freq
      .withColumn("wcum", sum("f").over(
        Window.partitionBy("bkt").orderBy("price_c")))
      .join(broadcast(bktPrefix), "bkt")
      .withColumn("cf", col("bprefix") + col("wcum"))
      .crossJoin(broadcast(n))
    val pcts = s.sql("SELECT explode(array(0.5D, 0.95D, 0.99D)) AS pct")
    val res = cum.join(broadcast(pcts), col("cf") >= ceil(col("pct") * col("n")))
      .groupBy("pct").agg(min("price_c").as("exact_pct_c"))
      .orderBy("pct")
    val rows = res.collect().toSeq
    freq.unpersist()
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), res.schema)
  }
  val apx2Sql: String =
    s"""WITH freq AS (
       |  SELECT ${centsSql("l_extendedprice")} AS price_c, count(*) AS f
       |  FROM lineitem GROUP BY 1),
       |cum AS (
       |  SELECT price_c,
       |         CAST(sum(f) OVER (ORDER BY price_c) AS BIGINT) AS cf,
       |         CAST(sum(f) OVER () AS BIGINT) AS n
       |  FROM freq),
       |pcts AS (SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS pct)
       |SELECT pct, min(price_c) AS exact_pct_c
       |FROM cum JOIN pcts ON cf >= ceil(pct * n)
       |GROUP BY pct ORDER BY pct""".stripMargin

  /** SK1: skew-aware two-phase count-distinct — distinct words per LANGUAGE
    * (5 heavy keys over 32 partitions = the classic skewed-aggregation
    * shape). Phase 1 shuffles on the COMPOSITE (lang, word) key — spreading
    * each heavy lang across all partitions — phase 2 counts the already-
    * distinct pairs per lang. A naive `groupBy(lang).agg(countDistinct)`
    * funnels each lang through one task; this plan scales with cluster
    * width regardless of key skew. */
  val sk1: Q = (s, d) => {
    val pairs = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .distinct() // phase 1: shuffle on (lang, word) — skew-free
    pairs.groupBy("lang").agg(count(lit(1)).as("n_distinct_words")) // phase 2
      .orderBy("lang")
  }
  val sk1Sql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_distinct_words FROM (
      |  SELECT DISTINCT lang, word FROM (
      |    SELECT lang, unnest(str_split(text, ' ')) AS word FROM documents))
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Q4-style EXISTS: orders in a half-year window having at least one
    * returned line — the correlated EXISTS expressed as a LEFT SEMI join
    * (one shuffle on orderkey; no per-row subquery re-scan). */
  val q4: Q = (s, d) => {
    val returned = li(s, d).filter(col("l_returnflag") === "R").select("l_orderkey")
    ord(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }
  val q4Sql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q13-style customer order-count distribution: LEFT OUTER join keeping
    * order-less customers (count(o_orderkey) = 0), then a second aggregate
    * over the counts — two shuffles, both on uniform keys. */
  val q13: Q = (s, d) => {
    val o = ord(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    Tables.customer(s, d).select("c_custkey")
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }
  val q13Sql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q22-style idle-rich customers: balance above the positive-balance
    * average (scalar-subquery → broadcast single-row cross join) AND no
    * URGENT order (NOT EXISTS → LEFT ANTI join; "urgent" rather than "any"
    * so the anti-join has survivors on the dense synthetic orders table).
    * Balance math in exact cents; the avg is the same long-sum/long-count
    * division in both engines. */
  val q22: Q = (s, d) => {
    val avgBal = Tables.customer(s, d).filter(col("c_acctbal") > 0)
      .agg(avg(cents(col("c_acctbal"))).as("avg_bal_c"))
    Tables.customer(s, d)
      .join(broadcast(avgBal))
      .filter(cents(col("c_acctbal")) > col("avg_bal_c"))
      .join(ord(s, d).filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), sum(cents(col("c_acctbal"))).as("totacctbal_c"))
      .orderBy("c_mktsegment")
  }
  val q22Sql: String =
    s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
       |       CAST(sum(${centsSql("c_acctbal")}) AS BIGINT) AS totacctbal_c
       |FROM customer
       |WHERE ${centsSql("c_acctbal")} > (
       |    SELECT avg(${centsSql("c_acctbal")}) FROM customer WHERE c_acctbal > 0)
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** W3: per-user inter-event gaps via lag() — sessionization's building
    * block; one shuffle on user_id, exact integer microsecond math. */
  val w3: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), min("gap_us").as("min_gap_us"),
        max("gap_us").as("max_gap_us"), sum("gap_us").as("sum_gap_us"))
      .orderBy("user_id")
  }
  val w3Sql: String =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |       min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
      |       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
      |FROM (
      |  SELECT user_id,
      |         epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
      |  FROM events)
      |WHERE gap_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** W4: ntile(4) balance quartiles within each nation — partitioned, so
    * the total order is per-nation (scalable), never a global sort. */
  val w4: Q = (s, d) => {
    val w = Window.partitionBy("c_nationkey").orderBy("bal_c", "c_custkey")
    Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_custkey"), cents(col("c_acctbal")).as("bal_c"))
      .withColumn("quartile", ntile(4).over(w))
      .groupBy("c_nationkey", "quartile")
      .agg(count(lit(1)).as("n"), min("bal_c").as("min_bal_c"), max("bal_c").as("max_bal_c"))
      .orderBy("c_nationkey", "quartile")
  }
  val w4Sql: String =
    s"""SELECT c_nationkey, quartile, CAST(count(*) AS BIGINT) AS n,
       |       min(bal_c) AS min_bal_c, max(bal_c) AS max_bal_c
       |FROM (
       |  SELECT c_nationkey, ${centsSql("c_acctbal")} AS bal_c,
       |         CAST(ntile(4) OVER (PARTITION BY c_nationkey
       |           ORDER BY ${centsSql("c_acctbal")}, c_custkey) AS INTEGER) AS quartile
       |  FROM customer)
       |GROUP BY c_nationkey, quartile ORDER BY c_nationkey, quartile""".stripMargin

  /** Q6-style forecast revenue: pure filter + single-row aggregate — the
    * minimal scan-bound query; every predicate must reach PushedFilters so
    * the scan is the whole plan. */
  val q6: Q = (s, d) =>
    li(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice")) * cents(col("l_discount"))).as("revenue_e4"),
        count(lit(1)).as("n_lines"))
  val q6Sql: String =
    s"""SELECT CAST(sum(${centsSql("l_extendedprice")} * ${centsSql("l_discount")}) AS BIGINT) AS revenue_e4,
       |       CAST(count(*) AS BIGINT) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** Q14-style promo share: conditional aggregate over a join — the
    * numerator is a CASE inside the same sum pass (no second scan); share
    * in exact basis points via integer division. */
  val q14: Q = (s, d) =>
    li(s, d)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"),
          cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .otherwise(0L)).as("promo_e4"),
        sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("total_e4"))
      .select(col("promo_e4"), col("total_e4"),
        // DECIMAL ratio: a month of e4-unit revenue at TPC-H sf100k is
        // ~2.7e18 — the SUM fits int64 but promo_e4 * 10000 wraps; the
        // bp share is the deliverable, so it divides in decimal
        expr("CAST(CAST(promo_e4 AS DECIMAL(38,0)) * 10000 div total_e4 AS BIGINT)")
          .as("promo_share_bp"))
  val q14Sql: String =
    s"""SELECT promo_e4, total_e4,
       |       CAST(CAST(promo_e4 AS HUGEINT) * 10000 // total_e4 AS BIGINT) AS promo_share_bp FROM (
       |  SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
       |               THEN ${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})
       |               ELSE 0 END) AS BIGINT) AS promo_e4,
       |         CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS total_e4
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00')""".stripMargin

  /** Q19-style disjunctive predicate join: OR-of-ANDs across two tables —
    * the shape that tests predicate normalization: the common l/p join key
    * plus per-branch ranges; Catalyst extracts the shared join condition
    * and pushes the common `l_quantity` bounds to the scan. */
  val q19: Q = (s, d) =>
    li(s, d).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(Tables.part(s, d).select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 40)))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("revenue_e4"),
        count(lit(1)).as("n_lines"))
  val q19Sql: String =
    s"""SELECT CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS revenue_e4,
       |       CAST(count(*) AS BIGINT) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  /** Q9-style profit rollup: 5-table join (lineitem⋈part⋈supplier⋈nation,
    * orders for the year) aggregated by (nation, year). Margin proxy =
    * revenue − qty·retailprice/10 in exact integer e4 units (the fixture
    * has no partsupp cost table). Dimension joins broadcast; the only
    * data-sized shuffle is the final group-by. */
  val q9: Q = (s, d) => {
    val p = Tables.part(s, d).filter(col("p_name").contains("a"))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("cost_c"))
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    li(s, d).select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        cents(col("l_quantity")).as("qty_c"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("rev_e4"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(ord(s, d).select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("n_name", "o_year")
      // `div` (integer) — Column./ on longs is DOUBLE division in Spark
      .agg(sum(col("rev_e4") - expr("qty_c * cost_c div 10")).as("profit_e4"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name", "o_year")
  }
  val q9Sql: String =
    s"""SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |  CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})
       |           - ${centsSql("l_quantity")} * ${centsSql("p_retailprice")} // 10) AS BIGINT) AS profit_e4,
       |  CAST(count(*) AS BIGINT) AS n_lines
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%a%'
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q16-style supplier-part counts: distinct suppliers per (brand, type,
    * size) for parts NOT supplied by any 'F'-status-order customer's
    * suppliers — here adapted: exclude suppliers appearing on 'R'-returned
    * lines (NOT IN → LEFT ANTI join), then the skew-safe two-phase
    * distinct count. */
  val q16: Q = (s, d) => {
    val excluded = li(s, d)
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 49)
      .select(col("l_suppkey")).distinct()
    val pairs = li(s, d).select("l_partkey", "l_suppkey")
      .join(excluded, Seq("l_suppkey"), "left_anti")
      .join(Tables.part(s, d).select("p_partkey", "p_brand", "p_type", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .select("p_brand", "p_type", "p_size", "l_suppkey")
      .distinct() // phase 1: shuffle on the composite key (skew-free)
    pairs.groupBy("p_brand", "p_type", "p_size")
      .agg(count(lit(1)).as("supplier_cnt")) // phase 2
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }
  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, CAST(count(*) AS BIGINT) AS supplier_cnt FROM (
      |  SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_suppkey NOT IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_returnflag = 'R' AND l_quantity > 49))
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** W5: RANGE-frame window — revenue within ±1 day of each order date per
    * priority (a value-range frame, not a row-count frame: peers are
    * determined by the ORDER BY value, the frame the row-based w1 cannot
    * express). Day-granular long key keeps the range arithmetic integral. */
  val w5: Q = (s, d) => {
    val byDay = ord(s, d).select(col("o_orderpriority"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        cents(col("o_totalprice")).as("price_c"))
      .groupBy("o_orderpriority", "day").agg(sum("price_c").as("day_price_c"))
    val w = Window.partitionBy("o_orderpriority").orderBy("day").rangeBetween(-1, 1)
    byDay.withColumn("win3_price_c", sum("day_price_c").over(w))
      .orderBy("o_orderpriority", "day")
  }
  val w5Sql: String =
    s"""SELECT o_orderpriority, day, day_price_c,
       |  CAST(sum(day_price_c) OVER (PARTITION BY o_orderpriority ORDER BY day
       |       RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS win3_price_c
       |FROM (
       |  SELECT o_orderpriority, epoch_us(o_orderdate) // 86400000000 AS day,
       |         CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS day_price_c
       |  FROM orders GROUP BY 1, 2)
       |ORDER BY o_orderpriority, day""".stripMargin

  /** SK2: SALTED join — the skew-mitigation pattern for a shuffle join on
    * a heavily-skewed key (5 langs over the whole corpus: a naive shuffle
    * join funnels each lang through one task). The fact side gets a
    * deterministic salt (doc_id % 16); the dim side is replicated ×16 via a
    * range cross join; the join key becomes (lang, salt) → 80 uniform
    * tasks. `shuffle_hash` hint keeps it a shuffle join so the pattern is
    * actually exercised (AQE would broadcast this tiny dim; at 100 TB a
    * mid-size dim over a skewed key is exactly where salting applies). */
  val sk2: Q = (s, d) => {
    val SaltN = 16
    val fact = Tables.documents(s, d).select(col("lang"), col("n_chars"),
      (col("doc_id") % SaltN).cast("int").as("salt"))
    val dim = Tables.documents(s, d).groupBy("lang").agg(count(lit(1)).as("lang_docs"))
    val saltedDim = dim.crossJoin(
      s.range(SaltN).select(col("id").cast("int").as("salt")))
    fact.join(saltedDim.hint("shuffle_hash"), Seq("lang", "salt"))
      .groupBy("lang", "lang_docs")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")
  }
  val sk2Sql: String =
    """SELECT d.lang, ld.lang_docs, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
      |FROM documents d
      |JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS lang_docs
      |      FROM documents GROUP BY lang) ld ON d.lang = ld.lang
      |GROUP BY d.lang, ld.lang_docs ORDER BY d.lang""".stripMargin

  /** X1: top-3 parts by revenue per brand through the CUSTOM Catalyst
    * operator (graft.plans.TopKPerGroup: LogicalPlan + Strategy + partial/
    * final SparkPlans) — the map-side-pruned alternative to w2's window
    * formulation; identical result contract, so the same oracle shape. */
  val x1: Q = (s, d) => {
    val p = Tables.part(s, d).select("p_partkey", "p_brand")
    val rev = li(s, d).groupBy("l_partkey")
      .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("revenue_e4"))
    val joined = rev.join(p, col("l_partkey") === col("p_partkey"))
      .select("p_brand", "p_partkey", "revenue_e4")
    graft.plans.TopKPerGroup(joined,
        Seq("p_brand"), Seq("revenue_e4" -> true, "p_partkey" -> false), 3)
      .orderBy("p_brand", "p_partkey")
  }
  val x1Sql: String =
    s"""SELECT p_brand, p_partkey, revenue_e4 FROM (
       |  SELECT p_brand, p_partkey, revenue_e4,
       |    row_number() OVER (PARTITION BY p_brand ORDER BY revenue_e4 DESC, p_partkey) AS rk
       |  FROM (
       |    SELECT p_brand, p_partkey,
       |      CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS revenue_e4
       |    FROM lineitem JOIN part ON l_partkey = p_partkey
       |    GROUP BY p_brand, p_partkey))
       |WHERE rk <= 3 ORDER BY p_brand, p_partkey""".stripMargin

  /** X2: the SAME top-3-per-brand query as x1, written as the STOCK
    * window idiom (`row_number().over(...) <= 3`, rank dropped) with the
    * [[graft.plans.RewriteRankFilterToTopK]] optimizer rule enabled —
    * the planner swaps in the bounded-exchange custom operator while the
    * user keeps the declarative formulation (plan asserted in TopKSpec).
    * Same oracle as x1: the rewrite must be result-invisible. NOTE: the
    * opt-in conf stays on for the session; every rank-filter in this
    * suite orders by a total order, so the rewrite is semantics-
    * preserving wherever it fires. */
  val x2: Q = (s, d) => {
    graft.plans.RewriteRankFilterToTopK.ensure(s)
    s.conf.set("spark.graft.rewriteRankFilter", "true")
    val p = Tables.part(s, d).select("p_partkey", "p_brand")
    val rev = li(s, d).groupBy("l_partkey")
      .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("revenue_e4"))
    val joined = rev.join(p, col("l_partkey") === col("p_partkey"))
      .select("p_brand", "p_partkey", "revenue_e4")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_brand").orderBy(col("revenue_e4").desc, col("p_partkey"))
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")
      .orderBy("p_brand", "p_partkey")
  }

  // =====================================================================
  //  registry
  // =====================================================================

  val queries: Map[String, Q] = Map(
    "x2_topk_rank_rewrite" -> x2,
    "s1_scan_pruned" -> s1,
    "s2_partitioned_scan" -> s2,
    "s3_union_scan" -> s3,
    "s5_text_sink_lines" -> s5,
    "s6_overwrite_sink" -> s6,
    "s7_metrics_sink" -> s7,
    "p1_csv_split_stitch" -> p1,
    "p2_malformed_filter" -> p2,
    "p3_empty_text_guard" -> p3,
    "p4_url_strip" -> p4,
    "p4b_url_strip_nb" -> p4b,
    "p5_mention_strip" -> p5,
    "p6_digit_strip" -> p6,
    "p7_nonalpha_space" -> p7,
    "p8_lowercase" -> p8,
    "p9_trim_squeeze" -> p9,
    "p10_label_normalize" -> p10,
    "p11_key_concat" -> p11,
    "t1_explode_tokens" -> t1,
    "t2_tokenize_ws_runs" -> t2,
    "t3_ml_tokenizer" -> t3,
    "o1_sorted_model_export" -> o1,
    "o1b_model_export_parts" -> o1b,
    "q1_pricing_summary" -> q1,
    "q3_shipping_priority" -> q3,
    "q5_local_supplier_revenue" -> q5,
    "w1_running_revenue" -> w1,
    "w2_topk_per_group" -> w2,
    "g1_rollup" -> g1,
    "set1_intersect_except" -> set1,
    "sj1_semi_anti_join" -> sj1,
    "sk1_skew_twophase_distinct" -> sk1,
    "q2_min_per_group" -> q2,
    "q7_cross_nation_volume" -> q7,
    "hll1_sketch_distinct" -> hll1,
    "g2_cube" -> g2,
    "gs1_grouping_sets" -> gs1,
    "pv1_pivot" -> pv1,
    "q17_correlated_avg_filter" -> q17,
    "q18_large_volume_orders" -> q18,
    "q4_exists_priority" -> q4,
    "q13_order_count_dist" -> q13,
    "q22_idle_rich_antijoin" -> q22,
    "w3_lag_event_gaps" -> w3,
    "w4_ntile_quartiles" -> w4,
    "x1_topk_custom_strategy" -> x1,
    "sk2_salted_skew_join" -> sk2,
    "apx1_quantile_sketch" -> apx1,
    "apx2_exact_percentiles" -> apx2,
    "s8_csv_source" -> s8,
    "s9_json_source" -> s9,
    "q9_profit_rollup" -> q9,
    "q16_supplier_part_counts" -> q16,
    "w5_range_frame_window" -> w5,
    "pv2_unpivot" -> pv2,
    "q6_forecast_revenue" -> q6,
    "q14_promo_share" -> q14,
    "q19_disjunctive_join" -> q19,
  )

  val oracle: Map[String, String] = Map(
    "hll1_sketch_distinct" -> hll1Sql,
    "s1_scan_pruned" -> s1Sql,
    "s2_partitioned_scan" -> s2Sql,
    "s3_union_scan" -> s3Sql,
    "s5_text_sink_lines" -> s5Sql,
    "s7_metrics_sink" -> s7Sql,
    "p1_csv_split_stitch" -> p1Sql,
    "p2_malformed_filter" -> p2Sql,
    "p3_empty_text_guard" -> p3Sql,
    "p4_url_strip" -> p4Sql,
    "p4b_url_strip_nb" -> p4bSql,
    "p5_mention_strip" -> p5Sql,
    "p6_digit_strip" -> p6Sql,
    "p7_nonalpha_space" -> p7Sql,
    "p8_lowercase" -> p8Sql,
    "p9_trim_squeeze" -> p9Sql,
    "p10_label_normalize" -> p10Sql,
    "p11_key_concat" -> p11Sql,
    "t1_explode_tokens" -> t1Sql,
    "t2_tokenize_ws_runs" -> t2Sql,
    "t3_ml_tokenizer" -> t3Sql,
    "o1_sorted_model_export" -> o1Sql,
    "o1b_model_export_parts" -> o1bSql,
    "q1_pricing_summary" -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier_revenue" -> q5Sql,
    "w1_running_revenue" -> w1Sql,
    "w2_topk_per_group" -> w2Sql,
    "g1_rollup" -> g1Sql,
    "set1_intersect_except" -> set1Sql,
    "sj1_semi_anti_join" -> sj1Sql,
    "sk1_skew_twophase_distinct" -> sk1Sql,
    "q2_min_per_group" -> q2Sql,
    "q7_cross_nation_volume" -> q7Sql,
    "g2_cube" -> g2Sql,
    "gs1_grouping_sets" -> gs1Sql,
    "pv1_pivot" -> pv1Sql,
    "q17_correlated_avg_filter" -> q17Sql,
    "q18_large_volume_orders" -> q18Sql,
    "q4_exists_priority" -> q4Sql,
    "q13_order_count_dist" -> q13Sql,
    "q22_idle_rich_antijoin" -> q22Sql,
    "w3_lag_event_gaps" -> w3Sql,
    "w4_ntile_quartiles" -> w4Sql,
    "x1_topk_custom_strategy" -> x1Sql,
    "x2_topk_rank_rewrite" -> x1Sql,
    "sk2_salted_skew_join" -> sk2Sql,
    "apx1_quantile_sketch" -> apx1Sql,
    "apx2_exact_percentiles" -> apx2Sql,
    "s8_csv_source" -> s8Sql,
    "s9_json_source" -> s9Sql,
    "q9_profit_rollup" -> q9Sql,
    "q16_supplier_part_counts" -> q16Sql,
    "w5_range_frame_window" -> w5Sql,
    "pv2_unpivot" -> pv2Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q14_promo_share" -> q14Sql,
    "q19_disjunctive_join" -> q19Sql,
  )
}
