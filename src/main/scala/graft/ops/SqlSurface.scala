package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.functions.{ConfusionMetricsAggregator, GraftFunctions}

/** The `spark.sql(...)` textual-SQL surface (free from Catalyst; the
  * reference has no SQL parser at all) plus the custom-function and
  * typed-Aggregator extension points, each verified against DuckDB.
  */
object SqlSurface {
  type Q = (SparkSession, String) => DataFrame

  /** SQL1: plain ANSI SQL through the parser over temp views. */
  val sql1: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem_v GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }
  val sql1Sql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** SQL2: custom expression-tree functions (graft_clean_nb) invoked from
    * textual SQL — proves the FunctionRegistry/extensions wiring end-to-end
    * and stays codegen'd (expression trees, not UDFs). */
  val sql2: Q = (s, d) => {
    GraftFunctions.register(s)
    Tables.documents(s, d).createOrReplaceTempView("documents_v")
    s.sql(
      """SELECT doc_id, graft_clean_nb(text) AS clean,
        |       graft_hamming(source, lang) AS src_lang_dist
        |FROM documents_v ORDER BY doc_id""".stripMargin)
  }
  val sql2Sql: String = {
    val clean = graft.text.TextOps.cleanNbSql("text")
    // graft_hamming = positions differing (over the common prefix) + length delta
    """WITH sl AS (
      |  SELECT doc_id,
      |         substr(source, 1, least(length(source), length(lang))) AS a,
      |         substr(lang, 1, least(length(source), length(lang))) AS b,
      |         abs(length(source) - length(lang)) AS ld
      |  FROM documents),
      |ch AS (
      |  SELECT doc_id, unnest(string_split_regex(a, '')) AS sc,
      |         unnest(string_split_regex(b, '')) AS lc
      |  FROM sl),
      |hd AS (
      |  SELECT doc_id, CAST(sum(CASE WHEN sc <> lc THEN 1 ELSE 0 END) AS BIGINT) AS nd
      |  FROM ch GROUP BY doc_id)
      |SELECT d.doc_id, CLEAN AS clean,
      |       CAST(coalesce(h.nd, 0) + s.ld AS BIGINT) AS src_lang_dist
      |FROM documents d
      |JOIN sl s ON d.doc_id = s.doc_id
      |LEFT JOIN hd h ON d.doc_id = h.doc_id
      |ORDER BY d.doc_id""".stripMargin.replace("CLEAN", clean)
  }

  /** A5: typed `Aggregator` metrics (the MulticlassMetrics-equivalent as a
    * first-class typed aggregate) over the NB scores — same oracle math as
    * the SQL metric path. */
  val a5: Q = (s, d) => {
    val sp = s
    import sp.implicits._
    SentimentNb.m6(s, d)
      .select(col("prediction"), col("label")).as[(Double, Double)]
      .select(new ConfusionMetricsAggregator().toColumn)
      .toDF()
  }
  val a5Sql: String = SentimentNb.binaryMetricsSql

  val queries: Map[String, Q] = Map(
    "sql1_ansi_sql_surface" -> sql1,
    "sql2_extension_functions" -> sql2,
    "a5_typed_aggregator_metrics" -> a5,
  )

  val oracle: Map[String, String] = Map(
    "sql1_ansi_sql_surface" -> sql1Sql,
    "sql2_extension_functions" -> sql2Sql,
    "a5_typed_aggregator_metrics" -> a5Sql,
  )
}
