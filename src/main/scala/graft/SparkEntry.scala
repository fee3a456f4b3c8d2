package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ml.MlPipelines
import graft.ops.{AsOf, Dedup, Events, Relational, SentimentNb, SentimentSvm, Similarity, SqlSurface, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared-operator inventory (SURVEY §2); every
  * entry with a key in `oracleSql` is hash-checked against DuckDB at
  * sf0.01 by the driver's Verify run.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q5-style 6-table join: dimensions broadcast, facts shuffle once. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ SentimentNb.queries ++ SentimentSvm.queries ++
      Events.queries ++ MlPipelines.queries ++
      Dedup.queries ++ TextAnalysis.queries ++ Similarity.queries ++
      graft.streaming.Streams.queries ++ graft.multimodal.Multimodal.queries ++
      graft.ml.SvmSgd.queries ++ SqlSurface.queries ++ graft.ml.MlLsh.queries ++
      AsOf.queries ++ ops.ScaleOps.queries ++ ops.TpchFull.queries ++
      ops.Retrieval.queries ++ ops.Pipeline.queries ++ ops.Graph.queries ++
      ops.Clustering.queries ++ ops.Selection.queries ++ ops.Curation.queries ++
      ops.Evaluation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ SentimentNb.oracle ++ SentimentSvm.oracle ++
      Events.oracle ++ MlPipelines.oracle ++ graft.ml.SvmSgd.oracle ++
      Dedup.oracle ++ TextAnalysis.oracle ++ Similarity.oracle ++
      graft.streaming.Streams.oracle ++ graft.multimodal.Multimodal.oracle ++
      SqlSurface.oracle ++ graft.ml.MlLsh.oracle ++ AsOf.oracle ++ ops.ScaleOps.oracle ++
      ops.TpchFull.oracle ++ ops.Retrieval.oracle ++ ops.Pipeline.oracle ++ ops.Graph.oracle ++
      ops.Clustering.oracle ++ ops.Selection.oracle ++ ops.Curation.oracle ++
      ops.Evaluation.oracle
}
