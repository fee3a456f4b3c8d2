package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 skew measurement (VERDICT item 6): the d3/d6/d20 hot-key caps
  * are COUNT WINDOWS riding the exchange their self-join needs anyway, so
  * a pathologically hot band/shingle key would sort its whole group in
  * ONE window task before the cap filter applies. This probe measures the
  * actual group-size distribution of every such window key at a given
  * scale factor, so the "replace the window with a broadcast key-count
  * semi-join" escalation is driven by a number instead of a fear.
  * Not registry-bound; invoked manually:
  *   sbt "runMain graft.tools.SkewProbe <sfDir>" */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dist(name: String, groups: DataFrame): Unit = {
      val r = groups.agg(
        count(lit(1)).as("n_groups"),
        max("c").as("max"),
        expr("percentile_approx(c, 0.5)").as("p50"),
        expr("percentile_approx(c, 0.99)").as("p99"),
        sum(when(col("c") > 50, 1L).otherwise(0L)).as("n_over_cap"),
        sum(when(col("c") > 1000000, 1L).otherwise(0L)).as("n_over_1e6")).head()
      println(s"[skew] $name: groups=${r.get(0)} max=${r.get(1)} " +
        s"p50=${r.get(2)} p99=${r.get(3)} over_cap50=${r.get(4)} over_1e6=${r.get(5)}")
    }

    val corp = graft.ops.Dedup.corpus(spark, d)
    // d3's (band, bi) window key — the hot-band cap exchange
    dist("d3 band(band,bi)", graft.ops.Dedup.idxBandsOf(corp)
      .groupBy("band", "bi").agg(count(lit(1)).as("c")))
    // d20's (sh) window key — the stop-shingle cap exchange
    val sh = graft.ops.Dedup.shinglesOf(corp.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        expr("CAST(conv(substr(md5(shingle), 1, 15), 16, 10) AS BIGINT)").as("sh"))
    dist("d20 shingle(sh)", sh.groupBy("sh").agg(count(lit(1)).as("c")))
    // d6's (lang, source, sh) window key
    val docs = graft.Tables.documents(spark, d)
    dist("d6 block(lang,source,sh)",
      sh.join(docs.select(col("doc_id"), col("lang"), col("source")), "doc_id")
        .groupBy("lang", "source", "sh").agg(count(lit(1)).as("c")))
    // per-doc size window (d6/d20's second window)
    dist("per-doc (doc_id)", sh.groupBy("doc_id").agg(count(lit(1)).as("c")))
    spark.stop()
  }
}
