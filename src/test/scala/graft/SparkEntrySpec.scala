package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: the `SparkEntry.queries` map is a `++` of ~19
  * per-family maps, and `++` silently keeps the LAST binding on a key
  * collision — a new op that reuses an existing name would shadow (or be
  * shadowed by) the old one and still verify green under the old
  * semantics. Caught live in round 9 (a second `pack1_sequence_packing`);
  * these checks make the next collision a compile-adjacent failure
  * instead of a silent shadow. */
class SparkEntrySpec extends AnyFunSuite {

  private val families: Seq[(String, Map[String, _])] = Seq(
    "Relational" -> ops.Relational.queries,
    "SentimentNb" -> ops.SentimentNb.queries,
    "SentimentSvm" -> ops.SentimentSvm.queries,
    "Events" -> ops.Events.queries,
    "MlPipelines" -> ml.MlPipelines.queries,
    "Dedup" -> ops.Dedup.queries,
    "TextAnalysis" -> ops.TextAnalysis.queries,
    "Similarity" -> ops.Similarity.queries,
    "Streams" -> streaming.Streams.queries,
    "Multimodal" -> multimodal.Multimodal.queries,
    "SvmSgd" -> ml.SvmSgd.queries,
    "SqlSurface" -> ops.SqlSurface.queries,
    "MlLsh" -> ml.MlLsh.queries,
    "AsOf" -> ops.AsOf.queries,
    "ScaleOps" -> ops.ScaleOps.queries,
    "TpchFull" -> ops.TpchFull.queries,
    "Retrieval" -> ops.Retrieval.queries,
    "Pipeline" -> ops.Pipeline.queries,
    "Graph" -> ops.Graph.queries,
    "Clustering" -> ops.Clustering.queries,
    "Selection" -> ops.Selection.queries,
    "Curation" -> ops.Curation.queries,
    "Evaluation" -> ops.Evaluation.queries)

  test("no query key is claimed by two family maps") {
    val all = families.flatMap { case (fam, m) => m.keys.map(_ -> fam) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"colliding registry keys: ${dups.map { case (k, fs) => s"$k <- ${fs.map(_._2).mkString("+")}" }.mkString(", ")}")
    assert(SparkEntry.queries.size === all.size,
      "merged registry must carry every family binding")
  }

  test("every oracle key has a query, and names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
    qs.foreach(k => assert(k.matches("[a-z0-9_]+"), s"non-kebab key: $k"))
  }
}
