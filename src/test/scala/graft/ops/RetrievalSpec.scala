package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.GraftApi

/** BM25 retrieval: planted-relevance ranking, tie determinism, and the
  * no-cartesian plan contract. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark engine"),          // heavy on 'spark'
    (2L, "spark engine for big data"),          // one 'spark', longer
    (3L, "hash join and sort merge join"),      // relevant to q2 only
    (4L, "totally unrelated words here"),
    (5L, "spark")                               // short doc, one 'spark'
  ).toDF("doc_id", "text")

  private def q = Seq((1, "spark"), (2, "hash"), (2, "merge")).toDF("query_id", "term")

  test("bm25TopK ranks the term-dense doc first and never returns non-matching docs") {
    val out = GraftApi.bm25TopK(docs, q, k = 3)
      .orderBy("query_id", "rnk")
      .collect()
    val q1 = out.filter(_.getInt(0) == 1).map(r => (r.getInt(1), r.getLong(2)))
    // doc 5 (dl=1, tf=1) outranks doc 1 (tf=3 but dl=4) is possible under
    // length normalization — assert the exact invariants instead of a fixed
    // permutation: all three spark-containing docs are returned, doc 4 never is
    assert(q1.map(_._2).toSet == Set(1L, 2L, 5L))
    val q2 = out.filter(_.getInt(0) == 2).map(_.getLong(2))
    assert(q2.toSeq == Seq(3L)) // only doc 3 matches q2's terms
    // doc 3 matched two terms — its score must exceed what either term alone gives
    assert(out.forall(_.getLong(3) > 0L))
  }

  test("bm25TopK scores are deterministic across reruns") {
    val a = GraftApi.bm25TopK(docs, q).collect().map(_.toSeq).toSet
    val b = GraftApi.bm25TopK(docs, q).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("bm25 plan broadcasts the query probe and never builds a cartesian over the corpus") {
    val plan = GraftApi.bm25TopK(docs, q).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("registry ret1 equals the library call on the fixture") {
    val reg = graft.SparkEntry.queries("ret1_bm25_topk")(spark, sfDir).collect().map(_.toSeq)
    val qs = Seq(1 -> "spark", 1 -> "table", 2 -> "hash", 2 -> "merge", 2 -> "sort",
      3 -> "window", 3 -> "scan").toDF("query_id", "term")
    val lib = GraftApi.bm25TopK(
      graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), qs, k = 5)
      .orderBy("query_id", "rnk").collect().map(_.toSeq)
    assert(reg.toSeq == lib.toSeq)
  }

  test("rrfFuse: a doc mid-ranked in BOTH signals outranks a doc top-ranked in ONE") {
    // hand-built rank frames: doc 100 is rank 1 sparse only (rrf =
    // 1e6/61 = 16393); doc 200 is rank 2 sparse + rank 1 dense (rrf =
    // 1e6/62 + 1e6/61 = 16129 + 16393 = 32522) -> 200 must fuse above 100.
    val sparse = Seq((1, 1, 100L), (1, 2, 200L)).toDF("query_id", "rnk", "doc_id")
    val dense = Seq((1L, 200L, 1), (1L, 300L, 2)).toDF("q_id", "cand_id", "rk")
    val out = GraftApi.rrfFuse(sparse, dense, kOut = 10)
      .orderBy("query_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._3).toSeq == Seq(200L, 100L, 300L),
      s"fused order must be two-signal doc first, got ${out.toSeq}")
    assert(out.head._4 == 1000000L / 62 + 1000000L / 61, "exact integer RRF math")
    assert(out(1)._4 == 1000000L / 61)
    // dense-only doc 300: rank 2 dense -> 1e6/62
    assert(out(2)._4 == 1000000L / 62)
  }

  test("ret2 registry query returns fused top-10 rows and exact per-signal provenance") {
    val rows = Retrieval.ret2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every row's rrf_e6 equals the recomputation from its own rank columns
    rows.foreach { r =>
      val sparseC = if (r.isNullAt(4)) 0L else 1000000L / (60 + r.getLong(4))
      val denseC = if (r.isNullAt(5)) 0L else 1000000L / (60 + r.getLong(5))
      assert(r.getLong(3) == sparseC + denseC,
        s"rrf_e6 mismatch for row $r")
    }
    // per query, at most 10 rows and ranks are 1..n contiguous
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val rks = g.map(_.getInt(1)).sorted
      assert(rks.length <= 10 && rks.toSeq == (1 to rks.length))
    }
  }

  test("ret4 Dirichlet QL: term repetition raises the score, length is penalized") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark engine"),               // 3x the query term, short
      (2L, "spark engine"),                           // 1x, shortest
      (3L, "spark " + ("filler " * 50).trim),         // 1x, long -> dl penalty
      (4L, "nothing relevant here")                   // no query term -> absent
    ).toDF("doc_id", "text")
    val qs = Seq((1, "spark")).toDF("query_id", "term")
    val out = Retrieval.queryLikelihoodTopKOf(docs, qs, k = 4).collect()
      .map(r => (r.getLong(2), r.getInt(1), r.getLong(3)))
    // doc 4 shares no term: not a candidate
    assert(!out.map(_._1).contains(4L))
    val byDoc = out.map(t => t._1 -> t._3).toMap
    // tf=3 beats tf=1 at comparable length
    assert(byDoc(1L) > byDoc(2L), s"$byDoc")
    // same tf, longer doc scores lower (the Dirichlet norm)
    assert(byDoc(2L) > byDoc(3L), s"$byDoc")
  }

  test("ret5 ranking metrics: perfect rankings score nDCG = MRR = 1e6; a " +
      "single relevant doc scores exactly its rank's literal discount") {
    val out = GraftApi.rankingMetrics(docs, q, k = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // q1 {spark}: docs 1,2,5 are all the scored docs AND all relevant ->
    // a perfect ranking: mrr = ndcg = 1e6, p@5 = 3/5
    assert(out(1) === ((3L, 3L, 1L, 1000000L, 600000L, 1000000L)))
    // q2 {hash, merge}: only doc 3 contains both terms and it ranks first
    assert(out(2) === ((1L, 1L, 1L, 1000000L, 200000L, 1000000L)))

    // q3 {spark, data}: doc 2 is the ONLY relevant doc (both terms) but
    // competes with spark-heavy docs — wherever BM25 lands it, nDCG must
    // equal that rank's literal integer discount and MRR its reciprocal
    val q3 = Seq((3, "spark"), (3, "data")).toDF("query_id", "term")
    val Array(row) = GraftApi.rankingMetrics(docs, q3, k = 5).collect()
    val w = Seq(1000000000L, 630929754L, 500000000L, 430676558L, 386852807L)
    val r = row.getLong(3)
    assert(row.getLong(1) === 1L && row.getLong(2) === 1L)
    assert(row.getLong(4) === 1000000L / r)
    assert(row.getLong(6) === w(r.toInt - 1) * 1000000L / 1000000000L)

    // a query whose terms appear nowhere: zero relevance, all-zero metrics
    val q4 = Seq((9, "zzzznope")).toDF("query_id", "term")
    val Array(z) = GraftApi.rankingMetrics(docs, q4, k = 5).collect()
    assert(z.getLong(1) === 0L && z.getLong(2) === 0L && z.isNullAt(3))
    assert(z.getLong(4) === 0L && z.getLong(5) === 0L && z.getLong(6) === 0L)
  }
}
