package graft.ops

import graft.SparkSpec

/** Planted-case checks for the round-11 third-pass ops: nearest as-of
  * picks the closer side and honors the backward tie preference, the
  * Markov matrix counts exactly the adjacent steps, ROUGE-2 recovers
  * hand-computed overlaps, and the Zipf slope is ~1e6 on an exact
  * freq = C/rank corpus. */
class AuditJoinSpec extends SparkSpec {

  test("asofNearestOf picks the nearer side, prefers backward on ties, drops out-of-tolerance") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "fwd_wins"),  // right at 90 (d=10) vs 105 (d=5) -> forward
      (2L, 100L, "tie_back"),  // right at 90 (d=10) vs 110 (d=10) -> backward
      (3L, 100L, "dropped"),   // nearest right at 85 (d=15) > tol for key 3
      (4L, 100L, "same_ts")    // right exactly at 100 -> backward, d=0
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 90L, 9L), (1L, 105L, 5L),
      (2L, 90L, 9L), (2L, 110L, 11L),
      (3L, 85L, 9L),
      (4L, 100L, 4L), (4L, 101L, 41L)
    ).toDF("k", "t", "v")
    val out = AsOf.asofNearestOf(left, right, "k", "t", "v", tolerance = 10L)
      .collect().map(r => r.getAs[String]("tag") ->
        ((r.getAs[Long]("nearest_v"), r.getAs[Int]("dir"), r.getAs[Long]("adiff"))))
      .toMap
    assert(out.keySet === Set("fwd_wins", "tie_back", "same_ts"))
    assert(out("fwd_wins") === ((5L, 1, 5L)), "forward match is nearer")
    assert(out("tie_back") === ((9L, 0, 10L)),
      "equal distance must resolve backward") // merge_asof nearest tie rule
    assert(out("same_ts") === ((4L, 0, 0L)), "simultaneous right is a backward hit")
  }

  test("markovTransitionsOf counts adjacent steps and row-normalizes in exact bp") {
    import spark.implicits._
    val ev = Seq(
      (10L, 1L, 1L, "A"), (10L, 2L, 2L, "B"), (10L, 3L, 3L, "A"), (10L, 4L, 4L, "B"),
      (20L, 1L, 5L, "A"), (20L, 2L, 6L, "A")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Curation.markovTransitionsOf(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      ("A", "B") -> ((2L, 3L, 6666L)),
      ("A", "A") -> ((1L, 3L, 3333L)),
      ("B", "A") -> ((1L, 1L, 10000L))))
  }

  test("markovTransitionsOf never crosses users") {
    import spark.implicits._
    // last event of user 1 is "X", first of user 2 is "Y": no X->Y step
    val ev = Seq((1L, 1L, 1L, "X"), (2L, 1L, 2L, "Y"), (2L, 2L, 3L, "Y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val pairs = Curation.markovTransitionsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("Y", "Y")))
  }

  test("rougeBigramOf matches hand-computed set overlaps and drops half pairs") {
    import spark.implicits._
    val pairs = Seq(
      (0L, 0, "a b c"), (0L, 1, "a b d"),   // overlap {a b}: p=r=f=5000
      (1L, 0, "x y z w"), (1L, 1, "x y z w"), // identical: 10000
      (2L, 0, "a b c"),                      // no candidate -> dropped
      (3L, 0, "a b"), (3L, 1, "q")           // candidate has no bigram -> dropped
    ).toDF("pair_id", "side", "text")
    val out = Evaluation.rougeBigramOf(pairs).collect()
      .map(r => r.getAs[Long]("pair_id") ->
        ((r.getAs[Long]("n_overlap"), r.getAs[Long]("p_bp"),
          r.getAs[Long]("r_bp"), r.getAs[Long]("f_bp")))).toMap
    assert(out.keySet === Set(0L, 1L))
    assert(out(0L) === ((1L, 5000L, 5000L, 5000L)))
    assert(out(1L) === ((3L, 10000L, 10000L, 10000L)))
  }

  test("lexicalDiversityOf counts types/tokens/hapax exactly") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "x y z"), (3L, "q q q q")).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversityOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) === ((3L, 2L, 1L, 6666L, 5000L)))
    assert(out(2L) === ((3L, 3L, 3L, 10000L, 10000L)), "all-distinct doc maxes both ratios")
    assert(out(3L) === ((4L, 1L, 0L, 2500L, 0L)), "repeated-word doc has zero hapax")
  }

  test("refIntegrityOf counts planted orphans and unreferenced parents") {
    import spark.implicits._
    val child = Seq(1L, 1L, 2L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Evaluation.refIntegrityOf(child, "fk", parent, "pk", "r").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map(
      "orphan_child_keys" -> 1L,          // 9 references nothing
      "unreferenced_parent_keys" -> 1L,   // 3 never referenced
      "distinct_child_keys" -> 3L,
      "distinct_parent_keys" -> 3L))
  }

  test("mv2 four-term delta algebra equals the direct join recompute") {
    import org.apache.spark.sql.functions._
    val direct = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))")).as("revenue_e4"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val viaAlgebra = ScaleOps.mv2(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viaAlgebra.toSeq === direct.toSeq)
  }

  test("keySkewAuditOf ranks planted heavy keys with exact shares and percentiles") {
    import spark.implicits._
    val rows = (Seq.fill(10)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(2)(3L) ++ Seq(4L, 5L))
      .toDF("k2")
    val out = ScaleOps.keySkewAuditOf(rows, "k2", topK = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).sortBy(_._1)
    // counts: {1:10, 2:2, 3:2, 4:1, 5:1}; sorted count list [1,1,2,2,10]:
    // p50 = first v with cf >= ceil(0.5*5)=3 -> 2; p99 -> 10
    assert(out.length === 3)
    assert(out(0) === ((1, 1L, 10L, 6250L, 5L, 2L, 10L, 500L)),
      "head key: 10/16 rows = 6250 bp, 5x the p50 key")
    assert(out(1)._3 === 2L && out(2)._3 === 2L, "ties broken deterministically")
    assert(out(1)._2 === 2L && out(2)._2 === 3L)
  }

  test("eval6 bootstrap CI brackets the point estimate and is rerun-stable") {
    val out = Evaluation.eval6(spark, sfDir).head()
    val (point, p05, p50, p95, n) = (out.getLong(0), out.getLong(1),
      out.getLong(2), out.getLong(3), out.getLong(4))
    assert(n === 200L)
    assert(p05 <= p50 && p50 <= p95, s"percentiles must be ordered: $p05 $p50 $p95")
    assert(p05 <= point && point <= p95,
      s"the 90% interval should bracket the point estimate ($p05, $point, $p95)")
    assert(point >= 0L && p95 <= 10000L)
    val again = Evaluation.eval6(spark, sfDir).head()
    assert(again === out, "hash-derived resamples must be rerun-stable")
  }

  test("zipfSlopeOf recovers slope ~ -1 on an exact freq = C/rank corpus") {
    import spark.implicits._
    // 12/rank over 4 ranks; distinct counts make the rank order total
    val words = Seq.fill(12)("w1") ++ Seq.fill(6)("w2") ++
      Seq.fill(4)("w3") ++ Seq.fill(3)("w4")
    val docs = Seq(("zipf", words.mkString(" "))).toDF("source", "text")
    val out = TextAnalysis.zipfSlopeOf(docs).collect()
    assert(out.length === 1)
    val (n, slope) = (out(0).getAs[Long]("n_ranks"), out(0).getAs[Long]("slope_neg_e6"))
    assert(n === 4L)
    // 12/rank is exactly rank^-1 scaled: OLS slope is -1 up to the e6
    // per-point log rounding (sub-ppm here)
    assert(math.abs(slope - 1000000L) <= 10L, s"slope_neg_e6 $slope not ~ 1e6")
  }
}
