package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Behavioral checks for the curation family beyond the oracle gate:
  * curriculum positions are a stage-monotone permutation, preference
  * counts satisfy the rank-sum identity, Bradley–Terry recovers a
  * planted dominance order, privacy audits partition the population,
  * triangle counts are exact on planted graphs, and MMR genuinely
  * prefers a diverse pick over a redundant one. */
class CurationSpec extends SparkSpec {

  test("priv4 releases true_n + bounded Laplace noise, deterministically") {
    val out = Curation.priv4(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, t, rel, noise) =>
      assert(rel === t + noise, "released = true + noise")
      // 4-hex-digit u bounds the inverse-CDF tail: |noise| <= 2*ln(65536) ~ 22.2
      assert(math.abs(noise) <= 23L, s"noise $noise outside the u-granularity bound")
    }
    val again = Curation.priv4(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === out.toSeq, "salted draw must be rerun-stable")
  }

  test("cur1 emits a stage-monotone permutation of all documents") {
    val out = Curation.cur1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(out.length.toLong === n, "every document gets a position")
    assert(out.map(_._4).sorted.toSeq === (1L to n).toSeq, "pos is a permutation of 1..n")
    assert(out.map(_._1).distinct.length === out.length, "each doc appears once")
    // stage-major: positions of stage k all precede positions of stage k+1
    val byStage = out.groupBy(_._3)
    assert(byStage.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
    for (k <- 1L to 3L if byStage.contains(k) && byStage.contains(k + 1)) {
      assert(byStage(k).map(_._4).max < byStage(k + 1).map(_._4).min,
        s"stage $k must fully precede stage ${k + 1}")
      // curriculum direction: earlier stages are strictly higher quality
      assert(byStage(k).map(_._2).min > byStage(k + 1).map(_._2).max,
        s"stage $k quality must dominate stage ${k + 1}")
    }
    val again = Curation.cur1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === out.toSeq, "cur1 must be deterministic")
  }

  test("pref1 satisfies the rank-sum identity wins_a + wins_b + ties = n_a * n_b") {
    val docs = graft.Tables.documents(spark, sfDir)
    val counts = docs.groupBy("lang", "source").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val out = Curation.pref1(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lang, sa, sb) = (r.getString(0), r.getString(1), r.getString(2))
      val (wa, wb, t) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(wa + wb + t === counts((lang, sa)) * counts((lang, sb)),
        s"($lang, $sa, $sb): decisive+ties must count every cross pair")
      val bp = r.getLong(6)
      assert(bp === wa * 10000 / math.max(wa + wb, 1L))
    }
  }

  test("markov2 stationary: 2-cycle keeps uniform mass, sink chain absorbs, source drains") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    // user 1 alternates a,b (P is the swap — uniform is stationary);
    // user 2 walks d -> c -> c (d is a source, c a self-loop sink)
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:01", "a"), (2L, 1L, "2024-01-01 00:00:02", "b"),
      (3L, 1L, "2024-01-01 00:00:03", "a"), (4L, 1L, "2024-01-01 00:00:04", "b"),
      (5L, 1L, "2024-01-01 00:00:05", "a"),
      (6L, 2L, "2024-01-01 00:00:01", "d"), (7L, 2L, "2024-01-01 00:00:02", "c"),
      (8L, 2L, "2024-01-01 00:00:03", "c"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val pi = Curation.markovStationaryOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(pi("a") === 1000000L && pi("b") === 1000000L, "swap chain is mass-stable")
    assert(pi("d") === 0L, "source state drains after one step")
    assert(pi("c") === 2000000L, "sink holds its own mass plus the source's")
  }

  test("markov2 fixture: mass bounded by the uniform start, all states present") {
    val states = Curation.markov2(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(states.nonEmpty)
    states.foreach { case (_, p) => assert(p >= 0L) }
    assert(states.map(_._2).sum <= states.length.toLong * 1000000L,
      "integer truncation only ever removes mass")
  }

  test("pref3 best-of-n: hand-traced draws, monotone curve, prompt accounting") {
    val sp = spark
    import sp.implicits._
    // prompt 1 has 3 samples, prompt 2 has 1 — so n=1 sees 2 prompts,
    // n=2 sees only prompt 1, and the curve's running max can never drop
    val samples = Seq(
      (1L, 10L, 100L), (1L, 11L, 300L), (1L, 12L, 200L),
      (2L, 20L, 50L))
      .toDF("prompt_id", "sample_id", "reward_c")
    val got = Curation.bestOfNCurveOf(samples, Seq(1, 2, 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(got(0)._2 === 2L && got(1)._2 === 1L && got(2)._2 === 1L,
      "n_prompts = prompts with >= n samples")
    // replay the deterministic draw order to get the expected maxima
    val draw = samples.collect().map { r =>
      val sid = r.getLong(1)
      (r.getLong(0), org.apache.commons.codec.digest.DigestUtils.md5Hex(s"bon:$sid"),
        sid, r.getLong(2))
    }
    val byPrompt = draw.groupBy(_._1).view.mapValues(
      _.sortBy(t => (t._2, t._3)).map(_._4)).toMap
    def bestAt(n: Int): Long =
      byPrompt.values.filter(_.length >= n).map(_.take(n).max).sum
    assert(got(0)._3 === bestAt(1) && got(1)._3 === bestAt(2) && got(2)._3 === bestAt(3))
    // prompt-1-only suffix of the curve is monotone non-decreasing
    assert(got(1)._3 <= got(2)._3)
    assert(got(2)._3 === 300L, "best of all three samples")
  }

  test("pref3 signed rewards: avg_best_c truncates toward zero like DuckDB //") {
    val sp = spark
    import sp.implicits._
    // Two prompts whose best-of-1 rewards sum to -7 over 2 prompts: an
    // inexact NEGATIVE quotient, the exact case where trunc (-3) and
    // floor (-4) disagree. DuckDB 1.0.0's integer // truncates toward
    // zero, so Spark `div` must be used bare (round-14 regression).
    val samples = Seq((1L, 10L, -3L), (2L, 20L, -4L))
      .toDF("prompt_id", "sample_id", "reward_c")
    val got = Curation.bestOfNCurveOf(samples, Seq(1)).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(1) === 2L && r.getLong(2) === -7L)
    assert(r.getLong(3) === -3L,
      "trunc-toward-zero: (-7) div 2 = -3, matching DuckDB (-7)//2")
  }

  test("pref3 fixture: avg best-of-8 dominates avg best-of-1 and counts nest") {
    val rows = Curation.pref3(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L))
    // prompts with >= n samples can only shrink as n grows
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 >= b._2 })
    assert(rows.last._3 >= rows.head._3,
      "expected max over 8 draws >= expected single draw")
  }

  test("pref2 recovers a planted dominance order") {
    val sp = spark
    import sp.implicits._
    // A beats B 9:1, B beats C 9:1, A beats C 9:1 -> beta(A) > beta(B) > beta(C)
    val wins = Seq(
      ("en", "A", "B", 90L, 10L, 0L),
      ("en", "B", "C", 90L, 10L, 0L),
      ("en", "A", "C", 90L, 10L, 0L))
      .toDF("lang", "src_a", "src_b", "wins_a", "wins_b", "ties")
    val beta = Curation.bradleyTerryOf(wins).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(beta("A") > beta("B"), s"A must outrank B: $beta")
    assert(beta("B") > beta("C"), s"B must outrank C: $beta")
    assert(beta.values.forall(_ >= 1000L), "beta floor holds")
  }

  test("priv1/priv2 groups partition the customer population") {
    val nCust = graft.Tables.customer(spark, sfDir).count()
    val p1 = Curation.priv1(spark, sfDir).collect()
    assert(p1.map(_.getLong(3)).sum === nCust, "priv1 group sizes must sum to |customer|")
    p1.foreach(r => assert((r.getLong(3) >= 5) === (r.getLong(4) == 1L)))
    val p2 = Curation.priv2(spark, sfDir).collect()
    assert(p2.map(_.getLong(2)).sum === nCust, "priv2 group sizes must sum to |customer|")
    p2.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= math.min(5L, r.getLong(2)),
        "l-diversity is bounded by segment domain and group size")
      assert((r.getLong(3) >= 3) === (r.getLong(4) == 1L))
    }
  }

  test("tc1 counts planted triangles exactly and ignores triangle-free structure") {
    val sp = spark
    import sp.implicits._
    // K4 on 1-4 (4 triangles, 3 per node) + a 5-6-7 path + a 10-leaf star
    // at hub 100 (0 triangles each)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val path = Seq((5L, 6L), (6L, 7L))
    val star = (101L to 110L).map(leaf => (100L, leaf))
    val und = (k4 ++ path ++ star).toDF("a", "b")
    val out = Graph.triangleCountsOf(und).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 gives each node 3 triangles and nothing else: $out")
  }

  test("mmr1 prefers a diverse pick over a redundant near-duplicate") {
    val sp = spark
    import sp.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val vecs = Seq(
      (1L, v(1.0, 0.0, 0.0, 0.0)),   // the query itself
      (2L, v(0.6, 0.8, 0.0, 0.0)),   // A: rel 0.6
      (3L, v(0.6, 0.8, 0.01, 0.0)),  // A': near-duplicate of A
      (4L, v(0.6, -0.8, 0.0, 0.0)),  // B: rel 0.6, anti-correlated with A
      (5L, v(0.0, 0.0, 1.0, 0.0)),   // fillers: rel 0
      (6L, v(0.0, 0.0, 0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter("vec_id = 1")
    val out = Similarity.mmrDiverseTopKOf(vecs, queries).collect()
      .map(r => (r.getLong(2), r.getLong(1))).toMap // rk -> cand_id
    assert(out(1L) === 2L, s"rank 1 is the most relevant (tie to lowest id): $out")
    assert(out(2L) === 4L, s"rank 2 must be the DIVERSE doc, not the near-dup: $out")
    assert(out(3L) === 3L, s"the near-dup only enters once diversity is exhausted: $out")
    assert(out.size === 5, "k picks per query")
  }

  test("priv3 conserves mass and its estimator inverts the mechanism exactly") {
    val out = Curation.priv3(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = graft.Tables.customer(spark, sfDir).count()
    val k = out.length.toLong
    assert(k === 5, "segment universe")
    assert(out.map(_._2).sum === n, "true counts partition the population")
    assert(out.map(_._3).sum === n, "every customer reports exactly one segment")
    out.foreach { case (seg, _, rep, est) =>
      val expected = (rep * 10000 * (k - 1) - 4000 * n) / (6000 * (k - 1) - 4000)
      assert(est === expected, s"$seg estimator must match the closed form")
    }
    // the mechanism genuinely flips: reported != true for a nontrivial share
    assert(out.exists { case (_, t, rep, _) => t != rep },
      "randomized response must perturb at least one segment count")
  }

  test("traj1 assembles planted trajectories in (ts, event_id) order") {
    val sp = spark
    import sp.implicits._
    val base = 1700000000000000L // epoch micros
    val ev = Seq(
      // user 1, one 10-min bucket: out-of-insertion-order rows
      (3L, base + 2000000L, 1L, "purchase"),
      (1L, base, 1L, "view"),
      (2L, base + 1000000L, 1L, "click"),
      // same ts tie -> event_id breaks it
      (5L, base + 3000000L, 1L, "error"),
      (4L, base + 3000000L, 1L, "signup"),
      // user 2, different bucket
      (6L, base + 700000000L, 2L, "view"))
      .toDF("event_id", "us", "user_id", "event_type")
      .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id", "event_type")
    val out = Curation.sessionPathsOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getString(4)))
      .sortBy(x => (x._1, x._2))
    assert(out.length === 2)
    val u1 = out.head
    assert(u1 === ((1L, 5L, "view", "error")),
      s"user 1: 5 turns, view first, error last (tie broken by event_id): $u1")
    assert(out(1) === ((2L, 1L, "view", "view")))
    // n_turns across sessions covers every event
    val full = Curation.sessionPathsOf(ev).collect().map(_.getLong(2)).sum
    assert(full === 6L)
  }

  test("dq2 flags a planted outlier and leaves a tight distribution unflagged") {
    val sp = spark
    import sp.implicits._
    val tight = (1L to 100L).map(i => ("a", 50L + (i % 3)))      // values 50..52
    val spread = (1L to 100L).map(i => ("b", i)) :+ (("b", 100000L)) // one far outlier
    val df = (tight ++ spread).toDF("grp", "v")
    val out = Curation.madOutliersOf(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val a = out.head; val b = out(1)
    assert(a._1 === "a" && a._5 === 0L, s"tight group has no outliers: $a")
    assert(b._1 === "b" && b._5 === 1L, s"spread group flags exactly the planted outlier: $b")
    assert(b._2 === 51L, "median of 1..100 + outlier is 51 (disc pick)")
    assert(a._3 === 1L, "MAD of the tight group is 1")
  }

  test("kcore1 peeling keeps a K4 core and sheds pendants") {
    val sp = spark
    import sp.implicits._
    // K4 on 1-4 (every node degree 3) + pendant chain 4-5-6 (degree < 3)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq((4L, 5L), (5L, 6L))
    val out = Graph.kcorePeelOf((k4 ++ chain).toDF("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core is exactly the K4 with degree 3 each: $out")
  }

  test("stat2 G-test cells: observed counts partition the corpus and total G >= 0") {
    val docs = graft.Tables.documents(spark, sfDir)
    val n = docs.count()
    val out = Curation.stat2(spark, sfDir).collect()
    assert(out.map(_.getLong(2)).sum === n, "cells cover every document")
    val totalG = out.map(_.getLong(4)).sum
    assert(totalG >= 0L, s"likelihood-ratio statistic is nonnegative in total: $totalG")
    // recompute one cell by hand from the marginals
    val r = docs.groupBy("lang").count().collect()
      .map(x => (x.getString(0), x.getLong(1))).toMap
    val c = docs.groupBy("source").count().collect()
      .map(x => (x.getString(0), x.getLong(1))).toMap
    val cell = out.head
    val (lang, src, o) = (cell.getString(0), cell.getString(1), cell.getLong(2))
    val expected = math.round(2.0 * o * math.log(o.toDouble * n / (r(lang).toDouble * c(src))) * 1e6)
    assert(cell.getLong(4) === expected, "g_e6 matches the closed form")
  }

  test("emb1 separates planted labeled blobs with the right nearest-foreign centroid") {
    val sp = spark
    import sp.implicits._
    def v(hot: Int, eps: Float): Array[Float] = {
      val a = Array.fill(8)(0.0f); a(hot) = 1.0f + eps; a
    }
    val rows =
      (1L to 20L).map(i => (i, v(0, i * 0.001f), 1)) ++
        (21L to 40L).map(i => (i, v(1, i * 0.001f), 2)) ++
        (41L to 60L).map(i => (i, v(2, i * 0.001f), 3))
    val out = Clustering.labelCentroidAuditOf(
        rows.toDF("vec_id", "embedding", "label")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    out.foreach { case (l, n, meanOwn, nnL, nnD) =>
      assert(n === 20L)
      assert(meanOwn < 1000L, s"label $l cohesion: members hug their centroid ($meanOwn)")
      assert(nnL != l && nnD > 1000000L,
        s"label $l separation: foreign centroids are far ($nnL at $nnD)")
    }
  }

  test("ret3 expansion genuinely adds weighted terms and preserves ret1 as the wt=10000 case") {
    // identity: the weighted path with full weight is bit-identical to ret1
    val docs = graft.Tables.documents(spark, sfDir)
    val sp = spark
    import sp.implicits._
    val q = Seq((1, "the"), (1, "data")).toDF("query_id", "term")
    val plain = Retrieval.bm25TopKOf(docs, q, 5).collect().map(_.toSeq)
    val weighted = Retrieval.bm25WeightedTopKOf(
      docs, q.withColumn("wt_bp", org.apache.spark.sql.functions.lit(10000L)), 5)
      .collect().map(_.toSeq)
    assert(plain.toSeq === weighted.toSeq, "wt_bp=10000 multiplies by exactly 1.0")
    // down-weighting strictly lowers a single-term score
    val q1 = Seq((1, "the")).toDF("query_id", "term")
    val full = Retrieval.bm25WeightedTopKOf(
      docs, q1.withColumn("wt_bp", org.apache.spark.sql.functions.lit(10000L)), 1)
      .collect().head.getLong(3)
    val half = Retrieval.bm25WeightedTopKOf(
      docs, q1.withColumn("wt_bp", org.apache.spark.sql.functions.lit(5000L)), 1)
      .collect().head.getLong(3)
    assert(half < full && half > 0, s"half-weight score $half must sit below $full")
  }

  test("mmr1 on the fixture returns 5 diversified picks per query, rank-1 = top cosine") {
    val out = Similarity.mmr1(spark, sfDir).collect()
    val perQ = out.groupBy(_.getLong(0))
    assert(perQ.nonEmpty)
    perQ.foreach { case (q, rows) =>
      assert(rows.length === 5, s"query $q: expected 5 picks")
      assert(rows.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      // scores are non-increasing only within the greedy's own ordering
      // guarantee for rank 1: it maximizes pure relevance
      val r1 = rows.find(_.getLong(2) == 1L).get
      assert(r1.getLong(3) % 7 === 0, "rank-1 score is 7*rel_e6 (no penalty)")
    }
  }

  test("mmr2 (bucketed candidates) picks only same-bucket neighbours; recall vs mmr1 reported") {
    import org.apache.spark.sql.functions.col
    val bucketed = Similarity.mmr2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bucketed.nonEmpty, "bucketed MMR must select something")
    // legality: every pick must live in its query's LSH bucket (that IS
    // the candidate-stage contract mmr2 adds over mmr1)
    val bk = Similarity.qnormOf(graft.Tables.embeddings(spark, sfDir))
      .select(col("vec_id"),
        Similarity.signBits("q", Similarity.planeWeights(8)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    bucketed.foreach { case (q, c, _) =>
      assert(bk(q) === bk(c), s"pick $c not in query $q's bucket")
    }
    // ranks are contiguous 1..n per query (a short bucket just stops early)
    bucketed.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"query $q ranks not contiguous")
    }
    // sim8-style instrumentation: how much of the exact greedy's choice
    // survives the LSH candidate swap. At tiny SF the 8-plane buckets are
    // near-singleton so this is LOW by construction — the number is the
    // evidence, not a gate (the gate is the legality check above).
    val exact = Similarity.mmr1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = bucketed.count { case (q, c, _) => exact.contains((q, c)) }
    info(s"mmr2 picks=${bucketed.length} overlap_with_mmr1=$hit " +
      s"recall_bp=${hit * 10000L / bucketed.length}")
  }
  test("fs1 keyness surfaces each language's discriminative term, positive-only") {
    import spark.implicits._
    // lang aa docs all contain xx (never in bb); shared word cc is everywhere
    val docs = Seq(
      (0L, "aa", "xx cc"), (1L, "aa", "xx cc"), (2L, "aa", "xx cc"),
      (3L, "bb", "yy cc"), (4L, "bb", "yy cc"), (5L, "bb", "yy cc"))
      .toDF("doc_id", "lang", "text")
    val out = Curation.keynessTermsOf(docs, topN = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(6)))
    // top term per lang is its exclusive word with keyness = a * ln(2)e6
    val ln2e6 = math.round(math.log(2.0) * 1000000)
    assert(out.filter(_._1 == "aa").head === (("aa", 1L, "xx", 3L, 3 * ln2e6)))
    assert(out.filter(_._1 == "bb").head === (("bb", 1L, "yy", 3L, 3 * ln2e6)))
    // cc has pmi = ln(1) = 0 in both langs -> filtered by keyness > 0
    assert(!out.exists(_._3 == "cc"))
  }

  test("priv5 t-closeness scores a skewed group's exact total variation") {
    val s2 = spark
    import s2.implicits._
    // global mix: X 5/6, Y 1/6. group A = {X, Y}: TV = 1/2(1/3 + 1/3) = 1/3;
    // group B = {X, X, X, X}: TV = 1/2(1/6 + 1/6) = 1/6. integer form:
    // A: |1*6-5*2| + |1*6-1*2| = 8 -> 1e6*8 div (2*2*6) = 333333
    // B: |4*6-5*4| + |0*6-1*4| = 8 -> 1e6*8 div (2*4*6) = 166666
    val rows = Seq(
      ("A", "X"), ("A", "Y"), ("B", "X"), ("B", "X"), ("B", "X"), ("B", "X")
    ).toDF("grp", "sens")
    val got = Curation.tClosenessOf(rows, Seq("grp"), "sens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("A", 2L, 333333L, 0L), ("B", 4L, 166666L, 1L)))
  }

  test("fs2 log-odds keyness: signs follow the leaning and the prior shrinks rare words") {
    import spark.implicits._
    // A-corpus says "alpha" a lot, B-corpus says "beta"; "common" is shared.
    // "rare" appears ONCE in A only — same direction as alpha but far less
    // evidence, so the prior+variance must rank it BELOW alpha's z.
    val docs = Seq(
      ("en", ("alpha " * 20 + "common " * 10 + "rare").trim),
      ("de", ("beta " * 20 + "common " * 10).trim))
      .toDF("lang", "text")
    val out = Curation.logOddsKeynessOf(docs, col("lang") === "en", topN = 3)
      .collect().map(r => (r.getString(0), r.getString(2), r.getAs[Long]("z_e3")))
    val a = out.filter(_._1 == "a").map(t => t._2 -> t._3).toMap
    val b = out.filter(_._1 == "b").map(t => t._2 -> t._3).toMap
    assert(a("alpha") > 0L, "A-heavy word leans A")
    assert(b("beta") < 0L, "B-heavy word leans B")
    assert(a.contains("rare") && a("rare") > 0L && a("rare") < a("alpha"),
      "one observation cannot outrank twenty under the prior")
    assert(math.abs(a.getOrElse("common", b("common"))) < a("alpha"),
      "a shared word is less distinctive than the A-exclusive one")
  }

  test("priv5 groups partition the population and a global-mix group scores 0") {
    val nCust = graft.Tables.customer(spark, sfDir).count()
    val p5 = Curation.priv5(spark, sfDir).collect()
    assert(p5.map(_.getLong(2)).sum === nCust, "priv5 group sizes must sum to |customer|")
    p5.foreach(r => assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L,
      "TV is a [0,1] distance"))
  }
}
