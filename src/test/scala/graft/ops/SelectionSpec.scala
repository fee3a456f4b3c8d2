package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the Selection family's math on planted frames: UniMax's capped
  * branch (the fixture's uniform sources never trigger it), DSIR's
  * importance ordering, exact character entropies, BPE pair counts, and
  * the textbook BPE merge sequence (bpe2 has no DuckDB oracle — this
  * suite is its compensating check). */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))

  // ---- mix3: UniMax water-filling ----

  test("mix3: a low-resource source is capped at E epochs; the rest share the water level") {
    // caps (E=2): tiny=8, a=40, b=60; B = 4+20+30 = 54
    // ascending by cap: tiny(8): 8*3 <= 54 → full; a(40): 40*2 <= 46? no;
    // b uncapped. rem = 46 over 2 → q=23, r=0 → a=23, b=23.
    val d = docs(
      (1L, "x y z w", "en", "tiny"), // 4 tokens
      (2L, (1 to 20).map(_ => "t").mkString(" "), "en", "a"), // 20
      (3L, (1 to 30).map(_ => "u").mkString(" "), "en", "b")) // 30
    val out = Selection.unimaxAllocationOf(d, 2L).orderBy("source")
      .select("source", "n_toks", "cap", "alloc", "epochs_bp")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 20L, 40L, 23L, 11500L),
      ("b", 30L, 60L, 23L, 7666L),
      ("tiny", 4L, 8L, 8L, 20000L)))
    // allocations exhaust the budget exactly
    assert(out.map(_._4).sum === 54L)
  }

  test("mix3: integer remainder goes to the first sources in cap order") {
    // two equal sources, odd budget: caps 20/20, B=10 → q=5 each... make
    // B odd: sources of 5 and 6 tokens, E=2 → caps 10/12, B=11; ascending:
    // s1(10): 10*2 <= 11? no → both uncapped; q=5, r=1 → s1 gets 6, s2 5.
    val d = docs(
      (1L, "a a a a a", "en", "s1"),
      (2L, "b b b b b b", "en", "s2"))
    val out = Selection.unimaxAllocationOf(d, 2L).orderBy("source")
      .select("source", "alloc").as[(String, Long)].collect().toSeq
    assert(out === Seq(("s1", 6L), ("s2", 5L)))
  }

  // ---- sel1: DSIR importance ordering ----

  test("sel2: budget cut keeps the exact quality-ranked prefix, id checksums pin the set") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (1L, "a", 100L, 50L), (2L, "b", 90L, 40L),
      (3L, "a", 80L, 30L), (4L, "b", 70L, 100L))
      .toDF("doc_id", "source", "q", "toks")
    // budget 100: d1 (cum 50) and d2 (cum 90) fit; d3 would hit 120
    val got = graft.api.GraftApi.budgetSelect(docs, budget = 100L).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("a") === ((2L, 80L, 1L, 50L, 1L)))
    assert(got("b") === ((2L, 140L, 1L, 40L, 2L)))
    // a budget covering everything keeps everything
    val all = graft.api.GraftApi.budgetSelect(docs, budget = 1000L).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(5))).toMap
    assert(all("a") === ((2L, 4L)))
    assert(all("b") === ((2L, 6L)))
    // zero budget keeps nothing
    val none = graft.api.GraftApi.budgetSelect(docs, budget = 0L).collect()
      .map(_.getLong(3)).sum
    assert(none === 0L)
  }

  test("sel1: docs made of target-enriched tokens outrank raw-typical docs") {
    // target slice (srcT) is all "good"; raw background is all "bad".
    // A raw doc of "good good good" must rank above one of "bad bad bad".
    val d = docs(
      (1L, "good good good good", "en", "srcT"),
      (2L, "good good good", "en", "raw1"),
      (3L, "bad bad bad", "en", "raw2"),
      (4L, "good bad", "en", "raw3"))
    val out = Selection.dsirTopKOf(d, Seq("srcT"), 10)
      .select("rnk", "doc_id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    val order = out.map(_._2)
    assert(order.indexOf(2L) < order.indexOf(4L))
    assert(order.indexOf(4L) < order.indexOf(3L))
  }

  // ---- t18: exact character entropy ----

  test("t18: uniform two-char doc scores ln2 micro-nats; repeated-char doc scores 0 and is dropped") {
    val d = docs(
      (1L, "ab", "en", "s"),      // H = ln 2 = 0.693147... → 693147
      (2L, "aaaaaaaa", "en", "s") // H = 0 → keep = 0
    )
    val out = Selection.charEntropyOf(d).orderBy("doc_id")
      .select("doc_id", "n_counted", "ent_e6", "keep")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(out === Seq((1L, 2L, 693147L, 0), (2L, 8L, 0L, 0)))
  }

  test("t18: characters outside a-z+space are ignored") {
    val d = docs((1L, "a1b2!", "en", "s")) // counted: a, b → n=2, H=ln2
    val out = Selection.charEntropyOf(d)
      .select("n_counted", "ent_e6").as[(Long, Long)].collect().head
    assert(out === ((2L, 693147L)))
  }

  // ---- bpe1: pair statistics ----

  test("bpe1: pair counts are term-frequency weighted over the distinct vocab") {
    // "ab" ×3, "abc" ×1 → pairs: (a,b) 3+1=4, (b,c) 1
    val d = docs(
      (1L, "ab ab abc", "en", "s"),
      (2L, "ab", "en", "s"))
    val out = Selection.bpePairStatsOf(d, 10)
      .select("rnk", "left_sym", "right_sym", "pair_count")
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out === Seq((1, "a", "b", 4L), (2, "b", "c", 1L)))
  }

  // ---- bpe2: textbook merge sequence (compensating check — no oracle) ----

  test("bpe2: classic low/lower/newest/widest corpus yields the textbook merges") {
    // freqs: low×5, lower×2, newest×6, widest×3
    // iter1: es=9 ties st=9 → lex (e,s); iter2: (es,t)=9;
    // iter3: lo=7 ties ow=7 → lex (l,o); iter4: (lo,w)=7.
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val d = docs((1L, words.mkString(" "), "en", "s"))
    val out = Selection.bpeMergesOf(d, 4).orderBy("iter")
      .select("iter", "left_sym", "right_sym", "pair_count")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(out === Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L)))
  }

  // ---- t19: exact bigram NLL ----

  test("t19: deterministic corpus pins the smoothed bigram math") {
    // corpus: "a b" ×2, "a c" ×1 (three docs). V = 3 (a, b, c).
    // c1(a)=3; c12(a,b)=2, c12(a,c)=1.
    // nll(a,b) = round(ln((3+3)/(2+1))*1e6) = round(ln 2 *1e6) = 693147
    // nll(a,c) = round(ln((3+3)/(1+1))*1e6) = round(ln 3 *1e6) = 1098612
    val d = docs(
      (1L, "a b", "en", "s"),
      (2L, "a b", "en", "s"),
      (3L, "a c", "en", "s"))
    val out = Selection.bigramNllOf(d).orderBy("doc_id")
      .select("doc_id", "n_bigrams", "nll_e6")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 693147L), (2L, 1L, 693147L), (3L, 1L, 1098612L)))
  }

  // ---- fim1: reassembly invariant ----

  test("fim1: PSM pieces are a permutation of the original text, splits are in range") {
    val d = docs((7L, "hello world of spark", "en", "s"), (8L, "x", "en", "s"))
    val out = Selection.fimSplitOf(d).orderBy("doc_id")
      .select("doc_id", "n", "s1", "s2", "fim_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    out.foreach { case (_, n, s1, s2, fim) =>
      assert(0 <= s1 && s1 <= s2 && s2 <= n)
      val body = fim.stripPrefix("<PRE>")
      val pre = body.substring(0, body.indexOf("<SUF>"))
      val rest = body.substring(body.indexOf("<SUF>") + 5)
      val suf = rest.substring(0, rest.indexOf("<MID>"))
      val mid = rest.substring(rest.indexOf("<MID>") + 5)
      assert(pre.length === s1)
      assert(mid.length === s2 - s1)
      assert(suf.length === n - s2)
    }
    val orig = Map(7L -> "hello world of spark", 8L -> "x")
    out.foreach { case (id, _, s1, s2, fim) =>
      val t = orig(id)
      assert(fim === s"<PRE>${t.substring(0, s1.toInt)}<SUF>${t.substring(s2.toInt)}<MID>${t.substring(s1.toInt, s2.toInt)}")
    }
  }

  // ---- rep1: adjacent-run collapse ----

  test("rep1: collapses runs, keeps non-adjacent repeats, preserves order") {
    val d = docs((1L, "a a a b b a c c c c", "en", "s"))
    val out = Selection.adjacentDedupOf(d)
      .select("n_tokens", "n_kept", "removed_bp", "clean_text")
      .as[(Long, Long, Long, String)].collect().head
    assert(out === ((10L, 4L, 6000L, "a b a c")))
  }

  // ---- tok2: BPE encode with learned merges (compensating check — no oracle) ----

  test("tok2: classic corpus encodes exactly under its own learned merges") {
    // merges from the classic corpus (see bpe2 test): es, es+t, lo, lo+w.
    // Encodings: low=[low] 1, lower=[low,e,r] 3, newest=[n,e,w,est] 4,
    // widest=[w,i,d,est] 4.
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val d = docs(
      (1L, words.mkString(" "), "en", "s"),
      (2L, "low lower newest widest", "en", "s"))
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val out = Selection.bpeEncodeStatsOf(d, merges).orderBy("doc_id")
      .select("doc_id", "n_words", "n_sym_before", "n_sym_after", "compression_bp")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc2: before = 3+5+6+6 = 20 chars; after = 1+3+4+4 = 12 → 6000 bp
    assert(out(1) === ((2L, 4L, 20L, 12L, 6000L)))
    // doc1: before = 5*3+2*5+6*6+3*6 = 79; after = 5*1+2*3+6*4+3*4 = 47
    assert(out.head === ((1L, 16L, 79L, 47L, 5949L)))
  }

  // ---- batch1: padding-waste accounting ----

  test("batch1: bucket math — caps, waste, microbatches, tails") {
    // doc lengths (tokens): 3, 64, 65, 70 → buckets 1, 1, 2, 2
    // bucket 1: n=2, sum=67, cap=64, waste=2*64-67=61, waste_bp=61*10000 div 128=4765
    //           microbatches=ceil(2/8)=1, tail=6
    // bucket 2: n=2, sum=135, waste=2*128-135=121, bp=121*10000 div 256=4726
    val d = docs(
      (1L, "a b c", "en", "s"),
      (2L, (1 to 64).map(_ => "w").mkString(" "), "en", "s"),
      (3L, (1 to 65).map(_ => "w").mkString(" "), "en", "s"),
      (4L, (1 to 70).map(_ => "w").mkString(" "), "en", "s"))
    val out = Selection.lengthBucketsOf(d, 64L, 8L).orderBy("bucket")
      .select("bucket", "cap_toks", "n_docs", "sum_toks", "sum_waste", "waste_bp", "n_microbatches", "tail_slots")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 64L, 2L, 67L, 61L, 4765L, 1L, 6L),
      (2L, 128L, 2L, 135L, 121L, 4726L, 1L, 6L)))
  }

  test("bpe2: repeated-symbol runs merge deterministically to fixpoint") {
    // vocab: "aaaa" f=2 → iter1 (a,a) = 3 adjacent pairs × f = 6; the
    // fixpoint replace turns " a a a a " into " aa aa ", so iter2's top
    // pair is (aa,aa) = 1 × f = 2.
    val d = docs((1L, "aaaa aaaa", "en", "s"))
    val out = Selection.bpeMergesOf(d, 2).orderBy("iter")
      .select("iter", "left_sym", "right_sym", "pair_count")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(out.head === ((1, "a", "a", 6L)))
    assert(out(1) === ((2, "aa", "aa", 2L)))
  }

  test("samp4: A-ES sample has k rows, keys <= 0, and a dominant weight always wins") {
    // 100 light docs (w=10) + one doc whose weight dwarfs them (w=10^6):
    // its key ln(u)/w is ~5 orders of magnitude closer to 0 than any
    // light doc's, so it must appear in the sample — the defining A-ES
    // property (P(selected) increasing in w).
    val light = (1L to 100L).map(i => (i, "x" * 10, "en", "s"))
    val heavy = Seq((999L, "irrelevant", "en", "s"))
    val d = docs(light ++ heavy: _*)
      .withColumn("n_chars", when(col("doc_id") === 999L, 1000000L).otherwise(10L))
    val out = Selection.weightedSampleOf(d, k = 5, salt = "samp4:").collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Int]("rk")).sorted.toSeq === Seq(1, 2, 3, 4, 5))
    assert(out.forall(_.getAs[Long]("key_e9") <= 0L), "ln(u)/w keys are non-positive")
    assert(out.exists(_.getAs[Long]("doc_id") === 999L), "dominant weight must be sampled")
    val again = Selection.weightedSampleOf(d, k = 5, salt = "samp4:").collect()
    assert(again.map(_.toString).toSeq === out.map(_.toString).toSeq, "rerun-stable")
    // heavier docs sort earlier in expectation: the top-1 key belongs to 999
    assert(out.minBy(_.getAs[Int]("rk")).getAs[Long]("doc_id") === 999L)
  }

  test("fim2 span corruption is lossless: sentinel substitution restores every doc") {
    val rows = Selection.fim2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val orig = graft.Tables.documents(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    val sentinel = "<X_(\\d+)>".r
    rows.foreach { r =>
      val (id, nSpans, nMasked) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val input = r.getString(4).split(" ").filter(_.nonEmpty).toSeq
      val target = r.getString(5)
      // parse target: "<X_a> t t t <X_b> t ..." -> span map
      val spans = scala.collection.mutable.Map[String, Vector[String]]()
      var cur: String = null
      target.split(" ").filter(_.nonEmpty).foreach {
        case s @ sentinel(_) => cur = s; spans(cur) = Vector.empty
        case t               => assert(cur != null, s"doc $id: target starts without sentinel"); spans(cur) :+= t
      }
      assert(spans.size === nSpans, s"doc $id sentinel count")
      assert(spans.values.map(_.size).sum === nMasked, s"doc $id masked count")
      assert(spans.values.forall(v => v.nonEmpty && v.size <= 3), s"doc $id span lengths")
      val restored = input.flatMap {
        case s @ sentinel(_) => spans(s)
        case t               => Seq(t)
      }
      assert(restored === orig(id), s"doc $id does not round-trip")
    }
  }

  test("t22 Kneser-Ney NLL matches a pure-Scala recompute on a planted corpus") {
    // 'san francisco' appears often but 'francisco' follows ONLY 'san' —
    // KN's continuation count must rank it less predictable as a unigram
    // continuation than its raw frequency suggests
    val docs = Seq(
      (1L, "san francisco is big"), (2L, "san francisco is old"),
      (3L, "san francisco was cold"), (4L, "the city is big"),
      (5L, "the city is old"), (6L, "a city was big")).toDF("doc_id", "text")
    val bi = docs.collect().flatMap { r =>
      val ws = r.getString(1).split(" ").filter(_.nonEmpty)
      ws.init.zip(ws.tail).map { case (a, b) => (r.getLong(0), a, b) }
    }
    val c1 = bi.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val t1 = bi.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).distinct.length.toLong }
    val c12 = bi.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.length.toLong }
    val c2 = bi.groupBy(_._3).map { case (k, v) => k -> v.map(_._2).distinct.length.toLong }
    val nb = c12.size.toLong
    def nllE6(w1: String, w2: String): Long = {
      val num = math.max(4 * c12((w1, w2)) - 3, 0L) * nb + 3 * t1(w1) * c2(w2)
      math.round(math.log((4.0 * c1(w1) * nb) / num.toDouble) * 1000000)
    }
    val expected = bi.groupBy(_._1).map { case (id, rows) =>
      val s = rows.map(t => nllE6(t._2, t._3)).sum
      (id, rows.length.toLong, s / rows.length)
    }.toSet
    val got = Selection.knBigramNllOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // the KN signature: p(francisco | san) uses C2(francisco)=1 despite
    // c12(san,francisco)=3 being the most frequent bigram; verify the
    // continuation term actually bites (nll higher than the naive MLE -ln(3/3))
    assert(nllE6("san", "francisco") > 0L)
  }

  test("t22 registry keep flag is an exact threshold on nll_e6") {
    val rows = Selection.t22(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = if (r.getLong(2) < Selection.KnKeepNllE6) 1 else 0
      assert(r.getInt(3) === expect)
    }
  }
  test("t25 stupid backoff walks every tier with the hand-computed rational NLLs") {
    import spark.implicits._
    // train trigrams: (a,b,c) (b,c,a) (c,a,b) (a,b,d); tokens a:2 b:2 c:1 d:1, T=6
    val train = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val test = Seq(
      (0L, "a b c"),  // tier0 hit:      ln(c12(a,b)/c123(a,b,c)) = ln 2
      (7L, "x b c"),  // tier1 backoff:  ln(5*c2(b)/(2*c23(b,c))) = ln 5
      (14L, "x y c"), // tier2 backoff:  ln(25*T/(4*c3(c)))       = ln 37.5
      (21L, "x y z")  // tier3 floor:    ln(125*T/8)              = ln 93.75
    ).toDF("doc_id", "text")
    val out = Selection.stupidBackoffOf(train, test).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    def e6(x: Double): Long = math.round(math.log(x) * 1000000)
    assert(out.toSeq === Seq(
      (0L, 1L, 1L, 0L, 0L, e6(2.0)),
      (7L, 1L, 0L, 1L, 0L, e6(5.0)),
      (14L, 1L, 0L, 0L, 1L, e6(37.5)),
      (21L, 1L, 0L, 0L, 1L, e6(93.75))))
  }

  test("t25 on the fixture exercises hit and both backoff tiers") {
    val agg = Selection.t25(spark, sfDir)
      .selectExpr("sum(n_hit) AS h", "sum(n_bo1) AS b1", "sum(n_bo2) AS b2").head()
    assert(agg.getLong(0) > 0L, "direct trigram hits must occur")
    assert(agg.getLong(1) > 0L, "bigram backoff must occur on held-out docs")
    assert(agg.getLong(2) >= 0L)
  }

  // ---- tok4: fertility by language ----

  test("tok4 fertility matches a hand-encoded two-language corpus") {
    // merge (a,b): en words [ab, ab, cd] -> tokens [ab]=1, [ab]=1, [c d]=2
    //   n_words 3, n_tokens 4, n_chars 6 -> fertility 1333 e3, cont 2500 bp
    // fr word [abc] -> [ab c]=2 tokens: n_words 1, n_tokens 2, n_chars 3
    //   -> fertility 2000 e3, cont 5000 bp
    val d = docs(
      (1L, "ab ab cd", "en", "s0"),
      (2L, "abc", "fr", "s0"))
    val out = Selection.bpeFertilityByLangOf(d, Seq(("a", "b"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("en", 3L, 4L, 6L, 1333L, 2500L),
      ("fr", 1L, 2L, 3L, 2000L, 5000L)))
  }

  // ---- mix4: data-constrained repetition allocation ----

  test("mix4 repeats the high-quality source before the boilerplate one gets a second epoch") {
    // A: 3 toks, 3 types -> q = 1e6; B: 6 toks, 1 type -> q = 166666
    // units by utility desc: A1(1e6) A2(5e5) A3(25e4) B1(166666) A4(125e3)
    //   B2(83333) B3(41666) B4(20833); budget = (5*9) div 2 = 22
    // prefix:    0    3    6     9      15     18(least 4) 22->0  0
    // -> A alloc 12 (4 full epochs, the cap), B alloc 10 (16666 bp)
    val d = docs(
      (1L, "x y z", "en", "A"),
      (2L, "x x x x x x", "en", "B"))
    val out = Selection.dataConstrainedAllocOf(d, 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("A", 3L, 1000000L, 12L, 40000L),
      ("B", 6L, 166666L, 10L, 16666L)))
  }

  test("mix4 allocation always spends exactly the budget and respects the epoch cap") {
    val rows = Selection.mix4(spark, sfDir).collect()
    val spent = rows.map(_.getLong(3)).sum
    val total = rows.map(_.getLong(1)).sum
    assert(spent === (5L * total) / 2L, "greedy fill must spend the whole budget")
    rows.foreach { r =>
      assert(r.getLong(3) <= 4L * r.getLong(1), s"epoch cap violated for ${r.getString(0)}")
      assert(r.getLong(3) >= 0L)
    }
  }
}
