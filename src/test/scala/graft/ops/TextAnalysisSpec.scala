package graft.ops

import graft.SparkSpec

/** Behavioral checks for the text-analysis detectors beyond the oracle
  * gate: the planted PII actually gets found and redacted, and the
  * repetition ratios sit inside their arithmetic bounds. */
class TextAnalysisSpec extends SparkSpec {

  test("t9 finds exactly the planted PII per doc_id % 4 class and redacts it") {
    val rows = TextAnalysis.t9(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (id, em, ph, ip) =>
      val want = (id % 4) match {
        case 0 => (1L, 0L, 0L)
        case 1 => (0L, 1L, 0L)
        case 2 => (0L, 0L, 1L)
        case _ => (0L, 0L, 0L)
      }
      assert((em, ph, ip) === want, s"doc $id: got ($em,$ph,$ip)")
    }
    // redaction must leave no live match: re-run the detector on a doc's
    // redacted text by construction — the md5 differs from the un-redacted
    // md5 whenever something was planted
    val planted = rows.count(_._1 % 4 != 3)
    assert(planted > 0, "fixture must exercise all plant classes")
  }

  test("t10 repetition ratios are bounded and trigram counts match n-2") {
    TextAnalysis.t10(spark, sfDir).collect().foreach { r =>
      val (n, dupW, nTri, dupT) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dupW >= 0 && dupW < 10000, s"dup_word_bp $dupW out of range")
      assert(dupT >= 0 && dupT <= 10000, s"dup_tri_bp $dupT out of range")
      assert(nTri === math.max(n - 2, 0), s"trigram count $nTri != max(n-2,0) for n=$n")
    }
    // word-soup fixture docs repeat words heavily — the signal must be live
    val avgDup = TextAnalysis.t10(spark, sfDir).collect().map(_.getLong(2)).sum /
      TextAnalysis.t10(spark, sfDir).count()
    assert(avgDup > 1000, s"average dup_word_bp $avgDup suspiciously low for the fixture")
  }

  test("chunk1 window/stride math on a long document (multi-chunk + tail rules)") {
    // the fixture docs are single-chunk; drive the operator on a 300-token
    // doc through the registry shape reimplemented over a temp view
    val sp = spark
    import sp.implicits._
    val doc = Seq((1L, (1 to 300).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 100).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 130).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = doc
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(org.apache.spark.sql.functions.col("text"), " ")).as("n"))
      .select(org.apache.spark.sql.functions.col("doc_id"), org.apache.spark.sql.functions.col("n"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("sequence(0, greatest(n - 1, 0), 96)")).as("start_tok"))
      .filter("start_tok = 0 OR start_tok + 32 < n")
      .selectExpr("doc_id", "start_tok", "least(128, n - start_tok) AS chunk_toks")
      .collect().groupBy(_.getLong(0))
    // doc 1 (300 toks): starts 0,96,192 kept; 288 dropped (288+32 >= 300)
    val d1 = chunks(1L).map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(d1.toSeq === Seq((0, 128), (96, 128), (192, 108)))
    // doc 2 (100 toks): single chunk, start 96 dropped (96+32 >= 100)
    assert(chunks(2L).map(r => (r.getInt(1), r.getInt(2))).toSeq === Seq((0, 100)))
    // doc 3 (130 toks): tail at 96 kept (96+32 < 130), 34 tokens
    val d3 = chunks(3L).map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(d3.toSeq === Seq((0, 128), (96, 34)))
    // every token index is covered by at least one chunk
    d1.foreach { case (s, l) => assert(l > 0 && s + l <= 300) }
    assert(d1.map { case (s, l) => (s, s + l) }.sliding(2).forall {
      case Array((_, e1), (s2, _)) => s2 < e1
      case _ => true
    }, "consecutive chunks must overlap")
  }

  test("t14 PMI: always-together words score ln(N/c) > 0, anti-correlated pairs never appear") {
    val sp = spark
    import sp.implicits._
    // 'x y' always co-occur (10 docs of 40); 'p' and 'q' never do
    val docs = ((1 to 10).map(i => (i.toLong, "x y filler")) ++
      (11 to 25).map(i => (i.toLong, "p filler")) ++
      (26 to 40).map(i => (i.toLong, "q filler")))
      .toDF("doc_id", "text")
    val out = graft.api.GraftApi.pmiCooccurrence(docs, minSupport = 5L)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val (cxy, pmi) = out(("x", "y"))
    assert(cxy === 10L)
    // PMI(x,y) = ln(40*10/(10*10)) = ln 4
    assert(pmi === math.round(math.log(4.0) * 1e6))
    assert(!out.contains(("p", "q")) && !out.contains(("q", "p")))
  }

  test("t16 Gopher rule battery matches a pure-JVM recomputation on the fixture") {
    val stop = Seq("the", "a", "data", "value", "row")
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val expected = docs.map { case (id, text, nChars) =>
      val ws = text.split(" ", -1)
      val k = 5 + id % 7
      val n = ws.length.toLong
      val nLines = (n + k - 1) / k
      val nBul = (0L until nLines).count(i => (id + 1 + i) % 9 == 0).toLong
      val nEll = (0L until nLines).count(i => (id + 1 + i) % 7 == 3).toLong
      val nWords = n + nBul + nEll
      val meanLen = ((nChars - n + 1) + nBul + 3 * nEll) * 100 / nWords
      val symbolBp = nEll * 10000 / nWords
      val bulletBp = nBul * 10000 / nLines
      val ellipsisBp = nEll * 10000 / nLines
      val alphaBp = n * 10000 / nWords
      val nStop = ws.distinct.count(stop.contains).toLong
      val keep = if (nWords >= 50 && nWords <= 100000 &&
        meanLen >= 300 && meanLen <= 1000 && symbolBp <= 1000 &&
        bulletBp < 9000 && ellipsisBp < 3000 && alphaBp >= 8000 && nStop >= 2) 1 else 0
      id -> ((nWords, nLines, meanLen, symbolBp, bulletBp, ellipsisBp, alphaBp, nStop, keep))
    }.toMap
    val got = TextAnalysis.t16(spark, sfDir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getInt(9)))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, row) => assert(row === expected(id), s"doc $id") }
    // the battery must be a live filter on this corpus, not all-pass/all-fail
    val keeps = got.values.map(_._9).toSet
    assert(keeps === Set(0, 1), s"keep flag must vary across the fixture, saw $keeps")
  }

  test("t17 C4 filter matches a pure-JVM recomputation incl. the cleaned-doc md5") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val k = (4 + id % 5).toInt
      val n = ws.length.toLong
      val nLines = ((n + k - 1) / k).toInt
      val base = (0 until nLines).map { i =>
        ws.slice(i * k, i * k + k).mkString(" ") +
          (if (id % 17 == 0 && i == 0) " javascript required" else "") +
          (if ((id + i) % 3 == 1) "" else ".")
      }
      val all = base ++
        (if (id % 23 == 0) Seq("lorem ipsum dolor sit amet.") else Nil) ++
        (if (id % 29 == 0) Seq("var f = function() {") else Nil)
      val full = all.mkString("\n")
      val kept = all.filter(l => l.endsWith(".") &&
        l.split(" ", -1).length >= 5 && !l.contains("javascript"))
      val keptWords = kept.map(_.split(" ", -1).length.toLong).sum
      val hasLorem = if (full.contains("lorem ipsum")) 1 else 0
      val hasBrace = if (full.contains("{")) 1 else 0
      val docKept = if (hasLorem == 0 && hasBrace == 0 && kept.length >= 3) 1 else 0
      id -> ((all.length.toLong, kept.length.toLong, keptWords,
        hasLorem, hasBrace, docKept, md5hex(kept.mkString("\n"))))
    }.toMap
    val got = TextAnalysis.t17(spark, sfDir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, row) => assert(row === expected(id), s"doc $id") }
    // the planted trigger classes must all fire somewhere
    assert(got.exists(_._2._4 == 1), "no lorem plant fired")
    assert(got.exists(_._2._5 == 1), "no brace plant fired")
    assert(got.values.map(_._6).toSet === Set(0, 1), "doc_kept must vary")
  }

  test("pack2 global concat-and-chunk packing on a hand-computed fixture + corpus invariants") {
    val sp = spark
    import sp.implicits._
    // lengths 1000,1500,600,2000,100 -> starts 0,1000,2500,3100,5100 (window 2048)
    val doc = Seq(
      (1L, (1 to 1000).map(_ => "w").mkString(" ")),
      (2L, (1 to 1500).map(_ => "w").mkString(" ")),
      (3L, (1 to 600).map(_ => "w").mkString(" ")),
      (4L, (1 to 2000).map(_ => "w").mkString(" ")),
      (5L, (1 to 100).map(_ => "w").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.packingStatsOf(doc, 2048L).orderBy("chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((0L, 2L, 2L, 2048L), (1L, 3L, 2L, 2048L), (2L, 2L, 1L, 1104L)))
    // corpus invariants: fill == window everywhere but the tail, totals add up
    val corpus = TextAnalysis.pack2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val nTotal = graft.Tables.documents(spark, sfDir)
      .selectExpr("CAST(sum(size(split(text, ' '))) AS BIGINT)").head().getLong(0)
    assert(corpus.map(_._4).sum === nTotal, "chunk fills must sum to the token stream")
    corpus.init.foreach { case (cid, _, _, fill) =>
      assert(fill === 2048L, s"non-tail chunk $cid fill $fill != 2048") }
    assert(corpus.map(_._1) === corpus.indices.map(_.toLong), "chunk ids must be contiguous from 0")
    assert(corpus.map(_._3).sum === graft.Tables.documents(spark, sfDir).count(),
      "every doc starts in exactly one chunk")
  }

  test("t15 unigram NLL matches hand-computed add-1 smoothed surprisals") {
    val sp = spark
    import sp.implicits._
    // corpus: a a b | a c  =>  c(a)=3, c(b)=c(c)=1, N=5, V=3, N+V=8
    // surprisal_e6: a -> ln(8/4)=ln2 -> 693147; b,c -> ln(8/2)=ln4 -> 1386294
    val docs = Seq(1L -> "a a b", 2L -> "a c").toDF("doc_id", "text")
    val out = TextAnalysis.unigramNllOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ln2e6 = math.round(math.log(2.0) * 1e6) // 693147
    val ln4e6 = math.round(math.log(4.0) * 1e6) // 1386294
    assert(out(1L) === ((3L, (2 * ln2e6 + ln4e6) / 3)))
    assert(out(2L) === ((2L, (ln2e6 + ln4e6) / 2)))
    // the rare-token doc must read as more surprising than the common one
    assert(out(2L)._2 > out(1L)._2)
  }

  test("t20 hashed linear score matches a JVM recomputation of the md5 weights") {
    import spark.implicits._
    def w(salt: String, feat: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + feat).getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(4)
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }
    val docs = Seq((1L, "alpha beta gamma", "sA"), (2L, "solo", "sB"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.hashedLinearScoreOf(docs).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_score"))).toMap
    val s1 = w("t20:", "alpha") + w("t20:", "beta") + w("t20:", "gamma") +
      w("t20b:", "alpha_beta") + w("t20b:", "beta_gamma")
    val s2 = w("t20:", "solo") // single token: bigram sum must be 0
    assert(out("sA") === ((1L, s1)))
    assert(out("sB") === ((1L, s2)))
  }

  test("t21 winnowing guarantee: docs sharing an 8-token run share a fingerprint") {
    val sp = spark; import sp.implicits._
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 $shared b1 b2 b3"),
      (2L, s"c1 c2 $shared d1 d2 d3 d4 d5")).toDF("doc_id", "text")
    val out = TextAnalysis.winnowingOf(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](3).toSet).toMap
    assert((out(1L) intersect out(2L)).nonEmpty,
      "a >= w+k-1 token overlap must share at least one selected fingerprint")
  }

  test("t21 tie-break is rightmost: constant doc selects every window's last slot") {
    val sp = spark; import sp.implicits._
    // 12 identical tokens -> 10 identical gram hashes -> 7 windows, every
    // min ties across all 4 slots; rightmost-wins selects positions 4..10
    val docs = Seq((1L, ("x " * 12).trim)).toDF("doc_id", "text")
    val r = TextAnalysis.winnowingOf(docs).collect().head
    assert(r.getLong(1) === 10L, "n_grams")
    assert(r.getLong(2) === 7L, "n_sel = one distinct (pos, fp) per window")
    assert(r.getSeq[Long](3).size === 1, "one distinct hash value")
  }

  test("d19 flags exactly the train docs sharing a winnowing fingerprint with eval") {
    // t21's registry output stringifies fps (driver-harness hashability);
    // parse it back for the set arithmetic
    val fps = TextAnalysis.t21(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        r.getString(3).split(',').filter(_.nonEmpty).map(_.toLong).toSet)).toMap
    val evalF = fps.collect { case (id, f) if id % 97 == 0 => f }
      .foldLeft(Set.empty[Long])(_ ++ _)
    val got = TextAnalysis.d19(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val trainWithFps = fps.filter { case (id, f) => id % 97 != 0 && f.nonEmpty }
    assert(got.map(_._1).toSet === trainWithFps.keySet)
    got.foreach { case (id, nf, nh, fl) =>
      assert(nf === fps(id).size.toLong, s"doc $id n_fps")
      assert(nh === (fps(id) intersect evalF).size.toLong, s"doc $id n_hits")
      assert(fl === (if (nh > 0) 1 else 0), s"doc $id flag")
    }
  }

  test("kw1 tf-idf keywords match a hand computation and break ties by term") {
    import spark.implicits._
    val docs = Seq((0L, "x x y"), (1L, "y z"), (2L, "z z z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywordsOf(docs, k = 3)
      .orderBy("doc_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(6)))
    val ln3e6 = math.round(math.log(3.0) * 1000000)        // df=1 → 1098612
    val ln15e6 = math.round(math.log(1.5) * 1000000)       // df=2 → 405465
    assert(out.toSeq === Seq(
      (0L, 1L, "x", 2L, 2 * ln3e6), (0L, 2L, "y", 1L, ln15e6),
      (1L, 1L, "y", 1L, ln15e6), (1L, 2L, "z", 1L, ln15e6), // equal scores → term asc
      (2L, 1L, "z", 3L, 3 * ln15e6)))
  }

  test("w2v1 skip-gram pairs cover both directions of the ±2 window exactly") {
    import spark.implicits._
    val docs = Seq((0L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.skipgramPairsOf(docs, minSupport = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // window 2 over [a b c]: (a,b) (b,c) at d=1, (a,c) at d=2 — each both ways
    assert(got === Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "c") -> 1L,
      ("c", "b") -> 1L, ("a", "c") -> 1L, ("c", "a") -> 1L))
    // repeated tokens count every positional occurrence (multiset, unlike t14)
    val rep = TextAnalysis.skipgramPairsOf(
      Seq((0L, "a a a")).toDF("doc_id", "text"), minSupport = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rep === Map(("a", "a") -> 6L)) // 2 at d=1 + 1 at d=2, both directions
  }

  test("t21 density and bounds hold on every fixture document") {
    val rows = TextAnalysis.t21(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var withSel = 0
    rows.foreach { r =>
      val (m, nsel) = (r.getLong(1), r.getLong(2))
      val fps = r.getString(3).split(',').filter(_.nonEmpty).map(_.toLong).toSeq
      if (m >= 4) {
        assert(nsel >= 1 && nsel <= m - 3, s"n_sel $nsel out of [1, ${m - 3}]")
        withSel += 1
      } else assert(nsel === 0 && fps.isEmpty)
      assert(fps.size <= nsel, "distinct hashes cannot exceed selected pairs")
      assert(fps === fps.sorted)
    }
    assert(withSel > 0)
  }

  test("t26 FORCAST grade matches hand-counted syllable profiles") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (1L, "go up"),                               // 2 monosyllables
      (2L, "observation computation analysis"),    // 4+4+4 syllables, 0 mono
      (3L, "the quick brown fox jumps")            // 5 monosyllables
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.forcastReadabilityOf(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // all-monosyllable text bottoms out at grade 5.0; zero-mono text
    // pins the ceiling 20.0 — the formula's exact range endpoints
    assert(rows(0) === ((1L, 2L, 2L, 2L, 5000L, 1000L)))
    assert(rows(1) === ((2L, 3L, 0L, 12L, 20000L, 4000L)))
    assert(rows(2) === ((3L, 5L, 5L, 5L, 5000L, 1000L)))
  }

  test("t27 burstiness: a uniformly-spread term scores VMR 0, a piled-up term scores its pile") {
    val s2 = spark
    import s2.implicits._
    // 'u' appears exactly once in all 4 docs: S1=4, S2=4, n=4
    //   -> (4*4 - 16)/(4*4) = 0 (sub-Poisson, clamped at the uniform floor)
    // 'b' appears 4 times in ONE doc: S1=4, S2=16
    //   -> (4*16 - 16)/(4*4) = 3 -> 3,000,000 e6
    val docs = Seq(
      (1L, "u b b b b"), (2L, "u"), (3L, "u"), (4L, "u")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.burstinessOf(docs, minDf = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("b", 1L, 4L, 3000000L), ("u", 4L, 4L, 0L)))
  }

  test("voc3 Heaps exponent matches the mirrored two-point arithmetic") {
    val s2 = spark
    import s2.implicits._
    // half (doc 0): "a b a" -> N1=3, T1=2; full adds doc 1 "a c" -> N=5, T=3
    val docs = Seq((0L, "a b a"), (1L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.heapsLawOf(docs).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 2L, 5L, 3L)))
    val lnT = math.round(math.log(3.0 / 2) * 1000000)
    val lnN = math.round(math.log(5.0 / 3) * 1000000)
    assert(r.getLong(4) === lnT * 1000000L / lnN)
  }

  test("voc5 JSD pins identical = 0, disjoint = ln 2, and the hand-mixed case") {
    val s2 = spark
    import s2.implicits._
    def jsd(docs: Seq[(String, String)]) =
      TextAnalysis.sourceJsdOf(docs.toDF("source", "text")).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // identical unigram distributions -> every word's p = q -> JSD = 0
    val same = jsd(Seq(("p", "x y y"), ("q", "x y y")))
    assert(same(("p", "q")) === ((2L, 2L, 0L)))
    // disjoint vocabularies -> the ln 2 maximum: per word round(p*ln2*1e9)
    // = 693147181, both sides, div 2 -> exactly 693147181
    val disj = jsd(Seq(("p", "x x"), ("q", "y y")))
    assert(disj(("p", "q")) === ((2L, 0L, 693147181L)))
    // hand case: shared x at equal mass contributes 0; y and z each
    // carry round(0.5*ln2*1e9) = 346573590 -> sum 693147180 div 2
    val mixed = jsd(Seq(("p", "x y"), ("q", "x z")))
    assert(mixed(("p", "q")) === ((3L, 1L, 346573590L)))
    // three sources emit all three unordered pairs, all bounded by ln 2
    val tri = jsd(Seq(("p", "x"), ("q", "y"), ("r", "x y")))
    assert(tri.size === 3)
    tri.values.foreach { case (_, _, j) => assert(j >= 0L && j <= 693147181L) }
    // facade routes to the same implementation
    assert(graft.api.GraftApi.sourceJsd(
      Seq(("p", "x"), ("q", "x")).toDF("source", "text")).collect()
      .head.getLong(4) === 0L)
  }

  test("voc4 source vocabulary overlap matches hand-counted type sets") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      ("sa", "a b c d"), ("sa", "a b"),     // types(sa) = {a,b,c,d}
      ("sb", "a b x"),                       // types(sb) = {a,b,x}
      ("sc", "a b c d"))                     // types(sc) = {a,b,c,d} (== sa)
      .toDF("source", "text")
    val out = TextAnalysis.sourceVocabOverlapOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_common"), r.getAs[Long]("jaccard_bp"), r.getAs[Long]("contain_bp")))).toMap
    // sa vs sb: common {a,b}=2, union 5 -> 4000 bp; containment 2/3 -> 6666
    assert(out(("sa", "sb")) === ((2L, 4000L, 6666L)))
    // sa vs sc: identical type sets
    assert(out(("sa", "sc")) === ((4L, 10000L, 10000L)))
    assert(out.size === 3, "unordered pairs only")
  }

  test("voc3 Heaps exponent emits NULL (not a crash/garbage) on degenerate corpora") {
    val s2 = spark
    import s2.implicits._
    // no even doc_ids -> n_half = 0 (the ln-of-infinity branch)
    val odd = Seq((1L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val rOdd = TextAnalysis.heapsLawOf(odd).head()
    assert(rOdd.isNullAt(rOdd.fieldIndex("beta_e6")))
    // only even doc_ids -> n_half = n_full (the 0-denominator branch)
    val even = Seq((0L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val rEven = TextAnalysis.heapsLawOf(even).head()
    assert(rEven.isNullAt(rEven.fieldIndex("beta_e6")))
  }

  test("t28 boilerplate: a planted template shingle tops its source, singles stay out") {
    val sp = spark
    import sp.implicits._
    // "all rights reserved" appears in 3 of source A's docs; each doc
    // also carries unique content shingles (df = 1 -> excluded)
    val docs = Seq(
      (1L, "all rights reserved alpha beta gamma", "A"),
      (2L, "all rights reserved delta epsilon zeta", "A"),
      (3L, "all rights reserved eta theta iota", "A"),
      (4L, "kappa lambda mu nu xi omicron", "B"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.boilerplateNgramsOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(("A", 1L, "all rights reserved", 3L)),
      "only the repeated template shingle survives df >= 2")
  }

  test("voc6 curve: hand-counted cutoffs, monotone vocab shrink, exact OOV shares") {
    val sp = spark
    import sp.implicits._
    // token freqs: a=3, b=2, c=1 over 6 tokens
    val docs = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCurveOf(docs, Seq(1L, 2L, 3L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 3L, 6L, 6L, 0L),
      (2L, 2L, 5L, 6L, 1666L),
      (3L, 1L, 3L, 6L, 5000L)))

    val fix = TextAnalysis.voc6(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(fix.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L, 16L))
    fix.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3, "vocab and kept mass shrink with the cutoff")
      assert(a._4 <= b._4, "OOV share grows with the cutoff")
    }
    assert(fix.head._4 === 0L, "cutoff 1 keeps everything")
  }

  test("t23 novelty: shared 3-grams are flagged, unique docs score 10000") {
    val sp = spark
    import sp.implicits._
    // docs 1 and 2 share the shingle "b c d"; doc 3 is fully unique;
    // doc 4 is too short for a 3-gram (falls back to the whole text)
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "x b c d"),
      (3L, "p q r"),
      (4L, "solo")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNoveltyOf(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 1L, 5000L)))
    assert(got(2L) === ((2L, 1L, 5000L)))
    assert(got(3L) === ((1L, 0L, 10000L)))
    assert(got(4L) === ((1L, 0L, 10000L)))
  }

  test("t23 fixture: novelty_bp = 10000 exactly when n_shared = 0, and in [0, 10000]") {
    val rows = TextAnalysis.t23(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (nSh, nShared, bp) =>
      assert(nShared <= nSh)
      assert(bp === (nSh - nShared) * 10000 / nSh)
      assert(bp >= 0 && bp <= 10000)
    }
    assert(rows.exists(_._3 < 10000), "the fixture corpus must contain shared phrases")
  }
}
