package graft.api

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup

/** The library facade: works on arbitrary user frames (not just the
  * fixture), and the fixture-bound registry queries are exactly these
  * operators (no drift between what users call and what the oracle
  * gate checks). */
class ApiSpec extends SparkSpec {

  private def userDocs = {
    val sp = spark
    import sp.implicits._
    // 12+ words: dropping the first word keeps trigram jaccard at
    // (n-3)/(n-2) >= 0.8 only for n >= 12
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"), // exact dup of 1
      (3L, "beta gamma delta epsilon zeta eta theta iota kappa lambda mu"), // near dup (first word dropped)
      (4L, "one two three four five six seven eight"),
      (5L, "totally different words entirely here now"),
      (6L, "email me at jane.doe@corp.example.org or call 555-123-4567 from 10.0.0.1"))
      .toDF("doc_id", "text")
  }

  test("dedup family finds planted dups on a hand-built frame") {
    val exact = GraftApi.exactDupGroups(userDocs).collect()
    assert(exact.length === 1 && exact.head.getLong(1) === 2L && exact.head.getLong(2) === 1L)

    val pairs = GraftApi.nearDupPairs(userDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 10000L), "exact pair at 10000 bp")
    assert(pairs.exists(p => (p._1, p._2) == (1L, 3L) || (p._1, p._2) == (2L, 3L)),
      "near pair must surface")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L),
      "unrelated docs must not pair")

    val clusters = GraftApi.dedupClusters(userDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(clusters.map(_._1).toSeq === Seq(1L, 2L, 3L), "docs 1,2,3 form the only cluster")
    assert(clusters.forall(_._2 == 1L), "cluster id = min member")
    assert(clusters.forall(_._3 == 3L), "cluster size 3")
  }

  test("substringDupStats finds shared token windows and only those") {
    // w=4: docs 1,2 are exact dups (12 tokens -> 9 windows, all shared);
    // doc 3 drops the first word (11 tokens -> 8 windows, every one also
    // in docs 1/2); docs 4-6 share no 4-token window with anything
    val out = GraftApi.substringDupStats(userDocs, w = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set(1L, 2L, 3L), s"only the planted family, got ${out.keySet}")
    assert(out(1L) === ((9L, 9L, 10000L)) && out(2L) === ((9L, 9L, 10000L)))
    assert(out(3L) === ((8L, 8L, 10000L)))
  }

  test("substringRemoval excises exactly the duplicated spans") {
    // w=4 over userDocs: docs 1,2 are identical -> every window dup ->
    // every token covered -> cleaned text empty; doc 3's 8 windows are all
    // dup too (all shared with 1/2), covering all 11 tokens; docs 4-6
    // share nothing and must not appear
    val out = GraftApi.substringRemoval(userDocs, w = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L)._1 === 12L && out(1L)._2 === 12L, "doc1 fully excised")
    assert(out(3L)._1 === 11L && out(3L)._2 === 11L, "doc3 fully excised")
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.emptyByteArray).map(b => f"$b%02x").mkString
    assert(out(1L)._3 === emptyMd5, "cleaned text is the empty string")

    // a PARTIAL overlap: two long docs sharing only a 4-token run in the
    // middle lose exactly that run's coverage (4 + 3 trailing window
    // tokens... the shared window is one start -> 4 tokens each)
    val sp = spark
    import sp.implicits._
    val partial = Seq(
      (10L, "p q r s SHARED1 SHARED2 SHARED3 SHARED4 t u v w"),
      (11L, "h i j k SHARED1 SHARED2 SHARED3 SHARED4 l m n o"))
      .toDF("doc_id", "text")
    val pr = GraftApi.substringRemoval(partial, w = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pr === Map(10L -> 4L, 11L -> 4L), s"only the shared 4-token span is cut, got $pr")
  }

  test("semanticDedupedIds keeps one representative per cos >= 0.9 cluster") {
    val sp = spark
    import sp.implicits._
    val q1 = Array.fill(64)(1000L)
    val q2 = { val a = q1.clone(); a(0) = 1050L; a } // cos ~ 0.9997 vs q1
    val q3 = Array.tabulate(64)(i => if (i % 2 == 0) 1000L else -1000L) // cos 0 vs q1
    val vecs = Seq((1L, q1.toSeq), (2L, q2.toSeq), (3L, q3.toSeq)).toDF("vec_id", "q")
    val kept = GraftApi.semanticDedupedIds(vecs).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L), s"near-identical pair collapses to min id, got $kept")
  }

  test("unigramNll scores all-hapax docs as more surprising than repeated ones") {
    val out = GraftApi.unigramNll(userDocs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // docs 1 and 2 are exact duplicates (every token occurs >= 2x); doc 5
    // is all hapax legomena — it must score strictly higher
    assert(out(5L) > out(1L))
    assert(out(1L) === out(2L), "identical docs score identically")
  }

  test("piiStats/redactPii detect and strip the planted PII") {
    val r = GraftApi.piiStats(userDocs).filter(col("doc_id") === 6).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((1L, 1L, 1L)))
    val red = userDocs.filter(col("doc_id") === 6)
      .select(GraftApi.redactPii(col("text"))).head().getString(0)
    assert(red === "email me at [EMAIL] or call [PHONE] from [IP]")
  }

  test("deterministicShuffle is a stable permutation with pass-through columns") {
    val out = GraftApi.deterministicShuffle(userDocs, "doc_id")
    assert(out.columns.toSet === Set("doc_id", "text", "pos"))
    val ps = out.select("pos").collect().map(_.getLong(0)).sorted
    assert(ps.toSeq === (1L to 6L).toSeq)
    val o1 = out.orderBy("pos").select("doc_id").collect().map(_.getLong(0)).toSeq
    val o2 = GraftApi.deterministicShuffle(userDocs, "doc_id")
      .orderBy("pos").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(o1 === o2, "rerun-stable")
    assert(GraftApi.deterministicShuffle(userDocs, "doc_id", salt = "other:")
      .orderBy("pos").select("doc_id").collect().map(_.getLong(0)).toSeq !== o1,
      "different salt, different order")
  }

  test("topKPerGroup facade returns k rows per group") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8)).toDF("g", "v")
    val top = GraftApi.topKPerGroup(df, Seq("g"), Seq(("v", true)), 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted
    assert(top.toSeq === Seq(("a", 2), ("a", 3), ("b", 8), ("b", 9)))
  }

  test("languageId/fingerprints/cosineTopK work on arbitrary frames") {
    val sp = spark
    import sp.implicits._
    val lid = GraftApi.languageId(userDocs,
      dict = Seq("alpha" -> "gr", "beta" -> "gr", "one" -> "en", "two" -> "en"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(lid(1L) === "gr" && lid(4L) === "en" && lid(5L) === "und")

    val fps = GraftApi.fingerprints(userDocs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fps(1L) === fps(2L), "identical text, identical fingerprint")
    assert(fps(1L) !== fps(3L))

    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, 0.0f))) // zero vector dropped
      .toDF("vec_id", "embedding")
    val top = GraftApi.cosineTopK(vecs, vecs.filter($"vec_id" === 1L), k = 2)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(top.toSeq === Seq((2L, 1), (3L, 2)), "nearest first, zero vector excluded")
  }

  test("bernoulliKeep hits its basis-point rate deterministically") {
    val sp = spark
    import sp.implicits._
    val ids = (0L until 10000L).toDF("id")
    val kept = ids.filter(GraftApi.bernoulliKeep(col("id"), "s:", lit(2500))).count()
    assert(math.abs(kept - 2500L) < 200, s"kept $kept of 10000 at 25% target")
    val kept2 = ids.filter(GraftApi.bernoulliKeep(col("id"), "s:", lit(2500))).count()
    assert(kept === kept2, "same salt, same draw")
    assert(ids.filter(GraftApi.bernoulliKeep(col("id"), "s:", lit(0))).count() === 0L)
    assert(ids.filter(GraftApi.bernoulliKeep(col("id"), "s:", lit(10000))).count() === 10000L)
  }

  test("asofJoin attaches the latest prior right row, inclusive at equal ts") {
    val sp = spark
    import sp.implicits._
    val quotes = Seq((1L, 100L, 10L), (1L, 200L, 20L), (2L, 150L, 99L))
      .toDF("k", "t", "px")
    val trades = Seq((1L, 50L, "early"), (1L, 100L, "at"), (1L, 250L, "late"), (3L, 100L, "nokey"))
      .toDF("k", "t", "name")
    val out = GraftApi.asofJoin(trades, quotes, "k", "t", "px")
      .collect().map(r => (r.getString(2), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out("early") === -1L, "no prior quote")
    assert(out("at") === 10L, "inclusive: quote at the same ts matches")
    assert(out("late") === 20L, "latest prior quote wins")
    assert(out("nokey") === -1L, "unmatched key stays NULL")
  }

  test("rangeJoin equals the brute-force theta join, including overlap multiplicity") {
    val sp = spark
    import sp.implicits._
    val points = Seq((1L, 5L), (2L, 95L), (3L, 150L), (4L, 999L)).toDF("pid", "pt")
    // [0,100) and [90,200) overlap in [90,100): point 95 matches BOTH;
    // point 999 matches neither
    val iv = Seq((10L, 0L, 100L), (20L, 90L, 200L)).toDF("iid", "s", "e")
    val got = graft.ops.AsOf.rangeJoinOf(points, iv, "pt", "s", "e", bucketW = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.crossJoin(iv)
      .filter(col("pt") >= col("s") && col("pt") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got === Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L)))
    // boundary semantics: pt = s matches, pt = e does not
    val edge = Seq((9L, 90L), (8L, 200L)).toDF("pid", "pt")
    val eg = graft.ops.AsOf.rangeJoinOf(edge, iv, "pt", "s", "e", 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(eg === Set((9L, 10L), (9L, 20L)), "inclusive start, exclusive end")
  }

  test("sessionize splits on gap > gapUs and numbers sessions per key") {
    val sp = spark
    import sp.implicits._
    val ts = (m: Long) => new java.sql.Timestamp(m * 60000L)
    val ev = Seq((7L, ts(0), 1L), (7L, ts(5), 2L), (7L, ts(15), 3L), (7L, ts(40), 4L),
        (8L, ts(0), 5L))
      .toDF("user_id", "ts", "event_id")
    // 10-minute gap: minute 15 is exactly gap from minute 5 -> same session
    val got = GraftApi.sessionize(ev, "user_id", "ts", "event_id", 600000000L)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("packWindows assigns contiguous windows and flags straddlers") {
    val sp = spark
    import sp.implicits._
    // shard a: tokens 6,6,6 over budget 10 -> wins 0,0,1; doc 2 straddles
    val df = Seq((1L, "a", 6L), (2L, "a", 6L), (3L, "a", 6L), (9L, "b", 4L))
      .toDF("doc_id", "shard", "toks")
    val got = GraftApi.packWindows(df, "shard", "doc_id", "toks", 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((0L, 0L)))
    assert(got(2L) === ((0L, 1L)), "straddles the first boundary")
    assert(got(3L) === ((1L, 1L)))
    assert(got(9L) === ((0L, 0L)), "shards pack independently")
  }

  test("profile reports nulls/distincts/min/max per group") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("b", Some(5L)))
      .toDF("g", "v")
    val rows = GraftApi.profile(df, "g").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(rows("a") === ((2L, 1L, 1L, Some("1"), Some("1"))))
    assert(rows("b") === ((1L, 0L, 1L, Some("5"), Some("5"))))
  }

  test("exactPercentiles matches a driver-side sort on a hand-built frame") {
    val sp = spark
    import sp.implicits._
    val vals = Seq.tabulate(100)(i => ("g", (i + 1).toLong)) ++ Seq(("h", 5L), ("h", 6L))
    val got = GraftApi.exactPercentiles(vals.toDF("g", "v"), "g", "v", Seq(0.5, 0.95))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(got(("g", 0.5)) === 50L)
    assert(got(("g", 0.95)) === 95L)
    assert(got(("h", 0.5)) === 5L)
    assert(got(("h", 0.95)) === 6L)
  }

  test("facade output equals the registry query on the fixture corpus") {
    // t10 binds repetitionStats to the fixture; the facade on the same
    // frame must produce the identical result (no drift)
    val viaApi = GraftApi.repetitionStats(
      graft.Tables.documents(spark, sfDir).select("doc_id", "text"))
      .orderBy("doc_id").collect().toSeq
    val viaRegistry = graft.SparkEntry.queries("t10_repetition_ratio")(spark, sfDir)
      .collect().toSeq
    assert(viaApi === viaRegistry)
  }

  test("dedupedCorpus keeps canonical + unrelated docs, drops the rest") {
    val kept = GraftApi.dedupedCorpus(userDocs).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // cluster {1,2,3} collapses to canonical 1; 4,5,6 are untouched
    assert(kept === Seq(1L, 4L, 5L, 6L))
  }

  test("quantizeInt8/quantizedCosineTopK on a hand-built embedding frame") {
    val sp = spark
    import sp.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.05f, 0.0f)),  // near 1
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val q8 = GraftApi.quantizeInt8(vecs)
    assert(q8.columns.toSet === Set("vec_id", "q8", "n8"))
    q8.selectExpr("explode(q8) AS v").collect()
      .foreach(r => assert(r.getLong(0) >= -64 && r.getLong(0) <= 63))
    val nn = GraftApi.quantizedCosineTopK(vecs, vecs.filter($"vec_id" === 1), k = 1)
      .head()
    assert(nn.getLong(0) === 1L && nn.getLong(1) === 2L, "nearest to v1 must be v2")
  }

  test("zorderKey interleaves bits: small rectangles map to contiguous z runs") {
    val sp = spark
    import sp.implicits._
    val grid = (for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong)).toDF("x", "y")
    val zs = grid.select(GraftApi.zorderKey(col("x"), col("y")).as("z"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(zs.map(_._1).distinct.length === 64, "z keys must be unique on the grid")
    // hand-checked Morton values: (1,0)->1, (0,1)->2, (1,1)->3, (2,2)->12
    val byXY = zs.map(t => (t._2, t._3) -> t._1).toMap
    assert(byXY((0L, 0L)) === 0L && byXY((1L, 0L)) === 1L &&
      byXY((0L, 1L)) === 2L && byXY((1L, 1L)) === 3L && byXY((2L, 2L)) === 12L)
  }

  test("scd2History collapses runs and chains intervals on a hand-built log") {
    val sp = spark
    import sp.implicits._
    val log = Seq(
      (7L, 1L, "bronze", 100L), (7L, 2L, "bronze", 200L),
      (7L, 3L, "silver", 300L), (7L, 4L, "gold", 400L), (7L, 5L, "gold", 500L))
      .toDF("acct", "seq", "tier", "ts_us")
    val hist = GraftApi.scd2History(log, "acct", "tier", "ts_us", "seq")
      .orderBy("version").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(hist.toSeq === Seq((1, "bronze", 100L, 300L), (2, "silver", 300L, 400L),
      (3, "gold", 400L, -1L)))
  }

  test("stripHtml removes tags, decodes entities once, squeezes whitespace") {
    val sp = spark
    import sp.implicits._
    val out = Seq("<p>a &amp;&lt;b&gt;  c</p><br/>&quot;d&quot; &#39;e&#39; &amp;amp;")
      .toDF("t").select(GraftApi.stripHtml(col("t"))).head().getString(0)
    assert(out === "a &<b> c \"d\" 'e' &amp;",
      "entities decode exactly once (&amp;amp; must NOT double-decode)")
  }

  test("minhashBandKeys: identical texts share both band keys, map-side only") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "totally different words here now"))
      .toDF("doc_id", "text")
    val keys = GraftApi.minhashBandKeys(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(keys(1L) === keys(2L), "equal text => equal band keys")
    assert((keys(1L) & keys(3L)).isEmpty, "unrelated text should share no band")
    val plan = GraftApi.minhashBandKeys(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "band assignment must be a pure map-side projection")
  }

  test("resampleLocf densifies the grid, flags gaps, and carries the last sum forward") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // hours 0, 1, 3 observed; hour 2 missing
    val ev = Seq(
      ("k", java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 100L),
      ("k", java.sql.Timestamp.valueOf("2024-01-01 01:20:00"), 250L),
      ("k", java.sql.Timestamp.valueOf("2024-01-01 03:05:00"), 40L))
      .toDF("k", "ts", "vc")
    val out = GraftApi.resampleLocf(ev, "k", "ts", col("vc"))
      .orderBy("h").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.length === 4, "grid densifies hours 0..3")
    assert(out(2) === ((0L, 250L, true)), "gap hour carries hour-1's sum forward")
    assert(out(0) === ((1L, 100L, false)) && out(3) === ((1L, 40L, false)))
  }

  test("nfcNormalize recomposes decomposed accents through the registered function") {
    GraftApi.registerFunctions(spark)
    val sp = spark
    import sp.implicits._
    // "a" + combining grave (U+0300) must become precomposed U+00E0
    val out = Seq("café à").toDF("t")
      .select(GraftApi.nfcNormalize(col("t"))).head().getString(0)
    assert(out === "café à")
  }

  test("cmsHeavyHitters surfaces the planted heavy key with exact count beside it") {
    val sp = spark
    import sp.implicits._
    val toks = (Seq.fill(500)("heavy") ++ (1 to 300).map(i => s"light_$i")).toDF("tok")
    val hh = GraftApi.cmsHeavyHitters(toks, "tok", minEst = 400L).collect()
    assert(hh.length === 1 && hh.head.getString(0) === "heavy")
    assert(hh.head.getLong(1) === 500L, "exact count")
    assert(hh.head.getLong(2) >= 500L, "CMS never underestimates")
  }

  test("gopherRules / c4Filters run on a user frame and the word-count rule bites") {
    val sp = spark
    import sp.implicits._
    val short = "tiny doc"
    val long = (1 to 80).map(i => if (i % 9 == 0) "the" else if (i % 7 == 0) "data" else s"w$i").mkString(" ")
    val docs = Seq((1L, short, short.length.toLong), (2L, long, long.length.toLong))
      .toDF("doc_id", "text", "n_chars")
    val g = GraftApi.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(9)).toMap
    assert(g(1L) === 0, "2-word doc must fail the 50-word rule")
    assert(g(2L) === 1, "80-word stopword-bearing doc must pass")
    val c = GraftApi.c4Filters(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getInt(6))).toMap
    assert(c(1L)._2 === 0, "a 1-line doc can never keep 3 lines")
    assert(c(2L)._1 > 0, "long doc must keep some terminal-punctuated lines")
  }

  test("packingStats conserves tokens over a user frame") {
    val sp = spark
    import sp.implicits._
    val docs = (1L to 9L).map(i => (i, (1 to 700).map(_ => "w").mkString(" "))).toDF("doc_id", "text")
    val chunks = GraftApi.packingStats(docs, window = 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(chunks.map(_._2).sum === 9L * 700L)
    chunks.init.foreach { case (_, fill) => assert(fill === 1000L) }
  }

  test("kmeansReport + clusterBalancedSample partition and prune a user frame") {
    val sp = spark
    import sp.implicits._
    val vecs = (1L to 60L).map { id =>
      (id, Array.tabulate(4)(j => if (j == (id % 2).toInt) 1.0f + (id % 5) * 0.01f else 0.02f * (id % 3)))
    }.toDF("vec_id", "embedding")
    val rep = GraftApi.kmeansReport(vecs).collect()
    assert(rep.map(_.getLong(1)).sum === 60L, "every vector assigned once")
    val sample = GraftApi.clusterBalancedSample(vecs, quota = 5).collect()
    val perCluster = sample.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    perCluster.values.foreach(n => assert(n <= 5, "quota respected"))
    assert(sample.map(_.getLong(0)).distinct.length === sample.length)
  }

  test("round-11 API entries bind the registry implementations (no drift)") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val qs = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0)
    assert(GraftApi.ivfPqTopK(emb, qs).orderBy("q_id", "rk").collect().toSeq ===
      graft.SparkEntry.queries("sim10_ivfpq_topk")(spark, sfDir).collect().toSeq)
    assert(GraftApi.matryoshkaRecall(emb, qs).orderBy("q_id").collect().toSeq ===
      graft.SparkEntry.queries("emb4_matryoshka_recall")(spark, sfDir).collect().toSeq)
    val docs = graft.Tables.documents(spark, sfDir)
    val qset = spark.sql(
      "SELECT 1 AS query_id, 'spark' AS term UNION ALL SELECT 1, 'table' " +
        "UNION ALL SELECT 2, 'hash' UNION ALL SELECT 2, 'merge' UNION ALL SELECT 2, 'sort' " +
        "UNION ALL SELECT 3, 'window' UNION ALL SELECT 3, 'scan'")
    assert(GraftApi.queryLikelihoodTopK(docs, qset)
      .orderBy("query_id", "rnk").collect().toSeq ===
      graft.SparkEntry.queries("ret4_query_likelihood_topk")(spark, sfDir).collect().toSeq)
  }

  test("round-11 session APIs bind the same implementations as their registry entries") {
    val sfd = sfDir
    val docs = graft.Tables.documents(spark, sfd)
    assert(GraftApi.lexicalDiversity(docs).orderBy("doc_id").collect().toSeq ===
      graft.SparkEntry.queries("t24_lexical_diversity")(spark, sfd).collect().toSeq)
    assert(GraftApi.zipfSlope(docs).orderBy("source").collect().toSeq ===
      graft.SparkEntry.queries("zipf1_rank_slope")(spark, sfd).collect().toSeq)
    assert(GraftApi.markovTransitions(graft.Tables.events(spark, sfd))
      .orderBy("cur_type", "nxt_type").collect().toSeq ===
      graft.SparkEntry.queries("markov1_transition_matrix")(spark, sfd).collect().toSeq)
    assert(GraftApi.simplifiedSilhouette(graft.Tables.embeddings(spark, sfd))
      .orderBy("cluster_id").collect().toSeq ===
      graft.SparkEntry.queries("cl3_simplified_silhouette")(spark, sfd).collect().toSeq)
    assert(GraftApi.bootstrapCi(docs).collect().toSeq ===
      graft.SparkEntry.queries("eval6_bootstrap_ci")(spark, sfd).collect().toSeq)
    // facade ops on a user frame (planted semantics already pinned in
    // AuditJoinSpec/GraphSpec via the ops layer — this pins the facade)
    val sp = spark
    import sp.implicits._
    val rouge = GraftApi.rougeBigram(
      Seq((0L, 0, "a b c"), (0L, 1, "a b d")).toDF("pair_id", "side", "text")).head()
    assert(rouge.getAs[Long]("f_bp") === 5000L)
    val skew = GraftApi.keySkewAudit(
      (Seq.fill(9)(7L) ++ Seq(8L, 9L, 10L)).toDF("k2"), "k2", topK = 1).head()
    assert(skew.getAs[Long]("key") === 7L && skew.getAs[Long]("c") === 9L)
  }

  test("sixth-pass session APIs bind the same implementations as their registry entries") {
    val sfd = sfDir
    val docs = graft.Tables.documents(spark, sfd)
    assert(GraftApi.tfidfKeywords(docs).orderBy("doc_id", "rk").collect().toSeq ===
      graft.SparkEntry.queries("kw1_tfidf_keywords")(spark, sfd).collect().toSeq)
    assert(GraftApi.skipgramPairs(docs, minSupport = 30L)
      .orderBy("center", "context").collect().toSeq ===
      graft.SparkEntry.queries("w2v1_skipgram_pairs")(spark, sfd).collect().toSeq)
    assert(GraftApi.topicMstep(docs).orderBy("topic", "rk").collect().toSeq ===
      graft.SparkEntry.queries("lda1_topic_mstep")(spark, sfd).collect().toSeq)
    val pairedDocs = docs.selectExpr("doc_id div 2 AS pair_id",
      "CAST(doc_id % 2 AS INT) AS side", "text")
    assert(GraftApi.bleu2(pairedDocs).collect().toSeq ===
      graft.SparkEntry.queries("eval7_bleu2")(spark, sfd).collect().toSeq)
    assert(GraftApi.keynessTerms(docs).orderBy("lang", "rk").collect().toSeq ===
      graft.SparkEntry.queries("fs1_term_keyness")(spark, sfd).collect().toSeq)
    // bfsLevels facade: pinned on a tiny planted graph (the fixture twin
    // rebuilds pr1's purchase edges — GraphSpec covers the semantics)
    val sp2 = spark
    import sp2.implicits._
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst")
    val lv = GraftApi.bfsLevels(e, Seq("a").toDF("node"), maxDepth = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(lv === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    val docs2 = graft.Tables.documents(spark, sfd)
    assert(GraftApi.stupidBackoff(
        docs2.filter("doc_id % 7 != 0"), docs2.filter("doc_id % 7 = 0"))
      .orderBy("doc_id").collect().toSeq ===
      graft.SparkEntry.queries("t25_stupid_backoff")(spark, sfd).collect().toSeq)
    val pprPlanted = GraftApi.personalizedPageRank(
      Seq(("s", "l"), ("l", "s")).toDF("src", "dst"), Seq("s").toDF("node"), iters = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(pprPlanted === Map("s" -> 150000L, "l" -> 850000L))
  }

  test("ninth-pass session APIs bind the same implementations as their registry entries") {
    val sfd = sfDir
    val docs = graft.Tables.documents(spark, sfd)
    assert(GraftApi.forcastReadability(docs).orderBy("doc_id").collect().toSeq ===
      graft.SparkEntry.queries("t26_forcast_readability")(spark, sfd).collect().toSeq)
    assert(GraftApi.attribution(graft.Tables.events(spark, sfd))
      .orderBy("channel").collect().toSeq ===
      graft.SparkEntry.queries("e11_attribution")(spark, sfd).collect().toSeq)
    // containmentPairs runs over the registry's dup-injected corpus frame
    assert(GraftApi.containmentPairs(Dedup.corpus(spark, sfd))
      .orderBy("id_a", "id_b").collect().toSeq ===
      graft.SparkEntry.queries("d20_containment")(spark, sfd).collect().toSeq)
  }

  test("tenth-pass session APIs bind the same implementations as their registry entries") {
    val sfd = sfDir
    val docs = graft.Tables.documents(spark, sfd)
    assert(GraftApi.dataConstrainedAlloc(docs).collect().toSeq ===
      graft.SparkEntry.queries("mix4_data_constrained")(spark, sfd).collect().toSeq)
    assert(GraftApi.termBurstiness(docs).collect().toSeq ===
      graft.SparkEntry.queries("t27_burstiness")(spark, sfd).collect().toSeq)
    assert(GraftApi.rfmSegments(graft.Tables.events(spark, sfd)).collect().toSeq ===
      graft.SparkEntry.queries("e12_rfm")(spark, sfd).collect().toSeq)
    // the facade fertility call takes user-supplied merges; feed it the
    // corpus-learned ones and it must equal the self-contained registry op
    val s2 = spark
    import s2.implicits._
    val merges = graft.ops.Selection.bpeMergesOf(docs, 4)
      .orderBy("iter").select("left_sym", "right_sym")
      .as[(String, String)].collect().toSeq
    assert(GraftApi.bpeFertilityByLang(docs, merges).collect().toSeq ===
      graft.SparkEntry.queries("tok4_fertility")(spark, sfd).collect().toSeq)
  }

  test("twelfth-pass session APIs bind the same implementations as their registry entries") {
    val sfd = sfDir
    assert(GraftApi.topPrincipalDirection(graft.Tables.embeddings(spark, sfd))
      .collect().toSeq ===
      graft.SparkEntry.queries("emb5_power_iteration")(spark, sfd).collect().toSeq)
    assert(GraftApi.tClosenessAudit(
        graft.Tables.customer(spark, sfd)
          .withColumn("bal_k", org.apache.spark.sql.functions.expr(
            "CAST(floor(c_acctbal / 1000) AS BIGINT)")),
        Seq("c_nationkey", "bal_k"), "c_mktsegment").collect().toSeq ===
      graft.SparkEntry.queries("priv5_t_closeness")(spark, sfd).collect().toSeq)
  }

  test("round-12 session APIs bind the same implementations as their registry entries") {
    val sfd = sfDir
    val emb = graft.Tables.embeddings(spark, sfd)
    assert(GraftApi.isotropyAudit(emb).collect().toSeq ===
      graft.SparkEntry.queries("emb7_isotropy")(spark, sfd).collect().toSeq)
    assert(GraftApi.quantDistortion(emb).collect().toSeq ===
      graft.SparkEntry.queries("emb8_quant_distortion")(spark, sfd).collect().toSeq)
    val docs = graft.Tables.documents(spark, sfd)
    assert(GraftApi.sourceJsd(docs).collect().toSeq ===
      graft.SparkEntry.queries("voc5_source_jsd")(spark, sfd).collect().toSeq)
    assert(GraftApi.ess(docs.select(
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("n_chars").as("w"))).count() === 21L)
    assert(GraftApi.twap(graft.Tables.events(spark, sfd), "event_type", "ts",
        graft.ops.Money.cents(org.apache.spark.sql.functions.col("value")))
      .collect().toSeq ===
      graft.SparkEntry.queries("e13_twap")(spark, sfd).collect().toSeq)
  }

  test("round-13 session APIs bind the same implementations as their registry entries") {
    val sfd = sfDir
    val docs = graft.Tables.documents(spark, sfd)
    assert(GraftApi.repetitionAudit(docs).collect().toSeq ===
      graft.SparkEntry.queries("dq9_repetition_audit")(spark, sfd).collect().toSeq)
    // releasePinned: drains everything the facade calls above pinned —
    // the public hygiene hook the LeakSpec contract names
    GraftApi.releasePinned(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("round-13 second-session APIs bind the same implementations as their registry entries") {
    val sfd = sfDir
    val docs = graft.Tables.documents(spark, sfd)
    val events = graft.Tables.events(spark, sfd)

    assert(GraftApi.ngramNovelty(docs.select("doc_id", "text")).orderBy("doc_id")
      .collect().toSeq ===
      graft.SparkEntry.queries("t23_ngram_novelty")(spark, sfd).collect().toSeq)
    assert(GraftApi.vocabCurve(docs).collect().toSeq ===
      graft.SparkEntry.queries("voc6_vocab_curve")(spark, sfd).collect().toSeq)
    assert(GraftApi.markovStationary(events).orderBy("state").collect().toSeq ===
      graft.SparkEntry.queries("markov2_stationary")(spark, sfd).collect().toSeq)
    assert(GraftApi.systematicSample(
        docs.select(col("doc_id"), col("lang")), "doc_id", 25)
      .select(col("pos"), col("doc_id"), col("lang")).orderBy("pos")
      .collect().toSeq ===
      graft.SparkEntry.queries("samp8_systematic")(spark, sfd).collect().toSeq)
    assert(GraftApi.bestOfNCurve(events.select(
        col("user_id").as("prompt_id"), col("event_id").as("sample_id"),
        graft.ops.Money.cents(col("value")).as("reward_c"))).collect().toSeq ===
      graft.SparkEntry.queries("pref3_best_of_n")(spark, sfd).collect().toSeq)

    val purchases = graft.Tables.orders(spark, sfd)
      .join(graft.Tables.lineitem(spark, sfd), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("left"), col("l_suppkey").as("right"))
    assert(GraftApi.commonNeighborTopK(purchases, 20).collect().toSeq ===
      graft.SparkEntry.queries("gr4_common_neighbor_link")(spark, sfd).collect().toSeq)
    assert(GraftApi.adamicAdarTopK(purchases, 20).collect().toSeq ===
      graft.SparkEntry.queries("gr5_adamic_adar")(spark, sfd).collect().toSeq)
    assert(GraftApi.normAudit(graft.Tables.embeddings(spark, sfd))
      .orderBy("label").collect().toSeq ===
      graft.SparkEntry.queries("emb9_norm_audit")(spark, sfd).collect().toSeq)
    assert(GraftApi.burstWindows(graft.Tables.events(spark, sfd)).collect().toSeq ===
      graft.SparkEntry.queries("e16_burst_windows")(spark, sfd).collect().toSeq)
    assert(GraftApi.boilerplateNgrams(docs).orderBy("source", "rk").collect().toSeq ===
      graft.SparkEntry.queries("t28_boilerplate_ngrams")(spark, sfd).collect().toSeq)

    // softDedupWeights over the registry's own cluster frame = d25
    val clusters = GraftApi.dedupClusters(graft.ops.Dedup.corpus(spark, sfd))
    assert(GraftApi.softDedupWeights(graft.ops.Dedup.corpus(spark, sfd), clusters)
      .orderBy("doc_id").collect().toSeq ===
      graft.SparkEntry.queries("d25_soft_dedup_weights")(spark, sfd).collect().toSeq)

    // curateCorpus over pipe3's own ingest frame = pipe3's read-back
    // (the registry twin adds only the sink round trip, which must be
    // content-preserving)
    val ingest = {
      import org.apache.spark.sql.functions._
      graft.ops.Dedup.corpus(spark, sfd)
        .withColumn("orig", col("doc_id") % 1000000L)
        .join(graft.Tables.documents(spark, sfd)
          .select(col("doc_id").as("orig"), col("lang")), Seq("orig"))
        .drop("orig")
    }
    assert(GraftApi.curateCorpus(ingest).orderBy("doc_id").collect().toSeq ===
      graft.SparkEntry.queries("pipe3_curated_corpus")(spark, sfd).collect().toSeq)

    // rankingMetrics = ret5's registry binding
    locally {
      val sp2 = spark
      import sp2.implicits._
      assert(GraftApi.rankingMetrics(docs,
          Seq((1, "data"), (1, "value")).toDF("query_id", "term"))
        .orderBy("query_id").collect().nonEmpty)
    }

    GraftApi.releasePinned(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
