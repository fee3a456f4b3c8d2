package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ScaleOps semantics + the plan/row-count properties that make each one a
  * scale-path operator rather than a rewrite of a plain query. */
class ScaleOpsSpec extends SparkSpec {

  test("bf1 equals the plain join and the bloom probe actually prunes") {
    graft.functions.GraftFunctions.register(spark)
    val got = ScaleOps.bf1(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val dim = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = graft.Tables.lineitem(spark, sfDir)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === plain, "bloom false positives must be removed by the exact join")

    // the reduction property: rows passing the map-side probe must cover
    // every true match (no false negatives) yet prune a real fraction of
    // the fact table (false-positive rate bounded by the sketch sizing)
    val factN = graft.Tables.lineitem(spark, sfDir).count()
    val trueN = graft.Tables.lineitem(spark, sfDir)
      .join(dim, col("l_orderkey") === col("o_orderkey")).count()
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("g_bf1_orders")
    graft.Tables.lineitem(spark, sfDir).createOrReplaceTempView("g_bf1_lineitem")
    val passedN = spark.sql("""
      SELECT count(*) FROM g_bf1_lineitem
      WHERE graft_might_contain(
        (SELECT graft_bloom_agg(xxhash64(o_orderkey), 100000L, 800000L)
         FROM g_bf1_orders WHERE o_orderpriority = '1-URGENT'),
        xxhash64(l_orderkey))""").head().getLong(0)
    assert(passedN >= trueN, "bloom filters must have no false negatives")
    assert(passedN < factN, "the probe must prune part of the fact scan")
  }

  test("pack1 windows are contiguous and conserve every token per shard") {
    val rows = ScaleOps.pack1(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables.documents(spark, sfDir)
      .groupBy("lang").agg(sum(size(split(col("text"), " ")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the last START window is where the final doc BEGINS (total tokens
    // minus the last doc's own), not where the stream ends — the final doc
    // may straddle into later windows that then contain no starts
    val lastDocStart = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lang").orderBy(col("doc_id").desc)
      graft.Tables.documents(spark, sfDir)
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .collect().map(r => r.getString(0) -> (docs(r.getString(0)) - r.getLong(2))).toMap
    }
    rows.groupBy(_._1).foreach { case (lang, ws) =>
      val wins = ws.map(_._2).sorted
      assert(wins.head === 0L, s"$lang: first window must be 0")
      assert(wins.last === lastDocStart(lang) / 512,
        s"$lang: last start-window must be where the final doc begins")
      assert(ws.map(_._4).sum === docs(lang),
        s"$lang: packed token counts must conserve the shard total")
    }
  }

  test("samp1 split partitions every document exactly once per stratum") {
    val rows = ScaleOps.samp1(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val perLang = graft.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (lang, ss) =>
      assert(ss.map(_._3).sum === perLang(lang),
        s"$lang: train+eval must partition the stratum")
      assert(ss.map(_._2).toSet.subsetOf(Set("train", "eval")))
    }
  }

  test("merge1 upsert: updates win, inserts append, untouched rows survive") {
    import graft.Tables
    val base = Tables.orders(spark, sfDir)
    val nBase = base.count()
    val nInserts = base.filter(col("o_orderkey") % 100 === 0).count()
    val got = ScaleOps.merge1(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // cardinality: every base row exactly once + the inserted keys
    assert(got.values.map(_._1).sum === nBase + nInserts)
    // every %10 key carries the update marker, every insert its own
    assert(got("MERGED")._1 === base.filter(col("o_orderkey") % 10 === 0).count())
    assert(got("INSERTED")._1 === nInserts)
  }

  test("s12 compaction reduces the file count and preserves content") {
    val result = ScaleOps.s12(spark, sfDir)
    val rows = result.collect()
    // content preserved (same agg as source)
    val src = graft.Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet === src)
    // the compacted read plan touches far fewer files than the 64 written
    val scanned = result.queryExecution.executedPlan.toString
    val m = "numFiles=(\\d+)".r.findFirstMatchIn(scanned)
    m.foreach(g => assert(g.group(1).toInt < 64, s"compaction must reduce files: $scanned"))
  }

  test("s10 read-back scan prunes to the lang=en partition directory") {
    val df = ScaleOps.s10(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      "the lang filter must resolve against the directory layout\n" + p.take(800))
    assert(!p.contains("PushedFilters: [IsNotNull(lang)"),
      "lang must be a partition column, not a data column")
  }

  test("b1 bucketed join runs with NO exchange and NO sort below the join") {
    // AQE wraps stages in opaque leaf nodes, so assert on the static plan —
    // the bucket-alignment property is decided at planning time anyway
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = ScaleOps.b1(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val smj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "bucketed join must plan as SortMergeJoin\n" + plan.toString.take(600))
      val belowJoin = smj.head.children.flatMap(_.collect { case n => n })
      assert(!belowJoin.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
        "bucket-aligned sides must join WITHOUT an exchange\n" + plan.toString.take(800))
      assert(plan.toString.contains("SelectedBucketsCount"),
        "scan must report bucketed layout\n" + plan.toString.take(800))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("shuf1 is a permutation: every doc exactly once, positions 1..N, rerun-stable") {
    val rows = ScaleOps.shuf1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong === n)
    assert(rows.map(_._1).toSeq === (1L to n).toSeq, "positions must be dense 1..N")
    assert(rows.map(_._2).distinct.length.toLong === n, "each doc appears exactly once")
    assert(rows.map(_._2).toSeq !== (0L until n).toSeq, "order must not be the identity")
    val again = ScaleOps.shuf1(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === again.toSeq, "the shuffle must be bit-identical across reruns")
  }

  test("samp2 keep rates land near the per-source targets") {
    // thresholds c0/80/40/20 = 75% / 50% / 25% / 12.5% expected keeps
    val target = Map("src0" -> 0.75, "src1" -> 0.50, "src2" -> 0.25)
    ScaleOps.samp2(spark, sfDir).collect().foreach { r =>
      val (src, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      val want = target.getOrElse(src, 0.125)
      val got = kept.toDouble / total
      // binomial 4-sigma band: sf0.001 strata hold only ~25 docs each
      val tol = math.max(0.02, 4.0 * math.sqrt(want * (1 - want) / total))
      assert(math.abs(got - want) < tol,
        s"$src keep rate $got too far from $want (n=$total, tol=$tol)")
    }
  }

  test("zo1 buckets partition all lineitems into z-contiguous rectangles") {
    val rows = ScaleOps.zo1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val total = graft.Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_._2).sum === total, "buckets must partition every row")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 31))
    // z-order locality: each bucket's partkey rectangle must be a strict
    // subset of the global range (a random bucketing would span ~all of it)
    val (gMin, gMax) = (rows.map(_._3).min, rows.map(_._4).max)
    val tight = rows.count(r => (r._4 - r._3) < (gMax - gMin))
    assert(tight >= rows.length / 2,
      s"at least half the buckets must have a sub-global partkey range ($tight/${rows.length})")
  }

  test("scd1 intervals chain per user: contiguous versions, valid_to = next valid_from") {
    val rows = ScaleOps.scd1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val byV = vs.sortBy(_._2)
      assert(byV.map(_._2).toSeq === (1 to byV.length), s"user $u versions must be contiguous")
      byV.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $u: valid_to must equal next valid_from")
          assert(a._3 !== b._3, s"user $u: consecutive versions must differ in type")
        case _ =>
      }
      assert(byV.last._5.isEmpty, s"user $u: current version must be open-ended")
    }
  }

  test("apx5 sketch estimates land within 5% of exact, global = union of parts") {
    // round-11 gate form: (event_type, exact_nd, within_5pct) — the flag
    // IS the bound (raw estimates are engine-defined, out of the hash)
    val rows = ScaleOps.apx5(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.map(_._1).contains("ALL"), "the union-of-sketches row must be present")
    rows.foreach { case (et, exact, ok) =>
      assert(exact > 0L, s"$et: exact distinct must be positive")
      assert(ok === 1, s"$et: sketch estimate strays >5% from exact $exact")
    }
  }

  test("s15 zstd writes strictly fewer bytes than snappy for the same rows") {
    val (zstd, snappy) = ScaleOps.codecBytes(spark, sfDir)
    assert(zstd > 0 && snappy > 0)
    assert(zstd < snappy, s"zstd=$zstd must beat snappy=$snappy on this projection")
  }

  test("dpp1 fact scan carries a dynamic-pruning partition filter") {
    val df = ScaleOps.dpp1(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"the fact scan must be pruned by the dim-side runtime filter:\n${p.take(1200)}")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("1-URGENT", "2-HIGH"))
  }

  test("bin1 binaryFile content bytes round-trip the fixture strings") {
    val rows = ScaleOps.bin1(spark, sfDir).collect()
    val names = graft.Tables.region(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows.length === names.size)
    rows.foreach { r =>
      assert(r.getLong(1) === names(r.getInt(0)).length.toLong, "byte length = string length")
    }
  }

  test("stat1: all six correlations agree with Spark's own df.stat.corr to 1e-4") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val ours = ScaleOps.stat1(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2) / 1e6).toMap
    assert(ours.size === 6, "4 measures => C(4,2) = 6 pairs")
    // micro-unit column behind each stat1 name, for df.stat.corr parity
    // (corr is scale-invariant, so cents/bp scaling cannot shift it)
    val sourceCol = Map(
      "qty_c" -> "l_quantity", "price_c" -> "l_extendedprice",
      "disc_e4" -> "l_discount", "tax_e4" -> "l_tax")
    ours.foreach { case ((a, b), got) =>
      val ref = li.stat.corr(sourceCol(a), sourceCol(b))
      assert(math.abs(got - ref) < 1e-4,
        s"($a,$b): exact-sum corr $got vs Spark double-sum $ref")
      assert(got >= -1.0 && got <= 1.0)
    }
  }

  test("stat1 zero-variance guard: constant column yields NULL, not a crash") {
    // same correlation arithmetic as stat1, on a frame with one constant
    // column — the nullif(denominator, 0) guard must surface SQL NULL
    val sp = spark
    import sp.implicits._
    Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "konst")
      .createOrReplaceTempView("stat1_zero_var_fixture")
    val r = spark.sql(
      """SELECT CAST(round(
        |  CAST(n * sp - sx * sk AS DOUBLE) /
        |  nullif(sqrt(CAST(n * ssx - sx * sx AS DOUBLE)) *
        |         sqrt(CAST(n * ssk - sk * sk AS DOUBLE)), 0D) * 1000000) AS BIGINT) AS corr_e6
        |FROM (SELECT CAST(count(*) AS DECIMAL(20,0)) AS n,
        |             sum(x) AS sx, sum(konst) AS sk,
        |             sum(x*x) AS ssx, sum(konst*konst) AS ssk,
        |             sum(x*konst) AS sp
        |      FROM stat1_zero_var_fixture)""".stripMargin).head()
    assert(r.isNullAt(0), "zero-variance pair must be NULL")
  }

  test("samp3 groupSample: k per group, rerun-stable, plan uses the custom top-k operator") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "g")
    val s1 = graft.api.GraftApi.groupSample(df, "g", "id", 5)
    assert(s1.queryExecution.executedPlan.toString.contains("TopKFinal"),
      "sampling must run through the custom partial/final operator")
    val r1 = s1.collect().map(r => (r.getString(1), r.getLong(0)))
    assert(r1.groupBy(_._1).forall(_._2.length == 5), "exactly k per group")
    val r2 = graft.api.GraftApi.groupSample(df, "g", "id", 5)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(r1.toSet == r2.toSet, "same salt + ids => same sample")
    val r3 = graft.api.GraftApi.groupSample(df, "g", "id", 5, ":other")
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(r1.toSet != r3.toSet, "different salt => different sample (w.h.p.)")
  }

  test("dq1 expectations count planted null/range/domain violations exactly") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "A"), (2L, -3.0, "A"), (null, 5.0, "N"),
      (4L, 200.0, "X"), (5L, 7.5, null))
      .toDF("id", "qty", "flag")
    val rep = graft.api.GraftApi.expectations(df, Seq(
      "id_not_null" -> col("id").isNull,
      "qty_in_0_100" -> (col("qty").isNull || col("qty") < 0.0 || col("qty") > 100.0),
      "flag_domain" -> (col("flag").isNull || !col("flag").isin("A", "N"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep("id_not_null") === (5L, 1L))
    assert(rep("qty_in_0_100") === (5L, 2L))
    assert(rep("flag_domain") === (5L, 2L))
  }

  test("dq1 registry report is one aggregate scan plus the anti-join row") {
    val rows = ScaleOps.dq1(spark, sfDir).collect()
    assert(rows.length === 7)
    val byName = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byName("c1_orderkey_not_null") === 0L)
    assert(byName("c7_orderkey_in_orders") === 0L, "fixture is referentially consistent")
    assert(byName("c6_price_under_60000") > 0L, "the tight price expectation must find violations")
  }

  test("mix1 temperature mix: rates and kept counts match a pure-JVM recomputation") {
    // Planted skew: one big source (400 docs), one mid (100), one small (25).
    // τ=0.5 mixing must DOWN-weight the big source (rate_bp < 5000-ish share)
    // and UP-weight the small one, and every emitted number must equal an
    // independent recomputation done with plain JVM integer math + MessageDigest
    // — no Spark expressions on the oracle side of the assert.
    import spark.implicits._
    val docs = (0 until 400).map(i => (i.toLong, "big", 100L + i)) ++
      (1000 until 1100).map(i => (i.toLong, "mid", 50L + i)) ++
      (2000 until 2025).map(i => (i.toLong, "small", 10L + i))
    val dir = java.nio.file.Files.createTempDirectory("graft_mix1").toString
    docs.toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // Independent model of the op: w_s = floor(sqrt(n_s*1e6)),
    // rate_bp = min(10000, 10000*(N div 2)*w_s div (w_total*n_s)),
    // keep = (first-4-hex of md5("mix1:"+id) as int) % 10000 < rate_bp.
    val bySrc = docs.groupBy(_._2)
    val nS = bySrc.map { case (s, ds) => s -> ds.size.toLong }
    val wS = nS.map { case (s, n) => s -> math.floor(math.sqrt(n.toDouble * 1000000L)).toLong }
    val nTotal = nS.values.sum
    val wTotal = wS.values.sum
    val rateBp = nS.map { case (s, n) =>
      s -> math.min(10000L, 10000L * (nTotal / 2) * wS(s) / (wTotal * n))
    }
    def md5KeepDraw(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix1:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(2).map(b => f"$b%02x").mkString, 16) % 10000L
    }
    val expected = bySrc.map { case (s, ds) =>
      val kept = ds.filter { case (id, _, _) => md5KeepDraw(id) < rateBp(s) }
      s -> (nS(s), rateBp(s), kept.size.toLong, kept.map(_._3).sum)
    }

    val got = ScaleOps.mix1(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === expected)
    // Temperature direction: small sources sample at a strictly higher rate.
    assert(got("small")._2 > got("mid")._2 && got("mid")._2 > got("big")._2)
    // Big source is genuinely down-sampled, small one kept (near-)fully.
    assert(got("big")._3 < 400L && got("small")._2 === 10000L)
  }

  test("mix2 DoReMi reweighting matches a full pure-JVM recomputation on the fixture") {
    // Independent model: add-1-smoothed unigram NLL per doc (t15's exact
    // integer scheme recomputed with plain JVM math), per-source integer
    // means, excess vs the doc-weighted global mean, exp rounded to e6,
    // then integer basis-point weights. Every emitted number must match.
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val toks = docs.map { case (id, t, s) =>
      (id, s, t.split(" ").filter(_.nonEmpty).toSeq) }
    val vocab = toks.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = vocab.values.sum
    val vSize = vocab.size.toLong
    val tokNll: Map[String, Long] = vocab.map { case (w, c) =>
      w -> math.round(math.log((nTotal + vSize).toDouble / (c + 1).toDouble) * 1e6)
    }
    val docNll = toks.map { case (id, s, ws) =>
      (id, s, ws.map(tokNll).sum / ws.length) }
    val bySrc = docNll.groupBy(_._2).map { case (s, ds) =>
      s -> (ds.size.toLong, ds.map(_._3).sum) }
    val gSum = bySrc.values.map(_._2).sum
    val gN = bySrc.values.map(_._1).sum
    val scored = bySrc.map { case (s, (n, sumNll)) =>
      val mean = sumNll / n
      val excess = math.max(0L, mean - gSum / gN)
      // mirror ScaleOps.expE6Horner: 12-term integer Horner fixed-point
      // exp (NOT math.exp — the engine dropped the raw-double form)
      val e = math.min(excess, 30000000L)
      val expE6 = (12 to 1 by -1).foldLeft(1000000L) { (acc, k) =>
        1000000L + e * acc / (10000000L * k)
      }
      s -> (n, mean, excess, expE6, n * expE6)
    }
    val tScore = scored.values.map(_._5).sum
    val expected = scored.map { case (s, (n, mean, excess, expE6, score)) =>
      s -> ((n, mean, excess, expE6, score * 10000 / tScore)) }
    val got = ScaleOps.mix2(spark, sfDir).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
    // the rule must be live: at least one domain strictly above baseline
    assert(got.values.exists(_._3 > 0L), "no domain has positive excess — signal dead")
    // weights are a (floor-divided) distribution over basis points
    val wSum = got.values.map(_._5).sum
    assert(wSum > 9900L && wSum <= 10000L, s"weight_bp sum $wSum out of band")
  }

  test("apx4 CMS estimates bound exact counts: est >= exact, est <= exact + eps*N") {
    // round-11 gate form: (tok, exact_cnt, within_eps) over the provable
    // subset (exact >= threshold — CMS can never miss those); the raw
    // estimate bound itself is re-checked here through the helper
    val rows = ScaleOps.apx4(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (tok, exact, ok) =>
      assert(exact >= 400L, s"$tok: gate rows are the exact-threshold subset")
      assert(ok === 1, s"$tok: CMS estimate outside [exact, exact + eps*N]")
    }
    val toks = graft.Tables.documents(spark, sfDir)
      .selectExpr("explode(split(text, ' ')) AS tok").filter("length(tok) > 0")
    val n = toks.count()
    val est = ScaleOps.cmsHeavyHittersOf(toks, "tok", 0.001, 0.99, 42, 400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    est.foreach { case (tok, exact, e) =>
      assert(e >= exact, s"CMS must never underestimate ($tok: $e < $exact)")
      assert(e <= exact + (0.001 * n).toLong + 1,
        s"CMS overestimate beyond eps*N bound ($tok: $e vs $exact, N=$n)")
    }
  }

  test("apx6 KMV estimate lands within the k=256 error band on every group") {
    // σ/D for KMV at k=256 is ~1/√(k−2) ≈ 6.3%; 4σ ≈ 2520 bp. A fixture
    // group failing this bound means the hash/order-statistics math broke,
    // not bad luck.
    val rows = ScaleOps.apx6(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, exact, est, errBp) =
        (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5))
      assert(errBp == math.abs(est - exact) * 10000 / exact)
      assert(errBp <= 2520, s"$lang: est $est vs exact $exact (err $errBp bp)")
    }
  }

  test("apx6 KMV sketches are mergeable: re-cut of unioned sketches = direct sketch") {
    import spark.implicits._
    // split the same value stream into two halves, sketch each, merge by
    // taking the k smallest of the concatenation — must equal the sketch
    // built over the whole stream in one pass (the per-shard deployment).
    val toks = graft.Tables.documents(spark, sfDir)
      .select(col("lang").as("grp"), explode(split(col("text"), " ")).as("v"))
      .filter(length(col("v")) > 0)
    val k = 64
    val whole = ScaleOps.kmvSketchOf(toks, k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val halfA = ScaleOps.kmvSketchOf(toks.filter(crc32(col("v")) % 2 === 0), k)
    val halfB = ScaleOps.kmvSketchOf(toks.filter(crc32(col("v")) % 2 === 1), k)
    val mergedRaw = halfA.union(halfB).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp").orderBy("h")
    val merged = mergedRaw.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select("grp", "h")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged === whole, "union sketch must equal the one-pass sketch")
  }

  test("zo2 Hilbert index matches a scalar JVM xy2d and beats z-order locality") {
    import spark.implicits._
    // scalar reference: the classic iterative xy2d on the 2^16 grid
    def xy2d(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0 & 65535L, y0 & 65535L, 0L)
      var s = 32768L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val pairs = Seq((0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L), (7L, 3L),
      (123L, 456L), (65535L, 65535L), (40000L, 1L), (2L, 60000L))
    val got = ScaleOps.hilbert16(pairs.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === xy2d(x, y), s"hilbert($x, $y)")
    }
    // the 2x2 base visit order of this (x-first) orientation:
    // (0,0) -> (1,0) -> (1,1) -> (0,1) — a single unit step each time
    assert(Seq((0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L))
      .map(p => got(p)) === Seq(0L, 1L, 2L, 3L))
    // locality: Hilbert buckets must not be WORSE than z-order's on the
    // summed per-bucket rectangle semi-perimeter (file-skipping proxy)
    def semiPerim(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.map(r => (r.getLong(3) - r.getLong(2)) + (r.getLong(5) - r.getLong(4))).sum
    val zo = semiPerim(ScaleOps.zo1(spark, sfDir).collect())
    val hi = semiPerim(ScaleOps.zo2(spark, sfDir).collect())
    info(s"semi-perimeter sum: zorder=$zo hilbert=$hi")
    assert(hi <= zo, s"Hilbert layout ($hi) must not lose to z-order ($zo)")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val a = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish")).toDF("doc_id", "text")
    val b = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new")).toDF("doc_id", "text")
    val got = ScaleOps.snapshotDiffOf(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("zo3 skipping audit: linear is perfect on its key, blind on the other; curves split the difference") {
    val s2 = spark
    import s2.implicits._
    // dense 64x64 grid: every layout sees identical data
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val rows = graft.api.GraftApi.skippingAudit(grid, "x", "y").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // linear-by-x probing x: each probe touches exactly ONE file
    assert(rows(("linear_x", "x")) === ((3L, 1000L, 312L)))
    // linear-by-x probing y: every file spans all of y -> all 32 touched
    assert(rows(("linear_x", "y")) === ((3L, 32000L, 10000L)))
    // both curves cut the y-probe cost well below the linear layout's 32
    // while staying above the perfect 1
    for (layout <- Seq("zorder", "hilbert")) {
      val (n, avgY, _) = rows((layout, "y"))
      assert(n === 3L)
      assert(avgY < 16000L, s"$layout should prune y probes, got $avgY")
      assert(avgY >= 1000L)
      // and the price paid on x stays far below full scan
      assert(rows((layout, "x"))._2 < 16000L)
    }
  }

  test("samp7 ESS: uniform = n, concentrated collapses, all-zero is NULL") {
    val s2 = spark
    import s2.implicits._
    def ess(rows: Seq[(String, Long)]) =
      graft.api.GraftApi.ess(rows.toDF("source", "w")).collect()
        .map(r => (if (r.isNullAt(0)) "__all__" else r.getString(0)) ->
          (r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // uniform weights: ESS = n exactly, share = 10000 bp
    val u = ess(Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 5L)))
    assert(u("a") === ((4L, 4000L, 10000L)))
    assert(u("__all__") === ((4L, 4000L, 10000L)))
    // one dominant weight: ESS = 103^2/10003 = 1.0605... -> 1060 e3, 2651 bp
    val c = ess(Seq(("b", 100L), ("b", 1L), ("b", 1L), ("b", 1L)))
    assert(c("b") === ((4L, 1060L, 2651L)))
    // all-zero weights: undefined -> NULL
    val z = ess(Seq(("z", 0L), ("z", 0L)))
    assert(z("z") === ((2L, -1L, -1L)))
    // the rollup folds partials: two sources, overall n = total
    val m = ess(Seq(("a", 1L), ("b", 3L)))
    assert(m("__all__")._1 === 2L)
  }

  test("samp5 balances every class to the minority size with a deterministic kept set") {
    val rows = ScaleOps.samp5(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val m = rows.map(_._2).min
    rows.foreach { case (src, before, after, _) =>
      assert(after === m, s"class $src must be cut to the minority size $m, got $after")
      assert(after <= before)
    }
    // rerun-stability: the kept-id sums are a pure function of the data
    val again = ScaleOps.samp5(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    assert(again.toSeq === rows.map(r => (r._1, r._4)).toSeq)
  }

  test("samp6 Neyman allocation favors the noisy stratum and sums exactly to the budget") {
    import spark.implicits._
    // s_noisy: same size as s_flat but high variance -> larger allocation
    val noisy = (0 until 100).map(i => ("s_noisy", if (i % 2 == 0) 100L else 900L))
    val flat = (0 until 100).map(_ => ("s_flat", 500L))
    val small = (0 until 10).map(i => ("s_small", 400L + (i % 3) * 100L))
    val out = ScaleOps.neymanAllocationOf(
      (noisy ++ flat ++ small).toDF("source", "y"), "source", "y", 100L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(out.values.sum === 100L, "allocations must sum exactly to the budget")
    assert(out("s_noisy") > out("s_small"), "high N*sigma wins budget")
    assert(out("s_flat") === 0L, "zero-variance stratum needs no samples under Neyman")
    // all-constant corpus: proportional fallback, still exactly the budget
    val const = ScaleOps.neymanAllocationOf(
      (flat ++ small.map { case (s, _) => (s, 7L) }).toDF("source", "y"), "source", "y", 11L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(const.values.sum === 11L)
    assert(const("s_flat") === 10L && const("s_small") === 1L,
      "fallback is proportional to stratum size")
  }

  test("samp6 golden: exact sf0.001 Neyman allocation, every column (round-13)") {
    // Pins the full 5-column result row-for-row — the r12 driver red on
    // samp6 was an ORACLE-side type promotion (DuckDB sum() OVER () made
    // `base` HUGEINT), not a value bug; this spec keeps the Spark side
    // frozen so any future red must be re-diagnosed on the compare path.
    val golden = Seq(
      ("src0", 25L, 3616L, 51L, 52L),
      ("src1", 25L, 3660L, 52L, 52L),
      ("src10", 25L, 3995L, 57L, 57L),
      ("src11", 25L, 3290L, 47L, 47L),
      ("src12", 25L, 3291L, 47L, 47L),
      ("src13", 25L, 3669L, 52L, 52L),
      ("src14", 25L, 3872L, 55L, 55L),
      ("src15", 25L, 2964L, 42L, 42L),
      ("src16", 25L, 3721L, 53L, 53L),
      ("src17", 25L, 3758L, 53L, 54L),
      ("src18", 25L, 3533L, 50L, 51L),
      ("src19", 25L, 2625L, 37L, 38L),
      ("src2", 25L, 3863L, 55L, 55L),
      ("src3", 25L, 3266L, 46L, 47L),
      ("src4", 25L, 3290L, 47L, 47L),
      ("src5", 25L, 3287L, 46L, 47L),
      ("src6", 25L, 3162L, 45L, 45L),
      ("src7", 25L, 3881L, 55L, 56L),
      ("src8", 25L, 3351L, 47L, 48L),
      ("src9", 25L, 3857L, 55L, 55L))
    val got = ScaleOps.samp6(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === golden)
    assert(got.map(_._5).sum === 1000L, "allocations must sum exactly to the budget")
  }

  test("samp8 systematic: exactly ceil(n/k) rows at positions 1, k+1, …, from the salted order") {
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "lang")
    val n = docs.count()
    val got = ScaleOps.samp8(spark, sfDir).collect()
    assert(got.length.toLong === (n + 24) / 25, "zero count variance — the systematic guarantee")
    assert(got.map(_.getLong(0)).toSeq === (1L to n by 25L).toSeq)
    // rows are the deterministic shuffle's rows at those positions
    val full = ScaleOps.deterministicShuffleOf(docs, "doc_id", "samp8:")
      .collect().map(r => (r.getAs[Long]("pos"), r.getAs[Long]("doc_id"))).toMap
    got.foreach(r => assert(full(r.getLong(0)) === r.getLong(1)))
  }
}
