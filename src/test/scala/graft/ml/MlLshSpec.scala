package graft.ml

import graft.SparkSpec

/** MLlib LSH recall/sanity: the stock MinHashLSH must recover the planted
  * near-identical token sets, and BRP-kNN must return well-formed
  * neighbor lists (hash randomness is seeded ⇒ deterministic per session). */
class MlLshSpec extends SparkSpec {

  test("MinHashLSH self-join yields near pairs, all within the threshold") {
    val rows = MlLsh.lsh1(spark, sfDir).collect()
    assert(rows.nonEmpty, "some near pairs must exist in the shared-vocab corpus")
    rows.foreach { r =>
      assert(r.getDouble(0) <= 0.3 + 1e-9, "histogram buckets within threshold")
      assert(r.getLong(1) > 0)
    }
  }

  test("BRP kNN returns k well-formed neighbors per query") {
    val rows = MlLsh.lsh2(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 5)
      assert(rs.forall(_.getLong(1) != q), "query must not be its own neighbor")
      val dists = rs.map(_.getDouble(2))
      assert(dists.forall(d => d >= 0.0 && d <= 2.0001),
        s"unit-sphere L2 distances must be in [0,2]: ${dists.toSeq}")
    }
  }

  test("lsh1 candidate pairs stay under the bucket-cap bound (full corpus)") {
    import org.apache.spark.sql.functions._
    // The degenerate-bucket cap makes the candidate count provably
    // ≤ NumBands · n · (MaxBucket-1) / 2 — linear in n, NOT O(n²). This is
    // the skew guard that replaced the round-≤6 1/5-sampling crutch: the
    // FULL corpus goes in, and the bound still holds.
    val n = graft.Tables.documents(spark, sfDir).count()
    val pairs = MlLsh.lsh1Pairs(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = pairs.count()
    val bound = MlLsh.Lsh1NumBands.toLong * n * (MlLsh.Lsh1MaxBucket - 1) / 2
    assert(total > 0, "shared-vocab corpus must yield some candidates")
    assert(total <= bound, s"candidate pairs $total must stay <= cap bound $bound")
    // candidates are well-formed: ordered ids, distance in [0,1]
    val bad = pairs.filter(col("id_a") >= col("id_b") ||
      col("jaccard_dist") < 0.0 || col("jaccard_dist") > 1.0).count()
    assert(bad === 0L)
    pairs.unpersist()
  }

  test("lsh1 planted recall: identical-token-set pairs in under-cap buckets all surface at distance 0") {
    import org.apache.spark.sql.functions._
    // The round-7 rewrite (3x4 hand-banding + bucket cap) deliberately
    // trades recall near the threshold for linear candidate growth — but
    // EXACT duplicates (identical binary token vectors, hence identical
    // hashes in every band) that sit in at least one under-cap bucket
    // have no excuse: all of them must appear at jaccard_dist 0. A
    // banding bug that silently drops pairs now fails here instead of
    // passing the subset/upper-bound tests.
    val bands = MlLsh.lsh1BandsOf(MlLsh.tokenVectors(spark, sfDir)).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2))))
    val bucketOf = bands.groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).toSet }
    val bucketSize = bands.groupBy(_._2).map { case (bk, rs) => bk -> rs.length }
    val tsets = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_sort(array_distinct(
        filter(split(lower(col("text")), "\\s"), t => length(t) > 0))).as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).mkString(" "))
    val expected = tsets.groupBy(_._2).values.filter(_.length > 1).flatMap { g =>
      val ids = g.map(_._1).sorted
      for {
        i <- ids.indices; j <- (i + 1) until ids.length
        a = ids(i); b = ids(j)
        // identical vectors share every bucket; the cap drops the pair
        // only when ALL of its buckets are over — those are exempt
        if bucketOf.contains(a) && bucketOf.contains(b) &&
          bucketOf(a).exists(bk => bucketSize(bk) <= MlLsh.Lsh1MaxBucket)
      } yield (a, b)
    }.toSet
    assert(expected.nonEmpty, "fixture must plant identical-token-set pairs in under-cap buckets")
    val got = MlLsh.lsh1Pairs(spark, sfDir)
      .filter(col("jaccard_dist") === 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = expected -- got
    assert(missing.isEmpty,
      s"recall regression: ${missing.size} planted exact-dup pairs absent, e.g. ${missing.take(3)}")
  }

  test("lsh1 zero-distance pairs have identical token sets (independent recompute)") {
    import org.apache.spark.sql.functions._
    // jaccard_dist == 0 claims identical binary token vectors; verify
    // against the raw text through a DIFFERENT path (SQL split + set
    // compare, no MLlib). Every zero-distance pair must agree.
    val pairs = MlLsh.lsh1Pairs(spark, sfDir).filter(col("jaccard_dist") === 0.0)
    val tsets = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_sort(array_distinct(
        filter(split(lower(col("text")), "\\s"), t => length(t) > 0))).as("ts"))
    val joined = pairs
      .join(tsets.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), Seq("id_a"))
      .join(tsets.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), Seq("id_b"))
    val nZero = joined.count()
    assert(nZero > 0, "fixture must contain planted duplicate pairs in kept buckets")
    val mismatched = joined.filter(col("ts_a") =!= col("ts_b")).count()
    assert(mismatched === 0L, s"$mismatched zero-distance pairs with differing token sets")
  }

  test("lsh2 kNN recall vs exact cosine top-k stays above the floor") {
    import org.apache.spark.sql.functions._
    val approx = MlLsh.lsh2(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // exact top-5 by cosine over the same candidate set (cosine rank ==
    // unit-sphere L2 rank, so this is the ground truth lsh2 approximates)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("nrm", expr("sqrt(aggregate(transform(e, x -> x*x), 0D, (a,v) -> a+v))"))
    val recalls = approx.map { case (q, got) =>
      val qv = emb.filter(col("vec_id") === q).head()
      val qe = qv.getSeq[Double](1); val qn = qv.getDouble(2)
      val exact = emb.filter(col("vec_id") =!= q)
        .withColumn("dot", expr(
          s"aggregate(zip_with(e, array(${qe.mkString(",")}), (x,y) -> x*y), 0D, (a,v) -> a+v)"))
        .withColumn("cos", col("dot") / (col("nrm") * lit(qn)))
        .orderBy(desc("cos")).limit(5).collect().map(_.getLong(0)).toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.5, s"mean kNN recall vs exact top-5 must stay >= 0.5, got $avg (${recalls.toSeq})")
  }

  test("batched cosineTopKMany returns the exact neighbors for lsh2's query keys") {
    import org.apache.spark.sql.functions._
    // lsh2's per-key approxNearestNeighbors is one O(|corpus|) scan PER
    // query (fine at k=3, a driver loop at k=1000); the documented route
    // for query SETS is the batched two-stage path. Show that for lsh2's
    // own keys the batched path returns exactly the brute-force top-5 —
    // so switching paths never loses a correct neighbor, whereas lsh2
    // itself is approximate (recall floor 0.5 above).
    val emb = graft.Tables.embeddings(spark, sfDir)
    val keys = emb.filter(col("vec_id") % 100 === 0).orderBy("vec_id").limit(3)
    def byQ(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val batched = byQ(graft.api.GraftApi.cosineTopKMany(emb, keys, k = 5).collect())
    val exact = byQ(graft.ops.Similarity.cosineTopKOf(emb, keys, 5).collect())
    assert(batched.keySet === exact.keySet)
    assert(batched.keySet.nonEmpty)
    exact.foreach { case (q, ids) =>
      assert(batched(q) === ids, s"batched top-5 for key $q must equal brute force")
    }
    // and every TRUE neighbor the per-key scan did find is in the batched set
    val approx = MlLsh.lsh2(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    approx.foreach { case (q, got) =>
      assert((got intersect exact(q)).subsetOf(batched(q)))
    }
  }

  test("lsh1 (stock MinHashLSH) and nearDupPairs (in-house d3 machinery) agree " +
      "pair-for-pair on a planted fixture — two engines as each other's oracle") {
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    // planted groups of IDENTICAL 6-word docs with pairwise-disjoint
    // vocabularies: token-set Jaccard and 3-shingle Jaccard are BOTH
    // exactly 1 inside a group and 0 across, so the MLlib-MinHash path
    // (lsh1, dist <= 0.2) and the in-house md5-LSH path (d3 machinery,
    // jac >= 8000 bp) must return the SAME pair set — the round-15
    // verdict's path-independent cross-check. Group sizes stay far under
    // both bucket caps (50), so no pair is cap-exempt.
    val g1 = "alpha bravo charlie delta echo foxtrot"
    val g2 = "golf hotel india juliet kilo lima"
    val g3 = "mike november oscar papa quebec romeo"
    val docs = Seq(
      (1L, g1), (2L, g1), (3L, g1),
      (10L, g2), (11L, g2), (12L, g2),
      (20L, g3), (21L, g3),
      (30L, "sierra tango uniform victor whiskey xray"),
      (31L, "yankee zulu signal beacon relay prism"),
      (32L, "quartz marble granite basalt slate shale")).toDF("doc_id", "text")
    val expected = Set((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
    val mllib = MlLsh.lsh1PairsOf(MlLsh.tokenVectorsOf(docs))
      .filter(col("jaccard_dist") <= 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inhouse = graft.ops.Dedup.nearDupPairsOf(docs, 8000)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mllib === expected, "MLlib MinHash path must find exactly the planted pairs")
    assert(inhouse === expected, "in-house d3 path must find exactly the planted pairs")
    assert(mllib === inhouse)
  }

  test("lsh2 BRP kNN recall vs the in-house sim1 exact top-k path (cross-check)") {
    import org.apache.spark.sql.functions._
    // same keys lsh2 uses, ground truth through graft.ops.Similarity's
    // cosineTopKOf — the sim1 registry machinery, which shares NOTHING
    // with MLlib's BRP hashing (int-quantized dots + graft_dot codegen)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val keys = emb.filter(col("vec_id") % 100 === 0).orderBy("vec_id").limit(3)
    val exact = graft.ops.Similarity.cosineTopKOf(emb, keys, 5).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val approx = MlLsh.lsh2(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    assert(approx.keySet === exact.keySet, "both paths must serve the same query keys")
    val recalls = exact.map { case (q, ids) =>
      (approx(q) intersect ids).size.toDouble / ids.size
    }
    val avg = recalls.sum / recalls.size
    // round-16 verdict #3: the old >= 0.5 floor would let a silent MLlib
    // quality regression (say 0.93 -> 0.55) pass. Measured on this fixture:
    // mean = 0.9333 (per-key 1.0, 0.8, 1.0) — freeze the band at
    // [measured - 0.1, 1.0] so any real drop in BRP fidelity trips loudly.
    assert(avg >= 0.8333 && avg <= 1.0,
      s"mean BRP recall vs the sim1 exact path must stay in [0.8333, 1.0] " +
        s"(measured 0.9333 at freeze time), got $avg")
  }

  test("lsh2 seeded runs are deterministic within a session") {
    val a = MlLsh.lsh2(spark, sfDir).collect().toSeq
    val b = MlLsh.lsh2(spark, sfDir).collect().toSeq
    assert(a === b)
  }
}
