package graft.ops

import graft.SparkSpec

/** Behavioral checks for cl1 beyond the oracle gate: the partition is
  * exhaustive and disjoint, the report is deterministic, and the
  * assignment step genuinely minimizes the integer squared-L2 distance. */
class ClusteringSpec extends SparkSpec {

  test("cl4 Calinski-Harabasz matches the hand-computed two-cluster fixture") {
    val s2 = spark
    import s2.implicits._
    def qv(x: Long): (Seq[Long], Long) = {
      val a = Array.fill(64)(0L); a(0) = x; (a.toSeq, x * x)
    }
    // cluster 1 at {0, 2}, cluster 2 at {100, 102} on one axis:
    // W_c = 2 each (w_e3 = 2000), T = 10004, B = 10000,
    // CH = (10000/1)/(4/2) = 5000 exactly -> ch_e6 = 5e9
    val assigned = Seq((1L, 0L), (1L, 2L), (2L, 100L), (2L, 102L))
      .map { case (cid, x) => val (q, nrm) = qv(x); (cid, q, nrm) }
      .toDF("cid", "q", "nrm")
    val rows = Clustering.calinskiHarabaszOf(assigned).collect()
    val per = rows.filter(!_.isNullAt(0))
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(per(1L) === ((2L, 2000L)))
    assert(per(2L) === ((2L, 2000L)))
    val ov = rows.find(_.isNullAt(0)).get
    assert(ov.getLong(1) === 4L && ov.getLong(2) === 4000L)
    assert(ov.getLong(3) === 5000000000L)
    // a single cluster is degenerate -> NULL CH
    val one = Seq((1L, 0L), (1L, 2L))
      .map { case (cid, x) => val (q, nrm) = qv(x); (cid, q, nrm) }
      .toDF("cid", "q", "nrm")
    val ov1 = graft.api.GraftApi.calinskiHarabasz(one).collect().find(_.isNullAt(0)).get
    assert(ov1.isNullAt(ov1.fieldIndex("ch_e6")))
  }

  test("cl1 partitions every nonzero vector exactly once, deterministically") {
    val out = Clustering.cl1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty && out.length <= 8, s"got ${out.length} clusters")
    out.foreach { case (cid, n, _, inertia, l1) =>
      assert(cid >= 1 && cid <= 8)
      assert(n > 0, s"cluster $cid reported empty")
      assert(inertia >= 0 && l1 > 0)
    }
    val qn = Similarity.qnormOf(graft.Tables.embeddings(spark, sfDir))
    val nVec = qn.count()
    val idSum = qn.selectExpr("CAST(sum(vec_id) AS BIGINT)").head().getLong(0)
    assert(out.map(_._2).sum === nVec, "members must cover every nonzero vector once")
    assert(out.map(_._3).sum === idSum, "sum_vec_id must partition the id space")
    val again = Clustering.cl1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq === out.toSeq, "cl1 must be deterministic")
  }

  test("cl2 respects the per-cluster quota and keeps small clusters whole") {
    val quota = 40
    val sample = Clustering.cl2(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(0))) // (cluster_id, vec_id)
    val sizes = Clustering.cl1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val kept = sample.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    kept.foreach { case (cid, n) =>
      assert(n === math.min(quota.toLong, sizes(cid)),
        s"cluster $cid kept $n of ${sizes(cid)} (quota $quota)")
    }
    // sampled ids must be actual members (subset of the partition)
    assert(sample.map(_._2).distinct.length === sample.length, "no id kept twice")
    // deterministic across runs
    val again = Clustering.cl2(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(0)))
    assert(again.toSeq === sample.toSeq)
  }

  test("cl3 silhouettes cover the partition, stay in range, and satisfy the assignment invariant") {
    val sil = Clustering.cl3(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sizes = Clustering.cl1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sil.map(s => s._1 -> s._2).toMap === sizes,
      "cl3 must report the same per-cluster membership as cl1")
    sil.foreach { case (cid, _, mean, neg) =>
      assert(mean >= -10000L && mean <= 10000L, s"cluster $cid mean $mean out of range")
      assert(neg === 0L,
        s"cluster $cid: assignment against final centroids can never prefer a foreign one")
      assert(mean >= 0L, s"cluster $cid: all silhouettes are >= 0 under the invariant")
    }
    val again = Clustering.cl3(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === sil.toSeq, "cl3 must be deterministic")
  }

  test("cl1 separates a planted two-blob geometry into distinct clusters") {
    val sp = spark
    import sp.implicits._
    // 8 seed ids; ids 1-4 near (+1,0,...), ids 5-8 near (0,+1,...); 40 more
    // points split between the blobs — k-means must keep the blobs apart
    val dim = 8
    def vec(hot: Int, eps: Int): Array[Float] = {
      val a = Array.fill(dim)(0.0f)
      a(hot) = 1.0f + eps * 0.001f
      a(1 - hot) = eps * 0.002f
      a
    }
    val rows = (1L to 4L).map(id => (id, vec(0, id.toInt))) ++
      (5L to 8L).map(id => (id, vec(1, id.toInt))) ++
      (9L to 28L).map(id => (id, vec(0, (id % 7).toInt))) ++
      (29L to 48L).map(id => (id, vec(1, (id % 7).toInt)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Clustering.kmeansOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._2).sum === 48L)
    // blob A has 24 members total (ids 1-4 + 9-28), blob B the other 24;
    // every member of a blob must land in a seed cluster of the same blob
    val byCluster = Clustering.kmeansOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap // cid -> sum_vec_id
    val blobASum = (1L to 4L).sum + (9L to 28L).sum
    val blobBSum = (5L to 8L).sum + (29L to 48L).sum
    val aClusters = byCluster.filter { case (cid, _) => cid <= 4 }.values.sum
    val bClusters = byCluster.filter { case (cid, _) => cid >= 5 }.values.sum
    assert(aClusters === blobASum, s"blob A ids leaked: $byCluster")
    assert(bClusters === blobBSum, s"blob B ids leaked: $byCluster")
  }

  test("lda1 M-step conserves token mass, bounds phi, and is rerun-stable") {
    val out = Clustering.lda1(spark, sfDir).collect()
    assert(out.nonEmpty)
    val topics = out.map(_.getLong(0)).distinct.sorted
    assert(topics.forall(t => t >= 0 && t < 4))
    // per-topic invariants: rk dense from 1, c_wk descending, phi exact
    topics.foreach { t =>
      val rows = out.filter(_.getLong(0) == t).sortBy(_.getLong(1))
      assert(rows.map(_.getLong(1)).toSeq === (1L to rows.length))
      val cwks = rows.map(_.getLong(3))
      assert(cwks.zip(cwks.tail).forall { case (a, b) => a >= b })
      rows.foreach { r =>
        assert(r.getLong(5) === r.getLong(3) * 10000 / r.getLong(4))
        assert(r.getLong(3) <= r.getLong(4))
      }
    }
    // token mass: the per-topic totals must sum to the corpus token count
    val totalFromTopics = out.groupBy(_.getLong(0))
      .map { case (_, rs) => rs.head.getLong(4) }.sum
    val corpusTokens = graft.Tables.documents(spark, sfDir)
      .selectExpr("sum(size(filter(split(text, ' '), w -> length(w) > 0)))")
      .head().getLong(0)
    assert(totalFromTopics === corpusTokens)
    // deterministic init → bit-identical rerun
    assert(Clustering.lda1(spark, sfDir).collect().toSeq === out.toSeq)
  }
}
