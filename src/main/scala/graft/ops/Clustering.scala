package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] Distributed k-means over the `embeddings` table — the clustering
  * primitive behind cluster-balanced corpus curation (SemDeDup-style
  * cluster-then-prune, DoReMi-style domain reweighting both start from
  * exactly this assignment step). Not derived from the reference.
  *
  * Exactness across engines: vectors ride Similarity's integer
  * quantization (q_i = round(e_i·1000), exact int64); distances are
  * integer squared-L2; new centroid components are integer means
  * (`sum div count` — DuckDB `//` and Spark `div` both truncate toward
  * zero, verified); argmin ties break on the lowest cluster id. Every
  * number in the output is exact integer math, so the DuckDB oracle
  * hash-matches bit-for-bit.
  *
  * Scale (the MLlib KMeans shape, re-expressed declaratively): the k×dim
  * centroid set lives in the PLAN as a literal array — each Lloyd
  * assignment is a zero-join, zero-shuffle whole-stage-codegen projection
  * (`transform`/`zip_with`/`aggregate` over the broadcast-sized literal).
  * The recompute is one partial-aggregated exchange of (k·dim·tasks) tiny
  * rows, collected k·dim to the driver (the same justified-small collect
  * MLlib's `collectAsMap` does per iteration). Nothing grows with corpus
  * size except the scan.
  */
object Clustering {
  type Q = (SparkSession, String) => DataFrame

  private val K = 8

  /** Centroid set → a SQL literal `array(array(...), ...)` ordered by
    * cluster id 1..K (element index = cluster id). */
  private def centLiteral(cents: Seq[Array[Long]]): String =
    cents.map(_.mkString("array(", "L, ", "L)")).mkString("array(", ", ", ")")

  /** One Lloyd assignment against literal centroids: per-vector distance
    * list via zip_with, argmin via array_position(array_min) — first
    * minimum wins, i.e. ties break on the lowest cluster id. */
  private def assign(qn: DataFrame, cents: Seq[Array[Long]]): DataFrame =
    qn.withColumn("dists", expr(
        s"transform(${centLiteral(cents)}, c -> " +
          "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v))"))
      .withColumn("cid", expr("CAST(array_position(dists, array_min(dists)) AS BIGINT)"))
      .withColumn("dist", expr("array_min(dists)"))
      .drop("dists")

  /** Recompute integer-mean centroids from an assignment; clusters are
    * keyed 1..K and a cluster that lost every member keeps its previous
    * centroid (deterministic, and what production k-means does short of
    * reseeding). */
  private def recompute(assigned: DataFrame, prev: Seq[Array[Long]]): Seq[Array[Long]] = {
    val sums = assigned
      .select(col("cid"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy("cid", "pos")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .select(col("cid"), col("pos"), expr("s div n").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCid = sums.groupBy(_._1)
    (1 to K).map { cid =>
      byCid.get(cid.toLong) match {
        case Some(rows) => rows.sortBy(_._2).map(_._3)
        case None       => prev(cid - 1)
      }
    }
  }

  /** Lloyd loop: final-iteration assignment frame (vec_id, q, nrm, cid,
    * dist) plus the centroid set the members were assigned against —
    * shared by the cl1 report and the cl2 cluster-balanced sample. Seeds
    * are the K lowest-id vectors (ids 1..K). */
  private[graft] def kmeansAssignments(
      vectors: DataFrame, iterations: Int = 2): (DataFrame, Seq[Array[Long]]) = {
    val qn = Similarity.qnormOf(vectors)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds: Seq[Array[Long]] = qn.filter(col("vec_id").between(1, K))
      .orderBy("vec_id").select("q").collect()
      .map(_.getSeq[Long](0).toArray).toSeq
    require(seeds.length == K, s"need $K seed vectors with vec_id 1..$K")
    var cents = seeds
    var it = 0
    while (it < iterations - 1) {
      cents = recompute(assign(qn, cents), cents)
      it += 1
    }
    // MlLsh convention: materialize the result eagerly (localCheckpoint) so
    // the loop cache can unpin before returning — library callers must not
    // inherit a session-lifetime MEMORY_AND_DISK frame (checkpoint blocks
    // are GC-managed by the ContextCleaner once the frame is unreachable).
    val finalAssign = assign(qn, cents).localCheckpoint(true)
    qn.unpersist()
    (finalAssign, cents)
  }

  /** Per-cluster report: member count, Σ vec_id (membership witness),
    * inertia (Σ squared-L2 to the final centroid), and the centroid's L1
    * norm (centroid witness). */
  private[graft] def kmeansOf(vectors: DataFrame, iterations: Int = 2): DataFrame = {
    val (assigned, cents) = kmeansAssignments(vectors, iterations)
    assigned
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"),
        sum("vec_id").as("sum_vec_id"),
        sum("dist").as("inertia"))
      .join(broadcast(
        vectors.sparkSession.createDataFrame(
          cents.zipWithIndex.map { case (c, i) =>
            (i + 1L, c.map(math.abs).sum)
          }).toDF("cid", "centroid_l1")), Seq("cid"))
      .select(col("cid").as("cluster_id"), col("n_members"),
        col("sum_vec_id"), col("inertia"), col("centroid_l1"))
  }

  val cl1: Q = (s, d) =>
    kmeansOf(Tables.embeddings(s, d)).orderBy("cluster_id")

  /** CL2: cluster-balanced sampling — the diversity-preserving prune
    * (SemDeDup-style cluster-then-cut): keep at most `quota` members per
    * final cluster, picked by md5(vec_id) (deterministic pseudo-random,
    * no RNG). Dominant clusters get truncated, rare clusters survive
    * whole — the opposite failure mode of uniform sampling, which
    * under-represents the tail.
    *
    * Scale: the per-cluster cut runs through the custom
    * [[graft.plans.TopKPerGroup]] operator, NOT a window — a
    * k-partition window is a skew funnel when k is 8 and the corpus is
    * 100 TB; TopKPartial caps every map task at quota rows per cluster
    * before the exchange, so the shuffle carries ≤ k·quota rows per
    * task regardless of corpus size. */
  private[graft] def clusterBalancedSample(vectors: DataFrame, quota: Int): DataFrame = {
    val (assigned, _) = kmeansAssignments(vectors)
    val keyed = assigned.select(
      col("vec_id"), col("cid").as("cluster_id"),
      expr("md5(CAST(vec_id AS STRING))").as("pick_key"))
    graft.plans.TopKPerGroup(keyed,
      groupBy = Seq("cluster_id"),
      orderBy = Seq(("pick_key", false), ("vec_id", false)),
      k = quota)
  }

  val cl2: Q = (s, d) =>
    clusterBalancedSample(Tables.embeddings(s, d), quota = 40)
      .orderBy("cluster_id", "vec_id")

  /** The shared Lloyd CTE chain (qn → cent0 → d0 → a0 → cent1 → d1 → a1)
    * replaying both passes — cl1Sql and cl2Sql each append their own final
    * SELECT, so an edit to either query's tail cannot corrupt the other
    * (previously cl2Sql was substring-sliced out of cl1Sql). Positional
    * arithmetic uses 1-based `range(1, 65)` indexing (dim is fixed at 64
    * in the fixture), `//` truncation matches Spark's `div`, and the
    * argmin window orders (dist, cid) — the same first-minimum tie-break. */
  private val lloydCtes: String = {
    val dim = 64
    s"""WITH qn AS (
       |  SELECT vec_id, q, CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nrm
       |  FROM (SELECT vec_id,
       |          list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |        FROM embeddings)
       |  WHERE CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) > 0),
       |cent0 AS (
       |  SELECT CAST(vec_id AS BIGINT) AS cid, q FROM qn WHERE vec_id BETWEEN 1 AND $K),
       |d0 AS (
       |  SELECT v.vec_id, c.cid,
       |         CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |           j -> (v.q[j] - c.q[j]) * (v.q[j] - c.q[j]))) AS BIGINT) AS dist
       |  FROM qn v CROSS JOIN cent0 c),
       |a0 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
       |    FROM d0) WHERE rk = 1),
       |cent1m AS (
       |  SELECT cid, list(c ORDER BY pos) AS q FROM (
       |    SELECT a0.cid, t.j AS pos, CAST(sum(v.q[t.j]) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
       |    FROM qn v JOIN a0 USING (vec_id) CROSS JOIN range(1, ${dim + 1}) t(j)
       |    GROUP BY a0.cid, t.j)
       |  GROUP BY cid),
       |cent1 AS (
       |  -- a cluster that lost every member keeps its seed centroid,
       |  -- mirroring the Spark side's carry-forward
       |  SELECT cid, q FROM cent1m
       |  UNION ALL
       |  SELECT c0.cid, c0.q FROM cent0 c0
       |  WHERE c0.cid NOT IN (SELECT cid FROM cent1m)),
       |d1 AS (
       |  SELECT v.vec_id, c.cid,
       |         CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |           j -> (v.q[j] - c.q[j]) * (v.q[j] - c.q[j]))) AS BIGINT) AS dist
       |  FROM qn v CROSS JOIN cent1 c),
       |a1 AS (
       |  SELECT vec_id, cid, dist FROM (
       |    SELECT vec_id, cid, dist,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
       |    FROM d1) WHERE rk = 1)
       |""".stripMargin
  }

  val cl1Sql: String = lloydCtes +
    """SELECT a1.cid AS cluster_id,
       |       CAST(count(*) AS BIGINT) AS n_members,
       |       CAST(sum(a1.vec_id) AS BIGINT) AS sum_vec_id,
       |       CAST(sum(a1.dist) AS BIGINT) AS inertia,
       |       (SELECT CAST(list_sum(list_transform(c1.q, x -> abs(x))) AS BIGINT)
       |        FROM cent1 c1 WHERE c1.cid = a1.cid) AS centroid_l1
       |FROM a1
       |GROUP BY a1.cid
       |ORDER BY cluster_id""".stripMargin

  /** cl2's oracle: the same two Lloyd passes ([[lloydCtes]]), then the
    * stock window formulation of the per-cluster cut (the custom
    * TopKPerGroup operator must agree with the declarative rank-filter
    * bit-for-bit). */
  val cl2Sql: String = lloydCtes +
    """SELECT cluster_id, vec_id, pick_key FROM (
        |  SELECT a1.cid AS cluster_id, a1.vec_id,
        |         md5(CAST(a1.vec_id AS VARCHAR)) AS pick_key,
        |         row_number() OVER (PARTITION BY a1.cid
        |           ORDER BY md5(CAST(a1.vec_id AS VARCHAR)), a1.vec_id) AS rk
        |  FROM a1)
        |WHERE rk <= 40
        |ORDER BY cluster_id, vec_id""".stripMargin

  // ---- CL3: simplified silhouette (cluster-quality audit) ----

  /** Simplified silhouette (Hruschka et al. 2004 — centroid distances
    * instead of the O(n²) pairwise form): per vector a = squared-L2 to
    * its OWN final centroid, b = min squared-L2 to any OTHER centroid,
    * s = (b − a)/max(a, b) ∈ [−1, 1]; reported per cluster as the mean
    * in basis points plus `n_negative` (s < 0 ⇔ a foreign centroid
    * closer than the assigned one). Because [[kmeansAssignments]]
    * re-assigns against the FINAL centroids, a = min over all centroids
    * and n_negative is 0 BY INVARIANT — the column is the cheap
    * assignment-vs-centroid drift check for callers who feed their own
    * (possibly stale) assignment, and the sign-split machinery below
    * keeps the op correct for them.
    * All integers; the two integral divisions are SIGN-SPLIT (the eval3
    * convention) so Spark's truncating `div` and DuckDB's flooring `//`
    * agree on negative silhouettes.
    *
    * Scale: one zero-join codegen projection per vector against the
    * k×dim centroid literal (cl1's Lloyd-assignment shape) + one
    * map-side-combined aggregate into k rows. The library entry point
    * is [[graft.api.GraftApi.simplifiedSilhouette]]. */
  private[graft] def silhouetteOf(vectors: DataFrame): DataFrame = {
    val (assigned, cents) = kmeansAssignments(vectors)
    assigned
      .withColumn("dists", expr(
        s"transform(${centLiteral(cents)}, c -> " +
          "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v))"))
      .withColumn("b", expr(
        s"array_min(zip_with(dists, sequence(1L, ${K}L), (v, i) -> CASE WHEN i = cid THEN NULL ELSE v END))"))
      .withColumn("s_bp", expr(
        """CASE WHEN b >= dist THEN (b - dist) * 10000 div greatest(greatest(dist, b), 1)
          |     ELSE -((dist - b) * 10000 div greatest(greatest(dist, b), 1)) END""".stripMargin))
      .groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"), sum("s_bp").as("ssil"),
        sum(when(col("s_bp") < 0L, 1L).otherwise(0L)).as("n_negative"))
      .withColumn("mean_sil_bp", expr(
        "CASE WHEN ssil >= 0 THEN ssil div n_members ELSE -((-ssil) div n_members) END"))
      .select("cluster_id", "n_members", "mean_sil_bp", "n_negative")
  }

  val cl3: Q = (s, d) =>
    silhouetteOf(Tables.embeddings(s, d)).orderBy("cluster_id")

  /** cl3's oracle: the same Lloyd chain, then b from the full d1
    * distance table by an INDEPENDENT route (join-and-min over foreign
    * centroids, where the Spark side masks one slot of the in-row
    * distance array). */
  val cl3Sql: String = lloydCtes +
    """, b AS (
       |  SELECT d.vec_id, CAST(min(d.dist) AS BIGINT) AS b
       |  FROM d1 d JOIN a1 a ON a.vec_id = d.vec_id AND d.cid <> a.cid
       |  GROUP BY d.vec_id),
       |sil AS (
       |  SELECT a.cid, a.vec_id,
       |         CASE WHEN b.b >= a.dist
       |              THEN (b.b - a.dist) * 10000 // greatest(greatest(a.dist, b.b), 1)
       |              ELSE -((a.dist - b.b) * 10000 // greatest(greatest(a.dist, b.b), 1)) END AS s
       |  FROM a1 a JOIN b ON b.vec_id = a.vec_id)
       |SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |       CASE WHEN sum(s) >= 0 THEN CAST(sum(s) AS BIGINT) // CAST(count(*) AS BIGINT)
       |            ELSE -(CAST(-sum(s) AS BIGINT) // CAST(count(*) AS BIGINT)) END AS mean_sil_bp,
       |       CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
       |FROM sil GROUP BY cid ORDER BY cluster_id""".stripMargin

  // ---- CL4: Calinski–Harabasz (pseudo-F) cluster-quality index ----

  /** CL4: the Calinski–Harabasz pseudo-F (1974) of the final k-means
    * assignment — the BETWEEN/WITHIN variance-ratio criterion used to
    * pick k and to compare clusterings, complementing cl3's silhouette
    * (silhouette judges member placement; CH judges the partition's
    * overall separation-vs-compactness). Both dispersion terms come
    * from EXACT sufficient statistics against the true rational means
    * (never the integer-rounded centroids): per cluster,
    * n_c·W_c = n_c·Σ|q|² − |Σq|² (Cauchy–Schwarz ⇒ ≥ 0), and the total
    * scatter from the same identity over the summed partials. Each W_c
    * rounds ONCE to e3 by its own exact integral division (trunc ==
    * floor on non-negatives), the rounded integers sum identically in
    * both engines, and B = T − W clamps at 0 (truncation can shave ±1
    * when the true B is 0). CH_e6 = B·(n−k)·10⁶ div (W·(k−1)) with
    * NULL when k ≤ 1, n ≤ k, or W = 0 (degenerate — the voc3
    * convention); k counts NON-EMPTY clusters.
    *
    * Scale: one posexploded map-side-combined (k×64)-row aggregate +
    * one per-cluster count/norm aggregate off the assignment — the
    * emb7 shape; the overall row folds partials, never rescans.
    * Library entry point: [[graft.api.GraftApi.calinskiHarabasz]]. */
  private[graft] def calinskiHarabaszOf(assigned: DataFrame): DataFrame = {
    val perDim = assigned.select(col("cid"), posexplode(col("q")).as(Seq("j", "x")))
      .groupBy("cid", "j").agg(sum(expr("CAST(x AS DECIMAL(38,0))")).as("s"))
    val ssumC = perDim.groupBy("cid").agg(sum(expr("s * s")).as("ssum"))
    val nc = assigned.groupBy("cid").agg(
      count(lit(1)).cast("decimal(38,0)").as("n_c"),
      sum(expr("CAST(nrm AS DECIMAL(38,0))")).as("nrm_c"))
    val per = nc.join(ssumC, Seq("cid"))
      .withColumn("w_e3", expr("(n_c * nrm_c - ssum) * 1000 div n_c"))
    val dimAll = perDim.groupBy("j").agg(sum("s").as("s"))
      .agg(sum(expr("s * s")).as("ssum_all"))
    val glob = nc.agg(sum("n_c").as("n"), sum("nrm_c").as("nrm_all"),
      count(lit(1)).cast("decimal(38,0)").as("k"))
    val wtot = per.agg(sum("w_e3").as("w_t"))
    val overall = glob.crossJoin(broadcast(dimAll)).crossJoin(broadcast(wtot))
      .withColumn("t_e3", expr("(n * nrm_all - ssum_all) * 1000 div n"))
      .select(lit(null).cast("long").as("cluster_id"),
        col("n").cast("long").as("n_members"), col("w_t").cast("long").as("w_e3"),
        expr("CASE WHEN k <= 1 OR n <= k OR w_t = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(greatest(t_e3 - w_t, CAST(0 AS DECIMAL(38,0))) * (n - k) * 1000000 " +
          "div (w_t * (k - 1)) AS BIGINT) END").as("ch_e6"))
    per.select(col("cid").cast("long").as("cluster_id"),
        col("n_c").cast("long").as("n_members"), col("w_e3").cast("long").as("w_e3"),
        lit(null).cast("long").as("ch_e6"))
      .unionByName(overall).orderBy("cluster_id")
  }

  val cl4: Q = (s, d) =>
    calinskiHarabaszOf(kmeansAssignments(Tables.embeddings(s, d))._1)

  /** cl4's oracle: the shared Lloyd chain's final assignment joined back
    * to qn for (q, nrm), then the same partial-fold arithmetic. */
  val cl4Sql: String = lloydCtes +
    """, asg AS (SELECT a.vec_id, a.cid, qn.q, qn.nrm FROM a1 a JOIN qn USING (vec_id)),
       |pd AS (
       |  SELECT cid, t.j, CAST(sum(q[CAST(t.j AS INTEGER)]) AS HUGEINT) AS s
       |  FROM asg CROSS JOIN generate_series(1, 64) t(j) GROUP BY cid, t.j),
       |sc AS (SELECT cid, CAST(sum(s * s) AS HUGEINT) AS ssum FROM pd GROUP BY cid),
       |nc AS (
       |  SELECT cid, CAST(count(*) AS HUGEINT) AS n_c,
       |         CAST(sum(nrm) AS HUGEINT) AS nrm_c
       |  FROM asg GROUP BY cid),
       |per AS (
       |  SELECT cid, n_c, (n_c * nrm_c - ssum) * 1000 // n_c AS w_e3
       |  FROM nc JOIN sc USING (cid)),
       |da AS (SELECT j, CAST(sum(s) AS HUGEINT) AS s FROM pd GROUP BY j),
       |ga AS (SELECT CAST(sum(s * s) AS HUGEINT) AS ssum_all FROM da),
       |gl AS (
       |  SELECT CAST(sum(n_c) AS HUGEINT) AS n, CAST(sum(nrm_c) AS HUGEINT) AS nrm_all,
       |         CAST(count(*) AS HUGEINT) AS k
       |  FROM nc),
       |wt AS (SELECT CAST(sum(w_e3) AS HUGEINT) AS w_t FROM per),
       |ov AS (
       |  SELECT (n * nrm_all - ssum_all) * 1000 // n AS t_e3, n, k, w_t
       |  FROM gl CROSS JOIN ga CROSS JOIN wt)
       |SELECT CAST(cid AS BIGINT) AS cluster_id, CAST(n_c AS BIGINT) AS n_members,
       |       CAST(w_e3 AS BIGINT) AS w_e3, CAST(NULL AS BIGINT) AS ch_e6
       |FROM per
       |UNION ALL
       |SELECT NULL, CAST(n AS BIGINT), CAST(w_t AS BIGINT),
       |       CASE WHEN k <= 1 OR n <= k OR w_t = 0 THEN CAST(NULL AS BIGINT)
       |            ELSE CAST(greatest(t_e3 - w_t, 0) * (n - k) * 1000000
       |              // (w_t * (k - 1)) AS BIGINT) END
       |FROM ov
       |ORDER BY cluster_id""".stripMargin

  // ---- EMB1: label-centroid embedding audit ----

  /** Supervised embedding-quality audit over a labeled vector frame
    * (vec_id, embedding, label): per label, the integer-mean centroid,
    * the mean squared-L2 distance of members to their own centroid
    * (cohesion), and the nearest FOREIGN centroid with its distance
    * (separation) — the per-class compactness/margin report run before
    * trusting an embedding column for similarity search or clustering.
    * The library entry point ([[graft.api.GraftApi.labelCentroidAudit]]).
    *
    * Exactness: cl1's integer conventions throughout — quantized
    * vectors, `sum div count` centroids, integer squared-L2, ties on
    * the lower label.
    *
    * Scale: the centroid aggregate is one partial-agg exchange of
    * labels·dim tiny rows with a labels·dim driver collect (the MLlib
    * recompute shape); member distances are then a ZERO-shuffle codegen
    * projection against plan-literal centroids, and the centroid×
    * centroid nearest-neighbor table is driver-side integer math over
    * ≤ labels² pairs. */
  private[graft] def labelCentroidAuditOf(vecs: DataFrame): DataFrame = {
    val qn = graft.ops.Similarity.qnormOf(vecs.select(col("vec_id"), col("embedding")))
      .join(vecs.select(col("vec_id"), col("label").cast("long").as("label")), Seq("vec_id"))
    val centRows = qn
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(expr("sum(x) div count(1)").as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val labels = centRows.map(_._1).distinct.sorted
    val cents: Map[Long, Array[Long]] = labels.map { l =>
      l -> centRows.filter(_._1 == l).sortBy(_._2).map(_._3)
    }.toMap
    // nearest foreign centroid per label: exact integer pair distances,
    // ties on the lower label — pure driver math over labels² pairs
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val nn: Map[Long, (Long, Long)] = labels.map { l =>
      val (bl, bd) = labels.filter(_ != l)
        .map(o => (o, d2(cents(l), cents(o))))
        .minBy { case (o, dd) => (dd, o) }
      l -> (bl, bd)
    }.toMap
    val centLit = centLiteral(labels.map(cents).toIndexedSeq)
    val idxExpr = labels.zipWithIndex
      .map { case (l, i) => s"WHEN label = $l THEN ${i + 1}" }
      .mkString("CASE ", " ", " ELSE 0 END")
    val nnDf = {
      val sp = vecs.sparkSession
      import sp.implicits._
      labels.toSeq.map(l => (l, nn(l)._1, nn(l)._2)).toDF("label", "nn_label", "nn_cdist")
    }
    qn
      .withColumn("own", expr(
        s"element_at(transform($centLit, c -> " +
          s"aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)), $idxExpr)"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), expr("sum(own) div count(1)").as("mean_own_dist"))
      .join(broadcast(nnDf), Seq("label"))
  }

  val emb1: Q = (s, d) =>
    labelCentroidAuditOf(graft.Tables.embeddings(s, d)).orderBy("label")
  val emb1Sql: String = {
    val dim = 64
    s"""WITH qn AS (
       |  SELECT vec_id, q FROM (
       |    SELECT vec_id,
       |           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |    FROM embeddings)
       |  WHERE CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) > 0),
       |lv AS MATERIALIZED (
       |  SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, qn.q
       |  FROM embeddings e JOIN qn ON qn.vec_id = e.vec_id),
       |cent AS MATERIALIZED (
       |  SELECT label, list(c ORDER BY pos) AS cq FROM (
       |    SELECT lv.label, t.j AS pos,
       |           CAST(sum(lv.q[t.j]) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
       |    FROM lv CROSS JOIN range(1, ${dim + 1}) t(j)
       |    GROUP BY lv.label, t.j)
       |  GROUP BY label),
       |own AS (
       |  SELECT lv.label,
       |         CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |           j -> (lv.q[j] - c.cq[j]) * (lv.q[j] - c.cq[j]))) AS BIGINT) AS d
       |  FROM lv JOIN cent c ON c.label = lv.label),
       |stats AS (
       |  SELECT label, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(d) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_own_dist
       |  FROM own GROUP BY label),
       |cd AS (
       |  SELECT a.label AS la, b.label AS lb,
       |         CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |           j -> (a.cq[j] - b.cq[j]) * (a.cq[j] - b.cq[j]))) AS BIGINT) AS cdist
       |  FROM cent a JOIN cent b ON a.label <> b.label),
       |nn AS (
       |  SELECT la AS label, lb AS nn_label, cdist AS nn_cdist FROM (
       |    SELECT la, lb, cdist,
       |           row_number() OVER (PARTITION BY la ORDER BY cdist, lb) AS rk
       |    FROM cd) WHERE rk = 1)
       |SELECT s.label, s.n, s.mean_own_dist, nn.nn_label, nn.nn_cdist
       |FROM stats s JOIN nn USING (label) ORDER BY label""".stripMargin
  }

  // ---- LDA1: one topic-model M-step under a deterministic init ----

  /** LDA1: the M-step of a plate-model topic EM (pLSA/LDA family) under
    * a DETERMINISTIC token→topic initialization — the word-topic count
    * matrix and per-topic top terms that one sweep of collapsed
    * Gibbs/EM maintains. Each token position draws its initial topic
    * from a salted md5 of (doc_id, position) mod K (the split1/eval6
    * hash-draw idiom — both engines replay it bit-for-bit, no RNG);
    * the M-step then folds word-topic counts c_wk and topic totals c_k
    * and emits each topic's top-5 terms with exact basis-point
    * φ̂(w|k) = c_wk·10⁴ div c_k. This is the distributed-update shape of
    * topic-model training: everything a real sampler adds is a smarter
    * (but still per-token) reassignment between identical M-steps.
    *
    * Scale: one corpus token scan → one map-side-combined hash
    * aggregate on (w, topic) — output is vocabulary×K, never
    * corpus-sized; topic totals derive from that same frame (no second
    * scan) and broadcast back; the top-5 window partitions K ways over
    * a vocabulary-sized frame. */
  private[graft] def topicMstepOf(docs: DataFrame, kTopics: Int = 4, topN: Int = 5): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "w")))
      .filter(length(col("w")) > 0)
      .withColumn("topic", expr(
        s"CAST(conv(substring(md5(concat('lda1:', CAST(doc_id AS STRING), ':', CAST(pos0 AS STRING))), 1, 4), 16, 10) AS BIGINT) % $kTopics"))
    val cwk = toks.groupBy("topic", "w").agg(count(lit(1)).as("c_wk"))
    val ck = cwk.groupBy("topic").agg(sum("c_wk").as("c_k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("topic").orderBy(col("c_wk").desc, col("w").asc)
    cwk.join(broadcast(ck), Seq("topic"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= topN)
      .select(col("topic"), col("rk").cast("long").as("rk"), col("w").as("term"),
        col("c_wk"), col("c_k"), expr("c_wk * 10000 div c_k").as("phi_bp"))
  }

  val lda1: Q = (s, d) =>
    topicMstepOf(Tables.documents(s, d)).orderBy("topic", "rk")
  val lda1Sql: String =
    """WITH ws AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
      |toks AS (
      |  SELECT doc_id, t.p AS pos0, t.w AS w FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
      |      i -> {'p': i - 1, 'w': ws[i]})) AS t
      |    FROM ws)
      |  WHERE len(t.w) > 0),
      |z AS (
      |  SELECT w,
      |         ('0x' || substr(md5('lda1:' || doc_id::VARCHAR || ':' || pos0::VARCHAR), 1, 4))::BIGINT % 4 AS topic
      |  FROM toks),
      |cwk AS (SELECT topic, w, CAST(count(*) AS BIGINT) AS c_wk FROM z GROUP BY topic, w),
      |ck AS (SELECT topic, CAST(sum(c_wk) AS BIGINT) AS c_k FROM cwk GROUP BY topic),
      |r AS (
      |  SELECT cwk.topic, cwk.w, cwk.c_wk, ck.c_k,
      |         row_number() OVER (PARTITION BY cwk.topic ORDER BY cwk.c_wk DESC, cwk.w) AS rk
      |  FROM cwk JOIN ck USING (topic))
      |SELECT topic, CAST(rk AS BIGINT) AS rk, w AS term, c_wk, c_k,
      |       c_wk * 10000 // c_k AS phi_bp
      |FROM r WHERE rk <= 5 ORDER BY topic, rk""".stripMargin

  val queries: Map[String, Q] = Map(
    "cl1_kmeans_clusters" -> cl1,
    "cl2_cluster_balanced_sample" -> cl2,
    "cl3_simplified_silhouette" -> cl3,
    "cl4_calinski_harabasz" -> cl4,
    "lda1_topic_mstep" -> lda1,
    "emb1_label_centroid_audit" -> emb1)
  val oracle: Map[String, String] = Map(
    "cl1_kmeans_clusters" -> cl1Sql,
    "cl2_cluster_balanced_sample" -> cl2Sql,
    "cl3_simplified_silhouette" -> cl3Sql,
    "cl4_calinski_harabasz" -> cl4Sql,
    "lda1_topic_mstep" -> lda1Sql,
    "emb1_label_centroid_audit" -> emb1Sql)
}
