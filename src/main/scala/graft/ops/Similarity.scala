package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] Similarity search over the `embeddings` table (SURVEY §7.8):
  * brute-force cosine top-k as the exact baseline, and a deterministic
  * hyperplane-LSH bucketing as the approximate scale path (the IVF-style
  * coarse quantizer), plus their composition (search within bucket).
  *
  * Exactness across engines: vectors are quantized to integers
  * (q_i = round(e_i·1000)), so dots and norms are exact int64; cosine is
  * then ONE double division of identical operands in both engines —
  * bit-identical, so even rank ordering matches. LSH hyperplane components
  * are md5-derived small integers, so bucket assignment is exact.
  *
  * Scale: brute-force is O(|Q|·N·dim) with the query side broadcast — the
  * correct plan when |Q| is small. The LSH path prunes N to a bucket:
  * shuffle on bucket key only. At 100 TB the bucket histogram (sim2) is
  * the balance check for the coarse quantizer.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** Any (vec_id, embedding) frame, integer-quantized, with exact norms;
    * zero vectors dropped. Dots/norms run through the codegen'd
    * `graft_dot` expression — the registry call makes every consumer
    * self-contained. */
  private[graft] def qnormOf(vectors: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    vectors
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("q"))
      .withColumn("nrm", expr("graft_dot(q, q)"))
      .filter(col("nrm") > 0)
  }

  private def qnorm(s: SparkSession, d: String): DataFrame =
    qnormOf(Tables.embeddings(s, d))

  private[ops] val qnormCte: String =
    """qn AS (
      |  SELECT vec_id, q, CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nrm
      |  FROM (SELECT vec_id,
      |          list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |        FROM embeddings)
      |  WHERE CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) > 0)""".stripMargin

  // ---- SIM1: brute-force cosine top-k (exact baseline) ----

  /** Exact brute-force cosine top-k of a (small, broadcastable) query set
    * against a corpus — the library entry point
    * ([[graft.api.GraftApi.cosineTopK]]); both frames (vec_id, embedding).
    * The query's own vec_id is excluded from its neighbors. */
  private[graft] def cosineTopKOf(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val qn = qnormOf(vectors)
    val qs = qnormOf(queries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("nrm").as("q_nrm"))
    val pairs = qn.join(broadcast(qs), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        expr("graft_dot(qq, q)").as("dot"),
        col("q_nrm"), col("nrm"))
      .withColumn("cos", col("dot") / sqrt(col("q_nrm").cast("double") * col("nrm").cast("double")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), col("rk"), round(col("cos"), 6).as("cos_r"))
  }

  val sim1: Q = (s, d) =>
    cosineTopKOf(Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0), k = 5)
      .orderBy("q_id", "rk")
  val sim1Sql: String =
    s"""WITH $qnormCte,
       |dots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qn a JOIN qn b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm),
       |ranked AS (
       |  SELECT q_id, cand_id,
       |         dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) AS cos,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id)
       |           AS INTEGER) AS rk
       |  FROM dots)
       |SELECT q_id, cand_id, rk, round(cos, 6) AS cos_r
       |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  // ---- SIM2: hyperplane-LSH bucket assignment (coarse quantizer) ----

  /** Deterministic hyperplane weights w(p,i) = (first md5 hex digit of
    * "p-i") − 8, the exact formula the DuckDB oracle dialect computes in
    * SQL. Evaluated DRIVER-side (the planes are plan-time constants), so
    * bucket assignment becomes a map-side dot product against literal
    * arrays — zero explodes, zero joins, zero shuffles; the 100 TB plan
    * is a pure projection over the vector scan. */
  private[ops] def planeWeights(nPlanes: Int, dims: Int = 64): IndexedSeq[IndexedSeq[Long]] =
    (0 until nPlanes).map { p =>
      (0 until dims).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$p-$i".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 1), 16) - 8L
      }
    }

  /** Exact integer dot of a quantized-vector column against one plane. */
  private[ops] def planeDot(qCol: String, weights: IndexedSeq[Long]): Column =
    expr(s"aggregate(zip_with($qCol, array(${weights.map(w => s"${w}L").mkString(",")}), " +
      "(x, y) -> x * y), 0L, (acc, v) -> acc + v)")

  /** Sign-bit key over a slice of planes: '1'/'0' per plane, concatenated. */
  private[ops] def signBits(qCol: String, planes: Seq[IndexedSeq[Long]]): Column =
    concat(planes.map(w => when(planeDot(qCol, w) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** 8 md5-derived integer hyperplanes over 64 dims; bucket = 8 sign bits. */
  private def buckets(s: SparkSession, d: String): DataFrame =
    qnorm(s, d).select(col("vec_id"), signBits("q", planeWeights(8)).as("bucket"))

  private val bucketsCte: String =
    s"""$qnormCte,
       |planes AS (
       |  SELECT p, i, ('0x' || substr(md5(p::VARCHAR || '-' || i::VARCHAR), 1, 1))::BIGINT - 8 AS w
       |  FROM range(8) tp(p) CROSS JOIN range(64) ti(i)),
       |comps AS (
       |  SELECT vec_id, unnest(range(64)) AS i, unnest(q) AS x FROM qn),
       |signs AS (
       |  SELECT c.vec_id, pl.p,
       |         CASE WHEN sum(c.x * pl.w) >= 0 THEN '1' ELSE '0' END AS b
       |  FROM comps c JOIN planes pl ON c.i = pl.i
       |  GROUP BY c.vec_id, pl.p),
       |buckets AS (
       |  SELECT vec_id, string_agg(b, '' ORDER BY p) AS bucket
       |  FROM signs GROUP BY vec_id)""".stripMargin

  /** Bucket histogram — the quantizer balance check. */
  val sim2: Q = (s, d) =>
    buckets(s, d).groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("first_vec"))
      .orderBy("bucket")
  val sim2Sql: String =
    s"""WITH $bucketsCte
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs, min(vec_id) AS first_vec
       |FROM buckets GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---- SIM3: ANN search within LSH bucket (the composed scale path) ----

  val sim3: Q = (s, d) => {
    val qb = qnorm(s, d).join(buckets(s, d), "vec_id")
    val queries = qb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("nrm").as("q_nrm"),
        col("bucket").as("q_bucket"))
    val pairs = qb.join(broadcast(queries),
        col("vec_id") =!= col("q_id") && col("bucket") === col("q_bucket"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        expr("graft_dot(qq, q)").as("dot"),
        col("q_nrm"), col("nrm"))
      .withColumn("cos", col("dot") / sqrt(col("q_nrm").cast("double") * col("nrm").cast("double")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("q_id"), col("cand_id"), col("rk"), round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id", "rk")
  }
  val sim3Sql: String =
    s"""WITH $bucketsCte,
       |qb AS (SELECT qn.vec_id, qn.q, qn.nrm, bk.bucket
       |       FROM qn JOIN buckets bk ON qn.vec_id = bk.vec_id),
       |dots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qb a JOIN qb b
       |      ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id AND a.bucket = b.bucket)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm),
       |ranked AS (
       |  SELECT q_id, cand_id,
       |         dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) AS cos,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id)
       |           AS INTEGER) AS rk
       |  FROM dots)
       |SELECT q_id, cand_id, rk, round(cos, 6) AS cos_r
       |FROM ranked WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin

  // ---- SIM4: IVF-style ANN (centroid cells, probe = 1) ----

  /** IVF coarse quantizer with deterministic centroids (the 8 lowest-id
    * vectors stand in for trained k-means centers): every vector is assigned
    * to its max-cosine centroid (argmax over a BROADCAST centroid set —
    * map-side; the row_number is one shuffle on vec_id), then each query
    * searches only its own cell. The inverted-file structure is the cell
    * keying itself: at scale the assign output is written partitioned by
    * cell id, and a query touches 1/k of the corpus (nprobe=1). */
  val sim4: Q = (s, d) => {
    val qn = qnorm(s, d)
    val cent = qn.filter(col("vec_id") <= 8)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("nrm").as("cnrm"))
    val aw = Window.partitionBy("vec_id").orderBy(col("acos").desc, col("cid"))
    val assign = qn.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("q"), col("nrm"), col("cid"),
        expr("graft_dot(q, cq)").as("adot"),
        col("cnrm"))
      .withColumn("acos", col("adot") / sqrt(col("nrm").cast("double") * col("cnrm").cast("double")))
      .withColumn("ark", row_number().over(aw)).filter(col("ark") === 1)
      .select(col("vec_id"), col("q"), col("nrm"), col("cid"))
    val queries = assign.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("nrm").as("q_nrm"),
        col("cid").as("q_cid"))
    val pairs = assign.join(broadcast(queries),
        col("vec_id") =!= col("q_id") && col("cid") === col("q_cid"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        expr("graft_dot(qq, q)").as("dot"),
        col("q_nrm"), col("nrm"))
      .withColumn("cos", col("dot") / sqrt(col("q_nrm").cast("double") * col("nrm").cast("double")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("q_id"), col("cand_id"), col("rk"), round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id", "rk")
  }
  val sim4Sql: String =
    s"""WITH $qnormCte,
       |cent AS (SELECT vec_id AS cid, q AS cq, nrm AS cnrm FROM qn WHERE vec_id <= 8),
       |adots AS (
       |  SELECT vec_id, cid, CAST(sum(x * y) AS BIGINT) AS adot, nrm, cnrm FROM (
       |    SELECT a.vec_id, c.cid, a.nrm, c.cnrm, unnest(a.q) AS x, unnest(c.cq) AS y
       |    FROM qn a CROSS JOIN cent c)
       |  GROUP BY vec_id, cid, nrm, cnrm),
       |assign AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, CAST(row_number() OVER (PARTITION BY vec_id
       |      ORDER BY adot / sqrt(CAST(nrm AS DOUBLE) * CAST(cnrm AS DOUBLE)) DESC, cid)
       |      AS INTEGER) AS ark
       |    FROM adots) WHERE ark = 1),
       |qb AS (SELECT qn.vec_id, qn.q, qn.nrm, a.cid
       |       FROM qn JOIN assign a ON qn.vec_id = a.vec_id),
       |dots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qb a JOIN qb b
       |      ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id AND a.cid = b.cid)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm),
       |ranked AS (
       |  SELECT q_id, cand_id,
       |         dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) AS cos,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id)
       |           AS INTEGER) AS rk
       |  FROM dots)
       |SELECT q_id, cand_id, rk, round(cos, 6) AS cos_r
       |FROM ranked WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin

  // ---- SIM5: int8 scalar-quantized ANN (the bandwidth-optimized path) ----

  /** Per-vector symmetric int8 quantization in PURE integer arithmetic:
    * mx = max|q_i|, q8_i = ((q_i + mx)·127) div (2·mx) − 64 ∈ [−64, 63].
    * The shifted numerator is never negative, so truncating division
    * behaves identically in Spark (`div`) and DuckDB (`//`) — no float
    * rounding anywhere, bit-exact across engines. At scale the q8 vectors
    * are the stored search structure: 8× smaller than float64 (1 byte per
    * dim as TINYINT/binary), so a brute-force or bucketed scan moves 8×
    * less data for near-identical ranking (recall asserted in
    * SimilaritySpec). Values stay in an ARRAY<BIGINT> here so the
    * codegen'd `graft_dot` runs unchanged. */
  private[graft] def quantizeInt8Of(vectors: DataFrame): DataFrame =
    qnormOf(vectors)
      .withColumn("mx", expr("array_max(transform(q, x -> abs(x)))"))
      .select(col("vec_id"),
        expr("transform(q, x -> (((x + mx) * 127) div (2 * mx)) - 64)").as("q8"))
      .withColumn("n8", expr("graft_dot(q8, q8)"))

  private val q8Cte: String =
    s"""$qnormCte,
       |q8n AS (
       |  SELECT vec_id, q8, CAST(list_sum(list_transform(q8, x -> x * x)) AS BIGINT) AS n8
       |  FROM (SELECT vec_id,
       |          list_transform(q, x -> ((x + mx) * 127) // (2 * mx) - 64) AS q8
       |        FROM (SELECT vec_id, q,
       |                list_max(list_transform(q, x -> abs(x))) AS mx FROM qn)))""".stripMargin

  /** Quantized brute-force cosine top-k — sim1's plan shape over the int8
    * vectors (query side broadcast, one window rank). Exact int64 dots of
    * int8 components; the only double op is the final norm division,
    * identical in both engines. The library entry point
    * ([[graft.api.GraftApi.quantizedCosineTopK]]). */
  private[graft] def quantizedCosineTopKOf(vectors: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val qn = quantizeInt8Of(vectors)
    val qs = quantizeInt8Of(queries)
      .select(col("vec_id").as("q_id"), col("q8").as("qq"), col("n8").as("q_n8"))
    val pairs = qn.join(broadcast(qs), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        expr("graft_dot(qq, q8)").as("dot"), col("q_n8"), col("n8"))
      .withColumn("cos", col("dot") / sqrt(col("q_n8").cast("double") * col("n8").cast("double")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), col("rk"), round(col("cos"), 6).as("cos_r"))
  }

  val sim5: Q = (s, d) =>
    quantizedCosineTopKOf(Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0), k = 5)
      .orderBy("q_id", "rk")
  val sim5Sql: String =
    s"""WITH $q8Cte,
       |dots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_n8, c_n8 FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.n8 AS q_n8, b.n8 AS c_n8,
       |           unnest(a.q8) AS xa, unnest(b.q8) AS xb
       |    FROM q8n a JOIN q8n b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id)
       |  GROUP BY q_id, cand_id, q_n8, c_n8),
       |ranked AS (
       |  SELECT q_id, cand_id,
       |         dot / sqrt(CAST(q_n8 AS DOUBLE) * CAST(c_n8 AS DOUBLE)) AS cos,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY dot / sqrt(CAST(q_n8 AS DOUBLE) * CAST(c_n8 AS DOUBLE)) DESC, cand_id)
       |           AS INTEGER) AS rk
       |  FROM dots)
       |SELECT q_id, cand_id, rk, round(cos, 6) AS cos_r
       |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  // ---- SIM7: two-stage retrieval (quantized prefilter → exact rerank) ----

  /** SIM7: the production ANN shape — a CHEAP int8 pass over the whole
    * corpus selects 32 candidates per query, then the EXPENSIVE
    * full-precision cosine runs only on those 32 (stage-2 touches
    * k1·|Q| rows, never the corpus). At 100 TB the first pass scans the
    * 8×-smaller quantized structure and the full-precision vectors are
    * fetched by candidate id — bandwidth goes to the cheap
    * representation, precision to a bounded rerank. Both stages rank
    * deterministically (integer dots, one double division, cand_id
    * tie-break), so the composition is oracle-exact end to end. */
  private[graft] def rerankTopKOf(vectors: DataFrame, queries: DataFrame,
      k1: Int, k: Int): DataFrame = {
    val stage1 = quantizedCosineTopKOf(vectors, queries, k1)
      .select(col("q_id"), col("cand_id"))
    val qn = qnormOf(vectors)
    val qs = qnormOf(queries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("nrm").as("q_nrm"))
    val pairs = stage1
      .join(qn, stage1("cand_id") === qn("vec_id"))
      .join(broadcast(qs), Seq("q_id"))
      .select(col("q_id"), col("cand_id"),
        expr("graft_dot(qq, q)").as("dot"), col("q_nrm"), col("nrm"))
      .withColumn("cos", col("dot") / sqrt(col("q_nrm").cast("double") * col("nrm").cast("double")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), col("rk"), round(col("cos"), 6).as("cos_r"))
  }

  val sim7: Q = (s, d) =>
    rerankTopKOf(Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0), k1 = 32, k = 5)
      .orderBy("q_id", "rk")
  val sim7Sql: String =
    s"""WITH $q8Cte,
       |d8s AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_n8, c_n8 FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.n8 AS q_n8, b.n8 AS c_n8,
       |           unnest(a.q8) AS xa, unnest(b.q8) AS xb
       |    FROM q8n a JOIN q8n b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id)
       |  GROUP BY q_id, cand_id, q_n8, c_n8),
       |stage1 AS (
       |  SELECT q_id, cand_id FROM (
       |    SELECT q_id, cand_id,
       |           row_number() OVER (PARTITION BY q_id
       |             ORDER BY dot / sqrt(CAST(q_n8 AS DOUBLE) * CAST(c_n8 AS DOUBLE)) DESC, cand_id)
       |             AS rk
       |    FROM d8s)
       |  WHERE rk <= 32),
       |exact AS (
       |  SELECT s.q_id, s.cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot,
       |         qa.nrm AS q_nrm, qb.nrm AS c_nrm FROM (
       |    SELECT s1.q_id, s1.cand_id, unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM stage1 s1
       |    JOIN qn a ON a.vec_id = s1.q_id
       |    JOIN qn b ON b.vec_id = s1.cand_id) s
       |  JOIN qn qa ON qa.vec_id = s.q_id
       |  JOIN qn qb ON qb.vec_id = s.cand_id
       |  GROUP BY s.q_id, s.cand_id, qa.nrm, qb.nrm),
       |ranked AS (
       |  SELECT q_id, cand_id,
       |         dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) AS cos,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id)
       |           AS INTEGER) AS rk
       |  FROM exact)
       |SELECT q_id, cand_id, rk, round(cos, 6) AS cos_r
       |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  // ---- SIM6: IVF with nprobe = 2 (the recall knob) ----

  /** sim4's IVF search with the query probing its TOP-2 centroid cells
    * instead of 1 — the standard recall/cost knob: corpus vectors stay
    * assigned to exactly one cell (the inverted file is unchanged), only
    * the query fans out, so cost scales linearly in nprobe while recall
    * approaches brute force. Same broadcast-centroid argmax, same
    * window top-k; the only change is `ark <= 2` on the QUERY side. */
  val sim6: Q = (s, d) => {
    val qn = qnorm(s, d)
    val cent = qn.filter(col("vec_id") <= 8)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("nrm").as("cnrm"))
    val aw = Window.partitionBy("vec_id").orderBy(col("acos").desc, col("cid"))
    val ranked = qn.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("q"), col("nrm"), col("cid"),
        expr("graft_dot(q, cq)").as("adot"), col("cnrm"))
      .withColumn("acos", col("adot") / sqrt(col("nrm").cast("double") * col("cnrm").cast("double")))
      .withColumn("ark", row_number().over(aw))
    val assign = ranked.filter(col("ark") === 1)
      .select(col("vec_id"), col("q"), col("nrm"), col("cid"))
    val queries2 = ranked.filter(col("ark") <= 2 && col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("nrm").as("q_nrm"),
        col("cid").as("q_cid"))
    val pairs = assign.join(broadcast(queries2),
        col("vec_id") =!= col("q_id") && col("cid") === col("q_cid"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        expr("graft_dot(qq, q)").as("dot"), col("q_nrm"), col("nrm"))
      .withColumn("cos", col("dot") / sqrt(col("q_nrm").cast("double") * col("nrm").cast("double")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("q_id"), col("cand_id"), col("rk"), round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id", "rk")
  }
  val sim6Sql: String =
    s"""WITH $qnormCte,
       |cent AS (SELECT vec_id AS cid, q AS cq, nrm AS cnrm FROM qn WHERE vec_id <= 8),
       |adots AS (
       |  SELECT vec_id, cid, CAST(sum(x * y) AS BIGINT) AS adot, nrm, cnrm FROM (
       |    SELECT a.vec_id, c.cid, a.nrm, c.cnrm, unnest(a.q) AS x, unnest(c.cq) AS y
       |    FROM qn a CROSS JOIN cent c)
       |  GROUP BY vec_id, cid, nrm, cnrm),
       |ranked AS (
       |  SELECT vec_id, cid, CAST(row_number() OVER (PARTITION BY vec_id
       |    ORDER BY adot / sqrt(CAST(nrm AS DOUBLE) * CAST(cnrm AS DOUBLE)) DESC, cid)
       |    AS INTEGER) AS ark
       |  FROM adots),
       |assign AS (SELECT vec_id, cid FROM ranked WHERE ark = 1),
       |qprobe AS (SELECT vec_id, cid FROM ranked WHERE ark <= 2 AND vec_id % 50 = 0),
       |qb AS (SELECT qn.vec_id, qn.q, qn.nrm, a.cid
       |       FROM qn JOIN assign a ON qn.vec_id = a.vec_id),
       |qs AS (SELECT qn.vec_id, qn.q, qn.nrm, p.cid
       |       FROM qn JOIN qprobe p ON qn.vec_id = p.vec_id),
       |dots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qs a JOIN qb b ON b.vec_id <> a.vec_id AND a.cid = b.cid)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm),
       |ranked2 AS (
       |  SELECT q_id, cand_id,
       |         dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) AS cos,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id)
       |           AS INTEGER) AS rk
       |  FROM dots)
       |SELECT q_id, cand_id, rk, round(cos, 6) AS cos_r
       |FROM ranked2 WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin

  // ---- SIM8: LSH recall measurement (exact top-k vs single-probe bucket) ----

  /** SIM8: recall INSTRUMENTATION for the ANN path — "measure, don't
    * guess": for each query, how many of its EXACT cosine top-5 live in
    * the query's own 8-plane LSH bucket, i.e. the recall ceiling of the
    * single-probe scan sim3 runs. Per query: (q_id, n_reachable,
    * recall_bp). The mean of recall_bp over queries is the number a
    * production deployment tracks before trusting sim3 over sim1; a
    * quantizer regression (e.g. a broken plane) shows up here as a
    * recall collapse while sim3 alone still "passes" (it returns
    * whatever its bucket holds).
    *
    * Scale: the exact side is the sim1 brute-force plan (broadcast query
    * set × corpus — the measurement is run over a SAMPLE of queries, as
    * here via % 50); the bucket lookups are one corpus-keyed equi-join
    * on the 5·|queries| result rows plus one broadcast join for the
    * query buckets. */
  val sim8: Q = (s, d) => {
    val bk = buckets(s, d)
    val exact = cosineTopKOf(Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0), k = 5)
    exact
      .join(bk.select(col("vec_id").as("cand_id"), col("bucket").as("c_bucket")), "cand_id")
      .join(broadcast(bk.select(col("vec_id").as("q_id"), col("bucket").as("q_bucket"))), "q_id")
      .groupBy("q_id")
      .agg(sum(when(col("c_bucket") === col("q_bucket"), 1L).otherwise(0L)).as("n_reachable"))
      .select(col("q_id"), col("n_reachable"),
        expr("n_reachable * 10000 div 5").as("recall_bp"))
      .orderBy("q_id")
  }
  val sim8Sql: String =
    s"""WITH $bucketsCte,
       |dots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qn a JOIN qn b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm),
       |ranked AS (
       |  SELECT q_id, cand_id,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id)
       |           AS INTEGER) AS rk
       |  FROM dots),
       |hits AS (
       |  SELECT r.q_id,
       |         CAST(sum(CASE WHEN bc.bucket = bq.bucket THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_reachable
       |  FROM ranked r
       |  JOIN buckets bc ON r.cand_id = bc.vec_id
       |  JOIN buckets bq ON r.q_id = bq.vec_id
       |  WHERE r.rk <= 5 GROUP BY r.q_id)
       |SELECT q_id, n_reachable, n_reachable * 10000 // 5 AS recall_bp
       |FROM hits ORDER BY q_id""".stripMargin

  // ---- MMR1: maximal-marginal-relevance diversified top-k ----

  /** MMR-diversified top-5 (Carbonell–Goldstein SIGIR'98) over each
    * query's exact top-20 cosine candidates, λ = 0.7 — the RAG retrieval
    * step that trades relevance against redundancy. The library entry
    * point ([[graft.api.GraftApi.mmrDiverseTopK]]).
    *
    * Exactness: relevance and pairwise similarity are rounded to integer
    * micro-cosines first, so every greedy score is exact int64
    * (score_e7 = 7·rel_e6 − 3·max-sim_e6; λ in exact tenths) and the
    * argmax ordering matches DuckDB bit-for-bit (ties break on cand_id).
    *
    * Scale: after the sim1-shaped candidate stage (query side broadcast,
    * one window rank), EVERYTHING is per-query-bounded: the pairwise
    * frame is |Q|·20·19 rows, and the 4 unrolled greedy steps join
    * frames of ≤ |Q|·20 rows each. The candidate and pair frames are
    * localCheckpoint-ed because five steps re-read them — without the
    * snapshot the brute-force scan would replay per step. */
  private[graft] def mmrDiverseTopKOf(vectors: DataFrame, queries: DataFrame,
      nCand: Int = 20, k: Int = 5, bucketed: Boolean = false): DataFrame = {
    // bucketed=true swaps the brute-force candidate scan for the sim3 LSH
    // path: both sides get an 8-plane sign-bit bucket and the broadcast
    // join adds bucket equality, so each query's candidate stage touches
    // ~1/2^8 of the corpus instead of all of it. The greedy re-rank
    // downstream is UNCHANGED (same exact integer scores) — only candidate
    // recall changes, which the mmr2-vs-mmr1 overlap spec quantifies (the
    // sim8 discipline). A query whose bucket holds < k neighbours simply
    // emits fewer ranks — identical semantics in the DuckDB oracle.
    val qn0 = qnormOf(vectors)
    val qs0 = qnormOf(queries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("nrm").as("q_nrm"))
    val (qn, qs, joinCond) =
      if (!bucketed) (qn0, qs0, col("vec_id") =!= col("q_id"))
      else (qn0.withColumn("bucket", signBits("q", planeWeights(8))),
        qs0.withColumn("q_bucket", signBits("qq", planeWeights(8))),
        col("vec_id") =!= col("q_id") && col("bucket") === col("q_bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    val cand = qn.join(broadcast(qs), joinCond)
      .select(col("q_id"), col("vec_id").as("cand_id"),
        expr("graft_dot(qq, q)").as("dot"), col("q_nrm"), col("nrm"))
      .withColumn("cos", col("dot") / sqrt(col("q_nrm").cast("double") * col("nrm").cast("double")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= nCand)
      .select(col("q_id"), col("cand_id"),
        expr("CAST(round(cos * 1000000) AS BIGINT)").as("rel_e6"))
      .localCheckpoint(true)
    val cv = cand.join(qn, cand("cand_id") === qn("vec_id"))
      .select(col("q_id"), col("cand_id"), col("q"), col("nrm"))
    val pi = cv.select(col("q_id"), col("cand_id").as("pa"), col("q").as("qa"), col("nrm").as("na"))
    val pj = cv.select(col("q_id").as("q_id2"), col("cand_id").as("pb"), col("q").as("qb"), col("nrm").as("nb"))
    val pairs = pi.join(pj, col("q_id") === col("q_id2") && col("pa") =!= col("pb"))
      .select(col("q_id"), col("pa"), col("pb"),
        expr("CAST(round(graft_dot(qa, qb) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("sim_e6"))
    // The greedy selection runs PER QUERY over ≤ nCand candidates and
    // ≤ nCand² pairwise sims — a bounded LOCAL computation. Round 11
    // replaced the former k-step driver loop (per step: an anti-join, a
    // penalty aggregate and a rank window — ~3·k shuffles of tiny
    // frames, pure stage machinery) with one fold over per-query
    // ARRAYS: candidates and the sim map collect into two bounded
    // columns, and `aggregate(sequence(1, k), …)` replays the exact
    // greedy recurrence (score = 7·rel − 3·max sim-to-selected, ties →
    // lowest cand_id via the (score, −id) struct max) in a single
    // projection. Semantics are bit-identical — the DuckDB oracle's
    // unrolled loop is unchanged — but the plan is 2 aggregates instead
    // of 3·k shuffles. The HOF is interpreted, but it touches k·nCand·k
    // elements per QUERY row, not per corpus row (the d11 lesson does
    // not bite: inputs are bound columns, never re-split expressions).
    val candArr = cand.groupBy("q_id").agg(
      array_sort(collect_list(struct(col("cand_id").as("id"), col("rel_e6").as("rel"))))
        .as("cands"))
    val simMap = pairs.groupBy("q_id").agg(
      map_from_entries(collect_list(struct(
        concat(col("pa").cast("string"), lit(":"), col("pb").cast("string")),
        col("sim_e6")))).as("smap"))
    val scored = "transform(filter(cands, c -> !exists(acc, a -> a.id = c.id)), " +
      "c -> named_struct(" +
      "'s', 7L * c.rel - 3L * coalesce(array_max(transform(acc, " +
      "a -> element_at(smap, concat(CAST(c.id AS STRING), ':', CAST(a.id AS STRING))))), 0L), " +
      "'negid', -c.id))"
    val greedy =
      s"""aggregate(sequence(1, $k),
         |  CAST(array() AS ARRAY<STRUCT<id: BIGINT, rk: BIGINT, s: BIGINT>>),
         |  (acc, step) -> CASE WHEN size(acc) >= size(cands) THEN acc ELSE
         |    concat(acc, array(named_struct(
         |      'id', -array_max($scored).negid,
         |      'rk', CAST(size(acc) + 1 AS BIGINT),
         |      's', array_max($scored).s))) END)""".stripMargin
    candArr.join(simMap, Seq("q_id"), "left")
      .withColumn("smap", coalesce(col("smap"), expr("CAST(map() AS MAP<STRING, BIGINT>)")))
      .select(col("q_id"), explode(expr(greedy)).as("pick"))
      .select(col("q_id"), col("pick.id").as("cand_id"),
        col("pick.rk").as("rk"), col("pick.s").as("score_e7"))
  }

  val mmr1: Q = (s, d) =>
    mmrDiverseTopKOf(Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0))
      .orderBy("q_id", "rk")
  /** Shared greedy-MMR oracle tail: `prologue` must open the WITH chain
    * (including a `qn` CTE) and end with a
    * `dots(q_id, cand_id, dot, q_nrm, c_nrm)` CTE — the candidate stage
    * is the ONLY thing mmr1 (brute force) and mmr2 (LSH-bucketed)
    * disagree on; the ranked-candidate cut, pairwise sims and the four
    * unrolled greedy steps are one definition (no string surgery). */
  private def mmrGreedySql(prologue: String): String = {
    // DuckDB inlines plain CTEs per reference; the recursive selK chain
    // references each predecessor 3x, which would re-inline (and re-run)
    // the pairwise-dot pipeline ~3^4 times at scale — AS MATERIALIZED
    // pins every multiply-referenced CTE to one execution.
    // one unrolled greedy step: pick argmax of 7·rel − 3·max-sim-to-selected
    def step(selPrev: String, k: Int, out: String): String =
      s"""scored$k AS MATERIALIZED (
         |  SELECT c.q_id, c.cand_id,
         |         CAST(7 * c.rel_e6 - 3 * max(p.sim_e6) AS BIGINT) AS score_e7
         |  FROM cand c
         |  JOIN pr p ON p.q_id = c.q_id AND p.pa = c.cand_id
         |  JOIN $selPrev s ON s.q_id = p.q_id AND s.cand_id = p.pb
         |  WHERE NOT EXISTS (SELECT 1 FROM $selPrev x
         |                    WHERE x.q_id = c.q_id AND x.cand_id = c.cand_id)
         |  GROUP BY c.q_id, c.cand_id, c.rel_e6),
         |pick$k AS MATERIALIZED (
         |  SELECT q_id, cand_id, CAST($k AS BIGINT) AS rk, score_e7 FROM (
         |    SELECT q_id, cand_id, score_e7,
         |           row_number() OVER (PARTITION BY q_id ORDER BY score_e7 DESC, cand_id) AS r
         |    FROM scored$k) WHERE r = 1),
         |$out AS MATERIALIZED (SELECT q_id, cand_id, rk, score_e7 FROM $selPrev
         |         UNION ALL SELECT q_id, cand_id, rk, score_e7 FROM pick$k)""".stripMargin
    s"""$prologue,
       |cand AS MATERIALIZED (
       |  SELECT q_id, cand_id,
       |         CAST(round(dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) * 1000000)
       |           AS BIGINT) AS rel_e6
       |  FROM (SELECT q_id, cand_id, dot, q_nrm, c_nrm,
       |          row_number() OVER (PARTITION BY q_id
       |            ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id) AS rk
       |        FROM dots) WHERE rk <= 20),
       |pr AS MATERIALIZED (
       |  SELECT i.q_id, i.cand_id AS pa, j.cand_id AS pb,
       |         CAST(round(CAST(pd.dot AS DOUBLE)
       |           / sqrt(CAST(pd.na AS DOUBLE) * CAST(pd.nb AS DOUBLE)) * 1000000) AS BIGINT) AS sim_e6
       |  FROM cand i JOIN cand j ON i.q_id = j.q_id AND i.cand_id <> j.cand_id
       |  JOIN (
       |    SELECT va, vb, CAST(sum(xa * xb) AS BIGINT) AS dot, any_value(nna) AS na, any_value(nnb) AS nb
       |    FROM (SELECT a.vec_id AS va, b.vec_id AS vb, a.nrm AS nna, b.nrm AS nnb,
       |                 unnest(a.q) AS xa, unnest(b.q) AS xb
       |          FROM qn a JOIN qn b ON a.vec_id <> b.vec_id
       |          WHERE a.vec_id IN (SELECT cand_id FROM cand)
       |            AND b.vec_id IN (SELECT cand_id FROM cand))
       |    GROUP BY va, vb) pd ON pd.va = i.cand_id AND pd.vb = j.cand_id),
       |sel1 AS MATERIALIZED (
       |  SELECT q_id, cand_id, CAST(1 AS BIGINT) AS rk, CAST(7 * rel_e6 AS BIGINT) AS score_e7 FROM (
       |    SELECT q_id, cand_id, rel_e6,
       |           row_number() OVER (PARTITION BY q_id ORDER BY rel_e6 DESC, cand_id) AS r
       |    FROM cand) WHERE r = 1),
       |${step("sel1", 2, "sel2")},
       |${step("sel2", 3, "sel3")},
       |${step("sel3", 4, "sel4")},
       |${step("sel4", 5, "sel5")}
       |SELECT q_id, cand_id, rk, score_e7 FROM sel5 ORDER BY q_id, rk""".stripMargin
  }

  val mmr1Sql: String = mmrGreedySql(
    s"""WITH $qnormCte,
       |dots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qn a JOIN qn b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm)""".stripMargin)

  // ---- MMR2: MMR over the LSH-bucketed candidate stage ----

  /** MMR2 = the VERDICT-r10 scale fix for mmr1: identical greedy
    * diversification, but the candidate stage rides the sim3 LSH-bucket
    * path instead of the brute-force corpus scan — the shape that
    * survives 100 TB (per-query work is bucket-sized, not corpus-sized).
    * mmr1 stays as the exact baseline; the recall cost of the swap is
    * pinned by the overlap case in `CurationSpec`. */
  val mmr2: Q = (s, d) =>
    mmrDiverseTopKOf(Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0),
      bucketed = true)
      .orderBy("q_id", "rk")
  val mmr2Sql: String = mmrGreedySql(
    s"""WITH $bucketsCte,
       |qb AS (SELECT qn.vec_id, qn.q, qn.nrm, bk.bucket
       |       FROM qn JOIN buckets bk ON qn.vec_id = bk.vec_id),
       |dots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qb a JOIN qb b
       |      ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id AND a.bucket = b.bucket)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm)""".stripMargin)

  // ---- EMB4: Matryoshka prefix-dim retrieval recall ----

  /** EMB4: the Matryoshka-representation audit (Kusupati et al.
    * NeurIPS 2022): retrieve with only the FIRST `dims` dimensions (the
    * cheap nested prefix a 4× smaller index would store) and measure,
    * per query, how much of the full-dimension exact top-k survives —
    * the number that decides whether truncated embeddings are safe for
    * first-stage retrieval. Per query: (q_id, n_hits, recall_bp).
    *
    * Exactness: both rankings are the sim1 integer-dot machinery (the
    * prefix side just slices the quantized arrays before the identical
    * dot/norm/rank pipeline), and the overlap count is an integer join —
    * hash-exact. Scale: two sim1-shaped passes (brute-force by intent —
    * this is instrumentation, like sim8); production would run it on a
    * sampled query set. */
  private[graft] def matryoshkaRecallOf(vectors: DataFrame, queries: DataFrame,
      dims: Int = 16, k: Int = 3): DataFrame = {
    def prefixed(df: DataFrame): DataFrame = qnormOf(df)
      .select(col("vec_id"), expr(s"slice(q, 1, $dims)").as("q"))
      .withColumn("nrm", expr("graft_dot(q, q)"))
      .filter(col("nrm") > 0)
    val pn = prefixed(vectors)
    val ps = prefixed(queries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    val prefTop = pn.join(broadcast(ps), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        expr("graft_dot(qq, q)").as("dot"), col("q_nrm"), col("nrm"))
      .withColumn("cos", col("dot") / sqrt(col("q_nrm").cast("double") * col("nrm").cast("double")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), lit(1).as("hit"))
    cosineTopKOf(vectors, queries, k)
      .select(col("q_id"), col("cand_id"))
      .join(prefTop, Seq("q_id", "cand_id"), "left")
      .groupBy("q_id")
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(col("q_id"), col("n_hits").cast("long").as("n_hits"),
        expr(s"CAST(n_hits * 10000 div $k AS BIGINT)").as("recall_bp"))
  }

  val emb4: Q = (s, d) =>
    matryoshkaRecallOf(Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0))
      .orderBy("q_id")
  val emb4Sql: String =
    s"""WITH $qnormCte,
       |pn AS (
       |  SELECT vec_id, list_slice(q, 1, 16) AS q,
       |         CAST(list_sum(list_transform(list_slice(q, 1, 16), x -> x * x)) AS BIGINT) AS nrm
       |  FROM qn),
       |pnn AS (SELECT * FROM pn WHERE nrm > 0),
       |pdots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM pnn a JOIN pnn b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm),
       |ptop AS (
       |  SELECT q_id, cand_id FROM (
       |    SELECT q_id, cand_id,
       |           row_number() OVER (PARTITION BY q_id
       |             ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id) AS rk
       |    FROM pdots) WHERE rk <= 3),
       |fdots AS (
       |  SELECT q_id, cand_id, CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS cand_id, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qn a JOIN qn b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id)
       |  GROUP BY q_id, cand_id, q_nrm, c_nrm),
       |ftop AS (
       |  SELECT q_id, cand_id FROM (
       |    SELECT q_id, cand_id,
       |           row_number() OVER (PARTITION BY q_id
       |             ORDER BY dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) DESC, cand_id) AS rk
       |    FROM fdots) WHERE rk <= 3)
       |SELECT f.q_id, CAST(sum(CASE WHEN p.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(sum(CASE WHEN p.cand_id IS NOT NULL THEN 1 ELSE 0 END) * 10000 // 3 AS BIGINT) AS recall_bp
       |FROM ftop f LEFT JOIN ptop p ON p.q_id = f.q_id AND p.cand_id = f.cand_id
       |GROUP BY f.q_id ORDER BY f.q_id""".stripMargin

  // ---- EMB5: top principal direction by exact-integer power iteration ----

  private val Emb5Iters = 3

  /** EMB5: the corpus's top principal direction (dominant eigenvector of
    * the un-centered Gram matrix XᵀX) by matrix-free power iteration —
    * the primitive behind embedding post-processing like all-but-the-top
    * (Mu & Viswanath, ICLR 2018: removing the dominant common direction
    * improves isotropy and downstream retrieval) and whitening. Wholly
    * EXACT across engines: vectors are the e3-quantized integers (the
    * sim1 contract), v₀ = all-ones·10³, and each iteration is
    *   dotᵢ = Σ_j qᵢⱼ·vⱼ  (int64)  →  sⱼ = Σᵢ dotᵢ·qᵢⱼ  (DECIMAL(38,0)
    * — the corpus-scale sum wraps int64 past ~10⁹ vectors)  →
    *   v′ⱼ = sign(sⱼ)·(|sⱼ|·10³ div max|s|)
    * (the sign-split keeps the integral division truncation-identical in
    * Spark (`div`, toward zero) and DuckDB (`//`, floor) — they differ
    * on negatives). Deterministic start ⇒ deterministic sign ⇒ the
    * DuckDB replay (iterations unrolled as CTEs) hash-matches exactly.
    *
    * Scale: one corpus scan per iteration; the per-dim fold is a
    * map-side-combined 64-row aggregate, the 64-long v crosses the
    * driver between iterations (the sim9-codebook class of justified
    * collect), and the final normalization stays in-frame off the
    * broadcast 1-row max. No dims×dims matrix is ever materialized.
    * Library entry point: [[graft.api.GraftApi.topPrincipalDirection]]. */
  private[graft] def topPrincipalOf(vectors: DataFrame, iters: Int = Emb5Iters): DataFrame = {
    require(iters >= 1, s"power iteration needs at least one step, got $iters")
    val qn = qnormOf(vectors).select("vec_id", "q")
    var v: IndexedSeq[BigInt] = IndexedSeq.fill(64)(BigInt(1000))
    def vLit = s"array(${v.map(x => s"${x}L").mkString(",")})"
    def sFrame = qn
      .withColumn("dot", expr(s"graft_dot(q, $vLit)"))
      .select(col("dot"), posexplode(col("q")).as(Seq("j", "x")))
      .groupBy("j").agg(sum(expr("CAST(dot AS DECIMAL(38,0)) * x")).as("s"))
    for (_ <- 1 until iters) {
      // 64 rows cross the driver — the next iteration's v is a plan literal
      val rows = sFrame.collect().map(r => (r.getInt(0), BigInt(r.getDecimal(1).toBigInteger)))
      val m = rows.map(_._2.abs).max.max(BigInt(1))
      v = rows.sortBy(_._1).map { case (_, s) => s.sign * (s.abs * 1000 / m) }.toIndexedSeq
    }
    val s = sFrame
    s.crossJoin(broadcast(s.agg(greatest(max(abs(col("s"))), lit(1)).as("m"))))
      .select(col("j").cast("long").as("dim"),
        expr("CAST(CASE WHEN s < 0 THEN -((-s) * 1000 div m) ELSE (s * 1000 div m) END AS BIGINT)")
          .as("v_e3"))
      .orderBy("dim")
  }

  val emb5: Q = (s, d) => topPrincipalOf(Tables.embeddings(s, d))

  /** The unrolled power-iteration CTE chain ending in `l$Emb5Iters(vl)`
    * — v carried as an ordered list between blocks, HUGEINT folds, and
    * the sign-split floor/trunc-proof division. A shared constant for
    * emb5Sql and emb6Sql (not string surgery — the cl2Sql lesson). */
  private val emb5Ctes: String = {
    def iterBlock(n: Int, dotExpr: String): String =
      s"""d$n AS (
         |  SELECT vec_id, q, CAST($dotExpr AS BIGINT) AS dot FROM qn${if (n > 1) s", l${n - 1}" else ""}),
         |s$n AS (
         |  SELECT j, CAST(sum(CAST(dot AS HUGEINT) * q[CAST(j AS INTEGER)]) AS HUGEINT) AS s
         |  FROM d$n CROSS JOIN generate_series(1, 64) t(j)
         |  GROUP BY j),
         |m$n AS (SELECT greatest(max(abs(s)), 1) AS m FROM s$n),
         |v$n AS (
         |  SELECT j, CAST(CASE WHEN s < 0 THEN -((-s) * 1000 // m) ELSE s * 1000 // m END AS BIGINT) AS v
         |  FROM s$n, m$n),
         |l$n AS (SELECT list(v ORDER BY j) AS vl FROM v$n)""".stripMargin
    val blocks = (1 to Emb5Iters).map { n =>
      val dot = if (n == 1) "1000 * list_sum(q)"
        else s"list_sum(list_transform(generate_series(1, 64), j -> q[CAST(j AS INTEGER)] * vl[CAST(j AS INTEGER)]))"
      iterBlock(n, dot)
    }.mkString(",\n")
    s"""$qnormCte,
       |$blocks""".stripMargin
  }

  /** emb5's oracle: the shared iteration chain + the dim projection. */
  val emb5Sql: String =
    s"""WITH $emb5Ctes
       |SELECT j - 1 AS dim, v AS v_e3 FROM v$Emb5Iters ORDER BY dim""".stripMargin

  // ---- EMB6: common-direction energy (the all-but-the-top diagnostic) ----

  /** EMB6: how much of the corpus's embedding energy sits on the
    * dominant common direction — the diagnostic that decides whether
    * all-but-the-top post-processing (Mu & Viswanath, ICLR 2018) is
    * worth applying, broken out PER LABEL (a label whose vectors load
    * heavily on the common direction is poorly separated from the rest
    * under cosine). share_e6 = 10⁶·Σᵢ(qᵢ·v)² div (|v|²·Σᵢ|qᵢ|²) with v
    * = emb5's power-iteration direction; every term is integer
    * (DECIMAL(38,0)/HUGEINT — (q·v)² reaches ~10¹⁷ per vector and the
    * corpus sum wraps int64 past ~10² vectors, well inside decimal
    * headroom at any corpus size). Removing the projection zeroes this
    * EXACTLY (x′·v = q·v·|v|² − (q·v)·|v|² = 0, pinned in
    * `DedupSimSpec`) — the energy share is the entire before/after
    * story, with no pairwise isotropy scan needed.
    *
    * Scale: emb5's three scans learn v (64 longs through the driver),
    * then ONE more scan folds the per-label energy — label count is
    * bounded, so the final frame is tiny. Library entry point:
    * [[graft.api.GraftApi.commonDirectionEnergy]]. */
  private[graft] def commonEnergyOf(vectors: DataFrame): DataFrame = {
    val v = topPrincipalOf(vectors).collect().map(r => r.getLong(1))
    val v2 = v.map(x => BigInt(x) * x).sum
    val vLit = s"array(${v.map(x => s"${x}L").mkString(",")})"
    qnormOf(vectors)
      .join(vectors.select(col("vec_id"), col("label")), Seq("vec_id"))
      .withColumn("pv", expr(s"graft_dot(q, $vLit)"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("CAST(pv AS DECIMAL(38,0)) * pv")).as("e_top"),
        sum(expr("CAST(nrm AS DECIMAL(38,0))")).as("e_all"))
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        expr(s"CAST(1000000 * e_top div (CAST(${v2}L AS DECIMAL(38,0)) * e_all) AS BIGINT)")
          .as("share_e6"))
      .orderBy("label")
  }

  val emb6: Q = (s, d) => commonEnergyOf(Tables.embeddings(s, d))

  /** emb6's oracle: emb5's shared power-iteration chain gives l3's `vl`;
    * the energy fold reuses it per label. */
  val emb6Sql: String = {
    s"""WITH $emb5Ctes,
       |vsq AS (SELECT CAST(list_sum(list_transform(vl, x -> CAST(x AS HUGEINT) * x)) AS HUGEINT) AS v2
       |       FROM l$Emb5Iters),
       |pv AS (
       |  SELECT e.label, qn.nrm,
       |         CAST(list_sum(list_transform(generate_series(1, 64),
       |           j -> qn.q[CAST(j AS INTEGER)] * vl[CAST(j AS INTEGER)])) AS BIGINT) AS pv
       |  FROM qn JOIN embeddings e USING (vec_id) CROSS JOIN l$Emb5Iters)
       |SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
       |       CAST(1000000 * sum(CAST(pv AS HUGEINT) * pv)
       |         // (vsq.v2 * sum(CAST(nrm AS HUGEINT))) AS BIGINT) AS share_e6
       |FROM pv CROSS JOIN vsq
       |GROUP BY label, vsq.v2 ORDER BY label""".stripMargin
  }

  // ---- EMB7: isotropy / anisotropy audit via the sum-vector identity ----

  /** Per-(label, dim) component sums — one additive-monoid half of
    * emb7's sufficient statistics (the other is [[isotropyNormStatsOf]]).
    * Split out so the streaming twin can merge per-batch deltas by
    * plain SUM and finish through the identical [[isotropyFromStats]]. */
  private[graft] def isotropyDimStatsOf(vectors: DataFrame): DataFrame =
    qnormOf(vectors).join(vectors.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("label"), posexplode(col("q")).as(Seq("j", "x")))
      .groupBy("label", "j").agg(sum(expr("CAST(x AS DECIMAL(38,0))")).as("s"))

  /** Per-label (count, Σ|q|²) — the norm half of emb7's statistics. */
  private[graft] def isotropyNormStatsOf(vectors: DataFrame): DataFrame =
    qnormOf(vectors).join(vectors.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy("label").agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(expr("CAST(nrm AS DECIMAL(38,0))")).as("nrmsum"))

  /** EMB7: the embedding-space ISOTROPY audit — how concentrated the
    * corpus (and each label) is around its own mean direction, from the
    * exact sum-vector identity Σ_{i≠j} qᵢ·qⱼ = |Σq|² − Σ|q|² (one scan;
    * the all-pairs mean dot product WITHOUT an all-pairs join). Two
    * rows of evidence per group, plus an overall NULL-label rollup row
    * folded from the same per-label partials (additive monoids — no
    * second corpus scan):
    *   mean_energy_e6 = 10⁶·|Σq|² div (n·Σ|q|²)  — the share of total
    *     energy on the mean vector (→10⁶ when every vector points the
    *     same way, →0 for an isotropic cloud; Ethayarajh EMNLP 2019's
    *     anisotropy diagnostic in exact integers);
    *   anis_e6 = 10⁶·(|Σq|² − Σ|q|²) div ((n−1)·Σ|q|²) — the mean
    *     cross-pair dot relative to the mean norm (the expected cosine
    *     between two random corpus members, up to norm spread), exactly
    *     10⁶ for an all-identical corpus and exactly −10⁶ for a ±q
    *     antipodal pair; sign-split (trunc/floor-proof), NULL at n ≤ 1.
    * Everything is integer: e3-quantized components (the sim1
    * contract), DECIMAL(38,0)/HUGEINT folds (per-dim sums reach ~10¹⁵
    * at 10¹² vectors, their squares ~10³⁰ — the eval2 overflow class).
    *
    * Scale: one corpus scan (64-way posexplode → map-side-combined
    * label×64-row aggregate), label-domain-bounded frames after that;
    * the rollup row re-aggregates the PARTIALS, not the corpus. The
    * decision this feeds: whether to run all-but-the-top (emb5/emb6's
    * common-direction removal) and whether per-label sub-spaces are
    * collapsed enough to hurt contrastive sampling (emb2).
    * Library entry point: [[graft.api.GraftApi.isotropyAudit]]. */
  private[graft] def isotropyFromStats(dims: DataFrame, norms: DataFrame): DataFrame = {
    val ple = dims.groupBy("label").agg(sum(expr("s * s")).as("ssum"))
    val perLabel = norms.join(ple, Seq("label"))
      .select(col("label").cast("long").as("label"), col("n"), col("nrmsum"), col("ssum"))
    val ae = dims.groupBy("j").agg(sum(col("s")).as("s"))
      .agg(sum(expr("s * s")).as("ssum"))
    val overall = norms.agg(sum(col("n")).as("n"), sum(col("nrmsum")).as("nrmsum"))
      .crossJoin(broadcast(ae))
      .select(lit(null).cast("long").as("label"), col("n"), col("nrmsum"), col("ssum"))
    perLabel.unionByName(overall)
      .select(col("label"), col("n").cast("long").as("n_vecs"),
        expr("CAST(ssum * 1000000 div (n * nrmsum) AS BIGINT)").as("mean_energy_e6"),
        expr("CASE WHEN n <= 1 THEN CAST(NULL AS BIGINT) " +
          "WHEN ssum >= nrmsum THEN CAST((ssum - nrmsum) * 1000000 div ((n - 1) * nrmsum) AS BIGINT) " +
          "ELSE -CAST((nrmsum - ssum) * 1000000 div ((n - 1) * nrmsum) AS BIGINT) END").as("anis_e6"))
      .orderBy("label")
  }

  private[graft] def isotropyOf(vectors: DataFrame): DataFrame =
    isotropyFromStats(isotropyDimStatsOf(vectors), isotropyNormStatsOf(vectors))

  val emb7: Q = (s, d) => isotropyOf(Tables.embeddings(s, d))

  val emb7Sql: String =
    s"""WITH $qnormCte,
       |pld AS (
       |  SELECT e.label, t.j, CAST(sum(qn.q[CAST(t.j AS INTEGER)]) AS HUGEINT) AS s
       |  FROM qn JOIN embeddings e USING (vec_id)
       |       CROSS JOIN generate_series(1, 64) t(j)
       |  GROUP BY e.label, t.j),
       |pl AS (
       |  SELECT e.label, CAST(count(*) AS HUGEINT) AS n,
       |         CAST(sum(qn.nrm) AS HUGEINT) AS nrmsum
       |  FROM qn JOIN embeddings e USING (vec_id) GROUP BY e.label),
       |ple AS (SELECT label, CAST(sum(s * s) AS HUGEINT) AS ssum FROM pld GROUP BY label),
       |ad AS (SELECT j, CAST(sum(s) AS HUGEINT) AS s FROM pld GROUP BY j),
       |ae AS (SELECT CAST(sum(s * s) AS HUGEINT) AS ssum FROM ad),
       |an AS (SELECT CAST(sum(n) AS HUGEINT) AS n, CAST(sum(nrmsum) AS HUGEINT) AS nrmsum FROM pl),
       |grp AS (
       |  SELECT label, n, nrmsum, ssum FROM pl JOIN ple USING (label)
       |  UNION ALL
       |  SELECT NULL AS label, an.n, an.nrmsum, ae.ssum FROM an CROSS JOIN ae)
       |SELECT CAST(label AS BIGINT) AS label, CAST(n AS BIGINT) AS n_vecs,
       |       CAST(ssum * 1000000 // (n * nrmsum) AS BIGINT) AS mean_energy_e6,
       |       CASE WHEN n <= 1 THEN CAST(NULL AS BIGINT)
       |            WHEN ssum >= nrmsum THEN CAST((ssum - nrmsum) * 1000000 // ((n - 1) * nrmsum) AS BIGINT)
       |            ELSE -CAST((nrmsum - ssum) * 1000000 // ((n - 1) * nrmsum) AS BIGINT) END AS anis_e6
       |FROM grp ORDER BY label""".stripMargin

  // ---- EMB8: int8 quantization-distortion audit ----

  /** EMB8: the DISTORTION half of the int8 story — sim5/sim8/sim11
    * measure what quantization does to RANKINGS; emb8 measures what it
    * does to the VECTORS: per label (plus the overall NULL-label rollup,
    * the emb7 fold), the relative squared reconstruction error of
    * sim5's symmetric int8 scheme, in exact integers. Working in the
    * common scaled basis avoids every division until the end:
    * errᵢ = q8ᵢ·2·mx − 127·qᵢ (the dequantization residual ×127·2mx's
    * denominator), so dist_e6 = 10⁶·Σ‖err‖² div (127²·Σ‖q‖²) and the
    * per-vector worst case rides the same integers. A healthy symmetric
    * int8 sits well under 10⁴ (1% energy); a label whose max_dist
    * spikes has outlier-magnitude dimensions the shared scale can't
    * represent — the signal to switch that shard to per-block or PQ
    * quantization (sim9/sim10).
    *
    * Exactness: err is integer by construction (trunc div inside the
    * quantizer is the sim5 contract, identical in both engines); per-
    * vector ‖err‖² ≤ 64·(2mx)² stays in int64, corpus sums ride
    * DECIMAL(38,0)/HUGEINT; every division is a non-negative exact
    * integral one. Scale: ONE corpus scan (the per-dim fold runs inside
    * a codegen'd `aggregate(transform(...))` — no explode), then
    * label-domain frames. Library entry point:
    * [[graft.api.GraftApi.quantDistortion]]. */
  private[graft] def quantDistortionOf(vectors: DataFrame): DataFrame = {
    val errExpr =
      "aggregate(transform(q, x -> " +
        "((((x + mx) * 127) div (2 * mx) - 64) * 2 * mx - 127 * x) * " +
        "((((x + mx) * 127) div (2 * mx) - 64) * 2 * mx - 127 * x)), 0L, (a, v) -> a + v)"
    val base = qnormOf(vectors)
      .join(vectors.select(col("vec_id"), col("label")), Seq("vec_id"))
      .withColumn("mx", expr("array_max(transform(q, x -> abs(x)))"))
      .withColumn("serr", expr(errExpr))
      .withColumn("d_e6", expr("serr * 1000000 div (16129 * nrm)"))
    val per = base.groupBy("label").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(expr("CAST(serr AS DECIMAL(38,0))")).as("serr"),
      sum(expr("CAST(nrm AS DECIMAL(38,0))")).as("nrm"),
      max("d_e6").as("max_d"))
    val overall = per.agg(sum("n").as("n"), sum("serr").as("serr"),
        sum("nrm").as("nrm"), max("max_d").as("max_d"))
      .select(lit(null).cast("long").as("label"), col("n"), col("serr"),
        col("nrm"), col("max_d"))
    per.select(col("label").cast("long").as("label"), col("n"), col("serr"),
        col("nrm"), col("max_d"))
      .unionByName(overall)
      .select(col("label"), col("n").cast("long").as("n_vecs"),
        expr("CAST(serr * 1000000 div (16129 * nrm) AS BIGINT)").as("dist_e6"),
        col("max_d").cast("long").as("max_dist_e6"))
      .orderBy("label")
  }

  val emb8: Q = (s, d) => quantDistortionOf(Tables.embeddings(s, d))
  val emb8Sql: String =
    s"""WITH $qnormCte,
       |base AS (
       |  SELECT e.label, qn.nrm,
       |         CAST(list_sum(list_transform(qn.q, x ->
       |           (((x + mx) * 127 // (2 * mx) - 64) * 2 * mx - 127 * x) *
       |           (((x + mx) * 127 // (2 * mx) - 64) * 2 * mx - 127 * x))) AS BIGINT) AS serr
       |  FROM (SELECT vec_id, q, nrm,
       |          list_max(list_transform(q, x -> abs(x))) AS mx FROM qn) qn
       |  JOIN embeddings e USING (vec_id)),
       |scored AS (
       |  SELECT label, nrm, serr, serr * 1000000 // (16129 * nrm) AS d_e6 FROM base),
       |per AS (
       |  SELECT label, CAST(count(*) AS HUGEINT) AS n,
       |         CAST(sum(CAST(serr AS HUGEINT)) AS HUGEINT) AS serr,
       |         CAST(sum(CAST(nrm AS HUGEINT)) AS HUGEINT) AS nrm,
       |         CAST(max(d_e6) AS BIGINT) AS max_d
       |  FROM scored GROUP BY label),
       |rows AS (
       |  SELECT label, n, serr, nrm, max_d FROM per
       |  UNION ALL
       |  SELECT NULL, CAST(sum(n) AS HUGEINT), CAST(sum(serr) AS HUGEINT),
       |         CAST(sum(nrm) AS HUGEINT), CAST(max(max_d) AS BIGINT) FROM per)
       |SELECT CAST(label AS BIGINT) AS label, CAST(n AS BIGINT) AS n_vecs,
       |       CAST(serr * 1000000 // (16129 * nrm) AS BIGINT) AS dist_e6,
       |       max_d AS max_dist_e6
       |FROM rows ORDER BY label""".stripMargin

  // ---- SIM11: rank-biased overlap between exact and ANN rankings ----

  /** Truncated-RBO depth weights w_d = round((1−p)·p^(d−1)·10⁹) at
    * p = 0.9 — INTEGER LITERALS shared verbatim with the oracle, so no
    * transcendental is ever evaluated at query time. */
  private val RboDepths = 3
  private val RboW: IndexedSeq[Long] = (1 to RboDepths).map { d =>
    (BigDecimal("0.1") * BigDecimal("0.9").pow(d - 1) * BigDecimal(1000000000))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
  }

  /** SIM11: rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010)
    * between the EXACT cosine ranking (sim1) and the LSH-bucketed ANN
    * ranking (sim3), per query — the ORDER-aware companion to sim8's
    * set-recall: recall says "did the ANN find the right candidates?",
    * RBO says "did it put them in the right ORDER, weighted toward the
    * top?" (the positions users/retrievers actually consume). Truncated
    * at depth 3 with p = 0.9: RBO = Σ_d w_d·(|A_d ∩ B_d|/d), where the
    * w_d are precomputed integer e9 literals (no runtime
    * transcendental) and each depth's agreement divides ONCE, exactly
    * (trunc == floor on non-negatives). Identical rankings score
    * Σw_d = 271 000 000 (the truncated mass; the remaining 0.729 of
    * RBO's unit mass lives beyond depth 3 — standard truncated RBO).
    *
    * Scale: both rankings are per-query-bounded frames (≤ k rows per
    * query); the overlap join is keyed (q_id, cand_id) and the depth
    * grid multiplies by the CONSTANT depth count. Library entry point:
    * [[graft.api.GraftApi.rankBiasedOverlap]]. */
  private[graft] def rboOf(a: DataFrame, b: DataFrame): DataFrame = {
    val shared = a.select(col("q_id"), col("cand_id"), col("rk").as("ra"))
      .join(b.select(col("q_id"), col("cand_id"), col("rk").as("rb")),
        Seq("q_id", "cand_id"))
      .select(col("q_id"), greatest(col("ra"), col("rb")).as("dmin"))
    val wCase = (1 to RboDepths).map(d =>
      s"WHEN $d THEN ${RboW(d - 1)}L").mkString("CASE d ", " ", " END")
    val grid = a.select("q_id").distinct()
      .select(col("q_id"), explode(expr(s"sequence(1, $RboDepths)")).as("d"))
    grid.join(shared, grid("q_id") === shared("q_id") && col("dmin") <= col("d"), "left")
      .groupBy(grid("q_id"), col("d")).agg(count(col("dmin")).as("c"))
      .groupBy("q_id")
      .agg(sum(expr(s"(($wCase) * c) div d")).cast("long").as("rbo_e9"),
        max(when(col("d") === RboDepths, col("c"))).as("n_shared"))
      .orderBy("q_id")
  }

  val sim11: Q = (s, d) => {
    val exact = sim1(s, d).filter(col("rk") <= RboDepths)
    rboOf(exact, sim3(s, d))
  }
  val sim11Sql: String = {
    val wCase = (1 to RboDepths).map(d =>
      s"WHEN $d THEN ${RboW(d - 1)}").mkString("CASE d ", " ", " END")
    s"""WITH a AS (
       |  SELECT q_id, cand_id, rk FROM (${sim1Sql.replace("\n", "\n  ")}) WHERE rk <= $RboDepths),
       |b AS (
       |  SELECT q_id, cand_id, rk FROM (${sim3Sql.replace("\n", "\n  ")})),
       |shared AS (
       |  SELECT a.q_id, greatest(a.rk, b.rk) AS dmin
       |  FROM a JOIN b USING (q_id, cand_id)),
       |grid AS (
       |  SELECT q_id, t.d FROM (SELECT DISTINCT q_id FROM a)
       |  CROSS JOIN generate_series(1, $RboDepths) t(d)),
       |cd AS (
       |  SELECT g.q_id, g.d, CAST(count(s.dmin) AS BIGINT) AS c
       |  FROM grid g LEFT JOIN shared s ON s.q_id = g.q_id AND s.dmin <= g.d
       |  GROUP BY g.q_id, g.d)
       |SELECT q_id,
       |       CAST(sum((($wCase) * c) // d) AS BIGINT) AS rbo_e9,
       |       CAST(max(CASE WHEN d = $RboDepths THEN c END) AS BIGINT) AS n_shared
       |FROM cd GROUP BY q_id ORDER BY q_id""".stripMargin
  }

  // ---- EMB2: hard-negative mining for contrastive training ----

  /** EMB2: the batch op that feeds contrastive / triplet training — for
    * each anchor (the sim1 query set, vec_id % 50 = 0), the top-5
    * DIFFERENT-label candidates by cosine ("hard negatives"), with the
    * anchor's hardest SAME-label cosine riding along and a `viol` flag
    * marking semi-hard violations (negative scores above the best
    * positive — the pairs a triplet loss actually learns from, Schroff
    * et al. FaceNet CVPR 2015). Exactness: integer-quantized dots (the
    * sim1 contract), ONE double division per pair of identical operands
    * in both engines, and `viol` compares those identical doubles — so
    * even the flag is engine-exact. Scale: anchors broadcast (the query
    * set is the small side); the corpus is scanned once, and both the
    * negative top-5 cut and the positive max are per-anchor aggregates
    * over that one pass — at 100 TB the brute-force pass swaps for the
    * IVF-celled candidate stream (sim4/sim6) with the same downstream
    * shape. */
  val emb2: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val qn = qnormOf(emb).join(emb.select(col("vec_id"), col("label")), "vec_id")
    val anchors = qn.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
        col("nrm").as("q_nrm"), col("label").as("q_lbl"))
    val pairs = qn.join(broadcast(anchors), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_lbl"), col("vec_id").as("cand_id"), col("label"),
        expr("graft_dot(qq, q)").as("dot"), col("q_nrm"), col("nrm"))
      .withColumn("cos", col("dot") / sqrt(col("q_nrm").cast("double") * col("nrm").cast("double")))
    val posBest = pairs.filter(col("label") === col("q_lbl"))
      .groupBy("q_id").agg(max(col("cos")).as("pos_cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    pairs.filter(col("label") =!= col("q_lbl"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .join(posBest, Seq("q_id"), "left")
      .select(col("q_id"), col("cand_id"), col("rk"),
        round(col("cos"), 6).as("neg_cos_r"),
        round(col("pos_cos"), 6).as("pos_cos_r"),
        when(col("cos") > col("pos_cos"), 1).otherwise(0).as("viol"))
      .orderBy("q_id", "rk")
  }
  val emb2Sql: String =
    s"""WITH $qnormCte,
       |qnl AS (
       |  SELECT q.vec_id, q.q, q.nrm, e.label
       |  FROM qn q JOIN embeddings e USING (vec_id)),
       |dots AS (
       |  SELECT q_id, q_lbl, cand_id, label,
       |         CAST(sum(xa * xb) AS BIGINT) AS dot, q_nrm, c_nrm FROM (
       |    SELECT a.vec_id AS q_id, a.label AS q_lbl, b.vec_id AS cand_id,
       |           b.label AS label, a.nrm AS q_nrm, b.nrm AS c_nrm,
       |           unnest(a.q) AS xa, unnest(b.q) AS xb
       |    FROM qnl a JOIN qnl b ON a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id)
       |  GROUP BY q_id, q_lbl, cand_id, label, q_nrm, c_nrm),
       |scored AS (
       |  SELECT q_id, q_lbl, cand_id, label,
       |         dot / sqrt(CAST(q_nrm AS DOUBLE) * CAST(c_nrm AS DOUBLE)) AS cos
       |  FROM dots),
       |pos AS (SELECT q_id, max(cos) AS pos_cos FROM scored
       |        WHERE label = q_lbl GROUP BY q_id),
       |neg AS (
       |  SELECT q_id, cand_id, cos,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |           ORDER BY cos DESC, cand_id) AS INTEGER) AS rk
       |  FROM scored WHERE label <> q_lbl)
       |SELECT n.q_id, n.cand_id, n.rk, round(n.cos, 6) AS neg_cos_r,
       |       round(p.pos_cos, 6) AS pos_cos_r,
       |       CASE WHEN n.cos > p.pos_cos THEN 1 ELSE 0 END AS viol
       |FROM neg n LEFT JOIN pos p USING (q_id)
       |WHERE n.rk <= 5 ORDER BY n.q_id, n.rk""".stripMargin

  // ---- SIM9: product quantization + ADC (asymmetric distance) scan ----

  /** PQ geometry: 64 dims → 8 subspaces × 8 dims, 16 codewords each
    * (Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011). A corpus vector compresses to 4 small code
    * ids — the representation that makes billion-vector search fit in
    * memory. */
  private[ops] val PqM = 8
  private[ops] val PqD = 8
  private[ops] val PqK = 16

  /** 3-level SQL literal `cb[j][cid][dim]` — codebooks ride the PLAN, so
    * assignment/encoding/table-build are zero-join codegen projections
    * (the cl1 literal-centroid convention). */
  private def cbLiteral(cb: Seq[Seq[Array[Long]]]): String =
    cb.map(_.map(_.mkString("array(", "L, ", "L)")).mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")

  /** (vec_id, j, sq): each vector split into its PqM quantized
    * subvectors — one corpus scan feeds every per-subspace step. */
  private def pqSubs(qn: DataFrame): DataFrame =
    qn.select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${PqM - 1}), j -> named_struct('j', j, 'sq', slice(q, j * $PqD + 1, $PqD)))")).as("s"))
      .select(col("vec_id"), col("s.j").as("j"), col("s.sq").as("sq"))

  /** Nearest codeword per (vec_id, j) against literal codebooks: integer
    * squared-L2, first-minimum (= lowest cid) on ties. */
  private def pqAssign(subs: DataFrame, cb: Seq[Seq[Array[Long]]]): DataFrame =
    subs.withColumn("dists", expr(
        s"transform(element_at(${cbLiteral(cb)}, j + 1), c -> " +
          "aggregate(zip_with(sq, c, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v))"))
      .withColumn("cid", expr("CAST(array_position(dists, array_min(dists)) AS BIGINT)"))
      .drop("dists")

  /** Per-subspace Lloyd training (iterations = 2, seeds = subvectors of
    * vec_id 1..PqK — the cl1 seeding convention); ALL subspaces train in
    * the same scans via the exploded subs frame, and the recompute
    * collect is PqM·PqK·PqD = 512 integers. Empty clusters keep their
    * seed codeword. */
  private[graft] def pqCodebooks(qn: DataFrame): Seq[Seq[Array[Long]]] = {
    val subs = pqSubs(qn).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seedRows = subs.filter(col("vec_id").between(1, PqK))
      .orderBy("vec_id", "j").collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getSeq[Long](2).toArray)).toMap
    val seeds: Seq[Seq[Array[Long]]] = (0 until PqM).map { j =>
      (1 to PqK).map { cid =>
        seedRows.getOrElse((cid.toLong, j),
          sys.error(s"need seed vectors with vec_id 1..$PqK"))
      }
    }
    val sums = pqAssign(subs, seeds)
      .select(col("j"), col("cid"), posexplode(col("sq")).as(Seq("pos", "x")))
      .groupBy("j", "cid", "pos").agg(expr("sum(x) div count(1)").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val bySub = sums.groupBy(t => (t._1, t._2))
    val cb1 = (0 until PqM).map { j =>
      (1 to PqK).map { cid =>
        bySub.get((j, cid.toLong)) match {
          case Some(rows) => rows.sortBy(_._3).map(_._4)
          case None       => seeds(j)(cid - 1)
        }
      }
    }
    subs.unpersist()
    cb1
  }

  /** SIM9: product-quantization ANN with an ADC scan — the compression
    * path sim5's int8 scalar quantization cannot reach (4 code ids per
    * vector vs 64 bytes). Corpus vectors encode once against trained
    * codebooks; each query precomputes its PqM×PqK distance TABLE, and a
    * candidate's approximate distance is four table lookups summed —
    * never a full-dimension dot at scan time. Exactness: cl1's integer
    * discipline end-to-end (quantized subvectors, integer squared-L2,
    * `sum div count` codewords, lowest-cid ties), so codebooks, codes,
    * tables, and the final ranking are all engine-exact and the oracle
    * replays the whole train→encode→scan pipeline in SQL. Scale: codes
    * are a one-pass projection against plan-literal codebooks; the ADC
    * join sends the broadcast |Q|·PqM·PqK table to the code stream
    * (corpus-sized but 4 ints wide — the point of PQ) and the per-query
    * cut is the standard top-k window (TopKPerGroup caps it at extreme
    * query counts). `PqSpec` pins a pure-Scala recompute and the
    * recall floor vs sim1's exact top-5. */
  val sim9: Q = (s, d) => {
    val qn = qnormOf(Tables.embeddings(s, d))
    val cb = pqCodebooks(qn)
    val codes = pqAssign(pqSubs(qn), cb).select(col("vec_id"), col("j"), col("cid"))
    val dtab = pqSubs(qn.filter(col("vec_id") % 50 === 0))
      .select(col("vec_id").as("q_id"), col("j"), posexplode(expr(
        s"transform(element_at(${cbLiteral(cb)}, j + 1), c -> " +
          "aggregate(zip_with(sq, c, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v))"))
        .as(Seq("cpos", "dist")))
      .select(col("q_id"), col("j"), (col("cpos") + 1).cast("long").as("cid"), col("dist"))
    val pairs = codes.join(broadcast(dtab), Seq("j", "cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id").as("cand_id"))
      .agg(sum("dist").as("adist"))
    val w = Window.partitionBy("q_id").orderBy(col("adist").asc, col("cand_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("q_id"), col("cand_id"), col("rk"), col("adist"))
      .orderBy("q_id", "rk")
  }
  /** The shared PQ oracle pipeline (train → encode → query tables),
    * ending at the `codes` and `dtab` CTEs — sim9 and sim10 both append
    * their own candidate/pairs tail (a shared constant, NOT string
    * surgery on a sibling query — the cl2Sql lesson). */
  private val pqCtes: String =
    s"""WITH $qnormCte,
       |subs AS MATERIALIZED (
       |  SELECT vec_id, t.j, list_slice(q, t.j * $PqD + 1, t.j * $PqD + $PqD) AS sq
       |  FROM qn CROSS JOIN range(0, $PqM) t(j)),
       |cb0 AS MATERIALIZED (
       |  SELECT CAST(vec_id AS BIGINT) AS cid, j, sq AS cq
       |  FROM subs WHERE vec_id BETWEEN 1 AND $PqK),
       |d0 AS (
       |  SELECT v.vec_id, v.j, c.cid,
       |         CAST(list_sum(list_transform(range(1, ${PqD + 1}),
       |           p -> (v.sq[p] - c.cq[p]) * (v.sq[p] - c.cq[p]))) AS BIGINT) AS dist
       |  FROM subs v JOIN cb0 c ON v.j = c.j),
       |a0 AS (
       |  SELECT vec_id, j, cid FROM (
       |    SELECT vec_id, j, cid,
       |           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rk
       |    FROM d0) WHERE rk = 1),
       |cb1m AS (
       |  SELECT j, cid, list(c ORDER BY pos) AS cq FROM (
       |    SELECT v.j, a0.cid, t.p AS pos,
       |           CAST(sum(v.sq[t.p]) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
       |    FROM subs v JOIN a0 ON a0.vec_id = v.vec_id AND a0.j = v.j
       |    CROSS JOIN range(1, ${PqD + 1}) t(p)
       |    GROUP BY v.j, a0.cid, t.p)
       |  GROUP BY j, cid),
       |cb1 AS MATERIALIZED (
       |  SELECT j, cid, cq FROM cb1m
       |  UNION ALL
       |  SELECT c0.j, c0.cid, c0.cq FROM cb0 c0
       |  WHERE NOT EXISTS (SELECT 1 FROM cb1m m WHERE m.j = c0.j AND m.cid = c0.cid)),
       |dcode AS (
       |  SELECT v.vec_id, v.j, c.cid,
       |         CAST(list_sum(list_transform(range(1, ${PqD + 1}),
       |           p -> (v.sq[p] - c.cq[p]) * (v.sq[p] - c.cq[p]))) AS BIGINT) AS dist
       |  FROM subs v JOIN cb1 c ON v.j = c.j),
       |codes AS (
       |  SELECT vec_id, j, cid FROM (
       |    SELECT vec_id, j, cid,
       |           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rk
       |    FROM dcode) WHERE rk = 1),
       |dtab AS (
       |  SELECT v.vec_id AS q_id, v.j, c.cid,
       |         CAST(list_sum(list_transform(range(1, ${PqD + 1}),
       |           p -> (v.sq[p] - c.cq[p]) * (v.sq[p] - c.cq[p]))) AS BIGINT) AS dist
       |  FROM subs v JOIN cb1 c ON v.j = c.j
       |  WHERE v.vec_id % 50 = 0)""".stripMargin

  val sim9Sql: String = pqCtes +
    s""",
       |pairs AS (
       |  SELECT d.q_id, co.vec_id AS cand_id, CAST(sum(d.dist) AS BIGINT) AS adist
       |  FROM codes co JOIN dtab d ON d.j = co.j AND d.cid = co.cid
       |  WHERE co.vec_id <> d.q_id
       |  GROUP BY d.q_id, co.vec_id)
       |SELECT q_id, cand_id, rk, adist FROM (
       |  SELECT q_id, cand_id, adist,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adist, cand_id) AS INTEGER) AS rk
       |  FROM pairs) WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  // ---- SIM10: IVF + PQ (the FAISS billion-scale serving shape) ----

  /** 2-level centroid literal for the coarse quantizer. */
  private def cellLit(cs: Seq[Array[Long]]): String =
    cs.map(_.mkString("array(", "L, ", "L)")).mkString("array(", ", ", ")")

  /** SIM10: the composition production actually deploys (FAISS IVF-PQ):
    * a coarse quantizer restricts each query to ONE inverted-file cell
    * (nprobe=1), and candidates inside the cell are scored in the
    * compressed domain by sim9's ADC tables — so a query touches ~1/8 of
    * the corpus AND never reads a full vector. Cell assignment is a
    * ZERO-shuffle codegen projection against plan-literal centroids
    * (integer squared-L2, lowest-cid ties — metric-consistent with the
    * PQ scoring, unlike sim4's cosine cells), improving on sim4's
    * crossJoin+window assignment shape. Everything downstream of the
    * scans is integer-exact, so the oracle replays cells + the shared
    * [[pqCtes]] pipeline. At 100 TB the codes+cell frame is the stored
    * index (partitioned by cell, 8 code ids + 1 cell id per vector);
    * queries broadcast their (cell, ADC-table) rows and the scan prunes
    * to matching cell partitions. */
  /** Parameterized IVF-PQ over any (vectors, queries) pair — the library
    * entry point ([[graft.api.GraftApi.ivfPqTopK]]). Coarse seeds are
    * the 8 LOWEST-vec_id vectors (= the registry's vec_id 1..8 on the
    * fixture, so sim10's oracle is untouched); codebooks train on
    * `vectors` and score `queries`' ADC tables against them. Emits
    * (q_id, cand_id, rk, adist). */
  private[graft] def ivfPqTopKOf(vectors: DataFrame, queries: DataFrame,
      k: Int = 3): DataFrame = {
    val qn = qnormOf(vectors)
    val cents = qn.orderBy("vec_id").limit(8)
      .select("q").collect().map(_.getSeq[Long](0).toArray).toSeq
    require(cents.length == 8, "need >= 8 vectors for the coarse quantizer")
    val cl = cellLit(cents)
    def withCell(df: DataFrame): DataFrame = df
      .withColumn("cds", expr(s"transform($cl, c -> " +
        "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v))"))
      .withColumn("cell", expr("CAST(array_position(cds, array_min(cds)) AS BIGINT)"))
      .drop("cds")
    val cb = pqCodebooks(qn)
    val codes = pqAssign(pqSubs(qn), cb).select(col("vec_id"), col("j"), col("cid"))
    val cells = withCell(qn).select(col("vec_id"), col("cell"))
    val qs = qnormOf(queries)
    val qcells = withCell(qs)
      .select(col("vec_id").as("q_id"), col("cell").as("q_cell"))
    val dtab = pqSubs(qs)
      .select(col("vec_id").as("q_id"), col("j"), posexplode(expr(
        s"transform(element_at(${cbLiteral(cb)}, j + 1), c -> " +
          "aggregate(zip_with(sq, c, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v))"))
        .as(Seq("cpos", "dist")))
      .select(col("q_id"), col("j"), (col("cpos") + 1).cast("long").as("cid"), col("dist"))
    val cand = codes.join(cells, "vec_id")
      .join(broadcast(qcells), col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
    val scored = cand.join(broadcast(dtab), Seq("q_id", "j", "cid"))
      .groupBy(col("q_id"), col("vec_id").as("cand_id"))
      .agg(sum("dist").as("adist"))
    val w = Window.partitionBy("q_id").orderBy(col("adist").asc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), col("rk"), col("adist"))
  }

  val sim10: Q = (s, d) =>
    ivfPqTopKOf(Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0))
      .orderBy("q_id", "rk")
  val sim10Sql: String = pqCtes +
    s""",
       |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS ccid, q AS cq
       |         FROM (SELECT vec_id, q FROM qn ORDER BY vec_id LIMIT 8)),
       |cd AS (
       |  SELECT v.vec_id, c.ccid,
       |         CAST(list_sum(list_transform(range(1, 65),
       |           p -> (v.q[p] - c.cq[p]) * (v.q[p] - c.cq[p]))) AS BIGINT) AS dist
       |  FROM qn v CROSS JOIN cent c),
       |cells AS MATERIALIZED (
       |  SELECT vec_id, ccid AS cell FROM (
       |    SELECT vec_id, ccid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, ccid) AS rk
       |    FROM cd) WHERE rk = 1),
       |qcells AS (SELECT vec_id AS q_id, cell AS q_cell FROM cells WHERE vec_id % 50 = 0),
       |pairs AS (
       |  SELECT d.q_id, co.vec_id AS cand_id, CAST(sum(d.dist) AS BIGINT) AS adist
       |  FROM codes co
       |  JOIN cells ce ON ce.vec_id = co.vec_id
       |  JOIN dtab d ON d.j = co.j AND d.cid = co.cid
       |  JOIN qcells qc ON qc.q_id = d.q_id AND qc.q_cell = ce.cell
       |  WHERE co.vec_id <> d.q_id
       |  GROUP BY d.q_id, co.vec_id)
       |SELECT q_id, cand_id, rk, adist FROM (
       |  SELECT q_id, cand_id, adist,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adist, cand_id) AS INTEGER) AS rk
       |  FROM pairs) WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin

  // ---- EMB9: embedding-norm health audit (dq2's MAD machinery) ----

  /** EMB9: embedding norm outlier audit — per label, the exact median
    * and MAD of the integer squared norms with a 3·MAD outlier count:
    * truncated/zero-padded/exploding vectors (a broken encoder batch, a
    * bad shard) surface as norm outliers long before any retrieval
    * metric moves. Runs dq2's MAD machinery
    * ([[graft.ops.Curation.madOutliersOf]]) verbatim over the
    * e3-quantized norms, so exactness and the oracle chain are shared —
    * value-domain percentile windows, no corpus-sized sort.
    * The library entry point ([[graft.api.GraftApi.normAudit]]). */
  /** The library entry point over any (vec_id, embedding, label) frame. */
  private[graft] def normAuditOf(vectors: DataFrame): DataFrame =
    graft.ops.Curation.madOutliersOf(
      qnormOf(vectors)
        .join(vectors.select(col("vec_id"), col("label")), Seq("vec_id"))
        .select(col("label").cast("string").as("grp"), col("nrm").as("v")))
      .withColumnRenamed("grp", "label")

  val emb9: Q = (s, d) =>
    normAuditOf(Tables.embeddings(s, d)).orderBy("label")
  val emb9Sql: String = graft.ops.Curation.madSqlOver(
    s"""$qnormCte,
       |li AS (
       |  SELECT e.label::VARCHAR AS grp, qn.nrm AS v
       |  FROM qn JOIN embeddings e USING (vec_id))""".stripMargin,
    "label")

  val queries: Map[String, Q] = Map(
    "emb9_norm_audit" -> emb9,
    "sim10_ivfpq_topk" -> sim10,
    "sim9_pq_adc_topk" -> sim9,
    "emb2_hard_negatives" -> emb2,
    "emb4_matryoshka_recall" -> emb4,
    "emb5_power_iteration" -> emb5,
    "emb6_common_energy" -> emb6,
    "emb7_isotropy" -> emb7,
    "sim11_rbo" -> sim11,
    "emb8_quant_distortion" -> emb8,
    "mmr1_diverse_topk" -> mmr1,
    "mmr2_diverse_topk_bucketed" -> mmr2,
    "sim8_lsh_recall" -> sim8,
    "sim6_ivf_nprobe2_topk" -> sim6,
    "sim1_ann_bruteforce_topk" -> sim1,
    "sim2_lsh_buckets" -> sim2,
    "sim3_lsh_ann_topk" -> sim3,
    "sim4_ivf_topk" -> sim4,
    "sim5_int8_quantized_topk" -> sim5,
    "sim7_rerank_topk" -> sim7,
  )

  val oracle: Map[String, String] = Map(
    "emb9_norm_audit" -> emb9Sql,
    "sim10_ivfpq_topk" -> sim10Sql,
    "sim9_pq_adc_topk" -> sim9Sql,
    "emb2_hard_negatives" -> emb2Sql,
    "emb4_matryoshka_recall" -> emb4Sql,
    "emb5_power_iteration" -> emb5Sql,
    "emb6_common_energy" -> emb6Sql,
    "emb7_isotropy" -> emb7Sql,
    "sim11_rbo" -> sim11Sql,
    "emb8_quant_distortion" -> emb8Sql,
    "mmr1_diverse_topk" -> mmr1Sql,
    "mmr2_diverse_topk_bucketed" -> mmr2Sql,
    "sim8_lsh_recall" -> sim8Sql,
    "sim1_ann_bruteforce_topk" -> sim1Sql,
    "sim2_lsh_buckets" -> sim2Sql,
    "sim3_lsh_ann_topk" -> sim3Sql,
    "sim4_ivf_topk" -> sim4Sql,
    "sim5_int8_quantized_topk" -> sim5Sql,
    "sim7_rerank_topk" -> sim7Sql,
    "sim6_ivf_nprobe2_topk" -> sim6Sql,
  )
}
