package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] Iterative graph analytics beyond Dedup's connected components:
  * PageRank over the real customer–supplier purchase graph, in EXACT
  * integer micro-units so three fixed iterations hash-match a DuckDB
  * chained-CTE oracle (float PageRank can never be cross-engine
  * bit-exact — the sum order differs; integer contributions `rank div
  * degree` make every step deterministic on both engines).
  *
  * Scale: the edge list partitions on the source key; each iteration is
  * ONE shuffle (contributions grouped by destination) + a broadcast-free
  * equi-join against the cached ranks — the standard distributed-PR
  * shape. The driver loop holds fixed iteration COUNT, never data
  * (SvmSgd's chained-epoch pattern).
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  private val Iters = 3

  /** Integer PageRank over an undirected edge frame (src, dst) — the
    * library entry point ([[graft.api.GraftApi.pageRank]]). Ranks start
    * at 1 000 000 per node; each step is
    * `150000 + (850 · Σ contrib) div 1000` with `contrib = rank div
    * degree` — damping 0.85 in exact thousandths. Returns (node,
    * rank_e6). Input must already contain both edge directions (or be a
    * directed graph where every node has out-degree ≥ 1). */
  private[graft] def pageRankOf(edges: DataFrame, iters: Int = Iters): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // degree folded into the cached edge list ONCE — each iteration then
    // pays a single join (ranks) instead of re-joining degrees every round
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("d")), Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var r = ed.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      r = ed
        .join(r, ed("src") === r("node"))
        .select(col("dst"), expr("r div d").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
        .select(col("dst").as("node"),
          expr("CAST(150000 + (850 * s) div 1000 AS BIGINT)").as("r"))
    }
    r.select(col("node"), col("r").as("rank_e6"))
  }

  /** PR1: supplier importance by random walk over the purchase graph —
    * an undirected customer↔supplier edge per distinct (customer,
    * supplier) trading pair from orders ⋈ lineitem. Emits the supplier
    * side's ranks after 3 exact-integer iterations. */
  val pr1: Q = (s, d) => {
    val e0 = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    val und = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    pageRankOf(und)
      .filter(col("node").startsWith("s"))
      .orderBy("node")
  }
  val pr1Sql: String =
    """WITH e0 AS (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
      |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
      |r1 AS (
      |  SELECT e.dst AS node,
      |         CAST(150000 + (850 * sum(r0.r // deg.d)) // 1000 AS BIGINT) AS r
      |  FROM edges e JOIN deg ON deg.src = e.src JOIN r0 ON r0.node = e.src
      |  GROUP BY e.dst),
      |r2 AS (
      |  SELECT e.dst AS node,
      |         CAST(150000 + (850 * sum(r1.r // deg.d)) // 1000 AS BIGINT) AS r
      |  FROM edges e JOIN deg ON deg.src = e.src JOIN r1 ON r1.node = e.src
      |  GROUP BY e.dst),
      |r3 AS (
      |  SELECT e.dst AS node,
      |         CAST(150000 + (850 * sum(r2.r // deg.d)) // 1000 AS BIGINT) AS r
      |  FROM edges e JOIN deg ON deg.src = e.src JOIN r2 ON r2.node = e.src
      |  GROUP BY e.dst)
      |SELECT node, r AS rank_e6 FROM r3
      |WHERE node LIKE 's%'
      |ORDER BY node""".stripMargin

  val queries: Map[String, Q] = Map(
    "pr1_pagerank_suppliers" -> pr1,
  )

  val oracle: Map[String, String] = Map(
    "pr1_pagerank_suppliers" -> pr1Sql,
  )
}
