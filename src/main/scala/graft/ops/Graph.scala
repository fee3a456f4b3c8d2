package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Plan-depth guardrail for the lazy iterative loops (round-14): the
    * fully-lazy round-13 shape is right at this engine's fixed 2-3
    * rounds (ReusedExchange pays each subtree's shuffle once), but the
    * library entry points expose `iters`/`maxDepth`/`rounds`, and the
    * lazy plan grows with every round (bfs ~3x per level) — a caller
    * asking for depth 15 got exponential analysis blowup with no
    * guardrail. Past `LazyComfortRounds` total rounds, every
    * `GuardEvery`-th round's frame is localCheckpointed (cutting the
    * lineage chain so plan size stays O(GuardEvery) subtrees) and the
    * PREVIOUS guard block is freed at the next cut ([[Pinned.checkpoint]]
    * — kcorePeelOf's per-round-free pattern). The final round never cuts,
    * so short runs pin nothing; on a long run at most ONE block (the last
    * interior cut) stays pinned behind the returned lazy frame —
    * [[graft.api.GraftApi.releasePinned]] frees it, as for kcore. */
  private[graft] val LazyComfortRounds = 6
  private[graft] val GuardEvery = 5

  private[graft] final class PlanGuard(totalRounds: Int) {
    private var freePrev: () => Unit = () => ()
    def shouldCut(round: Int): Boolean =
      totalRounds > LazyComfortRounds && round % GuardEvery == 0 &&
        round < totalRounds
    def cut(df: DataFrame): DataFrame = {
      val (cp, free) = Pinned.checkpoint(df)
      freePrev()
      freePrev = free
      cp
    }
    def apply(df: DataFrame, round: Int): DataFrame =
      if (shouldCut(round)) cut(df) else df
  }

  /** Integer PageRank over an undirected edge frame (src, dst) — the
    * library entry point ([[graft.api.GraftApi.pageRank]]). Ranks start
    * at 1 000 000 per node; each step is
    * `150000 + (850 · Σ contrib) div 1000` with `contrib = rank div
    * degree` — damping 0.85 in exact thousandths. Returns (node,
    * rank_e6). Input must already contain both edge directions (or be a
    * directed graph where every node has out-degree ≥ 1). */
  private[graft] def pageRankOf(edges: DataFrame, iters: Int = Iters): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // degree folded into the edge list ONCE — each iteration then pays a
    // single join (ranks) instead of re-joining degrees every round.
    // FULLY LAZY (round-13): no persist, no checkpoint — the `ed` subtree
    // is plan-identical across iterations, so Spark's ReusedExchange
    // writes its shuffles once and every round re-reads them; the
    // round-12 persist bought nothing the exchange reuse doesn't, and its
    // MEMORY_AND_DISK block leaked into the caller's session for life
    // (Spark never GC-frees escaped pins — the Pinned scaladoc). Plan
    // depth is `iters` with one `ed` copy per round — fine at the fixed
    // small iteration counts this engine uses; past that, [[PlanGuard]]
    // cuts the chain every few rounds so a library caller can push
    // `iters` arbitrarily high.
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("d")), Seq("src"))
    val guard = new PlanGuard(iters)
    var r = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("r"))
    for (i <- 1 to iters) {
      r = guard(ed
        .join(r, ed("src") === r("node"))
        .select(col("dst"), expr("r div d").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
        .select(col("dst").as("node"),
          expr("CAST(150000 + (850 * s) div 1000 AS BIGINT)").as("r")), i)
    }
    r.select(col("node"), col("r").as("rank_e6"))
  }

  /** Purchase-graph node encoding (round 16, guide §2.3 "narrower
    * types"): the iterative graph loops shuffle a (node, value) row per
    * edge per round, and the "c<custkey>"/"s<suppkey>" STRING keys
    * dominated those exchanges (an UnsafeRow string field costs ~2-3× a
    * long plus slower hashing/comparison — pr1 shuffled 61 MB at sf0.1,
    * bfs1 91 MB). Customers ride as custkey·2, suppliers as suppkey·2+1 —
    * disjoint parities, a bijection, so every distinct/degree/sum/min in
    * the loops is unchanged — and the string form is re-derived ONLY at
    * the output boundary, so emitted rows are bit-identical to the
    * string-keyed plan (oracle re-verified). Measured at sf0.1:
    * pr1+pr2+bfs1+ppr1 10.1 → 7.5 s warm, shuffle 237 → 148 MB. */
  private def encCust(c: org.apache.spark.sql.Column) = c * 2
  private def encSupp(c: org.apache.spark.sql.Column) = c * 2 + 1
  private val decodeNode =
    when(col("node") % 2 === 1, concat(lit("s"), expr("node div 2")))
      .otherwise(concat(lit("c"), expr("node div 2"))).as("node")

  /** The long-encoded distinct purchase edge list (customer → supplier). */
  private def purchaseEdges(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(encCust(col("o_custkey")).as("src"), encSupp(col("l_suppkey")).as("dst"))
      .distinct()

  /** PR1: supplier importance by random walk over the purchase graph —
    * an undirected customer↔supplier edge per distinct (customer,
    * supplier) trading pair from orders ⋈ lineitem. Emits the supplier
    * side's ranks after 3 exact-integer iterations. */
  val pr1: Q = (s, d) => {
    val e0 = purchaseEdges(s, d)
    val und = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    pageRankOf(und)
      .filter(col("node") % 2 === 1)
      .select(concat(lit("s"), expr("node div 2")).as("node"), col("rank_e6"))
      .orderBy("node")
  }
  val pr1Sql: String =
    """WITH e0 AS (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
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

  // ---- TC1: triangle counting (degree-oriented wedge join) ----

  /** Per-node triangle counts over an undirected (a, b) edge frame with
    * a < b — the library entry point ([[graft.api.GraftApi.triangleCounts]]).
    *
    * Scale: the classic degree-oriented enumeration (Schank–Wagner;
    * MapReduce form in Suri–Vassilvitskii WWW'11): orient every edge
    * from its lower-(degree, id) endpoint to the higher one, enumerate
    * wedges only at each edge's LOW-degree apex, then close them with
    * one equi-join against the undirected edge set. Wedge count is
    * Σ d⁺(v)² with d⁺ bounded by O(√m) on any graph (arboricity bound)
    * — hub nodes never explode the join the way a naive a<b wedge
    * enumeration would. Three shuffles total (degree agg, wedge join,
    * closing join), all on integer keys. */
  private[graft] def triangleCountsOf(und0: DataFrame): DataFrame = {
    val und = und0.select(col("a"), col("b"))
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("dg").as("db")), Seq("b"))
    // orient: u = endpoint with smaller (degree, id); v = the other
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("a")).otherwise(col("b")).as("u"),
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("b")).otherwise(col("a")).as("v"))
    val e1 = oriented.select(col("u"), col("v").as("v1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"))
    val wedges = e1.join(e2, Seq("u")).filter(col("v1") < col("v2"))
    val tris = wedges.join(und, wedges("v1") === und("a") && wedges("v2") === und("b"))
      .select(col("u"), col("v1"), col("v2"))
    tris.select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  /** TC1: triangles in the supplier co-purchase graph — suppliers
    * co-appearing in ≥ 2 distinct orders, SPARSIFIED to each node's
    * top-8 strongest ties (by co-order count, neighbor id tiebreak; an
    * edge survives if EITHER endpoint ranks it). Per-order pair
    * generation is bounded by (items per order)², a schema constant;
    * the top-k cut is the standard co-occurrence-network sparsification
    * and the property that makes triangle counting scale-safe here: a
    * co-purchase graph DENSIFIES as orders accumulate (every supplier
    * pair eventually co-occurs twice), so any fixed weight threshold
    * degenerates toward a clique with corpus growth — Θ(n³) triangles —
    * while union-of-top-8 bounds degree ≤ 16 and wedge work at n·k².
    * Measured: the w≥2-only variant took 18.6 s at sf0.1; this one 1 s. */
  /** Weighted supplier co-purchase edges: (a < b, w = co-order count),
    * thresholded at w ≥ 2 — shared by tc1 and kcore1. Per-order pair
    * generation is bounded by (items per order)², a schema constant. */
  private def coPurchaseW2(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    val x = li.select(col("ok"), col("sk").as("a"))
    val y = li.select(col("ok").as("ok2"), col("sk").as("b"))
    x.join(y, col("ok") === col("ok2") && col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
  }
  private val coPurchaseW2Sql: String =
    """li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
      |w2 AS MATERIALIZED (
      |  SELECT x.sk AS a, y.sk AS b, CAST(count(*) AS BIGINT) AS w
      |  FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk
      |  GROUP BY x.sk, y.sk HAVING count(*) >= 2)""".stripMargin

  /** The top-8-sparsified undirected supplier graph shared by tc1 and
    * lcc1 (see the tc1 scaladoc for why the sparsification is the
    * scale-safety condition). */
  private def sparsifiedUndOf(s: SparkSession, d: String): DataFrame = {
    val w2 = coPurchaseW2(s, d)
    val dir = w2.select(col("a").as("n"), col("b").as("nb"), col("w"))
      .unionAll(w2.select(col("b").as("n"), col("a").as("nb"), col("w")))
    val topw = Window.partitionBy("n").orderBy(col("w").desc, col("nb"))
    dir.withColumn("r", row_number().over(topw)).filter(col("r") <= 8)
      .select(least(col("n"), col("nb")).as("a"), greatest(col("n"), col("nb")).as("b"))
      .distinct()
  }
  /** CTE chain ending in `und(a, b)` — the oracle twin of
    * [[sparsifiedUndOf]], shared by tc1Sql and lcc1Sql. */
  private val sparsifiedUndSql: String =
    s"""$coPurchaseW2Sql,
      |dir AS (
      |  SELECT a AS n, b AS nb, w FROM w2 UNION ALL SELECT b AS n, a AS nb, w FROM w2),
      |und AS MATERIALIZED (
      |  SELECT DISTINCT least(n, nb) AS a, greatest(n, nb) AS b FROM (
      |    SELECT n, nb, row_number() OVER (PARTITION BY n ORDER BY w DESC, nb) AS r
      |    FROM dir) WHERE r <= 8)""".stripMargin

  val tc1: Q = (s, d) => triangleCountsOf(sparsifiedUndOf(s, d)).orderBy("node")
  val tc1Sql: String =
    s"""WITH $sparsifiedUndSql,
      |deg AS MATERIALIZED (
      |  SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
      |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
      |oriented AS MATERIALIZED (
      |  SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
      |              THEN u.a ELSE u.b END AS u,
      |         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
      |              THEN u.b ELSE u.a END AS v
      |  FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b),
      |tris AS MATERIALIZED (
      |  SELECT e1.u, e1.v AS v1, e2.v AS v2
      |  FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u AND e1.v < e2.v
      |  JOIN und ON und.a = e1.v AND und.b = e2.v)
      |SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
      |  SELECT u AS node FROM tris
      |  UNION ALL SELECT v1 AS node FROM tris
      |  UNION ALL SELECT v2 AS node FROM tris)
      |GROUP BY node ORDER BY node""".stripMargin

  // ---- LCC1: local clustering coefficient ----

  /** LCC1: per-node local clustering coefficient (Watts–Strogatz 1998)
    * over the same sparsified supplier graph as tc1 —
    * lcc = 2·triangles(v) / (deg(v)·(deg(v)−1)) in exact e6 fixed point
    * (dg < 2 ⇒ 0, guarding the ANSI divide), the standard
    * community-tightness audit beside the raw triangle counts: a
    * high-degree node with few triangles is a BRIDGE, a low-degree node
    * with lcc ≈ 1 sits inside a clique — exactly the distinction
    * community detection (lp1) and dedup-cluster QA care about.
    *
    * Scale: tc1's degree-oriented triangle machinery (wedge work bounded
    * by the top-8 sparsification) plus one degree aggregate and one
    * left join — node-bounded frames beyond the shared edge scan.
    * Library entry point: [[graft.api.GraftApi.clusteringCoefficients]]
    * (any undirected a<b edge frame). */
  private[graft] def clusteringCoefficientsOf(und0: DataFrame): DataFrame = {
    // lazy (round-13): `und` ends in a distinct() exchange, so its ~6
    // references below share ONE shuffle write via ReusedExchange — the
    // old eager checkpoint pinned a block per call that Spark never frees
    val und = und0.select(col("a"), col("b"))
    val deg = und.select(col("a").as("node")).unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
    deg.join(triangleCountsOf(und), Seq("node"), "left")
      .na.fill(0L, Seq("n_tri"))
      .withColumn("lcc_e6", expr(
        "CASE WHEN dg >= 2 THEN 2000000 * n_tri div (dg * (dg - 1)) ELSE 0L END"))
      .orderBy("node")
  }

  val lcc1: Q = (s, d) => clusteringCoefficientsOf(sparsifiedUndOf(s, d))
  val lcc1Sql: String =
    s"""WITH $sparsifiedUndSql,
      |deg AS MATERIALIZED (
      |  SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
      |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
      |oriented AS MATERIALIZED (
      |  SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
      |              THEN u.a ELSE u.b END AS u,
      |         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
      |              THEN u.b ELSE u.a END AS v
      |  FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b),
      |tris AS MATERIALIZED (
      |  SELECT e1.u, e1.v AS v1, e2.v AS v2
      |  FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u AND e1.v < e2.v
      |  JOIN und ON und.a = e1.v AND und.b = e2.v),
      |ntri AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
      |    SELECT u AS node FROM tris
      |    UNION ALL SELECT v1 AS node FROM tris
      |    UNION ALL SELECT v2 AS node FROM tris)
      |  GROUP BY node)
      |SELECT d.v AS node, d.dg, coalesce(t.n_tri, 0) AS n_tri,
      |       CASE WHEN d.dg >= 2 THEN 2000000 * coalesce(t.n_tri, 0) // (d.dg * (d.dg - 1))
      |            ELSE 0 END AS lcc_e6
      |FROM deg d LEFT JOIN ntri t ON t.node = d.v
      |ORDER BY node""".stripMargin

  // ---- GR1: Newman modularity of a node partition ----

  /** GR1: Newman–Girvan modularity (PNAS 2004) of a given node
    * partition over an undirected (a, b) edge frame — here the NATION
    * partition of the sparsified supplier co-purchase graph: does the
    * business segmentation match the graph's actual community
    * structure? This is the standard fitness score community detection
    * (lp1) optimizes, exposed as the AUDIT of any candidate partition:
    * Q = Σ_c [e_c/m − (d_c/2m)²], carried in the common-denominator
    * integer form num_c = 4m·e_c − d_c² so the overall
    * Q = Σ num_c / (4m²) divides ONCE, exactly. Per community the row
    * holds its exact integer evidence (n_nodes, within-edges e_in,
    * degree mass d_sum) plus its own truncated q_e9 share; an
    * overall NULL-community rollup row folds the Σ num_c partials —
    * never a second edge scan (the emb7 rollup convention).
    *
    * Exactness: m, e_c, d_c are integer counts; num_c rides
    * DECIMAL(38,0)/HUGEINT (d_c² and 4m² square corpus-sized counts —
    * the eval2 overflow class); q_e9 sign-splits (num_c < 0 for
    * under-connected communities, and trunc ≠ floor on negatives);
    * NULL when m = 0 (the voc3 convention). Nodes without a community
    * row contribute no e_c/d_c mass (inner join), but `m` — and the 4m²
    * denominator — counts ALL edges, including those touching unlabeled
    * nodes: a PARTIAL labeling is scored against the WHOLE graph's edge
    * mass (the standard Q definition), not re-normalized to its covered
    * subgraph, so partial labelings systematically deflate Q. Pass a
    * pre-filtered edge frame if subgraph-relative modularity is wanted.
    *
    * Scale: one degree aggregate, two broadcast-joinable community
    * lookups against the edge frame (communities are a dimension,
    * edges are the fact), then community-domain frames. Library entry
    * point: [[graft.api.GraftApi.modularity]]. */
  private[graft] def modularityOf(und0: DataFrame, communities: DataFrame): DataFrame = {
    // lazy (round-13): the three `und` references share the upstream
    // distinct() exchange via ReusedExchange — no pinned block needed
    val und = und0.select(col("a"), col("b"))
    val cm = communities.select(col("node"), col("c"))
    val deg = und.select(col("a").as("node")).unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
    val dC = deg.join(cm, Seq("node"))
      .groupBy("c").agg(count(lit(1)).as("n_nodes"), sum("dg").as("d_sum"))
    val eC = und
      .join(cm.select(col("node").as("a"), col("c").as("ca")), Seq("a"))
      .join(cm.select(col("node").as("b"), col("c").as("cb")), Seq("b"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca")).agg(count(lit(1)).as("e_in"))
      .withColumnRenamed("ca", "c")
    val mAgg = und.agg(count(lit(1)).cast("decimal(38,0)").as("m"))
    val per = dC.join(eC, Seq("c"), "left").na.fill(0L, Seq("e_in"))
      .crossJoin(broadcast(mAgg))
      .withColumn("num", expr(
        "4 * m * e_in - CAST(d_sum AS DECIMAL(38,0)) * d_sum"))
    def qE9(numCol: String): String =
      s"CASE WHEN m = 0 THEN CAST(NULL AS BIGINT) " +
        s"WHEN $numCol >= 0 THEN CAST($numCol * 1000000000 div (4 * m * m) AS BIGINT) " +
        s"ELSE -CAST((-$numCol) * 1000000000 div (4 * m * m) AS BIGINT) END"
    val perRows = per.select(col("c").cast("long").as("community"),
      col("n_nodes"), col("e_in"), col("d_sum"), expr(qE9("num")).as("q_e9"))
    val overall = per.agg(sum("n_nodes").as("n_nodes"), sum("e_in").as("e_in"),
        sum("d_sum").as("d_sum"), sum("num").as("tnum"))
      .crossJoin(broadcast(mAgg))
      .select(lit(null).cast("long").as("community"),
        col("n_nodes").cast("long").as("n_nodes"), col("e_in").cast("long").as("e_in"),
        col("d_sum").cast("long").as("d_sum"), expr(qE9("tnum")).as("q_e9"))
    perRows.unionByName(overall).orderBy("community")
  }

  val gr1: Q = (s, d) => modularityOf(sparsifiedUndOf(s, d),
    Tables.supplier(s, d).select(col("s_suppkey").as("node"), col("s_nationkey").as("c")))
  val gr1Sql: String =
    s"""WITH $sparsifiedUndSql,
      |cm AS (SELECT s_suppkey AS node, s_nationkey AS c FROM supplier),
      |deg AS (
      |  SELECT v AS node, CAST(count(*) AS BIGINT) AS dg FROM (
      |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
      |mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM und),
      |dc AS (
      |  SELECT c, CAST(count(*) AS BIGINT) AS n_nodes, CAST(sum(dg) AS BIGINT) AS d_sum
      |  FROM deg JOIN cm USING (node) GROUP BY c),
      |ec AS (
      |  SELECT ca.c AS c, CAST(count(*) AS BIGINT) AS e_in
      |  FROM und u JOIN cm ca ON ca.node = u.a
      |       JOIN cm cb ON cb.node = u.b AND cb.c = ca.c
      |  GROUP BY ca.c),
      |per AS (
      |  SELECT dc.c, n_nodes, coalesce(e_in, 0) AS e_in, d_sum,
      |         4 * m * coalesce(e_in, 0) - CAST(d_sum AS HUGEINT) * d_sum AS num, m
      |  FROM dc LEFT JOIN ec USING (c) CROSS JOIN mm),
      |rows AS (
      |  SELECT c, n_nodes, e_in, d_sum, num, m FROM per
      |  UNION ALL
      |  SELECT NULL, CAST(sum(n_nodes) AS BIGINT), CAST(sum(e_in) AS BIGINT),
      |         CAST(sum(d_sum) AS BIGINT), CAST(sum(num) AS HUGEINT), max(m)
      |  FROM per)
      |SELECT CAST(c AS BIGINT) AS community, n_nodes, e_in, d_sum,
      |       CASE WHEN m = 0 THEN CAST(NULL AS BIGINT)
      |            WHEN num >= 0 THEN CAST(num * 1000000000 // (4 * m * m) AS BIGINT)
      |            ELSE -CAST((-num) * 1000000000 // (4 * m * m) AS BIGINT) END AS q_e9
      |FROM rows ORDER BY community""".stripMargin

  // ---- GR3: global transitivity ----

  /** GR3: the global clustering coefficient (transitivity) of an
    * undirected (a, b) edge frame — closed wedges over all wedges,
    * C = 3·#triangles / #wedges — the ONE-NUMBER closure summary that
    * completes the structure panel (lcc1 gives the per-node view, which
    * over-weights low-degree nodes; transitivity weights every wedge
    * equally — the two can disagree wildly on hub-and-spoke graphs, and
    * that disagreement is itself the diagnostic). Σ_v n_tri(v) counts
    * each triangle three times, so C = 2·Σn_tri / Σ dg·(dg−1) divides
    * ONCE, exactly (e6; DECIMAL(38,0)/HUGEINT — wedge counts square
    * degrees; NULL when the graph has no wedges, the voc3 convention).
    *
    * Scale: tc1's degree-oriented triangle machinery + one degree
    * aggregate + a 1-row fold. Library entry point:
    * [[graft.api.GraftApi.transitivity]]. */
  private[graft] def transitivityOf(und0: DataFrame): DataFrame = {
    // lazy (round-13): same ReusedExchange argument as lcc1/gr1
    val und = und0.select(col("a"), col("b"))
    val deg = und.select(col("a").as("node")).unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
    val tri = triangleCountsOf(und).agg(
      sum(expr("CAST(n_tri AS DECIMAL(38,0))")).as("tri3"))
    deg.agg(count(lit(1)).cast("long").as("n_nodes"),
        sum(expr("CAST(dg AS DECIMAL(38,0)) * (dg - 1)")).as("wedges2"))
      .crossJoin(broadcast(tri))
      .select(col("n_nodes"),
        expr("CAST(coalesce(tri3, CAST(0 AS DECIMAL(38,0))) div 3 AS BIGINT)").as("n_triangles"),
        expr("CAST(wedges2 div 2 AS BIGINT)").as("n_wedges"),
        expr("CASE WHEN wedges2 = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(coalesce(tri3, CAST(0 AS DECIMAL(38,0))) * 2 * 1000000 div wedges2 AS BIGINT) END")
          .as("transitivity_e6"))
  }

  val gr3: Q = (s, d) => transitivityOf(sparsifiedUndOf(s, d))
  val gr3Sql: String =
    s"""WITH $sparsifiedUndSql,
      |deg AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
      |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
      |oriented AS MATERIALIZED (
      |  SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
      |              THEN u.a ELSE u.b END AS u,
      |         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
      |              THEN u.b ELSE u.a END AS v
      |  FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b),
      |tris AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n_tri
      |  FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u AND e1.v < e2.v
      |  JOIN und ON und.a = e1.v AND und.b = e2.v),
      |dd AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |         CAST(sum(CAST(dg AS HUGEINT) * (dg - 1)) AS HUGEINT) AS wedges2
      |  FROM deg)
      |SELECT n_nodes, CAST(n_tri AS BIGINT) AS n_triangles,
      |       CAST(wedges2 // 2 AS BIGINT) AS n_wedges,
      |       CASE WHEN wedges2 = 0 THEN CAST(NULL AS BIGINT)
      |            ELSE CAST(n_tri * 3 * 2 * 1000000 // wedges2 AS BIGINT) END AS transitivity_e6
      |FROM dd CROSS JOIN tris""".stripMargin

  // ---- GR2: degree assortativity ----

  /** GR2: Newman's degree assortativity coefficient (PRL 2002) over an
    * undirected (a, b) edge frame — the Pearson correlation of the
    * degrees at the two ends of each edge, over both stub directions:
    * r > 0 means hubs wire to hubs (social-network shape), r < 0 means
    * hubs wire to leaves (the internet/star shape). Beside gr1
    * (partition fitness) and lcc1 (local closure) this completes the
    * standard one-number structure panel.
    *
    * WHOLLY exact — no sqrt: over the 2m directed stubs the x and y
    * degree sequences are permutations of each other, so both Pearson
    * denominators are THE SAME integer D = M·Σx² − (Σx)² and
    * r = (M·Σxy − (Σx)²) / D is a pure rational — sign-split e6, NULL
    * when D = 0 (a regular graph has undefined assortativity — the
    * voc3 convention). Sums ride DECIMAL(38,0)/HUGEINT (Σxy squares
    * degree mass — the eval2 overflow class).
    *
    * Scale: one degree aggregate + two broadcast-free equi-joins of the
    * edge frame against the node-domain degree table + a 1-row fold.
    * Library entry point: [[graft.api.GraftApi.assortativity]]. */
  private[graft] def assortativityOf(und0: DataFrame): DataFrame = {
    val und = und0.select(col("a"), col("b"))
    val deg = und.select(col("a").as("node")).unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
    // the und⋈deg⋈deg three-way join is built ONCE and its two swapped
    // stub projections union it (round-13 advice: the old body repeated
    // the identical join expression per direction — ReusedExchange
    // dedupes the shuffles either way, but the doubled subtree paid the
    // sparsified-graph window/distinct pipeline twice at plan level)
    val dd = und
      .join(deg.select(col("node").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("dg").as("db")), Seq("b"))
      .select(col("da"), col("db"))
    val stubs = dd.select(col("da").as("x"), col("db").as("y"))
      .unionAll(dd.select(col("db").as("x"), col("da").as("y")))
    stubs.agg(count(lit(1)).cast("decimal(38,0)").as("m2"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .select(expr("CAST(m2 div 2 AS BIGINT)").as("m_edges"),
        expr("CASE WHEN m2 * sxx - sx * sx = 0 THEN CAST(NULL AS BIGINT) " +
          "WHEN m2 * sxy - sx * sx >= 0 " +
          "THEN CAST((m2 * sxy - sx * sx) * 1000000 div (m2 * sxx - sx * sx) AS BIGINT) " +
          "ELSE -CAST((sx * sx - m2 * sxy) * 1000000 div (m2 * sxx - sx * sx) AS BIGINT) END")
          .as("assort_e6"))
  }

  val gr2: Q = (s, d) => assortativityOf(sparsifiedUndOf(s, d))
  val gr2Sql: String =
    s"""WITH $sparsifiedUndSql,
      |deg AS (
      |  SELECT v AS node, CAST(count(*) AS BIGINT) AS dg FROM (
      |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
      |stubs AS (
      |  SELECT da.dg AS x, db.dg AS y
      |  FROM und u JOIN deg da ON da.node = u.a JOIN deg db ON db.node = u.b
      |  UNION ALL
      |  SELECT db.dg AS x, da.dg AS y
      |  FROM und u JOIN deg da ON da.node = u.a JOIN deg db ON db.node = u.b),
      |st AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS m2,
      |         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM stubs)
      |SELECT CAST(m2 // 2 AS BIGINT) AS m_edges,
      |       CASE WHEN m2 * sxx - sx * sx = 0 THEN CAST(NULL AS BIGINT)
      |            WHEN m2 * sxy - sx * sx >= 0
      |              THEN CAST((m2 * sxy - sx * sx) * 1000000 // (m2 * sxx - sx * sx) AS BIGINT)
      |            ELSE -CAST((sx * sx - m2 * sxy) * 1000000 // (m2 * sxx - sx * sx) AS BIGINT) END AS assort_e6
      |FROM st""".stripMargin

  // ---- KCORE1: bounded-round k-core peeling ----

  /** `rounds` peeling passes toward the k-core of an undirected (a, b)
    * edge frame: drop nodes with degree < k, restrict edges to
    * survivors, repeat — the library entry point
    * ([[graft.api.GraftApi.kcorePeel]]). Fixed round count (the pr1 /
    * d8-cap convention: the driver loop holds iteration COUNT, never
    * data); most real graphs' peeling converges in a handful of rounds,
    * and a caller needing the exact fixpoint raises `rounds`. Each round
    * is one degree aggregate + two semi-joins, all on integer keys, with
    * the surviving edge frame eagerly checkpointed per round — unlike the
    * other graph loops this one references EACH round's frame three
    * times (degree union ×2 + join left side), so a lazy chain triples
    * the subtree per round (3^rounds copies; the round-13 lazy attempt
    * planned 1000 parquet scans and ran 4× slower at sf0.1). Superseded
    * rounds free their blocks immediately ([[Pinned.checkpoint]]); only
    * the last round's node-bounded frame stays pinned behind the
    * returned aggregate — [[graft.api.GraftApi.releasePinned]] frees it.
    * Emits surviving (node, deg_core). */
  private[graft] def kcorePeelOf(und0: DataFrame, k: Int = 3, rounds: Int = 3): DataFrame = {
    var (und, freeUnd) = Pinned.checkpoint(und0.select(col("a"), col("b")))
    for (_ <- 1 to rounds) {
      val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
      val keep = deg.filter(col("dg") >= k).select("v")
      val (next, freeNext) = Pinned.checkpoint(und
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b")))
      freeUnd()
      und = next
      freeUnd = freeNext
    }
    und.select(col("a").as("node")).unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg_core"))
  }

  /** KCORE1: the 3-core of the supplier co-purchase graph after 3
    * peeling rounds — the "stable trading cluster" cut of the same w ≥ 2
    * edge set tc1 sparsifies. */
  val kcore1: Q = (s, d) =>
    kcorePeelOf(coPurchaseW2(s, d)).orderBy("node")
  val kcore1Sql: String = {
    def round(prev: String, out: String): String =
      s"""keep$out AS MATERIALIZED (
         |  SELECT v FROM (
         |    SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
         |      SELECT a AS v FROM $prev UNION ALL SELECT b AS v FROM $prev) GROUP BY v)
         |  WHERE dg >= 3),
         |$out AS MATERIALIZED (
         |  SELECT e.a, e.b FROM $prev e
         |  JOIN keep$out ka ON ka.v = e.a JOIN keep$out kb ON kb.v = e.b)""".stripMargin
    s"""WITH $coPurchaseW2Sql,
       |e0 AS (SELECT a, b FROM w2),
       |${round("e0", "e1")},
       |${round("e1", "e2")},
       |${round("e2", "e3")}
       |SELECT node, CAST(count(*) AS BIGINT) AS deg_core FROM (
       |  SELECT a AS node FROM e3 UNION ALL SELECT b AS node FROM e3)
       |GROUP BY node ORDER BY node""".stripMargin
  }

  // ---- PR2: HITS hubs/authorities over the directed purchase graph ----

  /** Integer HITS (Kleinberg JACM 1999) over a DIRECTED bipartite edge
    * frame (src = hub side, dst = authority side): per round, authority
    * = Σ incoming hub scores, hub = Σ outgoing authority scores, each
    * side renormalized to max = 10⁶ by ONE integer division (`s·10⁶ div
    * max(s)` — exact in both engines, unlike L2 normalization which
    * could never be cross-engine bit-stable). The library entry point
    * ([[graft.api.GraftApi.hits]]).
    *
    * Scale: pr1's loop shape — each half-step is one map-side-combined
    * groupBy shuffle on the cached edge list plus a 1-row max broadcast;
    * the driver holds the iteration count, never data. */
  private[graft] def hitsOf(edges: DataFrame, iters: Int = 2): DataFrame = {
    // iters = 0 would return before the authority frame exists
    require(iters >= 1, s"hits needs at least one iteration, got $iters")
    val e = edges.select(col("src"), col("dst")).distinct()
    // FULLY LAZY (round-13): the per-half-step max is no longer a driver
    // `.head()` action but a 1-row broadcast aggregate CROSS-JOINED into
    // the plan — so nothing materializes until the caller acts, no
    // per-half-step checkpoint blocks pin (Spark never GC-frees them),
    // and the e.distinct() exchange is written once and reused across
    // all 2·iters half-steps. Each half-step's groupBy exchange is
    // likewise shared between its max branch and its normalize branch
    // via ReusedExchange, so the "referenced twice ⇒ computed twice"
    // hazard the old eager barrier guarded against never materializes as
    // repeated shuffle work. Plan SIZE still doubles per half-step
    // (2^(2·iters) leaf copies) — fine at the fixed iters=2 this engine
    // uses; past the comfort zone [[PlanGuard]] cuts the hub frame's
    // chain every few rounds so high iteration counts stay bounded.
    // renormalization in DECIMAL(38,0): s ≤ degree·10⁶, so s·10⁶ wraps
    // int64 once a node's in-degree passes ~9.2e6 — real at 100 TB; the
    // integral divide lands back in [0, 10⁶] so the stored score stays
    // a plain long
    def renorm(raw: DataFrame, keyCol: String, outCol: String): DataFrame =
      raw.crossJoin(broadcast(raw.agg(max("s").as("mx"))))
        .select(col(keyCol).as("node"),
          expr("CAST(CAST(s AS DECIMAL(38,0)) * 1000000 div mx AS BIGINT)").as(outCol))
    val guard = new PlanGuard(iters)
    var h = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("hs"))
    var a: DataFrame = null
    for (i <- 1 to iters) {
      val araw = e.join(h, e("src") === h("node"))
        .groupBy("dst").agg(sum("hs").as("s"))
      a = renorm(araw, "dst", "as_")
      val hraw = e.join(a, e("dst") === a("node"))
        .groupBy("src").agg(sum("as_").as("s"))
      h = guard(renorm(hraw, "src", "hs"), i)
    }
    a.select(col("node"), col("as_").as("auth_e6"))
  }

  /** PR2: supplier authority under HITS — customers are hubs (they
    * "cite" the suppliers they buy from), suppliers are authorities; a
    * supplier scores high when HIGH-HUB customers (broad buyers) buy
    * from it, which is a different signal than pr1's random-walk mass.
    * Two exact-integer rounds over the distinct (customer → supplier)
    * purchase edges. */
  val pr2: Q = (s, d) =>
    // long-encoded nodes (see the pr1 encoding note); every authority is
    // a supplier (the dst side), decoded at the boundary
    hitsOf(purchaseEdges(s, d))
      .select(concat(lit("s"), expr("node div 2")).as("node"), col("auth_e6"))
      .orderBy("node")
  val pr2Sql: String =
    """WITH e0 AS MATERIALIZED (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |h0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS hs FROM e0),
      |a1r AS (SELECT e.dst, CAST(sum(h0.hs) AS BIGINT) AS s
      |        FROM e0 e JOIN h0 ON h0.node = e.src GROUP BY e.dst),
      |a1 AS MATERIALIZED (SELECT dst AS node,
      |        CAST(CAST(s AS HUGEINT) * 1000000 // (SELECT max(s) FROM a1r) AS BIGINT) AS as_ FROM a1r),
      |h1r AS (SELECT e.src, CAST(sum(a1.as_) AS BIGINT) AS s
      |        FROM e0 e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
      |h1 AS MATERIALIZED (SELECT src AS node,
      |        CAST(CAST(s AS HUGEINT) * 1000000 // (SELECT max(s) FROM h1r) AS BIGINT) AS hs FROM h1r),
      |a2r AS (SELECT e.dst, CAST(sum(h1.hs) AS BIGINT) AS s
      |        FROM e0 e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
      |a2 AS (SELECT dst AS node,
      |        CAST(CAST(s AS HUGEINT) * 1000000 // (SELECT max(s) FROM a2r) AS BIGINT) AS as_ FROM a2r)
      |SELECT node, as_ AS auth_e6 FROM a2 ORDER BY node""".stripMargin

  // ---- LP1: synchronous label propagation (communities, not CC) ----

  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007, 0709.2938) over an undirected (a, b) edge frame: labels
    * start as node ids; each round every node adopts the MOST FREQUENT
    * label among its neighbors, ties broken by the smallest label —
    * fully deterministic (the classic algorithm's random visit order
    * replaced by the synchronous+min-tie rule, the price of
    * hash-checkable output). Unlike d18/CC's min-label spread this is a
    * MODE vote: dense clusters converge to internal labels and sparse
    * bridges do NOT merge everything into one component.
    *
    * Scale: per round ONE shuffle (edge⋈label join into a
    * (node, label) count) + a per-node argmax window over the
    * neighbor-label domain (bounded by each node's distinct neighbor
    * labels, never the graph); fully lazy (round-13) — the e.distinct()
    * exchange is reused across rounds and nothing pins. The library
    * entry point is [[graft.api.GraftApi.labelPropagation]]. */
  private[graft] def labelPropagationOf(und0: DataFrame, rounds: Int = 2): DataFrame = {
    val e = und0.select(col("a"), col("b"))
      .unionAll(und0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val guard = new PlanGuard(rounds)
    var lab = e.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (i <- 1 to rounds) {
      val votes = e
        .join(lab.select(col("node").as("b"), col("lbl").as("nlbl")), Seq("b"))
        .groupBy(col("a"), col("nlbl")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("a").orderBy(col("c").desc, col("nlbl"))
      lab = guard(votes.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("a").as("node"), col("nlbl").as("lbl")), i)
    }
    // community sizes via ONE window pass over the final labels instead
    // of a groupBy + self-join — the lazy final `lab` is window-topped,
    // and a second reference would recompute its whole vote pipeline
    // (measured ~2x wall at sf0.1 on the lazy round-13 shape)
    lab.withColumn("csize",
        count(lit(1)).over(Window.partitionBy("lbl")))
      .select(col("node"), col("lbl").as("community"), col("csize"))
  }

  /** LP1: 2-round label propagation on the supplier co-purchase graph
    * (tc1/kcore1's w ≥ 2 edge set). The oracle replays both synchronous
    * rounds as chained vote/argmax CTEs. */
  val lp1: Q = (s, d) =>
    labelPropagationOf(coPurchaseW2(s, d)).orderBy("node")
  val lp1Sql: String = {
    def round(prev: String, out: String): String =
      s"""v$out AS (
         |  SELECT e.a, l.lbl AS nlbl, CAST(count(*) AS BIGINT) AS c
         |  FROM sym e JOIN $prev l ON l.node = e.b
         |  GROUP BY e.a, l.lbl),
         |$out AS MATERIALIZED (
         |  SELECT a AS node, nlbl AS lbl FROM (
         |    SELECT a, nlbl, row_number() OVER (PARTITION BY a ORDER BY c DESC, nlbl) AS rk
         |    FROM v$out)
         |  WHERE rk = 1)""".stripMargin
    s"""WITH $coPurchaseW2Sql,
       |sym AS MATERIALIZED (
       |  SELECT a, b FROM w2 UNION SELECT b AS a, a AS b FROM w2),
       |l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM sym),
       |${round("l0", "l1")},
       |${round("l1", "l2")},
       |sizes AS (SELECT lbl, CAST(count(*) AS BIGINT) AS csize FROM l2 GROUP BY lbl)
       |SELECT l.node, l.lbl AS community, s.csize
       |FROM l2 l JOIN sizes s ON s.lbl = l.lbl
       |ORDER BY l.node""".stripMargin
  }

  // ---- BFS1: multi-source BFS levels (seed-set reachability) ----

  /** Multi-source BFS over a directed (src, dst) edge frame: every node
    * within `maxDepth` hops of the seed set, labeled with its exact hop
    * distance — the reachability/lineage primitive (blast-radius of a
    * contaminated source, provenance closure, influence frontier).
    *
    * Scale: textbook frontier BFS — per level ONE equi-join of the
    * CURRENT frontier (never the full visited set) against the edge
    * list, one distinct, one anti-join against visited. Fully lazy
    * (round-13): the edge list and every level's distinct() end in
    * exchanges that ReusedExchange writes once, so neither the old edge
    * persist nor the per-round checkpoints (whose blocks Spark never
    * GC-frees) are needed; plan size grows ~3× per level — fine at the
    * fixed small depths this engine uses, and past the comfort zone
    * [[PlanGuard]] cuts the chain every few levels (rebuilding the
    * frontier from the checkpointed dist frame's current level), so a
    * caller can walk arbitrarily deep with bounded plan size. Work per
    * level is |edges out of frontier|, total O(edges within maxDepth),
    * independent of graph diameter beyond the cap. The driver holds the
    * level counter only. */
  private[graft] def bfsLevelsOf(edges: DataFrame, seeds: DataFrame,
      maxDepth: Int = 3): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val guard = new PlanGuard(maxDepth)
    var dist = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
    var frontier = dist.select("node")
    for (i <- 1 to maxDepth) {
      val nbrs = e.join(frontier, e("src") === frontier("node"))
        .select(e("dst").as("node")).distinct()
      val fresh = nbrs.join(dist.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(i.toLong).as("dist"))
      dist = dist.unionAll(fresh)
      if (guard.shouldCut(i)) {
        // cut dist's chain, then rebuild the frontier FROM the cut frame
        // (its current level's rows) so the next level's join also starts
        // from the checkpoint, not the lazy `fresh` subtree
        dist = guard.cut(dist)
        frontier = dist.filter(col("dist") === i.toLong).select("node")
      } else frontier = fresh.select("node")
    }
    dist
  }

  /** BFS1 on the fixture: the pr1 purchase graph, seeded at every tenth
    * supplier (a key-modulus seed set that is non-empty at every sf,
    * unlike a nation predicate) — "which customers and second-degree
    * suppliers does this supply slice touch within 3 hops". */
  val bfs1: Q = (s, d) => {
    // long-encoded nodes (see the pr1 encoding note), decoded at the
    // boundary — the per-level frontier joins and distincts ride longs
    val e0 = purchaseEdges(s, d)
    val und = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = Tables.supplier(s, d).filter(col("s_suppkey") % 10 === 0)
      .select(encSupp(col("s_suppkey")).as("node"))
    bfsLevelsOf(und, seeds).select(decodeNode, col("dist")).orderBy("node")
  }
  val bfs1Sql: String =
    """WITH e0 AS (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |r0 AS MATERIALIZED (
      |  SELECT DISTINCT 's' || s_suppkey AS node FROM supplier WHERE s_suppkey % 10 = 0),
      |r1 AS MATERIALIZED (
      |  SELECT node FROM r0
      |  UNION SELECT e.dst FROM edges e JOIN r0 ON e.src = r0.node),
      |r2 AS MATERIALIZED (
      |  SELECT node FROM r1
      |  UNION SELECT e.dst FROM edges e JOIN r1 ON e.src = r1.node),
      |r3 AS MATERIALIZED (
      |  SELECT node FROM r2
      |  UNION SELECT e.dst FROM edges e JOIN r2 ON e.src = r2.node)
      |SELECT node,
      |       CAST(CASE WHEN node IN (SELECT node FROM r0) THEN 0
      |                 WHEN node IN (SELECT node FROM r1) THEN 1
      |                 WHEN node IN (SELECT node FROM r2) THEN 2
      |                 ELSE 3 END AS BIGINT) AS dist
      |FROM r3 ORDER BY node""".stripMargin

  // ---- PPR1: personalized PageRank from a seed set ----

  /** Personalized PageRank (Jeh–Widom 2003 shape): pr1's exact-integer
    * power iteration with the teleport mass restricted to a SEED set —
    * the "importance relative to these nodes" primitive (seed-anchored
    * corpus selection, graph-RAG neighborhood scoring, influence
    * attribution), where bfs1 answers "how far", ppr1 answers "how
    * much". Seeds start at 10⁶; each step a node scores
    * `150000·[seed] + (850·Σ rank div degree) div 1000` — all exact
    * integer (the pr1 convention), so three iterations hash-match the
    * chained-CTE oracle. Nodes never reached keep rank 0 and are
    * dropped.
    *
    * Scale: identical to pr1 — degree folded once into the cached edge
    * list, per iteration ONE map-side-combined shuffle of contributions
    * + a full-outer join against the (tiny, checkpointed) seed frame;
    * rank frames only ever contain REACHED nodes (the r>0 filter feeds
    * the next join), so early iterations touch the seed neighborhood,
    * not the graph. */
  private[graft] def personalizedPageRankOf(edges: DataFrame, seeds: DataFrame,
      iters: Int = Iters): DataFrame = {
    // fully lazy (round-13, the pageRankOf argument): the `ed` and `sd`
    // subtrees are plan-identical across iterations, so their exchanges
    // are written once and reused; no pinned blocks escape the call
    val e = edges.select(col("src"), col("dst"))
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("d")), Seq("src"))
    val guard = new PlanGuard(iters)
    val sd = seeds.select(col("node")).distinct()
      .withColumn("is_seed", lit(1))
    var r = sd.select(col("node"), lit(1000000L).as("r"))
    for (i <- 1 to iters) {
      val contrib = ed
        .join(r.filter(col("r") > 0L), ed("src") === r("node"))
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy("dst").agg(expr("CAST((850 * sum(c)) div 1000 AS BIGINT)").as("contrib"))
        .select(col("dst").as("node"), col("contrib"))
      r = guard(contrib.join(sd, Seq("node"), "full_outer")
        .select(col("node"),
          (coalesce(col("contrib"), lit(0L)) +
            when(col("is_seed").isNotNull, 150000L).otherwise(0L)).as("r")), i)
    }
    r.filter(col("r") > 0L).select(col("node"), col("r").as("rank_e6"))
  }

  /** PPR1 on the fixture: the pr1 purchase graph scored from bfs1's
    * every-tenth-supplier seed slice. */
  val ppr1: Q = (s, d) => {
    // long-encoded nodes (see the pr1 encoding note), decoded at the boundary
    val e0 = purchaseEdges(s, d)
    val und = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = Tables.supplier(s, d).filter(col("s_suppkey") % 10 === 0)
      .select(encSupp(col("s_suppkey")).as("node"))
    personalizedPageRankOf(und, seeds)
      .select(decodeNode, col("rank_e6")).orderBy("node")
  }
  val ppr1Sql: String =
    """WITH e0 AS (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
      |seeds AS MATERIALIZED (
      |  SELECT DISTINCT 's' || s_suppkey AS node FROM supplier WHERE s_suppkey % 10 = 0),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM seeds),
      |c1 AS (SELECT e.dst AS node, (850 * sum(r0.r // deg.d)) // 1000 AS contrib
      |       FROM edges e JOIN deg ON deg.src = e.src
      |       JOIN r0 ON r0.node = e.src AND r0.r > 0 GROUP BY e.dst),
      |r1 AS MATERIALIZED (
      |  SELECT COALESCE(c.node, s.node) AS node,
      |         CAST(COALESCE(c.contrib, 0) + CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END AS BIGINT) AS r
      |  FROM c1 c FULL JOIN seeds s ON s.node = c.node),
      |c2 AS (SELECT e.dst AS node, (850 * sum(r1.r // deg.d)) // 1000 AS contrib
      |       FROM edges e JOIN deg ON deg.src = e.src
      |       JOIN r1 ON r1.node = e.src AND r1.r > 0 GROUP BY e.dst),
      |r2 AS MATERIALIZED (
      |  SELECT COALESCE(c.node, s.node) AS node,
      |         CAST(COALESCE(c.contrib, 0) + CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END AS BIGINT) AS r
      |  FROM c2 c FULL JOIN seeds s ON s.node = c.node),
      |c3 AS (SELECT e.dst AS node, (850 * sum(r2.r // deg.d)) // 1000 AS contrib
      |       FROM edges e JOIN deg ON deg.src = e.src
      |       JOIN r2 ON r2.node = e.src AND r2.r > 0 GROUP BY e.dst),
      |r3 AS (
      |  SELECT COALESCE(c.node, s.node) AS node,
      |         CAST(COALESCE(c.contrib, 0) + CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END AS BIGINT) AS r
      |  FROM c3 c FULL JOIN seeds s ON s.node = c.node)
      |SELECT node, r AS rank_e6 FROM r3 WHERE r > 0 ORDER BY node""".stripMargin

  // ---- GR4: common-neighbor link prediction (bipartite projection) ----

  /** GR4: link prediction over the customer–supplier purchase graph —
    * the top-20 supplier pairs most likely to be substitutes, scored by
    * common customers (the common-neighbors heuristic) with an exact
    * integer Jaccard tie-metric cn·1e6 div (d_a + d_b − cn). This is the
    * bipartite-projection wedge join (suppliers co-purchased by the same
    * customer), the same candidate-generation shape as d3's band join:
    * pairs exist ONLY where a shared customer witnesses them — never an
    * all-pairs supplier product.
    *
    * Scale: each customer's supplier list is capped at [[Gr4Cap]] by a
    * salted-md5 row_number (hot hub customers would otherwise contribute
    * O(degree²) wedges — the d3 hot-band rule applied to graphs; the cap
    * is part of the operator contract and the oracle replays it).
    * Degrees come from the UNCAPPED graph, so the Jaccard denominator is
    * exact even where candidates are capped. One shuffle for the edge
    * distinct, one self-join co-partitioned on the customer key, one
    * hash-agg on the pair; top-20 via TakeOrdered (never a global sort
    * materialization). The library entry point
    * ([[graft.api.GraftApi.commonNeighborTopK]]). */
  private val Gr4Cap = 50

  /** Top-k common-neighbor pairs over a bipartite (left, right) edge
    * frame: candidates from capped per-left wedges, degrees exact. */
  private[graft] def commonNeighborTopKOf(edges: DataFrame, k: Int,
      cap: Int = Gr4Cap): DataFrame = {
    val e = edges.select(col("left"), col("right")).distinct()
    val deg = e.groupBy("right").agg(count(lit(1)).as("deg"))
    val wE = Window.partitionBy("left")
      .orderBy(md5(concat(lit("gr4:"), col("left").cast("string"),
        lit("|"), col("right").cast("string"))), col("right"))
    val capped = e.withColumn("rk", row_number().over(wE))
      .filter(col("rk") <= cap).drop("rk")
    val cn = capped.select(col("left"), col("right").as("s_a"))
      .join(capped.select(col("left"), col("right").as("s_b")), Seq("left"))
      .filter(col("s_a") < col("s_b"))
      .groupBy("s_a", "s_b").agg(count(lit(1)).as("cn"))
    cn.join(deg.select(col("right").as("s_a"), col("deg").as("da")), Seq("s_a"))
      .join(deg.select(col("right").as("s_b"), col("deg").as("db")), Seq("s_b"))
      .withColumn("jaccard_e6", expr("cn * 1000000 div (da + db - cn)"))
      .select(col("s_a"), col("s_b"), col("cn"), col("jaccard_e6"))
      .orderBy(col("jaccard_e6").desc, col("s_a"), col("s_b"))
      .limit(k)
  }

  val gr4: Q = (s, d) =>
    commonNeighborTopKOf(
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("left"), col("l_suppkey").as("right")),
      20)
  val gr4Sql: String =
    s"""WITH e AS (
       |  SELECT DISTINCT o_custkey AS lft, l_suppkey AS rgt
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |deg AS (SELECT rgt, CAST(count(*) AS BIGINT) AS dg FROM e GROUP BY rgt),
       |capped AS (
       |  SELECT lft, rgt FROM (
       |    SELECT lft, rgt, row_number() OVER (PARTITION BY lft
       |      ORDER BY md5('gr4:' || lft::VARCHAR || '|' || rgt::VARCHAR), rgt) AS rk
       |    FROM e) WHERE rk <= $Gr4Cap),
       |cn AS (
       |  SELECT a.rgt AS s_a, b.rgt AS s_b, CAST(count(*) AS BIGINT) AS cn
       |  FROM capped a JOIN capped b ON a.lft = b.lft AND a.rgt < b.rgt
       |  GROUP BY a.rgt, b.rgt)
       |SELECT cn.s_a, cn.s_b, cn.cn,
       |       cn.cn * 1000000 // (da.dg + db.dg - cn.cn) AS jaccard_e6
       |FROM cn
       |JOIN deg da ON da.rgt = cn.s_a
       |JOIN deg db ON db.rgt = cn.s_b
       |ORDER BY jaccard_e6 DESC, s_a, s_b LIMIT 20""".stripMargin

  // ---- GR5: Adamic–Adar link prediction ----

  /** GR5: the Adamic–Adar index over the same bipartite wedge machinery
    * as gr4 — each shared customer contributes 1/ln(degree) instead of
    * 1, so promiscuous hub witnesses (a customer who buys from
    * everyone) count far less than selective ones: the standard
    * refinement of raw common-neighbor counting (Adamic & Adar, Social
    * Networks 2003). Per-witness weights are e6-rounded ONCE from
    * identical integer operands (the t14 transcendental convention) and
    * summed as exact longs, so ranking and scores hash-match the
    * oracle. Witness degrees come from the UNCAPPED edge frame; only
    * pair GENERATION is salt-capped (the gr4 contract — a witness that
    * forms a pair always has degree ≥ 2, so ln never sees 1). */
  private[graft] def adamicAdarTopKOf(edges: DataFrame, k: Int,
      cap: Int = Gr4Cap): DataFrame = {
    val e = edges.select(col("left"), col("right")).distinct()
    val ldeg = e.groupBy("left").agg(count(lit(1)).as("ldeg"))
    val wE = Window.partitionBy("left")
      .orderBy(md5(concat(lit("gr5:"), col("left").cast("string"),
        lit("|"), col("right").cast("string"))), col("right"))
    val capped = e.withColumn("rk", row_number().over(wE))
      .filter(col("rk") <= cap).drop("rk")
    capped.select(col("left"), col("right").as("s_a"))
      .join(capped.select(col("left"), col("right").as("s_b")), Seq("left"))
      .filter(col("s_a") < col("s_b"))
      .join(ldeg, Seq("left"))
      .withColumn("w_e6",
        expr("CAST(round(1000000.0 / ln(CAST(ldeg AS DOUBLE))) AS BIGINT)"))
      .groupBy("s_a", "s_b")
      .agg(count(lit(1)).as("cn"), sum("w_e6").as("aa_e6"))
      .orderBy(col("aa_e6").desc, col("s_a"), col("s_b"))
      .limit(k)
  }

  val gr5: Q = (s, d) =>
    adamicAdarTopKOf(
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("left"), col("l_suppkey").as("right")),
      20)
  val gr5Sql: String =
    s"""WITH e AS (
       |  SELECT DISTINCT o_custkey AS lft, l_suppkey AS rgt
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |ldeg AS (SELECT lft, CAST(count(*) AS BIGINT) AS ldeg FROM e GROUP BY lft),
       |capped AS (
       |  SELECT lft, rgt FROM (
       |    SELECT lft, rgt, row_number() OVER (PARTITION BY lft
       |      ORDER BY md5('gr5:' || lft::VARCHAR || '|' || rgt::VARCHAR), rgt) AS rk
       |    FROM e) WHERE rk <= $Gr4Cap)
       |SELECT a.rgt AS s_a, b.rgt AS s_b, CAST(count(*) AS BIGINT) AS cn,
       |       CAST(sum(CAST(round(1000000.0 / ln(CAST(ldeg.ldeg AS DOUBLE))) AS BIGINT)) AS BIGINT) AS aa_e6
       |FROM capped a
       |JOIN capped b ON a.lft = b.lft AND a.rgt < b.rgt
       |JOIN ldeg ON ldeg.lft = a.lft
       |GROUP BY a.rgt, b.rgt
       |ORDER BY aa_e6 DESC, s_a, s_b LIMIT 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "gr5_adamic_adar" -> gr5,
    "gr4_common_neighbor_link" -> gr4,
    "ppr1_personalized_pagerank" -> ppr1,
    "bfs1_seed_distance" -> bfs1,
    "pr2_hits_authorities" -> pr2,
    "pr1_pagerank_suppliers" -> pr1,
    "tc1_triangle_count" -> tc1,
    "lcc1_clustering_coefficient" -> lcc1,
    "gr1_modularity" -> gr1,
    "gr2_assortativity" -> gr2,
    "gr3_transitivity" -> gr3,
    "kcore1_supplier_core" -> kcore1,
    "lp1_label_propagation" -> lp1,
  )

  val oracle: Map[String, String] = Map(
    "gr5_adamic_adar" -> gr5Sql,
    "gr4_common_neighbor_link" -> gr4Sql,
    "ppr1_personalized_pagerank" -> ppr1Sql,
    "bfs1_seed_distance" -> bfs1Sql,
    "pr2_hits_authorities" -> pr2Sql,
    "pr1_pagerank_suppliers" -> pr1Sql,
    "tc1_triangle_count" -> tc1Sql,
    "lcc1_clustering_coefficient" -> lcc1Sql,
    "gr1_modularity" -> gr1Sql,
    "gr2_assortativity" -> gr2Sql,
    "gr3_transitivity" -> gr3Sql,
    "kcore1_supplier_core" -> kcore1Sql,
    "lp1_label_propagation" -> lp1Sql,
  )
}
