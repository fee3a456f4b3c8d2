package graft.ops

import graft.SparkSpec

/** Integer PageRank: hand-computed star-graph fixpoint steps and the
  * registry query's shape. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank on a 3-leaf star matches the hand-computed integer iterates") {
    // undirected star: center c — leaves l1 l2 l3
    val e0 = Seq(("c", "l1"), ("c", "l2"), ("c", "l3")).toDF("src", "dst")
    val und = e0.unionAll(e0.select($"dst".as("src"), $"src".as("dst")))
    val r = graft.api.GraftApi.pageRank(und, iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // r1(c)=150000+850*3000000/1000=2700000 ; r1(l)=150000+850*(10^6 div 3)/1000=433333
    // r2(l)=150000+850*(2700000 div 3)/1000=915000 ; r2(c)=150000+850*(3*433333)/1000=1254999
    // r3(l)=150000+850*(1254999 div 3)/1000=505583 ; r3(c)=150000+850*(3*915000)/1000=2483250
    assert(r("c") === 2483250L)
    assert(r("l1") === 505583L && r("l2") === 505583L && r("l3") === 505583L)
  }

  test("pr1 ranks every supplier, center-heavy suppliers above the floor") {
    val rows = Graph.pr1(spark, sfDir).collect()
    val nSupp = graft.Tables.supplier(spark, sfDir).count()
    assert(rows.length === nSupp, "every supplier node gets a rank")
    assert(rows.forall(_.getLong(1) >= 150000L), "rank never falls below the teleport floor")
    assert(rows.map(_.getLong(1)).distinct.length > 1, "ranks must differentiate suppliers")
  }

  test("pr2 HITS matches a hand-computed bipartite case and normalizes to 1e6") {
    // c1 -> {s1, s2}, c2 -> {s1}: round 1 gives a(s1)=2e6->1e6,
    // a(s2)=1e6->500000; hubs h(c1)=1.5e6->1e6, h(c2)=1e6->666666;
    // round 2: a(s1)=1e6+666666->1e6, a(s2)=1e6->600000
    val e = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1")).toDF("src", "dst")
    val out = Graph.hitsOf(e).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === Map("s1" -> 1000000L, "s2" -> 600000L))
  }

  test("pr2 on the fixture: every supplier scored, max authority = 1e6") {
    val rows = Graph.pr2(spark, sfDir).collect()
    val nSupp = graft.Tables.supplier(spark, sfDir).count()
    assert(rows.length === nSupp)
    assert(rows.map(_.getLong(1)).max === 1000000L, "normalization pins the max")
    assert(rows.map(_.getLong(1)).distinct.length > 1, "authorities differentiate")
  }

  test("lp1 mode-vote rounds match the hand-traced two-triangle graph") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by the 3-4 bridge; two
    // synchronous min-tie rounds traced by hand
    val e = Seq((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L),(3L,4L)).toDF("a","b")
    val out = Graph.labelPropagationOf(e, rounds = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)),
      4L -> ((4L, 1L)), 5L -> ((3L, 2L)), 6L -> ((3L, 2L))))
  }

  test("lp1 on the fixture labels every node with an existing node id, deterministically") {
    val rows = Graph.lp1(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val nodes = rows.map(_._1).toSet
    assert(rows.forall(r => nodes.contains(r._2)), "communities are node ids of the graph")
    val bySize = rows.groupBy(_._2)
    rows.foreach { case (_, c, cs) => assert(bySize(c).length.toLong === cs, "csize consistent") }
    val again = Graph.lp1(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
  }
  test("bfs1 levels match a hand-traced chain and respect the depth cap") {
    import spark.implicits._
    // directed chain s0 -> a -> b -> c -> dd, plus an unreachable island z
    val e0 = Seq(("s0", "a"), ("a", "b"), ("b", "c"), ("c", "dd"), ("z", "z2"))
      .toDF("src", "dst")
    val und = e0.unionAll(e0.selectExpr("dst AS src", "src AS dst"))
    val seeds = Seq("s0").toDF("node")
    val got = Graph.bfsLevelsOf(und, seeds, maxDepth = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("s0" -> 0L, "a" -> 1L, "b" -> 2L, "c" -> 3L))
    // dd is 4 hops out, z/z2 disconnected: all absent under the cap
    // two seeds: distances are the min over the seed set
    val got2 = Graph.bfsLevelsOf(und, Seq("s0", "c").toDF("node"), maxDepth = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got2 === Map("s0" -> 0L, "c" -> 0L, "a" -> 1L, "b" -> 1L, "dd" -> 1L))
  }
  test("ppr1 personalized PageRank matches the hand-computed seeded star iterates") {
    import spark.implicits._
    // star: seed s <-> l1,l2,l3, plus a disconnected island z1 <-> z2
    val e0 = Seq(("s", "l1"), ("s", "l2"), ("s", "l3"), ("z1", "z2")).toDF("src", "dst")
    val und = e0.unionAll(e0.selectExpr("dst AS src", "src AS dst"))
    val got = Graph.personalizedPageRankOf(und, Seq("s").toDF("node"), iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // r1: s=150000, leaves=(850*(1000000 div 3)) div 1000 = 283333
    // r2: s=150000+(850*3*283333) div 1000 = 872499; leaves=(850*(150000 div 3)) div 1000 = 42500
    // r3: s=150000+(850*3*42500) div 1000 = 258375; leaves=(850*(872499 div 3)) div 1000 = 247208
    assert(got === Map("s" -> 258375L, "l1" -> 247208L, "l2" -> 247208L, "l3" -> 247208L))
    // the island never receives teleport or flow: absent, not zero
  }

  test("gr1 modularity matches the hand-computed two-triangle-bridge graph") {
    // two triangles {1,2,3} and {4,5,6} joined by the bridge 3-4: m = 7,
    // each triangle community has e_in = 3, d_sum = 7 ->
    // num = 4*7*3 - 49 = 35 per community, Q = 70/196 = 0.357142857...
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("a", "b")
    val cm = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("node", "c")
    val rows = graft.api.GraftApi.modularity(und, cm).collect()
    val byC = rows.map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byC(0L) === ((3L, 3L, 7L, 178571428L))) // 35e9 div 196
    assert(byC(1L) === ((3L, 3L, 7L, 178571428L)))
    // the rollup row divides the SUMMED numerators once: 70e9 div 196
    assert(byC(-1L) === ((6L, 6L, 14L, 357142857L)))
    // everything in one community -> Q = (4m*m - (2m)^2) / 4m^2 = 0 exactly
    val one = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (5L, 9L), (6L, 9L)).toDF("node", "c")
    val q1 = graft.api.GraftApi.modularity(und, one).collect()
      .find(_.isNullAt(0)).get.getLong(4)
    assert(q1 === 0L)
    // a partial labeling that covers only the bridge: e_in = 1,
    // d_sum = 3 + 3 = 6, num = 28 - 36 = -8 -> the sign-split negative path
    val partial = Seq((3L, 9L), (4L, 9L)).toDF("node", "c")
    val qp = graft.api.GraftApi.modularity(und, partial).collect()
      .find(_.isNullAt(0)).get
    assert(qp.getLong(2) === 1L && qp.getLong(3) === 6L)
    assert(qp.getLong(4) === -40816326L) // -(8e9 div 196)
  }

  test("gr3 transitivity: triangle = 1e6, star = 0, kite hand case, disagreement with lcc mean") {
    def t(edges: Seq[(Long, Long)]) = {
      val r = graft.api.GraftApi.transitivity(edges.toDF("a", "b")).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3))
    }
    // a triangle closes every wedge
    assert(t(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === ((3L, 1L, 3L, 1000000L)))
    // a star has wedges but no closures
    assert(t(Seq((9L, 1L), (9L, 2L), (9L, 3L))) === ((4L, 0L, 3L, 0L)))
    // kite (triangle + pendant on node 3): degrees (2,2,3,1) -> wedges
    // = (1+1+3+0) = 5, one triangle -> C = 3/5 exactly
    assert(t(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))) === ((4L, 1L, 5L, 600000L)))
    // a single edge has no wedges -> undefined
    assert(t(Seq((1L, 2L)))._4 === Long.MinValue)
  }

  test("gr2 assortativity: star = -1e6 exactly, kite hand case, regular graph NULL") {
    def r(edges: Seq[(Long, Long)]): Option[Long] = {
      val row = graft.api.GraftApi.assortativity(edges.toDF("a", "b")).collect().head
      if (row.isNullAt(1)) None else Some(row.getLong(1))
    }
    // a star is perfectly disassortative: hubs only touch leaves
    assert(r(Seq((9L, 1L), (9L, 2L), (9L, 3L))) === Some(-1000000L))
    // triangle-plus-pendant ("kite"): num = -20, den = 28 -> -714285
    assert(r(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))) === Some(-714285L))
    // a regular graph (triangle) has zero degree variance -> NULL
    assert(r(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === None)
    // edge count rides along: the kite has 4 edges
    assert(graft.api.GraftApi.assortativity(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b"))
      .collect().head.getLong(0) === 4L)
  }

  test("lcc1 coefficients match the hand-traced triangle-plus-pendant graph") {
    val s2 = spark
    import s2.implicits._
    // triangle {1,2,3} plus pendant edge 3-4: deg = (2,2,3,1), tri = (1,1,1,0)
    // lcc_e6: 1,2 -> 2*1e6/(2*1) = 1e6; 3 -> 2*1e6/(3*2) = 333333; 4 -> 0 (deg < 2)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.clusteringCoefficientsOf(und).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, 1L, 1000000L), (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L), (4L, 1L, 0L, 0L)))
  }

  test("gr4 common neighbors: planted co-purchase pair with exact Jaccard; no witness, no pair") {
    val sp = spark
    import sp.implicits._
    // suppliers 100 (customers 1,2,3) and 101 (customers 1,2): cn = 2,
    // jaccard = 2/(3+2-2); supplier 102 shares no customer -> never paired
    val edges = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L),
      (1L, 101L), (2L, 101L),
      (4L, 102L)).toDF("left", "right")
    val got = Graph.commonNeighborTopKOf(edges, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((100L, 101L, 2L, 666666L)))
  }

  test("gr5 Adamic-Adar: the selective witness outweighs the hub, weights exact") {
    val sp = spark
    import sp.implicits._
    // customer 1 (degree 3) witnesses three pairs at 1e6/ln3 = 910239;
    // customer 2 (degree 2) witnesses (200,201) at 1e6/ln2 = 1442695
    val edges = Seq(
      (1L, 100L), (1L, 101L), (1L, 102L),
      (2L, 200L), (2L, 201L)).toDF("left", "right")
    val got = Graph.adamicAdarTopKOf(edges, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.head === ((200L, 201L, 1L, 1442695L)),
      "the degree-2 witness pair must rank first")
    assert(got.tail.toSeq === Seq(
      (100L, 101L, 1L, 910239L), (100L, 102L, 1L, 910239L), (101L, 102L, 1L, 910239L)))
  }

  test("gr4 fixture: scores are valid Jaccards, descending, and the cap bounds candidates") {
    val rows = Graph.gr4(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 20)
    assert(rows.map(_._4).toSeq === rows.map(_._4).sortBy(-_).toSeq, "ranked by score")
    rows.foreach { case (a, b, cn, j) =>
      assert(a < b && cn >= 1 && j >= 0 && j <= 1000000L)
    }
  }

  test("PlanGuard: bfs at depth 12 completes with bounded plan size, exact " +
      "distances, and zero blocks left after releasePinned") {
    val sp = spark
    import sp.implicits._
    // a 20-node path: depth 12 reaches exactly nodes 0..12
    val edges = (0L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = graft.api.GraftApi.bfsLevels(edges, seeds, maxDepth = 12)
    // unguarded, the lazy dist chain roughly doubles per level (~2^12
    // subtree copies); with PlanGuard cuts at levels 5 and 10 the final
    // plan holds only the last cut plus two lazy levels
    var planNodes = 0
    out.queryExecution.logical.foreach(_ => planNodes += 1)
    assert(planNodes < 400, s"guarded plan must stay bounded, got $planNodes nodes")
    val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === (0L to 12L).map(i => i -> i).toMap)
    graft.api.GraftApi.releasePinned(spark)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"blocks must not outlive releasePinned: $leaked")
  }

  test("PlanGuard: pageRank at iters 12 matches the driver-simulated " +
      "integer fixpoint (guarded cuts change lifecycle, never values)") {
    val sp = spark
    import sp.implicits._
    val e0 = Seq(("c", "l1"), ("c", "l2"), ("c", "l3")).toDF("src", "dst")
    val und = e0.unionAll(e0.select($"dst".as("src"), $"src".as("dst")))
    // simulate the exact integer iterates on the driver: center degree 3,
    // leaf degree 1; contrib = rank div degree, all values positive
    var rc = 1000000L
    var rl = 1000000L
    for (_ <- 1 to 12) {
      val nc = 150000L + (850L * (3L * rl)) / 1000L
      val nl = 150000L + (850L * (rc / 3L)) / 1000L
      rc = nc
      rl = nl
    }
    val r = graft.api.GraftApi.pageRank(und, iters = 12)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("c") === rc)
    assert(Seq("l1", "l2", "l3").forall(l => r(l) === rl))
    graft.api.GraftApi.releasePinned(spark)
  }
}
