package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom TopKPerGroup operator: result parity with the window-based
  * formulation, the partial/final plan split, and tie determinism. */
class TopKSpec extends SparkSpec {

  test("custom top-k equals the window row_number formulation") {
    val custom = graft.ops.Relational.x1(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val window = graft.ops.Relational.w2(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(custom === window)
  }

  test("plan splits into partial (pre-shuffle) and final (post-shuffle) execs") {
    val df = graft.ops.Relational.x1(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPartial"), p.take(1200))
    assert(p.contains("TopKFinal"), p.take(1200))
    // the exchange must sit BETWEEN final and partial: final above, partial below
    val iFinal = p.indexOf("TopKFinal")
    val iEx = p.indexOf("Exchange hashpartitioning", iFinal)
    val iPartial = p.indexOf("TopKPartial", iEx max 0)
    assert(iEx >= 0 && iPartial > iEx,
      "hash exchange must carry only the partially-pruned rows\n" + p.take(1200))
  }

  test("map-side prune bounds pre-shuffle rows to k per (partition, group)") {
    import spark.implicits._
    // one input partition, one group, 1000 rows → partial emits exactly k
    // (AQE off so the raw plan tree exposes the exec for direct execution)
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1 to 1000).map(i => ("g", i.toLong)).toDF("g", "v").coalesce(1)
      val topk = TopKPerGroup(df, Seq("g"), Seq("v" -> true), 5)
      val partial = topk.queryExecution.executedPlan.collectFirst {
        case e: TopKPartialExec => e
      }
      assert(partial.nonEmpty, "partial exec must exist")
      assert(partial.get.execute().count() === 5L)
      assert(topk.collect().map(_.getLong(1)).sorted.toSeq === (996L to 1000L))
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  test("at sf0.1 the exchange carries at most k·|groups| rows per input partition") {
    // the operator's entire reason to exist: the shuffle between partial
    // and final must be bounded by k·|groups| per map partition regardless
    // of fact-table size. Measured on the real bench-scale input.
    val sf01 = "/root/testdata/sf0.1"
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.ops.Relational.x1(spark, sf01)
      val partial = df.queryExecution.executedPlan.collectFirst {
        case e: TopKPartialExec => e
      }
      assert(partial.nonEmpty, "partial exec must exist in the x1 plan")
      val nGroups = graft.Tables.part(spark, sf01).select("p_brand").distinct().count()
      val perPartition = partial.get.execute()
        .mapPartitions(it => Iterator(it.size.toLong)).collect()
      val bound = 3L * nGroups
      perPartition.foreach(n =>
        assert(n <= bound, s"partial emitted $n rows from one partition; bound is k*|groups| = $bound"))
      assert(perPartition.sum > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  test("k larger than any group passes every row through") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v").repartition(3)
    val out = TopKPerGroup(df, Seq("g"), Seq("v" -> true), 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("null group keys form their own group; null order values sort per SortOrder") {
    import spark.implicits._
    val df = Seq((Option("a"), Option(1L)), (None, Option(5L)), (None, Option(7L)),
      (None, Option.empty[Long]), (Option("a"), Option(2L)))
      .toDF("g", "v").repartition(4)
    val out = TopKPerGroup(df, Seq("g"), Seq("v" -> true), 2).collect()
      .map(r => (if (r.isNullAt(0)) "NULL" else r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    // v DESC is NULLS LAST: the null-v row must lose to 5 and 7 in the null-g group
    assert(out.filter(_._1 == "NULL").map(_._2).sorted.toSeq === Seq(5L, 7L))
    assert(out.filter(_._1 == "a").map(_._2).sorted.toSeq === Seq(1L, 2L))
  }

  test("ties resolve by the caller's tiebreak order, not by partitioning") {
    import spark.implicits._
    val df = Seq(("g", 10L, 1L), ("g", 10L, 2L), ("g", 10L, 3L), ("g", 10L, 4L))
      .toDF("g", "v", "id").repartition(4)
    val kept = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 2)
      .collect().map(_.getLong(2)).sorted.toSeq
    assert(kept === Seq(1L, 2L), "equal values must keep the lowest tiebreak ids")
  }

  test("RewriteRankFilterToTopK swaps the window idiom for the custom operator, opt-in only") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    RewriteRankFilterToTopK.ensure(spark)
    val df = (1L to 100L).map(i => (s"g${i % 4}", i * 7 % 31, i)).toDF("g", "v", "id")
    def q() = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .filter(col("rk") <= 3).drop("rk")
    spark.conf.set("spark.graft.rewriteRankFilter", "false")
    val off = q()
    assert(!off.queryExecution.executedPlan.toString.contains("TopKFinal"),
      "rule must be inert without the opt-in conf")
    val expected = off.collect().map(_.toSeq).toSet
    spark.conf.set("spark.graft.rewriteRankFilter", "true")
    try {
      val on = q()
      val plan = on.queryExecution.executedPlan.toString
      assert(plan.contains("TopKFinal") && plan.contains("TopKPartial"),
        s"rewrite must fire on the window idiom:\n${plan.take(800)}")
      assert(!plan.contains("Window"),
        "the Window operator AND Spark's WindowGroupLimit prune must both be gone")
      assert(on.collect().map(_.toSeq).toSet === expected, "rewrite must be result-invisible")
      // a query that KEEPS the rank column must fall through untouched
      val keeps = df.withColumn("rk", row_number().over(
          Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
        .filter(col("rk") <= 3)
      assert(!keeps.queryExecution.executedPlan.toString.contains("TopKFinal"),
        "rank column still referenced => no rewrite")
    } finally spark.conf.set("spark.graft.rewriteRankFilter", "false")
  }
}
