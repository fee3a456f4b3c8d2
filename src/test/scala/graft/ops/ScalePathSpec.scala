package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** 100 TB design paths that small-SF correctness can't see on its own:
  * the broadcast-join fallback (web-scale vocabularies exceed broadcast —
  * the same plan must work as a shuffle join), bucketed co-located joins
  * (the zero-shuffle fact⋈fact path), and sketch accuracy. */
class ScalePathSpec extends SparkSpec {

  test("J1 model join falls back to shuffle join when broadcast is disabled — same results") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val withBroadcast = SentimentNb.m6(spark, sfDir).collect().toSeq
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // broadcast() hints still apply; build the hint-free variant inline:
      val toks = Corpus.tokensNb(spark, sfDir).filter(!col("is_train"))
      val joined = toks.join(SentimentNb.model(spark, sfDir), "word") // no hint
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        "with threshold=-1 and no hint this must NOT broadcast")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle join, got:\n${plan.take(600)}")
      // and the full scoring pipeline still gives identical predictions
      // (broadcast() hints inside m6 keep it broadcast; the point is the
      // hint-free path stays correct for when the model outgrows broadcast)
      val probes = joined.groupBy("word").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val reference = SentimentNb.j1(spark, sfDir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(probes === reference, "shuffle-join probe counts == broadcast-join probe counts")
      assert(withBroadcast.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("bucketed tables co-locate the orders⋈lineitem join (no exchange on bucketed sides)") {
    // warehouse dir is a static conf — TestSpark sets a tmp dir at build time
    try {
      graft.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      graft.Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderdate")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("li_bucketed")
          .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must be exchange-free, got:\n${plan.take(800)}")
        // correctness: same row count as the plain join
        val expected = graft.Tables.lineitem(spark, sfDir)
          .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
          .count()
        assert(j.count() === expected)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("partitionBy writes prune partitions at read time (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_returnflag", "l_quantity")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"partition filter must prune directories:\n${plan.take(600)}")
    val expected = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R").count()
    assert(q.count() === expected)
  }

  test("HLL sketch distinct is within the 6% gate bound of exact") {
    // round-11 gate form: (exact_orders, within_6pct) — 3 sigma at rsd 0.02
    val r = Relational.hll1(spark, sfDir).head()
    val (exact, ok) = (r.getLong(0), r.getInt(1))
    assert(exact > 0L && ok === 1, s"HLL estimate strays >6% from exact $exact")
  }

  test("approx_percentile sketch is within 1% of exact percentiles") {
    // apx1 now emits (pct, exact_pct_c, within_100bp): the raw sketch
    // value is engine-defined so the TOLERANCE flag is the deliverable
    // (its DuckDB oracle asserts the literal 1)
    val rows = Relational.apx1(spark, sfDir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, s"pct ${r.getDouble(0)}: exact cents must be positive")
      assert(r.getInt(2) === 1,
        s"pct ${r.getDouble(0)}: sketch outside the 100 bp tolerance")
    }
  }

  test("apx2 exact percentiles agree with a full-sort percentile") {
    val got = Relational.apx2(spark, sfDir).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      .orderBy("c").collect().map(_.getLong(0))
    Seq(0.5, 0.95, 0.99).foreach { p =>
      val target = math.ceil(p * exact.length).toLong
      assert(got(p) === exact((target - 1).toInt),
        s"pct $p: got ${got(p)} want ${exact((target - 1).toInt)}")
    }
  }
}
