package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for d11's cost attribution at scale: times the
  * mid-key md5 min-gram scan, the end-key generation, the blocked
  * self-join + distinct, and the final text-join + levenshtein verify
  * separately, so optimization targets the measured stage instead of the
  * guessed one. Not part of the registry; invoked manually. */
object D11Prof {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/scale/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[d11prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }

    val docs = graft.ops.Dedup.corpus(spark, d)
    t("corpus count")(docs.count())
    val chars = docs.agg(sum(length(col("text")))).head().getLong(0)
    println(s"[d11prof] total chars: $chars, docs: ${docs.count()}")

    val m = "substring(text, 25, greatest(length(text) - 48, 1))"
    val mgDense = s"array_min(transform(sequence(0, greatest(length($m) - 8, 0)), " +
      s"i -> CAST(conv(substr(md5(substring($m, i + 1, 8)), 1, 15), 16, 10) AS BIGINT)))"
    t("mid-key md5 DENSE scan")(
      docs.select(col("doc_id"), expr(mgDense).as("g")).agg(count(col("g"))).head().getLong(0))

    val anchored = s"filter(sequence(0, greatest(length($m) - 8, 0)), " +
      s"i -> ascii(substring($m, i + 1, 1)) % 4 = 0)"
    val mgAnch = s"coalesce(array_min(transform($anchored, " +
      s"i -> CAST(conv(substr(md5(substring($m, i + 1, 8)), 1, 15), 16, 10) AS BIGINT))), " +
      s"CAST(conv(substr(md5(substring($m, 1, 8)), 1, 15), 16, 10) AS BIGINT))"
    t("mid-key md5 ANCHORED scan")(
      docs.select(col("doc_id"), expr(mgAnch).as("g")).agg(count(col("g"))).head().getLong(0))

    t("anchor positions only (no md5)")(
      docs.select(col("doc_id"), expr(s"size($anchored)").as("na"))
        .agg(sum(col("na"))).head().getLong(0))

    t("end keys")(
      docs.select(col("doc_id"), length(col("text")).as("l"), explode(array(
        concat(lit("s:"), expr("right(text, 24)")),
        concat(lit("p:"), expr("left(text, 24)")))).as("blk")).count())

    graft.functions.GraftFunctions.register(spark)
    t("native mingram scan")(
      docs.select(col("doc_id"),
        expr(s"graft_mingram8($m)").as("g")).agg(count(col("g"))).head().getLong(0))

    t("full d11 (1st)")(graft.ops.Dedup.d11(spark, d).count())
    t("full d11 (2nd)")(graft.ops.Dedup.d11(spark, d).count())
    t("no-orderBy editDistancePairsOf")(
      graft.ops.Dedup.editDistancePairsOf(docs).count())
    t("no-orderBy editDistancePairsOf (2nd)")(
      graft.ops.Dedup.editDistancePairsOf(docs).count())

    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        println(f"[d11prof]   stage ${si.stageId}%3d ${si.numTasks}%4d tasks $dur%7.2f s  ${si.name.take(90)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fused = graft.ops.Dedup.editDistancePairsOf(docs)
    t("fused run with stage listener")(fused.count())
    spark.sparkContext.removeSparkListener(listener)
    println("[d11prof] executed plan:\n" +
      fused.queryExecution.executedPlan.toString.linesIterator
        .map("[d11prof] " + _).mkString("\n"))

    // stage replication of editDistancePairsOf for attribution
    var keyed: org.apache.spark.sql.DataFrame = null
    t("stage: keyed checkpoint") {
      keyed = docs
        .select(col("doc_id"), length(col("text")).as("l"),
          expr("length(text) div 32").as("lb"),
          expr("graft_mingram8(substring(text, 25, greatest(length(text) - 48, 1)))").as("g"),
          expr("left(text, 24)").as("pfx"), expr("right(text, 24)").as("sfx"))
        .select(col("doc_id"), col("l"), explode(array(
          concat(lit("s:"), col("sfx")),
          concat(lit("p:"), col("pfx")),
          concat_ws(":", lit("m"), col("lb"), col("g")),
          concat_ws(":", lit("m"), col("lb") + 1, col("g")))).as("blk"))
        .localCheckpoint(true)
      keyed.count()
    }
    val midKeyed = keyed.filter(col("blk").startsWith("m:"))
    val okMid = midKeyed.groupBy("blk").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= graft.ops.Dedup.D11MaxBucket).select("blk")
    val usable = keyed.filter(!col("blk").startsWith("m:")).unionAll(
      midKeyed.join(okMid, Seq("blk")).select(col("doc_id"), col("l"), col("blk")))
    var cand: org.apache.spark.sql.DataFrame = null
    t("stage: cand join+distinct") {
      cand = usable.as("a").join(usable.as("b"),
          col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id") &&
            abs(col("a.l") - col("b.l")) <= 20)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct().localCheckpoint(true)
      cand.count()
    }
    t("stage: verify join+lev") {
      cand
        .select(col("id_a"), col("id_b"),
          explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .join(docs, Seq("doc_id"))
        .groupBy("id_a", "id_b")
        .agg(max(when(col("doc_id") === col("id_a"), col("text"))).as("ta"),
          max(when(col("doc_id") === col("id_b"), col("text"))).as("tb"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("ta"), col("tb"), 20).as("dist"))
        .filter(col("dist") >= 0).count()
    }
    spark.stop()
  }
}
