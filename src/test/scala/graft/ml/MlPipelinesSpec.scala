package graft.ml

import org.apache.spark.sql.functions.{count, lit}

import graft.SparkSpec

class MlPipelinesSpec extends SparkSpec {

  test("m3 LinearSVC survives a prior Dataset.observe in the same session (regression)") {
    // LinearSVCModel.trainingSummary holds a SparkSession, and the
    // prediction UDF captures the model — Spark 4.1's classic session
    // passes task serialization only while its lazy observationManager
    // field is still null, so the FIRST Dataset.observe anywhere in the
    // JVM used to make every later un-copied LinearSVCModel.transform die
    // with "Task not serializable" (this is why m3_ml_linear_svc vanished
    // from CORRECTNESS_r05/r06: obs1 ran before it in the Verify sweep).
    // fitScore now transforms with a summary-free copy(); this pins it.
    val sp = spark
    import sp.implicits._
    val obs = org.apache.spark.sql.Observation()
    val n = Seq(1, 2, 3).toDF("x")
      .observe(obs, count(lit(1)).as("n"))
      .count()
    assert(n === 3L && obs.get("n") === 3L)
    val out = MlPipelines.mlSvm(spark, sfDir).collect()
    assert(out.length === 1)
    assert(!out.head.isNullAt(4), "accuracy must be computed")
  }
}
