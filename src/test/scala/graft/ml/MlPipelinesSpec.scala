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

  test("m1b/m3b golden pipelines are run-to-run deterministic (pinned layout) " +
      "with binary predictions on every test row") {
    // the property the frozen sf0.01 VALUES oracles rest on: repartition
    // by doc_id + randomSplit's within-partition sort + coalesce(1) fit
    // make the per-row prediction set a pure function of the input
    for (name <- Seq("m1b_ml_nb_predictions", "m3b_ml_svc_predictions")) {
      val q = MlPipelines.queries(name)
      val a = q(spark, sfDir).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val b = q(spark, sfDir).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(a === b, s"$name must be bit-stable across runs")
      assert(a.nonEmpty)
      a.foreach { case (_, l, p) =>
        assert((l == 0L || l == 1L) && (p == 0L || p == 1L))
      }
      assert(a.map(_._1) === a.map(_._1).sorted, "ordered by doc_id")
    }
  }

  test("m3b predictions are NON-constant at the sf0.01 golden gate " +
      "(guards the m1b majority-class degeneracy)") {
    // The frozen m1b golden is constant-0 (NB is majority-class-degenerate
    // on the 500-doc gate), so m1b's hash check cannot distinguish a broken
    // model that also emits constant 0. m3b's LinearSVC DOES split 0/1 on
    // the same gate — pin that here so at least one per-row golden retains
    // discriminating power. Runs at sf0.01, the scale the goldens froze at.
    val preds = MlPipelines.queries("m3b_ml_svc_predictions")(
      spark, "/root/testdata/sf0.01").collect().map(_.getLong(2)).toSet
    assert(preds === Set(0L, 1L),
      s"m3b must predict both classes at the golden gate, got $preds")
  }

  test("f123 (retired from registry) deterministic projection equals the " +
      "hash-green f1c entry row-for-row; idf mass stays finite") {
    // round-15 verdict #3: f1_hashing_tf_idf duplicated f1c's 312 rows
    // plus one engine-defined double. The registry entry is gone; this
    // pins the library function to the oracled twin instead.
    val full = MlPipelines.f123(spark, sfDir).collect()
    val det = full.map(r =>
      (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    val golden = MlPipelines.f1c(spark, sfDir).collect().map(r =>
      (r.getLong(0).toInt, r.getLong(1), r.getLong(2).toInt, r.getLong(3))).toSeq
    assert(det === golden, "f123 minus idf mass must be exactly f1c")
    full.foreach { r =>
      val m = r.getDouble(4)
      assert(!m.isNaN && !m.isInfinite && m >= 0.0, "idf mass finite and >= 0")
    }
  }
}
