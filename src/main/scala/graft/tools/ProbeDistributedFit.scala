package graft.tools

import org.apache.spark.ml.classification.{LinearSVC, NaiveBayes}
import org.apache.spark.sql.SparkSession

import graft.ml.MlPipelines

/** Round-16 verdict #4 probe: is the DISTRIBUTED (4-partition) fit of the
  * two flagship MLlib pipelines run-to-run deterministic on the pinned
  * layout? Runs each `MlPipelines.distributedPredictions` variant N times
  * in one session and reports, per pipeline:
  *   - whether per-row RAW scores (probability / rawPrediction vectors,
  *     stringified) are bit-identical across all runs, and
  *   - whether the ARGMAX (prediction) column is stable across all runs.
  * Bit-identical raws across runs ⇒ safe to freeze m1c/m3c VALUES
  * goldens; stable argmax over wobbling raws ⇒ document the wobble and do
  * NOT freeze (a near-boundary row could flip in a future run).
  * Usage: runMain graft.tools.ProbeDistributedFit /root/testdata/sf0.01 6 */
object ProbeDistributedFit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .appName("graft-probe-distributed-fit").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val cases = Seq(
        ("m1c_nb", () => MlPipelines.distributedPredictions(
          spark, sfDir, new NaiveBayes(), "probability")),
        ("m3c_svc", () => MlPipelines.distributedPredictions(
          spark, sfDir, new LinearSVC().setMaxIter(10).setRegParam(0.1),
          "rawPrediction")))
      for ((name, mk) <- cases) {
        val runs = (1 to n).map { i =>
          val rows = mk().collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
          println(s"[probe] $name run $i: ${rows.length} rows")
          rows
        }
        val rawStable = runs.forall(_ == runs.head)
        val argmaxStable = runs.forall(_.map(t => (t._1, t._3)) ==
          runs.head.map(t => (t._1, t._3)))
        println(s"[probe] $name over $n runs: rawBitIdentical=$rawStable " +
          s"argmaxStable=$argmaxStable rows=${runs.head.length}")
        if (rawStable)
          println(runs.head.map { case (id, l, p, _) => s"      ($id, $l, $p)" }
            .mkString(",\n"))
        else {
          // isolate which rows' raws differ between the first two divergent runs
          val other = runs.find(_ != runs.head).get
          val diffs = runs.head.zip(other).filter { case (a, b) => a != b }
          println(s"[probe] $name: ${diffs.length} differing rows; first 5:")
          diffs.take(5).foreach { case (a, b) =>
            println(s"[probe]   run1=$a\n[probe]   runK=$b")
          }
        }
      }
    } finally spark.stop()
  }
}
