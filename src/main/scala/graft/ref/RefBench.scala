package graft.ref

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Matched-workload baseline replay: the reference's published PySpark
  * numbers (BASELINE.md: NB 72.05 s, LinearSVC 78.78 s) were measured on a
  * 1 M-row Sentiment140 subset. This main replicates the reference's OWN
  * fixture (`input/test1/tweets.csv`, 24,999 rows) ×40 ≈ 1 M rows and runs
  * `RefPipeline.mlPipeline` — same parse, same clean dialect, same
  * Tokenizer→HashingTF→IDF→estimator stages, same randomSplit(75/25,
  * seed 1234) — end-to-end on local[32], giving the DIRECT throughput
  * ratio against the published numbers rather than an sf0.1-synthetic
  * proxy. (Replica accuracy is inflated vs the report — duplicated tweets
  * straddle the train/test split — so only wall time is comparable.)
  */
object RefBench {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_TWEETS", "/root/reference/input/test1/tweets.csv")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "40").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = Files.createTempDirectory("graft_refbench")
    (0 until reps).foreach { i =>
      Files.copy(Paths.get(src), dir.resolve(f"tweets_$i%02d.csv"))
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val rows = spark.read.text(dir.toString).count()
    def run(svm: Boolean): (Double, Double) = {
      val t0 = System.nanoTime()
      val m = RefPipeline.mlPipeline(spark, dir.toString, svm).head()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, m.getAs[Double]("accuracy"))
    }
    val (nbSec, nbAcc) = run(svm = false)
    val (svmSec, svmAcc) = run(svm = true)
    println(s"""{"metric":"ref_workload_1m","rows":$rows,"unit":"sec",""" +
      s""""nb_sec":${f(nbSec)},"svm_sec":${f(svmSec)},""" +
      s""""nb_acc":${f(nbAcc)},"svm_acc":${f(svmAcc)},""" +
      s""""baseline_nb_sec":72.05,"baseline_svm_sec":78.78,""" +
      s""""nb_ratio":${f(nbSec / 72.05)},"svm_ratio":${f(svmSec / 78.78)}}""")
    spark.stop()
  }
}
