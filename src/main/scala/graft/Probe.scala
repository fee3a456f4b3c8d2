package graft

import org.apache.spark.sql.SparkSession

/** Dev timing probe: times individual registry queries cold+warm without
  * running the whole Bench sweep. Usage:
  *   sbt "runMain graft.Probe d3_minhash_lsh_pairs d8_dedup_clusters"
  * (no args → a default set of the historically slowest queries).
  * Ambient host load swings timings ±35% — probe twice before believing
  * any regression (lsh1 measured 5.6 s and 8.3 s with identical code). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_SHUFFLE sizes the exchanges to the probed SF (the knob a
    // cluster deployment scales with data volume; 32 matches Bench at sf0.1)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("d3_minhash_lsh_pairs", "d8_dedup_clusters", "lsh1_ml_minhash_join",
        "m7c_svm_corrected_epochs", "d6_ngram_jaccard_blocked")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[probe] $name: not in registry")
        case Some(fn) =>
          def once(): (Double, Long) = {
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            ((System.nanoTime() - t0) / 1e9, n)
          }
          val (cold, n) = once()
          spark.catalog.clearCache()
          val (warm, _) = once()
          spark.catalog.clearCache()
          println(f"[probe] $name: cold $cold%.2f s, warm $warm%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
