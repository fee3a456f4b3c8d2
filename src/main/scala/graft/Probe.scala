package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing probe (not part of the driver contract; deleted or kept
  * out of the registry). Times named queries' sub-stages. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm the JVM/page cache once
    time("d3 warmup")(ops.Dedup.d3(spark, sfDir).count())
    spark.catalog.clearCache()
    time("d3 warm")(ops.Dedup.d3(spark, sfDir).count())
    spark.catalog.clearCache()
    time("d3 pairs only (no verify)")(
      ops.Dedup.d3(spark, sfDir).select("id_a", "id_b").count())
    spark.catalog.clearCache()
    time("d8 full")(ops.Dedup.d8(spark, sfDir).count())
    spark.catalog.clearCache()
    time("d8 full again")(ops.Dedup.d8(spark, sfDir).count())
    spark.catalog.clearCache()
    time("lsh1")(ml.MlLsh.lsh1(spark, sfDir).count())
    spark.catalog.clearCache()
    time("lsh1 again")(ml.MlLsh.lsh1(spark, sfDir).count())
    spark.stop()
  }
}
