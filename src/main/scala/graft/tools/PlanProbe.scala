package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val name = args(0)
    val df = graft.SparkEntry.queries(name)(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    println("=== formatted (first 120 lines) ===")
    df.explain("formatted")
    spark.stop()
  }
}
