package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * One parquet file per table; scans are plain `spark.read.parquet` so
  * Catalyst gets full pushdown (PushedFilters / ReadSchema pruning) —
  * SURVEY §2.1 S1/S2. At cluster scale these would be partitioned
  * directories; the API is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The fixture's `events.ts` physical type has varied across driver
    * generations: parquet TIMESTAMP(NANOS) (unreadable as a Spark
    * timestamp — surfaces as BIGINT nanos under the legacy flag, and
    * GenScale-written scale dirs preserve that), plain TIMESTAMP_NTZ
    * (current fixtures), or a plain instant TIMESTAMP. Normalize all
    * three to a µs-precision `TimestampType` column so every consumer —
    * windows, watermarks, as-of joins — sees one type. Conversions are
    * exact: integer `div` for nanos (nano epochs exceed double's 53-bit
    * mantissa, so no `/`), and the NTZ cast is lossless under the UTC
    * session timezone Verify/Bench/specs all pin. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
