package org.apache.spark.sql

/** Test-only bridge into the package-private CacheManager: lets the leak
  * spec assert that no graft operator leaves an EXPLICIT `.persist()`
  * registered after it returns (CacheManager holds entries strongly —
  * an escaped persist survives GC forever, the round-12 defect class). */
object GraftCacheProbe {
  def cacheManagerEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
