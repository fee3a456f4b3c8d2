package graft.api

import graft.SparkSpec

/** The README "Quickstart" section, executable: the three operator calls
  * (exactDupGroups, nearDupPairs, ivfPqTopK) run verbatim against the
  * fixture and the GraftSession sizing contract is exercised — so the
  * doc snippet cannot rot without failing the suite. */
class QuickstartDocSpec extends SparkSpec {

  test("quickstart snippet: sized confs + the three calls run and return rows") {
    // GraftSession sizing (the builder itself would start a second
    // session; the conf map is the documented contract)
    val confs = GraftSession.sizedConfs(
      inputBytes = 2L << 40, cores = 512, executorMemBytes = 16L << 30)
    assert(confs("spark.sql.adaptive.enabled") === "true")
    assert(confs("spark.sql.shuffle.partitions").toLong >= 1024L,
      "2 TiB over 512 cores must provision more than the floor")

    import org.apache.spark.sql.functions.col
    // the raw fixture has no exact dups — plant some the way a real crawl
    // would have them (same text under new doc ids)
    val base = graft.Tables.documents(spark, sfDir)
    val docs = base.unionAll(
      base.limit(5).select(
        ((col("doc_id") + 900000L).as("doc_id") +:
          base.columns.filter(_ != "doc_id").map(col)): _*))
    val emb = graft.Tables.embeddings(spark, sfDir)

    // 1. exact duplicate groups
    val dupGroups = GraftApi.exactDupGroups(docs)
    assert(dupGroups.count() >= 5, "the planted copies must group")

    // 2. MinHash-LSH near-dup pairs
    val nearDups = GraftApi.nearDupPairs(docs, minJaccardBp = 8000)
    assert(nearDups.count() >= 5, "identical texts are also near-dups")

    // 3. IVF-PQ top-k ANN
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0)
    val topK = GraftApi.ivfPqTopK(emb, queries, k = 10)
    val rows = topK.collect()
    assert(rows.nonEmpty, "IVF-PQ must return neighbours")
    assert(rows.forall(_.getInt(2) <= 10), "rk bounded by k")
  }

  test("quickstart audit snippet: the four corpus audits run and return rows") {
    val sp = spark
    import sp.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val skew = GraftApi.keySkewAudit(docs, "source")
    assert(skew.count() > 0 && skew.columns.contains("p99_c"))
    val zipf = GraftApi.zipfSlope(docs)
    assert(zipf.count() > 0, "every source gets a slope")
    val ci = GraftApi.bootstrapCi(docs)
    assert(ci.count() === 1)
    val sources = docs.select("source").distinct()
      .withColumnRenamed("source", "source_id")
    val fk = GraftApi.refIntegrity(docs, "source", sources, "source_id", "docs_sources")
    assert(fk.count() === 4)
    assert(fk.filter($"kind" === "orphan_child_keys").head().getLong(2) === 0L,
      "every doc source exists in the dimension by construction")
  }
}
