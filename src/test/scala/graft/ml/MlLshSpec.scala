package graft.ml

import graft.SparkSpec

/** MLlib LSH recall/sanity: the stock MinHashLSH must recover the planted
  * near-identical token sets, and BRP-kNN must return well-formed
  * neighbor lists (hash randomness is seeded ⇒ deterministic per session). */
class MlLshSpec extends SparkSpec {

  test("MinHashLSH self-join yields near pairs, all within the threshold") {
    val rows = MlLsh.lsh1(spark, sfDir).collect()
    assert(rows.nonEmpty, "some near pairs must exist in the shared-vocab corpus")
    rows.foreach { r =>
      assert(r.getDouble(0) <= 0.3 + 1e-9, "histogram buckets within threshold")
      assert(r.getLong(1) > 0)
    }
  }

  test("BRP kNN returns k well-formed neighbors per query") {
    val rows = MlLsh.lsh2(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 5)
      assert(rs.forall(_.getLong(1) != q), "query must not be its own neighbor")
      val dists = rs.map(_.getDouble(2))
      assert(dists.forall(d => d >= 0.0 && d <= 2.0001),
        s"unit-sphere L2 distances must be in [0,2]: ${dists.toSeq}")
    }
  }

  test("lsh1 recovers every exact-duplicate pair in its input subset") {
    import org.apache.spark.sql.functions._
    // identical token SETS (lsh1's actual MinHash input: lowercased
    // whitespace tokens, binary counts) => identical signatures in every
    // table => guaranteed join candidates at Jaccard distance 0. Count
    // them inside lsh1's doc_id % 5 subset and require the 0.0 histogram
    // bucket to cover them all — fails loudly if the numHashTables/
    // threshold parameters silently degrade.
    val expectedPairs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0)
      .select(array_sort(array_distinct(split(lower(col("text")), "\\s+"))).as("ts"))
      .groupBy("ts").agg(count(lit(1)).as("k"))
      .filter(col("k") > 1)
      .select(coalesce(sum(expr("k * (k - 1) / 2")), lit(0L)).cast("long").as("p"))
      .head().getLong(0)
    assert(expectedPairs > 0, "fixture must contain planted duplicate pairs in the %5 subset")
    val zeroBucket = MlLsh.lsh1(spark, sfDir).collect()
      .find(_.getDouble(0) == 0.0)
      .map(_.getLong(1)).getOrElse(0L)
    assert(zeroBucket >= expectedPairs,
      s"dist-0 bucket must cover all $expectedPairs exact-dup pairs, got $zeroBucket")
  }

  test("lsh2 kNN recall vs exact cosine top-k stays above the floor") {
    import org.apache.spark.sql.functions._
    val approx = MlLsh.lsh2(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // exact top-5 by cosine over the same candidate set (cosine rank ==
    // unit-sphere L2 rank, so this is the ground truth lsh2 approximates)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("nrm", expr("sqrt(aggregate(transform(e, x -> x*x), 0D, (a,v) -> a+v))"))
    val recalls = approx.map { case (q, got) =>
      val qv = emb.filter(col("vec_id") === q).head()
      val qe = qv.getSeq[Double](1); val qn = qv.getDouble(2)
      val exact = emb.filter(col("vec_id") =!= q)
        .withColumn("dot", expr(
          s"aggregate(zip_with(e, array(${qe.mkString(",")}), (x,y) -> x*y), 0D, (a,v) -> a+v)"))
        .withColumn("cos", col("dot") / (col("nrm") * lit(qn)))
        .orderBy(desc("cos")).limit(5).collect().map(_.getLong(0)).toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.5, s"mean kNN recall vs exact top-5 must stay >= 0.5, got $avg (${recalls.toSeq})")
  }

  test("lsh2 seeded runs are deterministic within a session") {
    val a = MlLsh.lsh2(spark, sfDir).collect().toSeq
    val b = MlLsh.lsh2(spark, sfDir).collect().toSeq
    assert(a === b)
  }
}
