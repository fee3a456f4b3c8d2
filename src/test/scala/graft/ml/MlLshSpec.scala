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

  test("lsh2 seeded runs are deterministic within a session") {
    val a = MlLsh.lsh2(spark, sfDir).collect().toSeq
    val b = MlLsh.lsh2(spark, sfDir).collect().toSeq
    assert(a === b)
  }
}
