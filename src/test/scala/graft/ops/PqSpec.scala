package graft.ops

import graft.SparkSpec

/** sim9 (PQ + ADC): the oracle gate proves Spark≡DuckDB; these prove the
  * numbers mean what they claim — the full train→encode→table→scan
  * pipeline reproduces under pure-Scala integer math, and the
  * approximate ranking actually tracks the exact L2 ranking it stands
  * in for. */
class PqSpec extends SparkSpec {

  private val M = Similarity.PqM; private val D = Similarity.PqD
  private val K = Similarity.PqK

  private def sq(a: Array[Long], b: Array[Long]): Long =
    a.indices.iterator.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum

  /** The engine's PQ pipeline, recomputed with plain Scala collections. */
  private def recompute(): (Map[Long, Seq[(Long, Long)]], Map[Long, Seq[Long]]) = {
    val raw = graft.Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qs = raw.map { case (id, v) => (id, v.map(x => math.round(x.toDouble * 1000))) }
      .filter { case (_, q) => q.iterator.map(x => x * x).sum > 0L }
    val subs: Map[Long, Array[Array[Long]]] =
      qs.map { case (id, q) => id -> (0 until M).map(j => q.slice(j * D, j * D + D)).toArray }.toMap
    // train: seeds = vec_id 1..K, one integer-mean recompute
    var cb: Array[Array[Array[Long]]] =
      (0 until M).map(j => (1 to K).map(cid => subs(cid.toLong)(j)).toArray).toArray
    def assign(j: Int, sv: Array[Long]): Int =
      cb(j).zipWithIndex.minBy { case (c, i) => (sq(sv, c), i) }._2
    val members = Array.fill(M, K)(List.empty[Array[Long]])
    for ((id, _) <- qs; j <- 0 until M) {
      val c = assign(j, subs(id)(j)); members(j)(c) ::= subs(id)(j)
    }
    cb = (0 until M).map { j =>
      (0 until K).map { c =>
        val ms = members(j)(c)
        if (ms.isEmpty) cb(j)(c)
        else (0 until D).map(p => ms.iterator.map(_(p)).sum / ms.size).toArray
      }.toArray
    }.toArray
    val codes: Map[Long, Array[Int]] =
      qs.map { case (id, _) => id -> (0 until M).map(j => assign(j, subs(id)(j))).toArray }.toMap
    // ADC scan per anchor
    val anchors = qs.map(_._1).filter(_ % 50 == 0)
    val top5 = anchors.map { qid =>
      val dt = (0 until M).map(j => cb(j).map(c => sq(subs(qid)(j), c)))
      val scored = qs.collect { case (cid, _) if cid != qid =>
        (cid, (0 until M).iterator.map(j => dt(j)(codes(cid)(j))).sum)
      }
      qid -> scored.sortBy { case (cid, a) => (a, cid) }.take(5).toSeq
    }.toMap
    val exact5 = anchors.map { qid =>
      val qv = qs.find(_._1 == qid).get._2
      qid -> qs.collect { case (cid, v) if cid != qid => (cid, sq(qv, v)) }
        .sortBy { case (cid, dd) => (dd, cid) }.take(5).map(_._1).toSeq
    }.toMap
    (top5, exact5)
  }

  test("sim9 matches the pure-Scala PQ pipeline bit-for-bit") {
    val (expected, _) = recompute()
    val got = Similarity.sim9(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (q, rows) => q -> rows.sortBy(_._3).map(t => (t._2, t._4)).toSeq }
    assert(got.keySet === expected.keySet)
    got.foreach { case (q, rows) => assert(rows === expected(q), s"query $q") }
  }

  test("sim10 = sim9's ADC ranking restricted to the query's coarse cell") {
    val raw = graft.Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qs = raw.map { case (id, v) => (id, v.map(x => math.round(x.toDouble * 1000))) }
      .filter { case (_, q) => q.iterator.map(x => x * x).sum > 0L }
    // seeds = the 8 LOWEST nonzero vec_ids (the library semantic since
    // ivfPqTopKOf was parameterized — on this fixture that is 0..7)
    val cents = qs.sortBy(_._1).take(8).map(_._2).toIndexedSeq
    def cell(q: Array[Long]): Int =
      cents.zipWithIndex.minBy { case (c, i) => (sq(c, q), i) }._2 + 1
    val cellOf = qs.map { case (id, q) => id -> cell(q) }.toMap
    val (adc, _) = recompute() // full-corpus ADC top-5 per anchor... need raw pairs
    // recompute the full scored list (not just top-5) for the restriction
    val got = Similarity.sim10(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.nonEmpty)
    // every returned candidate must share its query's cell
    got.foreach { case (q, c, _, _) =>
      assert(cellOf(c) === cellOf(q), s"cand $c not in query $q's cell")
    }
    // and where sim9's global top-5 already lies in the query's cell, the
    // in-cell ranking must preserve that order as a prefix-subsequence
    val byQ = got.groupBy(_._1)
    adc.foreach { case (q, top5) =>
      val inCell = top5.collect { case (cid, a) if cellOf(cid) == cellOf(q) => (cid, a) }
      val sim10Rows = byQ.get(q).map(_.sortBy(_._3).map(t => (t._2, t._4)).toSeq).getOrElse(Seq.empty)
      inCell.take(3).zipWithIndex.foreach { case ((cid, a), i) =>
        assert(i < sim10Rows.length && sim10Rows(i) === ((cid, a)),
          s"query $q: in-cell prefix of sim9 must head sim10's ranking")
      }
    }
  }

  test("sim9 recall@5 vs exact integer L2 top-5 clears the PQ floor") {
    val (approx, exact) = recompute()
    val recalls = approx.keys.toSeq.map { q =>
      (approx(q).map(_._1).toSet intersect exact(q).toSet).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@5 = $mean%.2f over ${recalls.size} queries")
    // 8 subspaces x 16 codewords = 32 bits/vec; i.i.d.-ish fixture vectors
    // are PQ's worst case (no cluster structure), so the floor asserts the
    // ranking is far from random (random recall at n≈500, k=5 is ~0.01)
    // without overfitting the fixture
    assert(mean >= 0.15, f"mean recall $mean%.3f below PQ floor")
  }
}
