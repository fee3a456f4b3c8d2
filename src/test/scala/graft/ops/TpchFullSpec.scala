package graft.ops

import graft.SparkSpec

/** Scale-guardrail assertions for the TpchFull queries (Q8/Q10/Q11/Q12/
  * Q15/Q20/Q21): decorrelated shapes must stay decorrelated (no
  * cartesian/nested-loop fallbacks), scalar thresholds must broadcast,
  * and the semi-join must plan as LeftSemi. Value correctness is owned
  * by the DuckDB oracle gate; these tests own the plan shapes. */
class TpchFullSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("Q8: single aggregate pass (CASE-sum), no cartesian, dims broadcast") {
    val df = TpchFull.q8(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("BroadcastHashJoin"), "region/nation dims must broadcast")
    // share is derived from the two sums of ONE aggregate, not a re-scan
    assert("HashAggregate".r.findAllIn(p).length <= 4,
      "q8 must compute nation/total sums in one partial+final aggregate\n" + p.take(800))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000, "share must be in [0, 10000] bp")
    }
  }

  test("Q11/Q15: global-scalar threshold joins broadcast (1-row side)") {
    Seq(TpchFull.q11(spark, sfDir), TpchFull.q15(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"),
        "scalar threshold must broadcast, never cartesian-shuffle\n" + p.take(600))
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        "1-row scalar side must be a broadcast join\n" + p.take(600))
    }
  }

  test("Q15 survivor set is the max-revenue supplier(s) only") {
    val rows = TpchFull.q15(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getLong(2)).toSet
    assert(revs.size == 1, "all survivors must share the single max revenue")
  }

  test("Q20: qualifying-supplier probe plans as a LEFT SEMI join") {
    val p = plan(TpchFull.q20(spark, sfDir))
    assert(p.contains("LeftSemi"), "IN-subquery must run as LEFT SEMI\n" + p.take(600))
    assert(!p.contains("CartesianProduct"))
  }

  test("Q21: double-EXISTS decorrelates to one window, no self-join explosion") {
    val df = TpchFull.q21(spark, sfDir)
    val p = plan(df)
    assert(p.contains("Window"), "per-order counts must come from a window\n" + p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no nested-loop fallback\n" + p.take(600))
    // lineitem is scanned for the window pass, not once per EXISTS arm:
    // at most 2 scans (fact + supplier-name join side)
    val liScans = "lineitem\\.parquet".r.findAllIn(p).length
    assert(liScans <= 1, s"q21 must scan lineitem once, got $liScans\n" + p.take(800))
  }

  test("Q10/Q12: selective filters pushed to scans") {
    val p10 = plan(TpchFull.q10(spark, sfDir))
    assert(p10.contains("EqualTo(l_returnflag,R)"),
      "returnflag filter must reach the lineitem scan\n" + p10.take(800))
    val p12 = plan(TpchFull.q12(spark, sfDir))
    assert(p12.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate window must reach the lineitem scan\n" + p12.take(800))
  }
}
