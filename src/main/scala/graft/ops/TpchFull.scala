package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** The remaining TPC-H-analogue queries (Q8, Q10, Q11, Q12, Q15, Q20,
  * Q21), completing the 22-query relational surface together with
  * `Relational` (q1-q7, q9, q13/q14, q16-q19, q22).
  *
  * The synthetic star schema has no `partsupp` table and no
  * shipmode/commitdate/receiptdate columns, so Q11/Q12/Q20/Q21 are
  * pattern-faithful adaptations: the join topology, decorrelation shape,
  * and aggregate structure match the TPC-H original, with available
  * columns standing in (late-shipment proxy = `l_shipdate` far past
  * `o_orderdate`; per-(part,supplier) lineitem volume stands in for
  * partsupp availability).
  *
  * Money math follows the repo-wide exactness contract: integer cents
  * (`Money.cents`) before aggregation, ratios as integer basis points via
  * truncating integer division (`div` / DuckDB `//`) — bit-exact across
  * engines and partitionings.
  */
object TpchFull {

  private def cents(c: Column): Column = Money.cents(c)
  private def centsSql(c: String): String = Money.centsSql(c)
  private def rev(p: String = "l_extendedprice", d: String = "l_discount"): Column =
    cents(col(p)) * (lit(100) - cents(col(d)))
  private def revSql: String =
    s"${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})"

  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  /** Q8-style national market share: one supplier nation's slice of a
    * region's market for one product type, by order year. The two
    * sums happen in ONE aggregate pass (CASE inside sum, no second
    * scan); region→nation dims broadcast; customer/supplier stay
    * unhinted so AQE sizes them at scale. Share emitted in exact basis
    * points via integer division. */
  val q8: Q = (s, d) => {
    val r = Tables.region(s, d).filter(col("r_name") === "AMERICA")
    val custNat = Tables.nation(s, d)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cust_nk"))
    val suppNat = Tables.nation(s, d)
      .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      .join(broadcast(custNat), col("c_nationkey") === col("cust_nk"))
      .select("c_custkey")
    val o = ord(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
    val p = Tables.part(s, d).filter(col("p_type") === "PROMO").select("p_partkey")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(suppNat), col("s_nationkey") === col("supp_nk"))
      .select("s_suppkey", "supp_nation")
    li(s, d).select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === "NATION_7", rev()).otherwise(0L)).as("nation_e4"),
        sum(rev()).as("total_e4"))
      .select(col("o_year"), col("nation_e4"), col("total_e4"),
        // DECIMAL ratio: the e4-unit revenue sums fit int64 at any
        // realistic scale but `* 10000` wraps — divide in decimal (q14's
        // round-11 convention)
        expr("CAST(CAST(nation_e4 AS DECIMAL(38,0)) * 10000 div total_e4 AS BIGINT)")
          .as("mkt_share_bp"))
      .orderBy("o_year")
  }
  val q8Sql: String =
    s"""SELECT o_year, nation_e4, total_e4,
       |       CAST(CAST(nation_e4 AS HUGEINT) * 10000 // total_e4 AS BIGINT) AS mkt_share_bp FROM (
       |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |    CAST(sum(CASE WHEN sn.n_name = 'NATION_7' THEN $revSql ELSE 0 END) AS BIGINT) AS nation_e4,
       |    CAST(sum($revSql) AS BIGINT) AS total_e4
       |  FROM lineitem
       |  JOIN part     ON l_partkey = p_partkey
       |  JOIN orders   ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region   ON cn.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
       |  GROUP BY 1)
       |ORDER BY o_year""".stripMargin

  /** Q10-style returned-item reporting: revenue lost to 'R'-flag returns
    * per customer over one quarter, top 20. Both selective filters (date
    * on orders, returnflag on lineitem) are pushed to the scans; nation
    * broadcasts; the orders⋈lineitem edge is the only large shuffle. */
  val q10: Q = (s, d) => {
    val o = ord(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = li(s, d).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        cents(col("c_acctbal")).as("acctbal_c"))
      .agg(sum(rev()).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("c_custkey"))
      .limit(20)
  }
  val q10Sql: String =
    s"""SELECT c_custkey, c_name, n_name, ${centsSql("c_acctbal")} AS acctbal_c,
       |  CAST(sum($revSql) AS BIGINT) AS revenue_e4
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""".stripMargin

  /** Q11-style important values: per-part shipped value from one region's
    * suppliers, keeping parts above 1/2000 of the grand total — the
    * global-scalar-threshold shape (agg → broadcast 1-row scalar →
    * filter), decorrelated from Q11's HAVING subquery. The threshold
    * compare is exact int64 cross-multiplication, no division.
    * (partsupp stand-in: lineitem value per (part) for those suppliers.) */
  val q11: Q = (s, d) => {
    val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
    val nat = Tables.nation(s, d)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val sup = Tables.supplier(s, d)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val vals = li(s, d).select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(rev()).as("value_e4"))
    val total = vals.agg(sum(col("value_e4")).as("total_e4"))
    vals.join(broadcast(total))
      .filter(col("value_e4") * 2000 > col("total_e4"))
      .select("l_partkey", "value_e4")
      .orderBy(col("value_e4").desc, col("l_partkey"))
  }
  val q11Sql: String =
    s"""WITH vals AS (
       |  SELECT l_partkey, CAST(sum($revSql) AS BIGINT) AS value_e4
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation   ON s_nationkey = n_nationkey
       |  JOIN region   ON n_regionkey = r_regionkey
       |  WHERE r_name = 'EUROPE'
       |  GROUP BY 1)
       |SELECT l_partkey, value_e4 FROM vals
       |WHERE value_e4 * 2000 > (SELECT sum(value_e4) FROM vals)
       |ORDER BY value_e4 DESC, l_partkey""".stripMargin

  /** Q12-style priority line counts: join orders⋈lineitem over a one-year
    * ship window, CASE-count high- vs low-priority orders per lineitem
    * class in a single aggregate pass (Q12's shipmode column has no
    * analogue here; l_returnflag carries the grouping role). */
  val q12: Q = (s, d) => {
    val l = li(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
    l.join(ord(s, d).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("l_returnflag")
  }
  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q15-style top supplier: quarterly revenue per supplier, keep the
    * max-revenue supplier(s) — Q15's revenue view + scalar-max subquery,
    * decorrelated into agg → broadcast 1-row max → exact int64 equality
    * filter. The filtered survivor set (≤ a handful of rows) then joins
    * supplier for names. */
  val q15: Q = (s, d) => {
    val rv = li(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(rev()).as("total_rev_e4"))
    val mx = rv.agg(max(col("total_rev_e4")).as("max_rev_e4"))
    rv.join(broadcast(mx))
      .filter(col("total_rev_e4") === col("max_rev_e4"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
      .orderBy("s_suppkey")
  }
  val q15Sql: String =
    s"""WITH rv AS (
       |  SELECT l_suppkey, CAST(sum($revSql) AS BIGINT) AS total_rev_e4
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, total_rev_e4
       |FROM rv JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM rv)
       |ORDER BY s_suppkey""".stripMargin

  /** Q20-style promotion-heavy suppliers: suppliers in one region having
    * a (part, supplier) pair whose 1997 shipped quantity exceeds half its
    * all-time volume (with a volume floor) — Q20's correlated per-pair
    * aggregate threshold, decorrelated into ONE conditional-sum pass over
    * the pair key, then a semi-join onto supplier. No partsupp table:
    * lineitem pair volume stands in for ps_availqty. */
  val q20: Q = (s, d) => {
    val promo = Tables.part(s, d).filter(col("p_type") === "PROMO").select("p_partkey")
    val qualifying = li(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        cents(col("l_quantity")).as("qc"), year(col("l_shipdate")).as("yr"))
      .join(promo, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(
        sum(when(col("yr") === 1997, col("qc")).otherwise(0L)).as("q97_c"),
        sum(col("qc")).as("qall_c"))
      .filter(col("qall_c") > 5000 && col("q97_c") * 2 > col("qall_c"))
      .select("l_suppkey").distinct()
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(s, d)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    Tables.supplier(s, d)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }
  val q20Sql: String =
    s"""SELECT s_suppkey, s_name
       |FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND s_suppkey IN (
       |    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
       |    WHERE p_type = 'PROMO'
       |    GROUP BY l_partkey, l_suppkey
       |    HAVING sum(${centsSql("l_quantity")}) > 5000
       |       AND 2 * sum(CASE WHEN year(l_shipdate) = 1997
       |                        THEN ${centsSql("l_quantity")} ELSE 0 END)
       |           > sum(${centsSql("l_quantity")}))
       |ORDER BY s_suppkey""".stripMargin

  /** Q21-style waiting suppliers: in finished ('F') orders, suppliers who
    * were the ONLY late supplier in a multi-supplier order ("late" proxy:
    * shipped >1400 days after the order date — ~p90 of the synthetic
    * ship-lag). Q21's EXISTS/NOT-EXISTS pair is decorrelated into one
    * window over the order key (distinct-supplier and late-supplier
    * counts), replacing two self-joins with a single shuffle. The oracle
    * keeps the original EXISTS form, proving the rewrite equivalent. */
  val q21: Q = (s, d) => {
    val f = ord(s, d).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val perSupp = li(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(f, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("l_suppkey"))
      .agg(max(when(datediff(col("l_shipdate"), col("o_orderdate")) > 1400, 1L)
        .otherwise(0L)).as("late"))
    val w = Window.partitionBy("o_orderkey")
    perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("late")).over(w))
      .filter(col("late") === 1L && col("n_supp") > 1 && col("n_late") === 1L)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }
  val q21Sql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait FROM (
      |  SELECT DISTINCT o_orderkey, l_suppkey
      |  FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |    AND datediff('day', o_orderdate, l1.l_shipdate) > 1400
      |    AND EXISTS (SELECT 1 FROM lineitem l2
      |                WHERE l2.l_orderkey = l1.l_orderkey
      |                  AND l2.l_suppkey <> l1.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      |                    WHERE l3.l_orderkey = l1.l_orderkey
      |                      AND l3.l_suppkey <> l1.l_suppkey
      |                      AND datediff('day', o3.o_orderdate, l3.l_shipdate) > 1400)
      |) q JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  // =====================================================================
  //  registry
  // =====================================================================

  val queries: Map[String, Q] = Map(
    "q8_market_share" -> q8,
    "q10_returned_items" -> q10,
    "q11_important_values" -> q11,
    "q12_priority_classes" -> q12,
    "q15_top_supplier" -> q15,
    "q20_promo_heavy_suppliers" -> q20,
    "q21_waiting_suppliers" -> q21,
  )

  val oracle: Map[String, String] = Map(
    "q8_market_share" -> q8Sql,
    "q10_returned_items" -> q10Sql,
    "q11_important_values" -> q11Sql,
    "q12_priority_classes" -> q12Sql,
    "q15_top_supplier" -> q15Sql,
    "q20_promo_heavy_suppliers" -> q20Sql,
    "q21_waiting_suppliers" -> q21Sql,
  )
}
