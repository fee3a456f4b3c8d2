package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{round, col => _}

/** THE money-exactness primitive: prices become integer CENTS
  * (`round(x*100)` as long) before any aggregation, so sums/comparisons
  * are exact int64 in BOTH engines and hash-compare bit-for-bit. One
  * definition — a drifted copy of this rule in any query breaks the
  * oracle contract for that file silently. */
object Money {
  def cents(c: Column): Column = round(c * 100).cast("long")
  def centsSql(e: String): String = s"CAST(round($e * 100) AS BIGINT)"
}
