package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 (SURVEY §7.2's source extension point): a
  * deterministic synthetic document table generated ON THE EXECUTORS —
  * no files, no driver materialization — with real pushdown:
  *
  *  - `SupportsPushDownFilters`: range/equality predicates on `doc_id`
  *    narrow the generated interval BEFORE generation, so a filtered
  *    read does proportionally less work (the DSv2 analogue of parquet
  *    row-group skipping).
  *  - `SupportsPushDownRequiredColumns`: unprojected columns are never
  *    generated (the md5 text column is the expensive one).
  *  - `planInputPartitions`: the interval splits into `partitions`
  *    (default 8) independent ranges — the scan parallelizes like any
  *    file source.
  *
  * Rows are pure functions of the row index (text embeds
  * `md5(i.toString)`), so DuckDB reproduces the exact content from
  * `range()` + `md5()` — the source is oracle-checkable end-to-end.
  *
  * Usage: `spark.read.format("graft.sources.GraftDocsSource")
  *   .option("rows", "10000").load()`
  */
class GraftDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDocsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftDocsTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(8))
}

object GraftDocsSource {
  val schema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("lang", StringType, nullable = false)
    .add("text", StringType, nullable = false)

  private val Langs = Array("en", "de", "fr")

  private[sources] def lang(i: Long): String = Langs((i % 3).toInt)

  /** A pushed-down aggregation this source can answer in CLOSED FORM:
    * optional GROUP BY lang, functions drawn from count(*) / min(doc_id)
    * / max(doc_id) in any order. `funcs` keeps the requested order so
    * output columns map positionally. */
  private[sources] case class PushedDocsAgg(byLang: Boolean, funcs: Seq[String])

  /** Closed-form per-lang stats over [lo, hi): (langIdx, count, minId,
    * maxId), only groups with count > 0. Rows are index functions
    * (lang = i % 3), so counts are pure modular arithmetic — the
    * aggregated "scan" touches ZERO generated rows. */
  private[sources] def langStats(lo: Long, hi: Long): Seq[(Int, Long, Long, Long)] = {
    // #{i < n : i ≡ g (mod 3)} for n ≥ 0, 0 ≤ g ≤ 2
    def below(n: Long, g: Int): Long = math.max(0L, (n - g + 2) / 3)
    (0 to 2).map { g =>
      val cnt = below(hi, g) - below(lo, g)
      val mn = lo + (((g - lo) % 3) + 3) % 3
      val mx = hi - 1 - ((((hi - 1 - g) % 3) + 3) % 3)
      (g, cnt, mn, mx)
    }.filter(_._2 > 0)
  }

  private[sources] def text(i: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(i.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    s"doc $i $hex"
  }
}

private class GraftDocsTable(rows: Long, partitions: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_docs($rows)"
  override def schema(): StructType = GraftDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocsScanBuilder(rows, partitions,
      Option(options.get("streamBatchRows")).map(_.toLong))
}

private class GraftDocsScanBuilder(rows: Long, partitions: Int,
    streamBatchRows: Option[Long] = None)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GraftDocsSource.schema
  private var pushedAgg: Option[GraftDocsSource.PushedDocsAgg] = None

  /** count(*) / min(doc_id) / max(doc_id), optionally grouped by lang —
    * everything this source can answer from modular arithmetic alone.
    * COMPLETE pushdown: Spark drops its own aggregate node entirely and
    * the "scan" emits 1–3 pre-aggregated rows, never generating a
    * document (the DSv2 analogue of parquet footer-statistics reads). */
  private def translate(agg: Aggregation): Option[GraftDocsSource.PushedDocsAgg] = {
    def isCol(e: org.apache.spark.sql.connector.expressions.Expression,
        name: String): Boolean = e match {
      case r: NamedReference => r.fieldNames().sameElements(Array(name))
      case _ => false
    }
    val byLang = agg.groupByExpressions() match {
      case Array() => Some(false)
      case Array(g) if isCol(g, "lang") => Some(true)
      case _ => None
    }
    def func(f: AggregateFunc): Option[String] = f match {
      case _: CountStar => Some("count")
      case m: Min if isCol(m.column(), "doc_id") => Some("min")
      case m: Max if isCol(m.column(), "doc_id") => Some("max")
      case _ => None
    }
    val funcs = agg.aggregateExpressions().toSeq.map(func)
    byLang match {
      case Some(b) if funcs.nonEmpty && funcs.forall(_.isDefined) =>
        Some(GraftDocsSource.PushedDocsAgg(b, funcs.map(_.get)))
      case _ => None
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case some @ Some(_) => pushedAgg = some; true
      case None => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case GreaterThan("doc_id", _: Long) | GreaterThanOrEqual("doc_id", _: Long) |
           LessThan("doc_id", _: Long) | LessThanOrEqual("doc_id", _: Long) |
           EqualTo("doc_id", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan("doc_id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("doc_id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    accepted = ours
    rest // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // with a pushed aggregation the output schema is the aggregation's
    // (group cols, then agg cols, positionally) — not the pruned one
    val schema = pushedAgg match {
      case Some(a) =>
        val base = if (a.byLang) new StructType().add("lang", StringType, nullable = false)
                   else new StructType()
        a.funcs.zipWithIndex.foldLeft(base) {
          case (st, ("count", i)) => st.add(s"count_$i", LongType, nullable = false)
          case (st, (f, i))       => st.add(s"${f}_$i", LongType, nullable = true)
        }
      case None => required
    }
    new GraftDocsScan(lo, math.max(lo, hi), partitions, schema,
      streamBatchRows.getOrElse(math.max(1L, (math.max(lo, hi) - lo) / 4)),
      pushedAgg)
  }
}

private class GraftDocsScan(lo: Long, hi: Long, partitions: Int, required: StructType,
    streamBatchRows: Long,
    agg: Option[GraftDocsSource.PushedDocsAgg] = None)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftDocsScan(range=[$lo,$hi), cols=${required.fieldNames.mkString(",")}" +
      agg.map(a => s", aggPushed=${if (a.byLang) "lang:" else ""}${a.funcs.mkString("+")}").getOrElse("") + ")"
  override def toBatch: Batch = this

  /** Micro-batch view of the same interval: the offset is the next unread
    * row index. Admission control caps each micro-batch at
    * `streamBatchRows` (so the engine's committed offset always equals
    * what was actually emitted — clamping inside planInputPartitions
    * would silently drop rows), and `SupportsTriggerAvailableNow` lets
    * `Trigger.AvailableNow` drain the interval as several bounded
    * batches. Rows are pure index functions, so streaming ≡ batch and
    * the batch SQL oracle verifies the streamed result. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {
      private def off(v: Long): Offset = new Offset {
        override def json(): String = v.toString
      }
      override def initialOffset(): Offset = off(lo)
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException(
          "admission-controlled source: use latestOffset(start, limit)")
      override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(streamBatchRows)
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val s = start.json().toLong
        off(math.min(s + streamBatchRows, hi))
      }
      override def prepareForTriggerAvailableNow(): Unit = ()
      override def reportLatestOffset(): Offset = off(hi)
      override def deserializeOffset(json: String): Offset = off(json.toLong)
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val s = start.json().toLong
        val e = end.json().toLong
        if (e <= s) Array.empty
        else Array(GraftDocsPartition(s, e): InputPartition)
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftDocsReaderFactory(required.fieldNames)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }

  override def planInputPartitions(): Array[InputPartition] = agg match {
    case Some(a) => Array(GraftDocsAggPartition(lo, hi, a))
    case None =>
      val n = hi - lo
      if (n <= 0) Array.empty
      else {
        val k = math.min(partitions.toLong, n).toInt
        (0 until k).map { p =>
          val start = lo + n * p / k
          val end = lo + n * (p + 1) / k
          GraftDocsPartition(start, end): InputPartition
        }.toArray
      }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory(required.fieldNames)
}

private case class GraftDocsPartition(start: Long, end: Long) extends InputPartition

/** Single partition answering a completely-pushed aggregation from
  * closed-form modular arithmetic — no document row is ever generated. */
private case class GraftDocsAggPartition(lo: Long, hi: Long,
    agg: GraftDocsSource.PushedDocsAgg) extends InputPartition

/** Serialized to executors; generates rows for one index range, only the
  * requested columns. */
private class GraftDocsReaderFactory(fields: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: GraftDocsAggPartition => aggReader(p)
      case p: GraftDocsPartition    => rowReader(p)
    }

  /** Pre-aggregated rows: per-lang (or global) count/min/max. An empty
    * interval yields ONE all-groups row for the global form (count 0,
    * min/max NULL — SQL aggregate semantics) and zero rows grouped. */
  private def aggReader(p: GraftDocsAggPartition): PartitionReader[InternalRow] = {
    val stats = GraftDocsSource.langStats(p.lo, p.hi)
    def cell(f: String, cnt: Long, mn: Long, mx: Long): Any = f match {
      case "count" => cnt
      case "min"   => if (cnt > 0) mn else null
      case "max"   => if (cnt > 0) mx else null
    }
    val rows: Seq[InternalRow] =
      if (p.agg.byLang)
        stats.map { case (g, cnt, mn, mx) =>
          InternalRow.fromSeq(UTF8String.fromString(GraftDocsSource.lang(g.toLong)) +:
            p.agg.funcs.map(cell(_, cnt, mn, mx)))
        }
      else {
        val cnt = stats.map(_._2).sum
        val mn = if (stats.nonEmpty) stats.map(_._3).min else 0L
        val mx = if (stats.nonEmpty) stats.map(_._4).max else 0L
        Seq(InternalRow.fromSeq(p.agg.funcs.map(cell(_, cnt, mn, mx))))
      }
    val it = rows.iterator
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }

  private def rowReader(p: GraftDocsPartition): PartitionReader[InternalRow] = {
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "doc_id" => i
          case "lang"   => UTF8String.fromString(GraftDocsSource.lang(i))
          case "text"   => UTF8String.fromString(GraftDocsSource.text(i))
        })
      override def close(): Unit = ()
    }
  }
}
