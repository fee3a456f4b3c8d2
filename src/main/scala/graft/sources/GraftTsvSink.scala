package graft.sources

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 WRITE path (SURVEY §7.2's sink extension point,
  * completing the GraftDocsSource read/stream story): a tab-separated
  * text sink with the REAL two-phase commit protocol —
  *
  *  - each task's [[DataWriter]] writes to a hidden per-query staging
  *    directory and reports its file in a [[WriterCommitMessage]];
  *    nothing under the destination is visible until job commit;
  *  - the driver's [[BatchWrite.commit]] publishes exactly the staged
  *    files named in the messages (a speculative or zombie task's
  *    orphan output is left behind in staging and swept — the rename
  *    is the atomicity point, the same contract as Hadoop
  *    FileOutputCommitter v1);
  *  - [[BatchWrite.abort]] deletes the staging directory, leaving any
  *    previously committed data untouched;
  *  - `SaveMode.Overwrite` arrives as [[SupportsTruncate]]: commit
  *    removes the previously published part files in the same step
  *    that publishes the new ones.
  *
  * All filesystem access goes through the Hadoop [[FileSystem]] API, so
  * the sink runs identically on local disk and HDFS-compatible stores;
  * per-task files mean no write-side shuffle and parallelism = upstream
  * partitioning, exactly like the built-in file sinks. Fields must not
  * contain tab or newline (the S5 text-sink contract).
  *
  * Usage: `df.write.format("graft.sources.GraftTsvSink")
  *   .option("path", dir).mode("overwrite").save()`
  */
class GraftTsvSink extends TableProvider {
  // write-only source: the schema comes from the incoming DataFrame
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("GraftTsvSink requires a 'path' option"))
    new GraftTsvTable(path, schema)
  }
}

private class GraftTsvTable(path: String, tschema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-tsv-sink($path)"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftTsvWriteBuilder(path, info.schema(), info.queryId(), truncate = false)
}

private class GraftTsvWriteBuilder(path: String, schema: StructType,
    queryId: String, truncate: Boolean) extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftTsvWriteBuilder(path, schema, queryId, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftTsvBatchWrite(path, schema, queryId, truncate)
  }
}

private case class GraftTsvCommitMessage(stagedFile: String) extends WriterCommitMessage

/** Java-serializable carrier for the driver's Hadoop configuration
  * (round-14 advice): executor-side writers previously built their
  * FileSystem from a fresh `new Configuration()`, which resolves default
  * scheme handlers only — any non-default fs config (object-store
  * credentials, custom scheme impls) worked on the driver's commit path
  * but broke in tasks on a real cluster. Hadoop `Configuration` is
  * Writable, not Serializable, so ship it via write()/readFields(). */
private class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends java.io.Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private class GraftTsvBatchWrite(path: String, schema: StructType,
    queryId: String, truncate: Boolean) extends BatchWrite {

  private def fs(p: Path) =
    p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftTsvWriterFactory(path, schema, queryId,
      new SerializableHadoopConf(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dest = new Path(path)
    val f = fs(dest)
    f.mkdirs(dest)
    if (truncate) {
      // publish-and-truncate in one step: drop the previous generation's
      // part files, keeping unrelated user files alone
      Option(f.globStatus(new Path(dest, "part-*.tsv")))
        .getOrElse(Array.empty).foreach(s => f.delete(s.getPath, false))
    }
    messages.collect { case GraftTsvCommitMessage(staged) =>
      val sp = new Path(staged)
      // rename = the atomicity point; only message-named files publish
      if (!f.rename(sp, new Path(dest, sp.getName)))
        throw new java.io.IOException(s"commit rename failed for $staged")
    }
    // sweep the staging dir (takes any speculative-task orphans with it)
    f.delete(new Path(dest, s".staging-$queryId"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dest = new Path(path)
    fs(dest).delete(new Path(dest, s".staging-$queryId"), true)
  }
}

private class GraftTsvWriterFactory(path: String, schema: StructType,
    queryId: String, conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftTsvDataWriter(path, schema, queryId, partitionId, taskId, conf)
}

private class GraftTsvDataWriter(path: String, schema: StructType,
    queryId: String, partitionId: Int, taskId: Long,
    conf: SerializableHadoopConf) extends DataWriter[InternalRow] {

  private val staged =
    new Path(new Path(path, s".staging-$queryId"), f"part-$partitionId%05d-$taskId.tsv")
  // executor-side: the DRIVER's Hadoop configuration, shipped through the
  // factory, so non-default fs config (credentials, scheme impls)
  // resolves identically on both sides of the two-phase commit
  private val fs = staged.getFileSystem(conf.value)
  private lazy val out = {
    fs.mkdirs(staged.getParent)
    new java.io.PrintWriter(new java.io.OutputStreamWriter(
      fs.create(staged, true), java.nio.charset.StandardCharsets.UTF_8))
  }

  override def write(row: InternalRow): Unit = {
    val cells = schema.fields.zipWithIndex.map { case (fld, i) =>
      if (row.isNullAt(i)) ""
      else fld.dataType match {
        case LongType    => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType  => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType  => row.getUTF8String(i).toString
        case dt => throw new IllegalArgumentException(
          s"GraftTsvSink: unsupported field type $dt")
      }
    }
    out.println(cells.mkString("\t"))
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftTsvCommitMessage(staged.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(staged, false)
  }

  override def close(): Unit = ()
}
