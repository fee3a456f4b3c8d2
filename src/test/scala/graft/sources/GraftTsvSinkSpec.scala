package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DSv2 WRITE path: two-phase commit semantics a library caller can
  * observe — round-trip fidelity, truncate-on-overwrite, and no staging
  * residue after a successful job. */
class GraftTsvSinkSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft_tsv_sink").toString

  private def partFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(n => n.startsWith("part-") && n.endsWith(".tsv")).toSeq

  test("round trip: rows come back exactly, nulls as empty cells") {
    val sp = spark
    import sp.implicits._
    val dir = freshDir()
    val df = Seq((1L, "en", "alpha"), (2L, "de", null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "txt")
    df.write.format("graft.sources.GraftTsvSink").option("path", dir).mode("append").save()
    val lines = spark.read.text(dir + "/part-*.tsv")
      .collect().map(_.getString(0)).sorted
    assert(lines.toSeq === Seq("1\ten\talpha", "2\tde\t"))
  }

  test("overwrite truncates: the second generation fully replaces the first") {
    val sp = spark
    import sp.implicits._
    val dir = freshDir()
    val gen1 = (1L to 100L).toDF("doc_id").repartition(4)
    gen1.write.format("graft.sources.GraftTsvSink").option("path", dir).mode("append").save()
    assert(partFiles(dir).size === 4, "one published file per task")
    // second generation: fewer rows AND fewer partitions — any stale
    // first-generation file would surface as extra rows/files
    val gen2 = (1L to 7L).toDF("doc_id").repartition(1)
    gen2.write.format("graft.sources.GraftTsvSink")
      .option("path", dir).mode("overwrite").save()
    assert(partFiles(dir).size === 1, "truncate must remove the old generation")
    val back = spark.read.text(dir + "/part-*.tsv")
      .collect().map(_.getString(0).toLong).sorted
    assert(back.toSeq === (1L to 7L))
  }

  test("commit leaves no staging residue; unrelated user files survive truncate") {
    val sp = spark
    import sp.implicits._
    val dir = freshDir()
    Files.writeString(java.nio.file.Paths.get(dir, "NOTES.txt"), "keep me")
    (1L to 5L).toDF("doc_id").write
      .format("graft.sources.GraftTsvSink").option("path", dir).mode("append").save()
    (6L to 9L).toDF("doc_id").write
      .format("graft.sources.GraftTsvSink").option("path", dir)
      .mode("overwrite").save()
    val names = Option(new java.io.File(dir).listFiles()).get.map(_.getName)
    assert(!names.exists(_.startsWith(".staging-")), "staging must be swept on commit")
    assert(names.contains("NOTES.txt"), "truncate only touches part-*.tsv")
  }

  test("missing path option fails fast") {
    val sp = spark
    import sp.implicits._
    val ex = intercept[Exception] {
      Seq(1L).toDF("doc_id").write
        .format("graft.sources.GraftTsvSink").mode("append").save()
    }
    assert(ex.getMessage != null)
  }
}
