package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** SURVEY §2.2 P1–P11 semantics, incl. the reference quirks:
  * comma-dropping stitch (NB.java:57-61), regex dialect order differences
  * (NB.java:67-73 vs SVM.java:76-79), and the lookahead URL regex that only
  * Java regex engines run (NB.java:67). */
class TextOpsSpec extends SparkSpec {

  private def evalStr(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().getString(0)
  }

  private def parse(line: String): (String, String, String, String) = {
    import spark.implicits._
    val r = Seq(line).toDF("line")
      .select(TextOps.csvSplitStitch(col("line")).as("p"))
      .select("p.id", "p.label", "p.source", "p.text").head()
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
  }

  test("P1 stitch drops commas inside quoted text (load-bearing quirk)") {
    val (id, label, source, text) =
      parse("""75005,1,Sentiment140,"The Clefhangers were featured, singing Carolina """")
    assert(id === "75005" && label === "1" && source === "Sentiment140")
    // comma inside the quoted field is DROPPED by the stitch; quotes survive
    assert(text === "\"The Clefhangers were featured singing Carolina \"")
  }

  test("P1 exactly four columns → text passthrough") {
    assert(parse("1,0,src,plain text")._4 === "plain text")
  }

  test("P2 wellFormed rejects <4 columns") {
    import spark.implicits._
    val df = Seq("a,b,c,d", "a,b,c", "a,b,c,d,e").toDF("line")
    assert(df.filter(TextOps.wellFormed(col("line"))).count() === 2)
  }

  test("P4 NB URL regex (Java lookahead) strips scheme'd and bare-www urls") {
    val in = "go http://example.com/x and www.foo.com/y end"
    assert(evalStr(TextOps.stripUrlNb(lit(in))) === "go  and  end")
  }

  test("P4 NB URL regex matches the frozen java.util.regex golden file") {
    // golden generated ONCE via String.replaceAll(NbUrlRe, "") — the
    // reference's exact engine and call (NB.java:67) — then committed.
    // Freezes the lookahead dialect's quirks (http://wwwnot.com survives;
    // wwww.quad.com -> "w" via the www. alternative at offset 1) against
    // any future edit to the pattern or the expression wiring.
    import spark.implicits._
    val golden = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/nb_url_golden.tsv"), "UTF-8")
      .getLines().map { l => val Array(in, out) = l.split("\t", -1); (in, out) }
      .toSeq
    assert(golden.size === 25, "golden file must not be silently truncated")
    val got = golden.map(_._1).toDF("in")
      .select(col("in"), TextOps.stripUrlNb(col("in")).as("out"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === golden, "Spark expression must reproduce the frozen reference-engine output")
  }

  test("P4 SVM URL regex strips only scheme'd urls, replaces with space") {
    val in = "go http://example.com/x and www.foo.com/y end"
    assert(evalStr(TextOps.stripUrlSvm(lit(in))) === "go   and www.foo.com/y end")
  }

  test("NB clean dialect: url→mention→digit→nonalpha→lower→trim→squeeze") {
    val in = "Check http://t.co/abc @User1 #cool 42 GREAT!!  day "
    assert(evalStr(TextOps.cleanNb(lit(in))) === "check great day")
  }

  test("SVM clean dialect keeps mention words (digits become spaces, not deleted)") {
    // no mention/digit strip; [^a-zA-Z ]→' ' spaces digits out, so 'user1'
    // yields token 'user' (vs NB where digit-strip glues 'mid42dle'→'middle')
    val in = "Lo http://t.co/abc @User1 42 OK!"
    assert(evalStr(TextOps.cleanSvm(lit(in))) === "lo user ok")
  }

  test("NB clean is idempotent and emits only [a-z ] — property") {
    import spark.implicits._
    val samples = Iterator.continually(Gen.asciiPrintableStr.sample)
      .flatten.take(60).toSeq :+ "" :+ "  \t\n " :+ "ALL CAPS 42 @x #y http://z.co/a"
    val rows = samples.toDF("t")
      .select(col("t"), TextOps.cleanNb(col("t")).as("c1"))
      .select(col("t"), col("c1"), TextOps.cleanNb(col("c1")).as("c2"))
      .collect()
    rows.foreach { r =>
      val (raw, c1, c2) = (r.getString(0), r.getString(1), r.getString(2))
      assert(c1 === c2, s"not idempotent for [${raw.take(40)}]")
      assert(c1.forall(ch => ch == ' ' || (ch >= 'a' && ch <= 'z')),
        s"bad alphabet in [$c1] from [${raw.take(40)}]")
    }
  }

  test("P10 label normalization: '1'→1.0, else 0.0 / -1.0") {
    import spark.implicits._
    val got = Seq("1", "0", "x").toDF("raw").select(
      TextOps.normLabel(col("raw")).as("l01"),
      TextOps.normLabel(col("raw"), negative = -1.0).as("lpm"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(got === Seq((1.0, 1.0), (0.0, -1.0), (0.0, -1.0)))
  }
}
