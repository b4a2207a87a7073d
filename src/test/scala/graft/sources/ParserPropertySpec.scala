package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property test: the declarative Spark parser must agree with a direct
  * sequential reimplementation of the reference grammar
  * (`agent-loop.sh:185-227`) on randomly generated task files. The
  * sequential model is independent code — written from the grammar, not
  * from the Spark plan — so agreement is meaningful.
  */
class ParserPropertySpec extends SparkSpec {

  /** Reference grammar, executed the way the bash loop does — with the
    * reference's EXACT regexes (Java backtracking ≡ bash ERE here). */
  private def referenceParse(lines: Seq[String]): Seq[(Int, String, String)] = {
    val Heading = "^##\\s+(.+)$".r
    val Task    = "^-\\s+(.+)$".r
    val Cont    = "^\\s+(.+)$".r
    var group = "ungrouped"
    var current: Option[(String, StringBuilder)] = None
    val out = Vector.newBuilder[(String, String)]
    def flush(): Unit = { current.foreach { case (g, t) => out += ((g, t.toString)) }; current = None }
    for (raw <- lines) {
      val line = raw.stripSuffix("\r")
      line match {
        case Heading(g) => flush(); group = g
        case Task(t)    => flush(); current = Some((group, new StringBuilder(t)))
        case Cont(c)    => current.foreach { case (_, sb) => sb.append(" ").append(c) }
        case _          => flush() // blank / other terminates
      }
    }
    flush()
    out.result().zipWithIndex.map { case ((g, t), i) => (i + 1, g, t) }
  }

  private val lineGen: Gen[String] = Gen.frequency(
    3 -> Gen.oneOf("## Alpha", "## Beta Group", "##NoSpace", "## "),
    5 -> Gen.oneOf("- task one", "- another task", "-nospace", "- "),
    3 -> Gen.oneOf("  continuation words", "   more detail", " x", "\tindented tab"),
    2 -> Gen.oneOf("", "   ", "plain text line"),
    1 -> Gen.oneOf("## CRLF group\r", "- crlf task\r", "  crlf cont\r"))

  private val fileGen: Gen[Seq[String]] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, lineGen))

  test("property: Spark parser == sequential reference on 150 random files") {
    import spark.implicits._
    val files = Iterator.iterate(Seed(7L))(_.next).take(150)
      .map(s => fileGen.pureApply(Gen.Parameters.default, s)).toSeq
    // One Spark job for all files: file_id distinguishes them.
    val rows = files.zipWithIndex.flatMap { case (lines, f) =>
      lines.zipWithIndex.map { case (l, i) => (s"f$f", i.toLong, l) }
    }
    val parsed = TaskListParser.parse(rows.toDF("file_id", "line_no", "line"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (f, rs) => f -> rs.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq }
    files.zipWithIndex.foreach { case (lines, f) =>
      val expected = referenceParse(lines)
      val got = parsed.getOrElse(s"f$f", Seq.empty)
      assert(got == expected,
        s"file f$f:\nlines=${lines.mkString("|")}\nexpected=$expected\ngot=$got")
    }
  }
}
