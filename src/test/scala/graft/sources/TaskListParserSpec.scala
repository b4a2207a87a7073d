package graft.sources

import graft.SparkSpec

/** The 8 reference parser cases (`tests/test-features.sh:440-579`),
  * re-expressed over the declarative parser. */
class TaskListParserSpec extends SparkSpec {

  private def parse(text: String, fileId: String = "f"): Seq[(Int, String, String)] = {
    import spark.implicits._
    val lines = text.split("\n", -1).toSeq.zipWithIndex
      .map { case (l, i) => (fileId, i.toLong, l) }
      .toDF("file_id", "line_no", "line")
    TaskListParser.parse(lines)
      .collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq
  }

  test("basic: group + task") {
    assert(parse("## Setup\n- Install dependencies") ==
      Seq((1, "Setup", "Install dependencies")))
  }

  test("multiline: indented continuations joined with a space") {
    val out = parse("## Build\n- Compile the source code\n  with optimization flags\n  and debug symbols")
    assert(out == Seq((1, "Build",
      "Compile the source code with optimization flags and debug symbols")))
  }

  test("ungrouped: tasks before any heading") {
    val out = parse("- First task\n- Second task")
    assert(out == Seq((1, "ungrouped", "First task"), (2, "ungrouped", "Second task")))
  }

  test("multigroup: correct group assignment across groups") {
    val out = parse(
      "## Frontend\n- Build React app\n- Run unit tests\n\n## Backend\n- Start server\n- Run integration tests\n- Deploy to staging")
    assert(out.map(_._2) == Seq("Frontend", "Frontend", "Backend", "Backend", "Backend"))
    assert(out(2)._3 == "Start server")
    assert(out(4)._3 == "Deploy to staging")
    assert(out.map(_._1) == Seq(1, 2, 3, 4, 5))
  }

  test("empty file: zero tasks, no crash") {
    assert(parse("").isEmpty)
  }

  test("headings only: zero tasks") {
    assert(parse("## Group A\n## Group B\n## Group C").isEmpty)
  }

  test("CRLF stripped from group names and task text") {
    val out = parse("## MyGroup\r\n- My CRLF task\r\n")
    assert(out == Seq((1, "MyGroup", "My CRLF task")))
    assert(!out.exists { case (_, g, t) => g.contains("\r") || t.contains("\r") })
  }

  test("heading immediately after task (no blank line) closes the task") {
    val out = parse("## First\n- Task in first group\n## Second\n- Task in second group")
    assert(out == Seq((1, "First", "Task in first group"),
                      (2, "Second", "Task in second group")))
  }

  test("blank line terminates a multiline task: later indented line ignored") {
    val out = parse("## G\n- task one\n\n  stray indented line\n- task two")
    assert(out == Seq((1, "G", "task one"), (2, "G", "task two")))
  }

  test("multiple files parse independently") {
    import spark.implicits._
    val lines = Seq(
      ("a", 0L, "## A"), ("a", 1L, "- a1"),
      ("b", 0L, "- b1"), ("b", 1L, "- b2"))
      .toDF("file_id", "line_no", "line")
    val out = TaskListParser.parse(lines).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(out == Seq(
      ("a", 1, "A", "a1"),
      ("b", 1, "ungrouped", "b1"), ("b", 2, "ungrouped", "b2")))
  }
}
