package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** End-to-end: real .md files on disk → parsed task rows (the actual
  * reference input path: `./agent-loop.sh tasks.md`). Fixtures mirror
  * the reference's own sample files (tests/two-group-test.md shape). */
class FileParseSpec extends SparkSpec {

  test("parseDir reads real markdown files and parses per file") {
    val dir = Files.createTempDirectory("graft-md")
    Files.writeString(Paths.get(dir.toString, "two-group.md"),
      "## Frontend\n- Build app\n- Run tests\n\n## Backend\n- Start server\n")
    Files.writeString(Paths.get(dir.toString, "minimal.md"),
      "- single ungrouped task\n  with a continuation\n")

    val out = TaskListParser.parseDir(spark, dir.toString + "/*.md")
      .collect()
      .map(r => (r.getString(0).split("/").last, r.getInt(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq

    assert(out == Seq(
      ("minimal.md", 1, "ungrouped", "single ungrouped task with a continuation"),
      ("two-group.md", 1, "Frontend", "Build app"),
      ("two-group.md", 2, "Frontend", "Run tests"),
      ("two-group.md", 3, "Backend", "Start server")))
  }

  test("CSV and ORC round-trip through the same query surface") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-fmt").toString
    val src = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").limit(100)
    src.write.option("header", "true").csv(s"$dir/csv")
    src.write.orc(s"$dir/orc")
    val csv = spark.read.option("header", "true")
      .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
      .csv(s"$dir/csv")
    val orc = spark.read.orc(s"$dir/orc")
    // Same grouped result regardless of storage format.
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderstatus").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(csv) == counts(src))
    assert(counts(orc) == counts(src))
  }

  test("nested JSON state document ingests and explodes to task rows") {
    // FIXTURES.md §A.2: run header + tasks[] array — the reference's
    // state.json read end-to-end through the JSON file source.
    val dir = Files.createTempDirectory("graft-json")
    Files.writeString(Paths.get(dir.toString, "state.json"),
      """{"task_file":"tasks.md","task_file_hash":"abc123",""" +
      """"tasks":[{"index":1,"group":"setup","task":"install","status":"completed","attempts":1},""" +
      """{"index":2,"group":"setup","task":"configure","status":"failed","attempts":5}]}""")

    val doc = spark.read.json(dir.toString)
    import org.apache.spark.sql.functions._
    val rows = doc
      .select(col("task_file"), explode(col("tasks")).as("t"))
      .select(col("task_file"), col("t.index"), col("t.group"),
              col("t.task"), col("t.status"), col("t.attempts"))
      .collect().map(_.toSeq).toSeq
    assert(rows == Seq(
      Seq("tasks.md", 1L, "setup", "install", "completed", 1L),
      Seq("tasks.md", 2L, "setup", "configure", "failed", 5L)))
  }
}
