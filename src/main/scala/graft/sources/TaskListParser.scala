package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markdown task-list grammar → rows, re-expressed as a declarative Spark
  * plan (no driver-side loops).
  *
  * Grammar (reference parser at `agent-loop.sh:185-227`, edge cases at
  * `tests/test-features.sh:440-579`):
  *   - `## <name>`        starts a group (heading fill-down, `:200-203`);
  *   - `- <text>`         starts a task (`:207`);
  *   - indented lines continue the previous task, joined with a single
  *     space (`:215`) — including all-whitespace lines of ≥2 chars, whose
  *     backtracked capture is a single space (bash ERE quirk, proven by
  *     tools/diff_parser.py against the reference's own parser);
  *   - blank / other lines terminate a multiline task and are ignored;
  *   - CR is stripped (`:197`);
  *   - tasks before any heading get group `ungrouped` (`:187`).
  *
  * Input: `(file_id STRING, line_no BIGINT, line STRING)` — one row per
  * line, any number of files. Output: `(file_id, index, group, task)` with
  * `index` 1-based per file in file order.
  *
  * Scale shape: every window below is `partitionBy(file_id)` — parsing
  * parallelizes across files and no task ever holds more than one file's
  * lines. The multiline join is a `collect_list` per (file, task) group —
  * bounded by one task's continuation lines, never a whole file.
  */
object TaskListParser {

  /** Parse every task file under `path` (glob ok) straight from disk:
    * `wholetext` keeps one row per file — so line numbers are exact and
    * per-file — then `posexplode` restores the line stream and
    * [[parse]] does the grammar. Each file is one row until the explode,
    * so parallelism is per-file (the right granularity: the grammar is
    * sequential WITHIN a file, embarrassingly parallel across files). */
  def parseDir(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file_id"), col("value"))
    val lines = files
      .select(col("file_id"), posexplode(split(col("value"), "\n")))
      .select(col("file_id"), col("pos").cast("long").as("line_no"), col("col").as("line"))
    parse(lines)
  }

  def parse(lines: DataFrame): DataFrame = {
    val byLine = Window.partitionBy("file_id").orderBy("line_no")
    val fill   = byLine.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // The classification patterns are the reference's EXACT regexes
    // (`^##[[:space:]]+(.+)$` etc., agent-loop.sh:200,207,215) — Java
    // backtracking reproduces bash ERE here, including the subtle cases
    // the differential test (tools/diff_parser.py) caught: a
    // whitespace-only line of ≥2 chars IS a continuation contributing a
    // single space, and captures keep trailing whitespace.
    val classified = lines
      .withColumn("line", regexp_replace(col("line"), "\r$", ""))
      .withColumn("kind",
        when(col("line").rlike("^##\\s+.+$"), "heading")
          .when(col("line").rlike("^-\\s+.+$"), "task")
          .when(col("line").rlike("^\\s+.+$"), "cont")
          .otherwise("blank"))

    val grouped = classified
      .withColumn("grp_raw",
        when(col("kind") === "heading",
             regexp_extract(col("line"), "^##\\s+(.+)$", 1)))
      .withColumn("grp",
        coalesce(last(col("grp_raw"), ignoreNulls = true).over(fill), lit("ungrouped")))
      // Running count of task starts = the task each line belongs to.
      .withColumn("task_no",
        sum(when(col("kind") === "task", 1).otherwise(0)).over(fill))
      // A continuation line only attaches if nothing terminated the task
      // since its `- ` line: count terminators (blank/heading) since the
      // task start and require zero.
      .withColumn("brk",
        sum(when(col("kind").isin("blank", "heading"), 1).otherwise(0)).over(fill))

    val starts = grouped.filter(col("kind") === "task")
      .select(col("file_id"), col("task_no"), col("grp"), col("brk").as("start_brk"),
              regexp_extract(col("line"), "^-\\s+(.+)$", 1).as("head"),
              col("line_no").as("start_line"))

    val conts = grouped.filter(col("kind") === "cont" && col("task_no") > 0)
      // BASH_REMATCH[1]: maximal leading whitespace stripped, trailing
      // kept; an all-whitespace line backtracks to a single-space capture.
      .select(col("file_id"), col("task_no"), col("brk"), col("line_no"),
              regexp_extract(col("line"), "^\\s+(.+)$", 1).as("cont"))

    // Join continuations to their task; drop any continuation separated
    // from the task start by a terminator. The join key (file_id, task_no)
    // co-partitions with the window above, so AQE coalesces the shuffles.
    val joined = starts
      .join(conts, Seq("file_id", "task_no"), "left_outer")
      .groupBy(col("file_id"), col("task_no"), col("grp"),
               col("head"), col("start_line"))
      // collect_list drops nulls, so a task whose continuations were all
      // severed by a terminator (brk mismatch) still keeps its start row.
      .agg(array_sort(collect_list(
        when(col("brk") === col("start_brk"), struct(col("line_no"), col("cont")))))
        .as("parts"))
      .withColumn("task",
        concat_ws(" ", concat(array(col("head")),
                              transform(col("parts"), p => p("cont")))))

    joined.select(
      col("file_id"),
      row_number().over(Window.partitionBy("file_id").orderBy("start_line")).as("index"),
      col("grp").as("group"),
      col("task"))
  }
}
