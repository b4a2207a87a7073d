package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.1 — scans / sources.
  *
  * Reference behaviors re-expressed Spark-first:
  *  - full scan + count (task-file read loop, `agent-loop.sh:195-224`)
  *  - projected scan with parquet column pruning (`agent-loop.sh:322-325`)
  *  - semi-structured text → rows with heading fill-down (the markdown
  *    task grammar, `agent-loop.sh:185-227`); the full grammar (multiline
  *    continuation join, CRLF, ungrouped default) is implemented in
  *    [[graft.sources.TaskListParser]]; this query oracle-checks the
  *    fill-down core over the `documents` table.
  *  - nested-JSON ingest / field extraction (`agent-loop.sh:293-303`).
  */
object Scans {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // COUNT(*) never reads data pages — parquet footers only.
    "q_scan_full" -> ((s, dir) =>
      Tables.lineitem(s, dir).agg(count(lit(1)).as("n_rows"))),

    // Two-column projection: ReadSchema must show exactly these columns.
    "q_scan_project" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"))
        .orderBy("l_orderkey", "l_quantity")),

    // Markdown-ish line stream: every 10th row is a `## heading`, the rest
    // are `- item` lines; group name fills down (agent-loop.sh:187,200-203).
    // Partitioned by `source` (≈ file id): each file's lines fill down
    // independently, so the window parallelizes across files — at corpus
    // scale no single task sees more than one file's lines. Round 1 used
    // an unpartitioned window here, which serializes the whole corpus
    // through one task; this is the scale-safe shape.
    "q_source_text_parse" -> ((s, dir) => {
      val lines = Tables.documents(s, dir).select(
        col("doc_id"), col("source"),
        when(col("doc_id") % 10 === 0,
             concat(lit("## group-"), col("doc_id").cast("string")))
          .otherwise(concat(lit("- "), substring(col("text"), 1, 30)))
          .as("line"))
      val marked = lines
        .withColumn("grp",  when(col("line").startsWith("## "), expr("substr(line, 4)")))
        .withColumn("item", when(!col("line").startsWith("## "), expr("substr(line, 3)")))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      marked
        .withColumn("grp_name",
          coalesce(last(col("grp"), ignoreNulls = true).over(w), lit("ungrouped")))
        .filter(col("item").isNotNull)
        .select(col("doc_id"), col("source"), col("grp_name"), col("item"))
        .orderBy("doc_id")
    }),

    // JSON document ingest: extract a typed field from the props JSON
    // string (the `.usage.input_tokens // 0` shape, agent-loop.sh:417-422).
    "q_json_doc_ingest" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(0)).as("k"))
        .orderBy("event_id")),

    // JSONL interchange round trip (round 15) — see sources/Ingest:
    // corpus ∪ escaping plants staged to JSONL, read back through the
    // schema-explicit FAILFAST reader, content-audited per source.
    // The oracle computes the SAME audit from parquet, so the hash
    // matches iff the writer+reader preserved every byte.
    "q_source_jsonl_ingest" -> ((s, dir) =>
      graft.sources.Ingest.jsonlRoundtrip(s, dir)),

    // The CSV twin: multiLine + RFC-4180 quote-doubling — the reader
    // configuration the embedded-newline plant exists to catch.
    "q_source_csv_ingest" -> ((s, dir) =>
      graft.sources.Ingest.csvRoundtrip(s, dir)),
  )

  /** The ingest round-trip audit from the PARQUET side — plants as
    * literals (chr(10) spells the embedded newline; DuckDB treats
    * backslash literally in standard strings, same as the Scala
    * source). */
  private def ingestOracleSql(includeEmpty: Boolean): String = {
    val b = graft.sources.Ingest.IngestPlantBase
    val empty =
      if (includeEmpty) s"\n        UNION ALL SELECT ${b + 4}, 'plant', ''"
      else ""
    s"""
      WITH docs AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL SELECT $b, 'plant', 'line one' || chr(10) || 'line two'
        UNION ALL SELECT ${b + 1}, 'plant', 'comma, separated, values'
        UNION ALL SELECT ${b + 2}, 'plant', 'a "quoted" span'
        UNION ALL SELECT ${b + 3}, 'plant', 'back\\slash and trailing space '$empty)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(length(text)) AS BIGINT) AS n_chars,
             CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT
                      % ${graft.sources.Ingest.FoldMod}) AS BIGINT)
               AS fold_sum
      FROM docs GROUP BY source ORDER BY source"""
  }

  val oracle: Map[String, String] = Map(
    "q_scan_full" -> "SELECT count(*) AS n_rows FROM lineitem",

    "q_scan_project" ->
      "SELECT l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_quantity",

    "q_source_text_parse" -> """
      WITH lines AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 10 = 0
                    THEN '## group-' || CAST(doc_id AS VARCHAR)
                    ELSE '- ' || substr(text, 1, 30) END AS line
        FROM documents),
      marked AS (
        SELECT doc_id, source,
               CASE WHEN line LIKE '## %' THEN substr(line, 4) END AS grp,
               CASE WHEN line NOT LIKE '## %' THEN substr(line, 3) END AS item
        FROM lines),
      filled AS (
        SELECT doc_id, source,
               coalesce(last_value(grp IGNORE NULLS) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 'ungrouped') AS grp_name,
               item
        FROM marked)
      SELECT doc_id, source, grp_name, item FROM filled
      WHERE item IS NOT NULL ORDER BY doc_id""",

    "q_json_doc_ingest" -> """
      SELECT event_id,
             coalesce(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER), 0) AS k
      FROM events ORDER BY event_id""",

    // Parquet-side twins of the ingest round trips — a hash match
    // proves the staged format preserved every byte (see the keys).
    "q_source_jsonl_ingest" -> ingestOracleSql(includeEmpty = true),
    "q_source_csv_ingest" -> ingestOracleSql(includeEmpty = false),
  )
}
