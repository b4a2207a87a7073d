package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Token accounting from a model-result JSON document
  * (`agent-loop.sh:414-426`): total = Σ of the four usage fields with
  * jq-style `// 0` defaults; context window = the FIRST modelUsage
  * entry's contextWindow with `// 200000` (Spark's JSON map parsing
  * preserves document key order, matching jq's object iteration).
  * Differentially tested against the reference's jq pipeline
  * (tools/diff_tokens.py). */
object TokenUsage {

  private val MapSchema = "MAP<STRING, STRUCT<contextWindow: BIGINT>>"

  def total(js: Column): Column =
    Seq("input_tokens", "cache_creation_input_tokens",
        "cache_read_input_tokens", "output_tokens")
      .map(f => coalesce(get_json_object(js, s"$$.usage.$f").cast("long"), lit(0L)))
      .reduce(_ + _)

  def contextWindow(js: Column): Column =
    coalesce(
      // try_element_at: an EMPTY modelUsage map must yield the default,
      // not an ANSI out-of-bounds error.
      try_element_at(
        map_values(from_json(get_json_object(js, "$.modelUsage"), lit(MapSchema))), lit(1))
        .getField("contextWindow"),
      lit(200000L))

  /** The reference's `"total:window"` rendering. */
  def usageLine(js: Column): Column =
    concat(total(js).cast("string"), lit(":"), contextWindow(js).cast("string"))
}
