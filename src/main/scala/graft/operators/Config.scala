package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Config/broadcast lookup — the reference's layered config resolution
  * (`agent-loop.sh:47-80` load_boot_file: task-file directive overrides
  * the project's `.agent-loop/boot.md`, which overrides the built-in
  * prompt; `telegram-agent.py:67-106` reads telegram.json the same way)
  * re-expressed as the Spark idiom for "every row sees a tiny config":
  * broadcast the config tables, LEFT-join them to the fact scan, and
  * resolve the effective value with a coalesce fallback chain. The
  * built-in layer comes from session conf (`spark.conf`), the Spark
  * analogue of the reference's environment-variable defaults
  * (`agent-loop.sh:16-22`).
  *
  * Scale shape: the config side is O(config) and broadcasts; the corpus
  * side never shuffles for the enrichment (both joins are
  * BroadcastHashJoin — asserted in PlanShapeSpec), and the only wide op
  * is the final tiny aggregate.
  */
object Config {
  type Q = (SparkSession, String) => DataFrame

  /** Conf key for the built-in default threshold — settable per session,
    * like the reference's env-var defaults. */
  val DefaultThresholdKey = "graft.config.defaultThreshold"

  /** Layer 1 (strongest): per-run overrides — the task-file directive. */
  def overrides(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("de", 200L), ("fr", 150L)).toDF("lang", "thr_override")
  }

  /** Layer 2: project defaults — `.agent-loop/boot.md`. */
  def defaults(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("de", 100L), ("en", 120L), ("es", 110L)).toDF("lang", "thr_default")
  }

  val queries: Map[String, Q] = Map(
    // Every document resolves its effective min-length threshold through
    // the override → default → builtin chain ('zh' has neither layer and
    // falls through to the conf default), then a per-lang pass/total
    // count keeps the output small and oracle-friendly.
    "q_config_lookup" -> ((s, dir) => {
      val builtin = s.conf.get(DefaultThresholdKey, "80").toLong
      Tables.documents(s, dir)
        .join(broadcast(overrides(s)), Seq("lang"), "left")
        .join(broadcast(defaults(s)), Seq("lang"), "left")
        .withColumn("threshold",
          coalesce(col("thr_override"), col("thr_default"), lit(builtin)))
        .groupBy(col("lang"), col("threshold"))
        .agg(
          count(when(col("n_chars") >= col("threshold"), 1)).as("n_pass"),
          count(lit(1)).as("n_total"))
        .orderBy("lang")
    }))

  /** A `def`, not a `val`: the built-in layer is a SESSION CONF, which
    * DuckDB cannot read, so the oracle resolves the live value at
    * access time — `Verify` dumps `oracleSql` from the same session
    * that ran the queries, so the dumped SQL tracks whatever the
    * session set (the same derive-both-sides-from-one-input rule the
    * corpus-size knobs follow via their `params` CTEs). getActiveSession
    * is thread-local, so fall back to the JVM-wide default session — an
    * access from a thread that didn't create the session must not
    * silently read the documented default while the engine query reads
    * the real conf. No session at all → the documented default. */
  def oracle: Map[String, String] = {
    val builtin = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.conf.get(DefaultThresholdKey, "80")).getOrElse("80").toLong
    Map(
      "q_config_lookup" -> s"""
      WITH overrides(lang, thr_override) AS (VALUES ('de', 200), ('fr', 150)),
      defaults(lang, thr_default) AS (VALUES ('de', 100), ('en', 120), ('es', 110)),
      enriched AS (
        SELECT d.lang,
               CAST(coalesce(o.thr_override, f.thr_default, $builtin) AS BIGINT) AS threshold,
               d.n_chars
        FROM documents d
        LEFT JOIN overrides o ON d.lang = o.lang
        LEFT JOIN defaults f ON d.lang = f.lang)
      SELECT lang, threshold,
             count(CASE WHEN n_chars >= threshold THEN 1 END) AS n_pass,
             count(*) AS n_total
      FROM enriched GROUP BY lang, threshold ORDER BY lang""")
  }
}
