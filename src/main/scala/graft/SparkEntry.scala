package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Thin: keys → functions; each operator family lives in graft.operators.
  */
object SparkEntry {
  /** Flagship: the reference's `--status` aggregation (SURVEY §3.2,
    * agent-loop.sh:144-151) — its 4 separate filtered scans + derived
    * `pending` collapsed into ONE grouped pass with conditional counts.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.orders(spark, "/root/testdata/sf0.001")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_done"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_partial"))
      .select(
        col("n_total"), col("n_open"), col("n_done"), col("n_partial"),
        (col("n_total") - col("n_open") - col("n_done") - col("n_partial"))
          .as("n_pending"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Scans.queries ++
    operators.Filters.queries ++
    operators.Aggs.queries ++
    operators.Joins.queries ++
    operators.Config.queries ++
    operators.Windows.queries ++
    operators.Events.queries ++
    operators.SortsSets.queries ++
    operators.Scalars.queries ++
    operators.Udfs.queries ++
    operators.Dedup.queries ++
    operators.Similarity.queries ++
    operators.TextAnalysis.queries ++
    operators.Curation.queries ++
    operators.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approx/UDF/map ops) get the
    * driver's weaker rows-only check and a ScalaTest spec instead. */
  def oracleSql: Map[String, String] =
    operators.Scans.oracle ++
    operators.Filters.oracle ++
    operators.Aggs.oracle ++
    operators.Joins.oracle ++
    operators.Config.oracle ++
    operators.Windows.oracle ++
    operators.Events.oracle ++
    operators.SortsSets.oracle ++
    operators.Scalars.oracle ++
    operators.Udfs.oracle ++
    operators.Dedup.oracle ++
    operators.Similarity.oracle ++
    operators.TextAnalysis.oracle ++
    operators.Curation.oracle ++
    operators.Multimodal.oracle
}
