package graft

import java.util.concurrent.ConcurrentLinkedDeque

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query observability — the engine-side analogue of the
  * reference's always-on status/progress reporting (`--status`,
  * `agent-loop.sh:144-151`; per-task log lines throughout): every
  * DataFrame action that completes is recorded with its duration,
  * output rows, and how many bytes crossed a shuffle boundary.
  *
  * Implementation is the idiomatic Spark hook — a
  * `QueryExecutionListener` on the session's listener manager — so
  * capture is passive: no query rewrites, no timing wrappers, works
  * for actions issued by any caller (including SQL users). Metrics
  * come from the EXECUTED plan's accumulators, i.e. what actually ran
  * under AQE, not what was planned. The shuffle-bytes figure is the
  * one to watch at 100 TB: it is the number every SCALE.md rule tries
  * to keep sublinear in corpus size.
  *
  * The buffer is a bounded deque (latest `Keep` records): a
  * long-running session (Bench drives 96 actions; a streaming driver
  * runs forever) must not grow driver memory with query history.
  */
object Metrics {
  final case class QueryMetric(
      action: String,        // the DataFrame action ("count", "collect", …)
      durationNs: Long,
      outputRows: Option[Long],  // root operator's numOutputRows, if exposed
      shuffleBytes: Long,        // Σ dataSize over shuffle exchanges
      shuffleRows: Long,         // Σ numOutputRows over shuffle exchanges
      failed: Option[String])    // exception class name on failure

  private val Keep = 256
  private val buf = new ConcurrentLinkedDeque[QueryMetric]()
  private val listeners = new java.util.concurrent.ConcurrentHashMap[SparkSession, QueryExecutionListener]()

  private def record(m: QueryMetric): Unit = {
    buf.addLast(m)
    while (buf.size > Keep) buf.pollFirst()
  }

  /** Full executed-plan walk. `TreeNode.collect` stops at adaptive
    * boundaries — `AdaptiveSparkPlanExec` exposes the plan that
    * actually ran via `executedPlan` (not `children`), and each
    * `QueryStageExec` is a LEAF wrapping its materialized stage in
    * `plan` — so the shuffle exchanges AQE re-planned around are
    * invisible to a naive traversal. */
  private def nodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      nodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: nodes(q.plan)
    case other => other +: other.children.flatMap(nodes)
  }

  /** Broadcast exchanges are deliberately EXCLUDED: a broadcast is the
    * alternative to shuffling (its dataSize is the small side, once),
    * and counting it would make the broadcast-join designs this
    * library prefers look like shuffle volume. */
  private def metricSum(qe: QueryExecution, nodeFilter: String, metric: String): Long =
    nodes(qe.executedPlan).collect {
      case p if p.nodeName.contains(nodeFilter)
          && !p.nodeName.contains("Broadcast") =>
        p.metrics.get(metric).map(_.value).getOrElse(0L)
    }.sum

  /** Bytes that crossed a shuffle boundary in this (already executed)
    * query — for callers that hold the DataFrame and want synchronous
    * attribution (Bench records this per query) rather than the async
    * listener stream. */
  def shuffleBytesOf(qe: QueryExecution): Long = metricSum(qe, "Exchange", "dataSize")

  private class Recorder extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      record(QueryMetric(
        funcName, durationNs,
        qe.executedPlan.metrics.get("numOutputRows").map(_.value),
        metricSum(qe, "Exchange", "dataSize"),
        metricSum(qe, "Exchange", "shuffleRecordsWritten"),
        None))
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
      record(QueryMetric(funcName, 0L, None, 0L, 0L, Some(e.getClass.getSimpleName)))
  }

  /** Start capturing on this session (idempotent per session). */
  def install(spark: SparkSession): Unit =
    listeners.computeIfAbsent(spark, s => {
      val l = new Recorder
      s.listenerManager.register(l)
      l
    })

  /** Stop capturing on this session. */
  def uninstall(spark: SparkSession): Unit = {
    val l = listeners.remove(spark)
    if (l != null) spark.listenerManager.unregister(l)
  }

  /** Snapshot of the retained records, oldest first. Listener delivery
    * is asynchronous — tests should poll until the expected action
    * appears rather than read immediately after the action returns. */
  def recent(): Seq[QueryMetric] = buf.iterator().asScala.toSeq

  /** Drop all retained records (test isolation). */
  def reset(): Unit = buf.clear()
}
