package graft

import org.apache.spark.sql.functions._

/** The passive observability hook: actions are captured with executed-
  * plan metrics (what actually ran under AQE), including the
  * shuffle-bytes figure the SCALE.md rules are written to minimize. */
class MetricsSpec extends SparkSpec {

  private def awaitActions(min: Int): Seq[Metrics.QueryMetric] = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var snap = Metrics.recent()
    while (snap.size < min && System.nanoTime() < deadline) {
      Thread.sleep(50); snap = Metrics.recent()
    }
    snap
  }

  test("listener records duration and shuffle volume of a grouped action") {
    Metrics.reset()
    Metrics.install(spark)
    try {
      // A shuffling aggregate: lang-keyed count over documents.
      Tables.documents(spark, sfDir).groupBy("lang").count().collect()
      val snap = awaitActions(1)
      assert(snap.nonEmpty, "no action captured")
      val m = snap.last
      assert(m.failed.isEmpty)
      assert(m.durationNs > 0)
      // The groupBy moved SOMETHING through a shuffle exchange; the
      // exact volume is plan-dependent, the capture must be nonzero.
      assert(m.shuffleRows > 0, s"no shuffle rows recorded: $m")
      assert(m.shuffleBytes > 0, s"no shuffle bytes recorded: $m")
    } finally Metrics.uninstall(spark)
  }

  private def awaitStream(pred: Seq[Metrics.StreamBatch] => Boolean)
      : Seq[Metrics.StreamBatch] = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var snap = Metrics.recentStreaming()
    while (!pred(snap) && System.nanoTime() < deadline) {
      Thread.sleep(50); snap = Metrics.recentStreaming()
    }
    snap
  }

  test("streaming listener: gate drops are visible as input minus sink rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Metrics.resetStreaming()
    Metrics.installStreaming(spark)
    val in = MemoryStream[Long]
    // A stateless gate (the contaminationGate shape): filter → sink.
    // Per-batch drop count = inputRows − sinkRows, no custom metric
    // plumbing needed — the listener reads both off the progress event.
    val q = in.toDS().toDF("v").filter(col("v") % 2 === 0)
      .writeStream.format("memory").queryName("metrics_gate")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      in.addData(0L until 100L: _*)
      q.processAllAvailable()
      val snap = awaitStream(_.exists(b =>
        b.query == "metrics_gate" && b.inputRows == 100))
      val b = snap.filter(b => b.query == "metrics_gate" && b.inputRows == 100)
      assert(b.nonEmpty, s"no gate batch captured: $snap")
      assert(b.head.sinkRows == 50, s"expected 50 sink rows: ${b.head}")
      assert(b.head.triggerMs >= 0)
      assert(b.head.stateRows == 0, "a stateless gate must hold no state")
    } finally { q.stop(); Metrics.uninstallStreaming(spark) }
  }

  test("streaming listener: stateful aggregation exposes state rows and updates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Metrics.resetStreaming()
    Metrics.installStreaming(spark)
    val in = MemoryStream[Long]
    val q = in.toDS().toDF("v").groupBy(expr("v % 10").as("k")).count()
      .writeStream.format("memory").queryName("metrics_state")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete).start()
    try {
      in.addData(0L until 50L: _*)
      q.processAllAvailable()
      val snap = awaitStream(_.exists(b =>
        b.query == "metrics_state" && b.stateRows > 0))
      val batches = snap.filter(_.query == "metrics_state")
      assert(batches.nonEmpty,
        s"no metrics_state batch captured before the deadline: $snap")
      val b = batches.last
      assert(b.stateRows == 10, s"expected 10 state groups: $b")
      assert(b.stateRowsUpdated > 0, s"no state updates recorded: $b")
      assert(b.stateBytes > 0, s"no state memory recorded: $b")
    } finally { q.stop(); Metrics.uninstallStreaming(spark) }
  }

  test("uninstall stops capture; buffer stays bounded") {
    Metrics.reset()
    Metrics.install(spark)
    try {
      Tables.documents(spark, sfDir).limit(1).collect()
      assert(awaitActions(1).nonEmpty)
    } finally Metrics.uninstall(spark)
    Metrics.reset()
    // Post-uninstall actions must not be recorded (listener delivery is
    // async — give stragglers a moment before asserting silence).
    Tables.documents(spark, sfDir).limit(1).collect()
    Thread.sleep(300)
    assert(Metrics.recent().isEmpty, s"captured after uninstall: ${Metrics.recent()}")
  }
}
