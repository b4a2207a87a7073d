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
