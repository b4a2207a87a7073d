package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 moved the Column↔Expression conversions behind
  * `private[sql] classic.ExpressionUtils`, so libraries adding native
  * Catalyst expressions need an accessor inside the `org.apache.spark.sql`
  * namespace — the same pattern Delta/Frameless/Sedona use. This is the
  * ONLY file outside the `graft` namespace; keep it minimal.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until the listener bus has delivered every queued event —
    * `LiveListenerBus.waitUntilEmpty` is `private[spark]`, and metric
    * windows read task-time sums off an async listener (graft.Metrics
    * .TaskClock), so a window boundary needs a drain to be exact. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
