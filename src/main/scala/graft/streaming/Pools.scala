package graft.streaming

import org.apache.spark.sql.SparkSession

/** Concurrency isolation between workload classes — the reference runs
  * separate chat/task/classify thread pools so a long-running task can
  * never starve chat handling (`telegram-agent.py:612-616`, invariant
  * tested at `tests/test-telegram-agent.py:66-100`). The Spark analogue
  * is fair-scheduler POOLS (conf/fairscheduler.xml): jobs — including
  * every micro-batch of a streaming query — submitted under a pool get
  * task slots by pool weight/minShare instead of FIFO behind whatever
  * job was submitted first.
  *
  * Requires `spark.scheduler.mode=FAIR` and
  * `spark.scheduler.allocation.file=conf/fairscheduler.xml` on the
  * session. Scale note: on a 1000-executor cluster this is the
  * difference between an interactive query landing in seconds versus
  * behind a multi-hour batch scan — same mechanism, same config.
  */
object Pools {
  val Chat     = "chat"
  val Task     = "task"
  val Classify = "classify"

  /** Runs `start` (typically a `writeStream.start()` or an action) with
    * the scheduler pool set on the calling thread. A streaming query's
    * micro-batch thread INHERITS the caller's local properties at
    * start(), so every batch of the query runs in `pool`; the previous
    * pool binding is restored afterwards so the calling thread is not
    * left mutated. */
  def inPool[T](spark: SparkSession, pool: String)(start: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", pool)
    try start
    finally sc.setLocalProperty("spark.scheduler.pool", prev)
  }
}
