package graft.sources

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Drives the custom MicroBatchStream through the reference's offset
  * contract: incremental delivery, offset acknowledgement (save_offset),
  * and checkpoint-restart with exactly-once replay. */
class UpdateLogSourceSpec extends SparkSpec {

  private def readQueue(q: String) =
    spark.readStream.format(classOf[UpdateLogProvider].getName)
      .option("queue", q).load()

  test("incremental micro-batches: each poll delivers only new update_ids") {
    val qn = "inc"
    try {
      UpdateLog.post(qn, 1L, "hello")
      UpdateLog.post(qn, 2L, "hi")
      val q = readQueue(qn).writeStream.format("memory").queryName("upd_inc")
        .outputMode(OutputMode.Append).start()
      try {
        q.processAllAvailable()
        assert(spark.table("upd_inc").count() == 2)
        UpdateLog.post(qn, 1L, "again")
        q.processAllAvailable()
        val rows = spark.table("upd_inc").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
        // No dupes, ids monotonic, all three delivered exactly once.
        assert(rows.toSeq == Seq((1L, 1L, "hello"), (2L, 2L, "hi"), (3L, 1L, "again")))
        // commit() advanced the acknowledged offset (save_offset,
        // telegram-agent.py:620-621). Spark acknowledges batch N at the
        // start of trigger N+1, so the floor here is the first batch's
        // end — the final batch's commit may still be pending.
        assert(UpdateLog.committedOffset(qn) >= 3L)
      } finally q.stop()
    } finally UpdateLog.drop(qn)
  }

  test("checkpoint restart: updates posted while down replay exactly once") {
    val qn = "restart"
    val ckpt = java.nio.file.Files.createTempDirectory("upd-ckpt").toString
    // foreachBatch: the recovery-capable sink (the memory sink refuses
    // checkpoint restart); batches land in a shared buffer.
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, String)]())
    def start() = readQueue(qn).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => seen.add((r.getLong(0), r.getString(2))))
        ()
      }
      .outputMode(OutputMode.Append).start()
    try {
      UpdateLog.post(qn, 1L, "before")
      val q1 = start()
      try { q1.processAllAvailable() } finally q1.stop()
      assert(seen.size == 1)
      // The consumer is DOWN; updates keep arriving (the long-poll gap).
      UpdateLog.post(qn, 2L, "while-down-1")
      UpdateLog.post(qn, 2L, "while-down-2")
      // Restart from the same checkpoint: only the unacknowledged
      // updates replay — none lost, none duplicated.
      val q2 = start()
      try { q2.processAllAvailable() } finally q2.stop()
      val all = seen.toArray(Array.empty[(Long, String)]).toSeq.sortBy(_._1)
      assert(all == Seq((1L, "before"), (2L, "while-down-1"), (3L, "while-down-2")))
    } finally UpdateLog.drop(qn)
  }
}
