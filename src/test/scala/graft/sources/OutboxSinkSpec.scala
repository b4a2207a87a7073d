package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The sink half of the custom-connector pair: two-phase commit with
  * idempotent-by-batchId delivery, proven against a REAL epoch replay
  * (checkpoint commit log truncated so Spark re-executes the batch). */
class OutboxSinkSpec extends SparkSpec {

  private def pipe(qn: String, bx: String, ckpt: String) =
    spark.readStream.format(classOf[UpdateLogProvider].getName)
      .option("queue", qn).load()
      .select(col("chat_id"), col("text"))
      .writeStream.format(classOf[OutboxProvider].getName)
      .option("box", bx)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)

  test("streamed records land once; a replayed epoch does not double-deliver") {
    val qn = "outq"; val bx = "outbox1"
    val ckpt = java.nio.file.Files.createTempDirectory("outbox-ckpt").toString
    try {
      UpdateLog.post(qn, 10L, "m1")
      val q1 = pipe(qn, bx, ckpt).start()
      try {
        q1.processAllAvailable()
        UpdateLog.post(qn, 20L, "m2")
        q1.processAllAvailable()
      } finally {
        q1.stop(); q1.awaitTermination()
        // The restart reuses the SAME persistent query id (ckpt/metadata),
        // so the manager must have fully deregistered this run first.
        val dl = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (spark.streams.active.exists(_.id == q1.id) && System.nanoTime() < dl)
          Thread.sleep(20)
      }
      val afterFirst = Outbox.delivered(bx)
      assert(afterFirst.map(r => (r._2, r._3)).sorted == Seq((10L, "m1"), (20L, "m2")),
        s"unexpected delivery: $afterFirst")
      // Force a genuine epoch replay: drop the newest entry of the
      // checkpoint COMMIT log while keeping its offsets entry — on
      // restart Spark sees offsets ahead of commits and re-executes
      // that batch against the sink with the same epochId.
      val commits = java.nio.file.Paths.get(ckpt, "commits")
      val newest = java.nio.file.Files.list(commits)
        .filter(p => p.getFileName.toString.forall(_.isDigit))
        .max((a, b) => a.getFileName.toString.toLong
          .compareTo(b.getFileName.toString.toLong)).get()
      java.nio.file.Files.delete(newest)
      // …including Hadoop's checksum sidecar: a stale .N.crc makes the
      // replayed commit's rename fail as a concurrent-modification error.
      java.nio.file.Files.deleteIfExists(
        newest.resolveSibling("." + newest.getFileName.toString + ".crc"))
      val q2 = pipe(qn, bx, ckpt).start()
      try {
        q2.processAllAvailable() // replays the dropped epoch
        UpdateLog.post(qn, 30L, "m3")
        q2.processAllAvailable() // and continues with new data
      } finally q2.stop()
      val all = Outbox.delivered(bx)
      // Exactly-once: m2's replay was absorbed by the idempotent commit;
      // m3 arrived; nothing delivered twice.
      assert(all.map(r => (r._2, r._3)).sorted ==
        Seq((10L, "m1"), (20L, "m2"), (30L, "m3")), s"delivery set: $all")
      assert(all.map(_._1).distinct.size == all.size,
        s"a batchId delivered twice: $all")
    } finally { UpdateLog.drop(qn); Outbox.drop(bx) }
  }

  test("a fresh-checkpoint query is not mistaken for a replay of an earlier one") {
    // Failure mode of epoch-only idempotency keying: query A commits
    // epochs 0..n into a box; query B (new checkpoint ⇒ NEW queryId,
    // epochs restarting at 0) writes to the same box and its batches
    // are silently dropped as "already committed". Keying by
    // (queryId, epochId) must deliver both.
    val qn1 = "outq-a"; val qn2 = "outq-b"; val bx = "outbox2"
    val ck1 = java.nio.file.Files.createTempDirectory("outbox-ckpt-a").toString
    val ck2 = java.nio.file.Files.createTempDirectory("outbox-ckpt-b").toString
    try {
      UpdateLog.post(qn1, 1L, "from-a")
      val qa = pipe(qn1, bx, ck1).start()
      try qa.processAllAvailable() finally qa.stop()
      // Second pipeline, fresh checkpoint, same box: its first batch is
      // also epochId 0 — the exact collision the keying must survive.
      UpdateLog.post(qn2, 2L, "from-b")
      val qb = pipe(qn2, bx, ck2).start()
      try qb.processAllAvailable() finally qb.stop()
      val all = Outbox.delivered(bx)
      assert(all.map(r => (r._2, r._3)).sorted == Seq((1L, "from-a"), (2L, "from-b")),
        s"fresh-checkpoint batch dropped or duplicated: $all")
    } finally { UpdateLog.drop(qn1); UpdateLog.drop(qn2); Outbox.drop(bx) }
  }
}
