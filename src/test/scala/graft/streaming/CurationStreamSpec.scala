package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Curation
import graft.sources.{Outbox, OutboxProvider, UpdateLog, UpdateLogProvider}

/** End-to-end streaming curation: the custom micro-batch SOURCE feeds
  * the round-5 contamination GATE and lands in the exactly-once SINK —
  * the ingest-time composition of the batch `q_decontaminate` audit
  * (documents arriving on a stream are dropped at the door instead of
  * flagged after the fact). The gate is a stateless per-row filter, so
  * it adds no streaming state, no watermark requirement, and survives
  * replay for free (the sink's idempotent commit does the rest).
  */
class CurationStreamSpec extends SparkSpec {

  test("streamed docs pass the contamination gate; eval-overlapping ones are dropped") {
    val qn = "cur-in"; val bx = "cur-out"
    val ckpt = java.nio.file.Files.createTempDirectory("cur-ckpt").toString
    try {
      val evalText = "alpha beta gamma delta epsilon zeta"
      val evalShingles = evalText.split(" ")
        .sliding(Curation.ShingleWidth).map(_.mkString(" ")).toSeq
      // Contaminated: embeds a full eval 5-gram verbatim.
      UpdateLog.post(qn, 1L, "intro words alpha beta gamma delta epsilon trailing tail")
      // Clean: shares words with eval but never a full-width shingle.
      UpdateLog.post(qn, 2L, "alpha beta gamma changed words entirely here now")
      // Clean and below shingle width: must pass, not crash sequence().
      UpdateLog.post(qn, 3L, "tiny doc")
      val q = Curation.contaminationGate(
          spark.readStream.format(classOf[UpdateLogProvider].getName)
            .option("queue", qn).load(),
          evalShingles)
        .select(col("chat_id"), col("text"))
        .writeStream.format(classOf[OutboxProvider].getName)
        .option("box", bx)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      try q.processAllAvailable() finally q.stop()
      val delivered = Outbox.delivered(bx).map(r => (r._2, r._3)).sorted
      assert(delivered == Seq(
        (2L, "alpha beta gamma changed words entirely here now"),
        (3L, "tiny doc")), s"gate delivered: $delivered")
    } finally { UpdateLog.drop(qn); Outbox.drop(bx) }
  }
}
