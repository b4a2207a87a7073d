package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Micro-batch file source with checkpointed offsets (SURVEY §2.9 row 1):
  * the reference's long-poll + offset-persist loop
  * (`telegram-agent.py:154-166,618-623`) maps to Spark's file streaming
  * source — each new file is an offset unit, progress is checkpointed,
  * restarts resume. */
class FileSourceSpec extends SparkSpec {

  test("file stream: new files become micro-batches, offsets checkpoint, restart resumes") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    val ckpt   = Files.createTempDirectory("graft-stream-ckpt").toString

    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("event_id", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(s"$srcDir/$name")

    writeBatch("b1", Seq((1L, "click"), (2L, "view")))
    val schema = "event_id BIGINT, event_type STRING"
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*")
      .groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("filestream")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete).start()

    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    val afterB1 = spark.table("filestream").as[(String, Long)].collect().toMap
    assert(afterB1 == Map("click" -> 1L, "view" -> 1L))

    // New file lands; a RESTARTED query (same checkpoint) must pick up
    // only the delta and carry the aggregation state forward.
    writeBatch("b2", Seq((3L, "click")))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val afterB2 = spark.table("filestream").as[(String, Long)].collect().toMap
    assert(afterB2 == Map("click" -> 2L, "view" -> 1L))
  }
}
