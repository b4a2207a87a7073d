package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Chunker

/** Windowed / deduplicating / sink-side streaming transforms (SURVEY
  * §2.9). Each takes a streaming DataFrame with an event-time `ts`
  * column and composes the standard Structured Streaming primitives —
  * no custom engine surgery, exactly as §4.2 concluded.
  *
  * ==Message-bus source/sink seam==
  * Every transform here is SOURCE-AGNOSTIC: it takes a streaming
  * DataFrame and returns one, so the file/MemoryStream sources used in
  * tests swap for a message-bus connector (e.g. the Apache Pulsar or
  * Kafka Structured Streaming connectors) with zero changes to this
  * file — only the boundary changes:
  * {{{
  *   // test harness (FileSource / MemoryStream):
  *   spark.readStream.schema(sch).parquet(dir)
  *   // production (connector jar on the classpath; not shippable in
  *   // this offline container — no connector jar under /opt/spark/jars):
  *   spark.readStream.format("pulsar")
  *     .option("service.url", ...).option("topics", ...).load()
  *     .select(from_json(col("value").cast("string"), sch).as("e"))
  *     .select("e.*")
  * }}}
  * The offset/replay contract the connector must honor — resume from
  * the checkpointed offset, at-least-once delivery with the idempotent
  * sink absorbing replays — is exactly what StreamingSpec's
  * checkpoint-restart test pins down against the file source, and what
  * `Sinks.idempotentAppend` provides on the write side.
  */
object StreamOps {

  /** Tumbling daily buckets — the daily-log sink key
    * (`agent-loop.sh:527-546`). */
  def tumblingDaily(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .count()
      .select(col("window.start").as("day"), col("event_type"), col("count"))

  /** Sliding windows — the periodic liveness view
    * (`telegram-agent.py:397-400`). */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("user_id"), col("n"))

  /** Activity-gap sessions — "new group = new session"
    * (`agent-loop.sh:635-640`). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
              col("session_window.end").as("s_end"),
              col("user_id"), col("n_events"))

  /** Stateful dedup within the watermark — drop re-delivered updates
    * (`telegram-agent.py:378-384,464-471`). */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")

  /** Chunked outbound sink (`telegram-agent.py:169-182,204-246`): long
    * payloads split through the Chunker UDF inside foreachBatch — the
    * batch is a plain DataFrame, so the whole §2 operator surface is
    * usable sink-side. Returns the rows the sink would transmit. */
  def chunkBatch(batch: DataFrame, limit: Int): DataFrame =
    batch.select(col("user_id"),
      explode(Chunker.chunksOf(col("payload"), lit(limit))).as("message"))
}
