package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A custom DataSource-V2 micro-batch SOURCE with the reference's
  * long-poll/offset contract (`telegram-agent.py:154-166` tg_get_updates
  * + `:618-623` the poll loop):
  *
  *   - every update carries a monotonically increasing `update_id`;
  *   - a read at offset o returns all updates with `update_id ≥ o`;
  *   - after processing, the consumer advances its offset to
  *     `max(update_id) + 1` and persists it (`save_offset`,
  *     `telegram-agent.py:108-116`) so a restart resumes — never
  *     re-serving what was acknowledged, never skipping what wasn't.
  *
  * Spark mapping: `latestOffset` is the poll; `planInputPartitions
  * (start, end)` snapshots updates in `[start, end)` INTO the partition
  * (so readers never reach back to the driver — executor-safe, like
  * MemoryStream); `commit(end)` is `save_offset` — the engine's
  * checkpoint, not the source, is the replay authority, which is what
  * upgrades the reference's at-least-once loop to exactly-once on
  * restart (driven through checkpoint-restart in UpdateLogSourceSpec).
  *
  * The backing queue is an in-JVM registry (a test transport, exactly
  * like Spark's own MemoryStream); the offset/replay/commit logic above
  * is the part a real network transport would reuse unchanged.
  */
object UpdateLog {
  val schema: StructType = new StructType()
    .add("update_id", LongType).add("chat_id", LongType).add("text", StringType)

  private case class Queue(rows: ArrayBuffer[(Long, Long, String)],
                           var nextId: Long, var committed: Long)
  private val queues = new ConcurrentHashMap[String, Queue]()

  private def queue(name: String): Queue =
    queues.computeIfAbsent(name, _ => Queue(ArrayBuffer.empty, 1L, 0L))

  /** Post an update; returns its assigned update_id (monotonic). */
  def post(name: String, chatId: Long, text: String): Long = {
    val q = queue(name)
    q.synchronized {
      val id = q.nextId; q.nextId += 1
      q.rows += ((id, chatId, text)); id
    }
  }

  /** The long-poll answer: next offset to request (max update_id + 1). */
  def nextOffset(name: String): Long = { val q = queue(name); q.synchronized(q.nextId) }

  /** Updates with update_id in [from, until). */
  def range(name: String, from: Long, until: Long): Seq[(Long, Long, String)] = {
    val q = queue(name)
    q.synchronized(q.rows.filter(r => r._1 >= from && r._1 < until).toSeq)
  }

  /** The consumer's persisted offset (save_offset analogue) — observable
    * so tests assert acknowledgement really advanced. */
  def committedOffset(name: String): Long = { val q = queue(name); q.synchronized(q.committed) }

  private[sources] def commit(name: String, offset: Long): Unit = {
    val q = queue(name)
    q.synchronized { q.committed = math.max(q.committed, offset) }
  }

  def drop(name: String): Unit = { queues.remove(name); () }
}

private case class UpdateOffset(next: Long) extends Offset {
  override def json: String = next.toString
}

/** The snapshot partition: rows ride along, executor-safe. */
private case class UpdateSlice(rows: Seq[(Long, Long, String)]) extends InputPartition

private class UpdateLogStream(queueName: String) extends MicroBatchStream {
  override def latestOffset(): Offset = UpdateOffset(UpdateLog.nextOffset(queueName))
  override def initialOffset(): Offset = UpdateOffset(1L)
  override def deserializeOffset(json: String): Offset = UpdateOffset(json.toLong)
  override def commit(end: Offset): Unit =
    UpdateLog.commit(queueName, end.asInstanceOf[UpdateOffset].next)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(UpdateSlice(UpdateLog.range(queueName,
      start.asInstanceOf[UpdateOffset].next, end.asInstanceOf[UpdateOffset].next)))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val it = p.asInstanceOf[UpdateSlice].rows.iterator
          private var cur: (Long, Long, String) = _
          override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
          override def get(): InternalRow =
            InternalRow(cur._1, cur._2, UTF8String.fromString(cur._3))
          override def close(): Unit = ()
        }
    }
  override def stop(): Unit = ()
}

/** `spark.readStream.format(classOf[UpdateLogProvider].getName)
  * .option("queue", name).load()` */
class UpdateLogProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = UpdateLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new UpdateLogTable(properties.get("queue"))
}

private class UpdateLogTable(queueName: String) extends Table with SupportsRead {
  require(queueName != null, "updatelog source requires .option(\"queue\", name)")
  override def name(): String = s"updatelog($queueName)"
  override def schema(): StructType = UpdateLog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = UpdateLog.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new UpdateLogStream(queueName)
    }
}
