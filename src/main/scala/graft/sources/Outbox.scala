package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A custom DataSource-V2 streaming SINK with the outbound-message
  * contract of the reference's send path (`telegram-agent.py:169-182`
  * tg_send_message): records are (chat_id, text) and delivery must not
  * duplicate when a batch retries — which the reference cannot
  * guarantee (an HTTP send that times out after delivery re-sends);
  * the DSv2 two-phase commit protocol upgrades it to exactly-once:
  *
  *   - executors STAGE rows per partition and return them as commit
  *     messages (`DataWriter.commit`) — nothing is visible yet;
  *   - the driver's `StreamingWrite.commit(batchId, messages)` applies
  *     the whole batch atomically, and IDEMPOTENTLY per (queryId,
  *     batchId): a replayed epoch (post-crash re-execution of a
  *     committed one) is a no-op, while a DIFFERENT query — or the same
  *     pipeline restarted on a fresh checkpoint, whose epochs restart at
  *     0 — is never confused with a replay (both driven in
  *     OutboxSinkSpec);
  *   - `abort` drops the staged rows — a failed batch leaves nothing.
  *
  * The outbox itself is an in-JVM registry (test transport, like the
  * UpdateLog source); the staging/commit/abort protocol is the part a
  * real network sink would reuse unchanged.
  */
object Outbox {
  val schema: StructType = new StructType()
    .add("chat_id", LongType).add("text", StringType)

  private case class Box(delivered: mutable.ArrayBuffer[(Long, Long, String)],
                         committedBatches: mutable.Set[(String, Long)])
  private val boxes = new ConcurrentHashMap[String, Box]()
  private def box(name: String): Box =
    boxes.computeIfAbsent(name, _ => Box(mutable.ArrayBuffer.empty, mutable.Set.empty))

  /** Everything delivered so far: (batchId, chat_id, text). */
  def delivered(name: String): Seq[(Long, Long, String)] = {
    val b = box(name); b.synchronized(b.delivered.toSeq)
  }

  /** Idempotency is keyed by (queryId, epochId), NOT epochId alone:
    * epochIds restart at 0 for a query started on a fresh checkpoint,
    * and two queries writing to one box overlap epoch numbers — either
    * would silently drop batches under epoch-only keying. The queryId is
    * the PERSISTENT streaming id (`LogicalWriteInfo.queryId()`, sourced
    * from checkpoint metadata), so a same-checkpoint restart keeps its
    * id and replayed epochs are still absorbed. */
  private[sources] def commit(name: String, queryId: String, batchId: Long,
                              rows: Seq[(Long, String)]): Unit = {
    val b = box(name)
    b.synchronized {
      if (!b.committedBatches.contains((queryId, batchId))) { // idempotent replay
        b.committedBatches += ((queryId, batchId))
        b.delivered ++= rows.map(r => (batchId, r._1, r._2))
      }
    }
  }

  def drop(name: String): Unit = { boxes.remove(name); () }
}

/** Commit message: the partition's staged rows ride back to the driver. */
private case class StagedRows(rows: Seq[(Long, String)]) extends WriterCommitMessage

private class OutboxStreamingWrite(boxName: String, queryId: String) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
                                epochId: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private val staged = mutable.ArrayBuffer.empty[(Long, String)]
          override def write(row: InternalRow): Unit =
            staged += ((row.getLong(0), row.getUTF8String(1).toString))
          override def commit(): WriterCommitMessage = StagedRows(staged.toSeq)
          override def abort(): Unit = staged.clear()
          override def close(): Unit = ()
        }
    }
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    Outbox.commit(boxName, queryId, epochId,
      messages.toSeq.flatMap(_.asInstanceOf[StagedRows].rows))
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

/** `df.writeStream.format(classOf[OutboxProvider].getName)
  * .option("box", name)...` */
class OutboxProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Outbox.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new OutboxTable(properties.get("box"))
}

private class OutboxTable(boxName: String) extends Table with SupportsWrite {
  require(boxName != null, "outbox sink requires .option(\"box\", name)")
  override def name(): String = s"outbox($boxName)"
  override def schema(): StructType = Outbox.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def buildForStreaming(): StreamingWrite =
        new OutboxStreamingWrite(boxName, info.queryId())
    }
}
