package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING maintenance of the served ANN index — the round-9 ROADMAP
  * candidate: arriving vectors assign against the FROZEN centroid
  * artifact and APPEND into their cell buckets inside `foreachBatch`,
  * with a batch LEDGER upgrading the append to EXACTLY-ONCE.
  *
  * Why a ledger: `Sinks.appendBucketed` is not idempotent (its
  * documented hazard — a replayed epoch doubles its rows), and
  * Structured Streaming replays the last in-flight epoch after every
  * restart. The Outbox sink closes this with DSv2 two-phase commit;
  * a parquet TABLE has no commit protocol, so this one is built from
  * plain files:
  *
  *   - every appended row is tagged (batch_id, attempt) where
  *     `attempt` is a fresh UUID per physical append attempt;
  *   - after the append completes, ONE tiny marker file
  *     `<ledgerDir>/b<batchId>` is written whose CONTENT is the
  *     attempt id — the marker creation is the atomic commit point;
  *   - [[readCommitted]] serves the table joined against the ledger on
  *     (batch_id, attempt): rows of an attempt that crashed BEFORE its
  *     marker (the classic append-then-crash window) never match any
  *     marker and stay INVISIBLE — orphan bytes on disk, not duplicate
  *     rows in answers; the replay's fresh attempt commits under a new
  *     UUID.
  *
  * A replayed epoch whose marker EXISTS is a pure no-op (checked
  * before any write). Idempotency is keyed per ledger directory — the
  * caller scopes one ledger per (query, table), mirroring the Outbox
  * lesson that epoch ids alone collide across queries/restarts.
  *
  * Scale shape: per batch — one broadcast-centroid assignment pass
  * over the batch, one bucketed append (files land inside their cell
  * buckets; plan-time pruning keeps working across appends), one
  * 8-byte marker write. Serving adds a broadcast semi-join against a
  * ledger of (batches-so-far) rows — KBs for any plausible stream
  * history, and compactable by rewriting the table minus the ledger
  * columns.
  */
object IndexIngest {

  /** The foreachBatch body: gate, tag, append, commit. `assign` maps a
    * raw arriving batch to (vec_id, v, cell [, carried…]) rows — kept
    * as a function so the caller decides quantization/centroids. */
  def ingestBatch(batch: DataFrame, batchId: Long, assign: DataFrame => DataFrame,
                  table: String, nBuckets: Int, ledgerDir: String): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(ledgerDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(ledgerDir, s"b$batchId")
    if (!fs.exists(marker)) { // replayed committed epoch ⟹ no-op
      val attempt = java.util.UUID.randomUUID().toString
      graft.sources.Sinks.appendBucketed(
        assign(batch)
          .withColumn("batch_id", lit(batchId))
          .withColumn("attempt", lit(attempt)),
        table, "cell", nBuckets)
      // COMMIT POINT: the marker names the one attempt whose rows are
      // visible. Written via a temp-file rename so a crash mid-write
      // can't leave a half marker that commits garbage.
      val tmp = new Path(ledgerDir, s".b$batchId.tmp")
      val out = fs.create(tmp, true)
      out.write(attempt.getBytes("UTF-8"))
      out.close()
      if (!fs.rename(tmp, marker))
        throw new IllegalStateException(s"ledger commit failed for batch $batchId")
      ()
    }
  }

  /** The ledger as a (batch_id, attempt) frame — one row per committed
    * batch, read from the marker files. */
  def ledger(spark: SparkSession, ledgerDir: String): DataFrame = {
    val fs = new Path(ledgerDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows =
      if (!fs.exists(new Path(ledgerDir))) Seq.empty[(Long, String)]
      else fs.listStatus(new Path(ledgerDir)).toSeq
        .filter(s => s.getPath.getName.startsWith("b"))
        .map { s =>
          val in = fs.open(s.getPath)
          val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
          (s.getPath.getName.drop(1).toLong, content)
        }
    import spark.implicits._
    rows.toDF("batch_id", "attempt")
  }

  /** Serve the COMMITTED view of an ingested index: rows whose
    * (batch_id, attempt) a marker names — uncommitted-attempt orphans
    * are filtered at plan time by the broadcast ledger join. */
  def readCommitted(spark: SparkSession, table: String,
                    ledgerDir: String): DataFrame =
    spark.table(table).join(
      broadcast(ledger(spark, ledgerDir)), Seq("batch_id", "attempt"),
      "left_semi")
}
