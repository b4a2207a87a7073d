package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sink shapes from SURVEY §2.1 (architectural rows — no query keys):
  *
  *  - date-partitioned append (the daily log `agent_YYYY-MM-DD.log`,
  *    `agent-loop.sh:527-546`) → `partitionBy(day)` parquet append;
  *  - per-key output files (per-task log `NNN-group--task.log`,
  *    `agent-loop.sh:274,502`) → `partitionBy(log_name)`;
  *  - atomic visibility (tmp+rename, `agent-loop.sh:317-319`) is Spark's
  *    commit protocol — files appear only on successful commit, so it is
  *    NOT reimplemented.
  *
  * Scale notes: `partitionBy` hash-routes rows to their partition
  * directory during the write — no pre-shuffle needed unless file-count
  * control matters, in which case repartition on the partition column
  * first (one file per partition value instead of one per task ×
  * value). Both are exposed here; SinksSpec verifies layout + re-read.
  */
object Sinks {

  /** Append `df` to `path` partitioned by the yyyy-MM-dd of `tsCol`. */
  def appendDaily(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      // One file per day per write: route each day's rows to one task.
      .repartition(col("day"))
      .write.mode("append").partitionBy("day").parquet(path)

  /** Write one directory per key value (the per-task log layout). */
  def writePerKey(df: DataFrame, keyCol: String, path: String): Unit =
    df.repartition(col(keyCol))
      .write.mode("overwrite").partitionBy(keyCol).parquet(path)

  /** Idempotent micro-batch append for `foreachBatch` — the engine-side
    * replay guard (the reference persists its offset before processing,
    * `telegram-agent.py:622-623`; Structured Streaming replays the batch
    * instead, so the SINK must be idempotent). Each batch overwrites its
    * own `batch_id=N` directory: a replayed batch rewrites the same
    * files, never duplicates. */
  def idempotentAppend(batch: DataFrame, batchId: Long, path: String): Unit =
    batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  /** Range-clustered write — the layout that makes parquet row-group
    * skipping work: `repartitionByRange` puts disjoint key ranges in
    * separate files and `sortWithinPartitions` orders rows inside each,
    * so every file's min/max footer statistics are tight and a range
    * predicate prunes whole files. The write-time cost buys every
    * subsequent scan; at 100 TB this (or Z-ordering for multi-column
    * predicates) is the difference between reading a file and a lake. */
  def writeRangeClustered(df: DataFrame, keyCol: String, nFiles: Int,
                          path: String): Unit =
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction — after many streaming/partitioned appends a
    * table degrades into thousands of tiny files; rewrite to
    * `targetFiles` and swap in atomically (write-new + move). At lake
    * scale this is table-format work (Iceberg/Delta rewrite); the
    * operator shape — full read, repartition, rewrite — is the same. */
  def compact(spark: org.apache.spark.sql.SparkSession,
              path: String, targetFiles: Int): Unit = {
    val tmp = path + ".compact-tmp"
    spark.read.parquet(path).repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
