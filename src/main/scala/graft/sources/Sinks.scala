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

  /** Z-ORDER clustered write — multi-column file skipping.
    * [[writeRangeClustered]] gives tight footer stats on ONE column;
    * every file still spans the other columns' full ranges, so a
    * predicate on a second column reads the whole table. Interleaving
    * the bits of both (min/max-normalized, 16-bit) keys into one
    * z-value and range-partitioning + sorting by it gives each file a
    * small RECTANGLE of the (a, b) space — parquet min/max stats then
    * prune files for predicates on EITHER column (the plain-directory
    * form of table-format Z-ordering; SinksSpec measures per-file
    * ranges of both columns against the single-column layout). Cost:
    * one tiny min/max aggregate for normalization plus the same range
    * shuffle the single-column write pays; the z-value is a
    * constant-size 32-term shift/or projection, fully codegen'd. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    nFiles: Int, path: String): Unit = {
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).collect()(0)
    // Empty input: the min/max row is all null — write the (empty)
    // frame as-is instead of throwing on getDouble (the sibling
    // writeRangeClustered handles empty input the same way).
    if (r.isNullAt(0)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    def norm16(c: String, lo: Double, hi: Double) = {
      val span = if (hi > lo) hi - lo else 1.0
      least(lit(65535L), greatest(lit(0L),
        ((col(c).cast("double") - lo) / span * 65535.0).cast("long")))
    }
    val zExpr = (0 until 16).map(i =>
      s"shiftleft(shiftright(z_a, $i) & 1, ${2 * i}) | " +
        s"shiftleft(shiftright(z_b, $i) & 1, ${2 * i + 1})")
      .mkString("(", ") | (", ")")
    df.withColumn("z_a", norm16(colA, r.getDouble(0), r.getDouble(1)))
      .withColumn("z_b", norm16(colB, r.getDouble(2), r.getDouble(3)))
      .withColumn("z_v", expr(zExpr))
      .repartitionByRange(nFiles, col("z_v"))
      .sortWithinPartitions("z_v")
      .drop("z_a", "z_b", "z_v")
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed-table write — the shuffle-free BIG-BIG join layout. Both
    * sides of a recurring join written with the SAME bucket count on
    * the join key, read back as catalog tables, sort-merge join with NO
    * Exchange on either side (BucketingSpec plan-asserts it on
    * lineitem⋈orders): the write-time hash(key) mod nBuckets layout is
    * recorded in the catalog and satisfies the join's distribution
    * requirement outright. `sortBy` additionally pre-sorts each bucket
    * file, tightening parquet min/max footers for key-range pruning.
    * One write pays for every subsequent join on that key — at 100 TB
    * the difference between moving both tables per query and moving
    * neither. When bucketing beats AQE and when it doesn't: SCALE.md
    * §Joins. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)

  /** APPEND a batch to an existing bucketed table — the table
    * MAINTENANCE path: new rows land as additional files inside their
    * key's bucket (Spark validates the bucket spec against the
    * existing table), so plan-time bucket pruning and exchange-free
    * joins keep working across the combined data without rewriting
    * the original. The per-bucket file count grows by one per append
    * — after many appends, run [[compact]]; and appends are NOT
    * idempotent (a replayed batch doubles its rows), so a streaming
    * caller must gate on its batchId ledger the way the Outbox sink
    * does. AnnIndexSpec proves append == rebuild for the served ANN
    * index. */
  def appendBucketed(df: DataFrame, table: String, keyCol: String,
                     nBuckets: Int): Unit =
    df.write.mode("append").format("parquet")
      .bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)

  /** Small-file compaction — after many streaming/partitioned appends a
    * table degrades into thousands of tiny files; rewrite to
    * `targetFiles` and swap in. The swap is two renames (current → .old,
    * tmp → current), NOT atomic: a concurrent reader can see a missing
    * table for the instant between them. But unlike delete-then-rename,
    * no data is ever unreferenced-and-gone — a crash mid-swap leaves the
    * previous table intact under `.compact-old`, and a failed second
    * rename rolls the first back. Truly atomic swap is table-format
    * territory (an Iceberg/Delta rewrite commit); plain directories
    * cannot do better than this. The FileSystem is resolved FROM THE
    * PATH, not the default FS, so the table may live on any filesystem
    * (s3a://, file://, hdfs://) regardless of fs.defaultFS. */
  def compact(spark: org.apache.spark.sql.SparkSession,
              path: String, targetFiles: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(path)
    val fs  = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".compact-tmp")
    val old = new Path(path + ".compact-old")
    // Crash recovery: a previous compact that died between its two
    // renames leaves the table under `.compact-old` and nothing at the
    // real path — restore it BEFORE reading, instead of failing the
    // read with an unrelated path-not-found.
    if (!fs.exists(dst) && fs.exists(old) && !fs.rename(old, dst))
      sys.error(s"compact: found data at $old but none at $dst, and restoring failed — " +
        s"recover $old manually")
    spark.read.parquet(path).repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true) // leftover from a previous crashed compact
    if (!fs.rename(dst, old))
      sys.error(s"compact: cannot move $dst aside to $old")
    if (!fs.rename(tmp, dst)) {
      // Roll back; if the rollback rename ALSO fails, say where the
      // data really is instead of claiming restoration succeeded.
      if (fs.rename(old, dst))
        sys.error(s"compact: cannot swap $tmp into $dst (original restored)")
      else
        sys.error(s"compact: cannot swap $tmp into $dst AND rollback failed — " +
          s"table data is at $old, compacted data at $tmp; restore manually")
    }
    fs.delete(old, true)
  }
}
