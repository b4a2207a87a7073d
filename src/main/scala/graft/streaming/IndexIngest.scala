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
  *     `<genDir>/b<batchId>` is written whose CONTENT is the
  *     attempt id — the marker creation is the atomic commit point;
  *   - [[readCommitted]] serves the table joined against the ledger on
  *     (batch_id, attempt): rows of an attempt that crashed BEFORE its
  *     marker (the classic append-then-crash window) never match any
  *     marker and stay INVISIBLE — orphan bytes on disk, not duplicate
  *     rows in answers; the replay's fresh attempt commits under a new
  *     UUID.
  *
  * A replayed epoch whose marker EXISTS (or that compaction already
  * folded — the high-water check) is a pure no-op, checked before any
  * write. Idempotency is keyed per ledger directory — the caller
  * scopes one ledger per (query, table), mirroring the Outbox lesson
  * that epoch ids alone collide across queries/restarts.
  *
  * LEDGER COMPACTION ([[compact]]): a long-lived stream accretes one
  * marker file and one tagged batch per epoch forever. Compaction
  * folds everything committed into ONE generation: the committed rows
  * rewrite into a fresh bucketed table tagged with a single
  * (batch_id = −gen, attempt) pair, the new generation's ledger is
  * that one marker, and the swap commits by atomically CREATING
  * `HEAD-<gen>` (content: table name + the folded high-water batch
  * id). Resolution always follows the HIGHEST HEAD present, so a
  * crash anywhere before the HEAD create serves the OLD generation
  * exactly-once (its table and markers are never touched), and a
  * crash after serves the new one — there is no window where rows
  * double or vanish (AnnIndexSpec attacks exactly that window).
  * Replays of folded epochs stay no-ops via the recorded high-water.
  * Stale generations (tables, marker dirs, older HEADs, crashed
  * staging) are swept best-effort at the START of the next compact —
  * sweep failure costs bytes, never correctness. Single-writer, like
  * the stream itself: run between micro-batches, not against one.
  *
  * Scale shape: per batch — one broadcast-centroid assignment pass
  * over the batch, one bucketed append (files land inside their cell
  * buckets; plan-time pruning keeps working across appends), one
  * 8-byte marker write. Serving adds a broadcast semi-join against a
  * ledger of (batches since last compaction) rows; compaction bounds
  * that at one marker + the tail, and rewrites the table's append
  * fragments into `nBuckets` files.
  */
object IndexIngest {

  /** Resolved ledger generation: which table serves, which directory
    * holds the markers, and the high-water batch id already folded by
    * compaction (MinValue for gen 0 — nothing folded). */
  private case class Gen(gen: Long, table: String, hw: Long, dir: Path)

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest `HEAD-<n>` wins; no HEAD ⟹ generation 0 (the
    * pre-compaction layout: base table, markers at the ledger root) —
    * so ledgers created before compaction existed resolve unchanged. */
  private def resolveGen(spark: SparkSession, baseTable: String,
                         ledgerDir: String): Gen = {
    val fs = fsOf(spark, ledgerDir)
    val root = new Path(ledgerDir)
    val heads =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(_.getPath.getName.startsWith("HEAD-"))
        .map(_.getPath)
    if (heads.isEmpty) Gen(0L, baseTable, Long.MinValue, root)
    else {
      val head = heads.maxBy(_.getName.drop(5).toLong)
      val gen = head.getName.drop(5).toLong
      val Array(table, hw) = readSmall(fs, head).split('\t')
      Gen(gen, table, hw.toLong, new Path(root, s"gen-$gen"))
    }
  }

  private def readSmall(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Atomic small-file create via temp + rename (rename-to-fresh-name
    * is atomic on every FileSystem; a crash mid-write leaves only the
    * dot-temp, which resolution ignores). */
  private def atomicCreate(fs: org.apache.hadoop.fs.FileSystem, target: Path,
                           content: String): Unit = {
    val tmp = new Path(target.getParent, s".${target.getName}.tmp")
    val out = fs.create(tmp, true)
    out.write(content.getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, target))
      throw new IllegalStateException(s"atomic create failed for $target")
    ()
  }

  /** The foreachBatch body: gate, tag, append, commit. `assign` maps a
    * raw arriving batch to (vec_id, v, cell [, carried…]) rows — kept
    * as a function so the caller decides quantization/centroids. */
  def ingestBatch(batch: DataFrame, batchId: Long, assign: DataFrame => DataFrame,
                  table: String, nBuckets: Int, ledgerDir: String): Unit = {
    val spark = batch.sparkSession
    val g = resolveGen(spark, table, ledgerDir)
    val fs = fsOf(spark, ledgerDir)
    val marker = new Path(g.dir, s"b$batchId")
    // Replay gates: a batch compaction already folded (≤ high-water) or
    // one whose marker exists is committed — re-appending would double it.
    if (batchId > g.hw && !fs.exists(marker)) {
      val attempt = java.util.UUID.randomUUID().toString
      graft.sources.Sinks.appendBucketed(
        assign(batch)
          .withColumn("batch_id", lit(batchId))
          .withColumn("attempt", lit(attempt)),
        g.table, "cell", nBuckets)
      // COMMIT POINT: the marker names the one attempt whose rows are
      // visible. Written via a temp-file rename so a crash mid-write
      // can't leave a half marker that commits garbage.
      atomicCreate(fs, marker, attempt)
    }
  }

  /** The ledger as a (batch_id, attempt) frame — one row per committed
    * batch of the CURRENT generation, read from the marker files. */
  def ledger(spark: SparkSession, ledgerDir: String): DataFrame =
    ledgerOf(spark, resolveGen(spark, "", ledgerDir))

  private def ledgerOf(spark: SparkSession, g: Gen): DataFrame = {
    val fs = fsOf(spark, g.dir.toString)
    val rows =
      if (!fs.exists(g.dir)) Seq.empty[(Long, String)]
      else fs.listStatus(g.dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("b"))
        .map(s => (s.getPath.getName.drop(1).toLong, readSmall(fs, s.getPath)))
    import spark.implicits._
    rows.toDF("batch_id", "attempt")
  }

  /** Serve the COMMITTED view of an ingested index: rows whose
    * (batch_id, attempt) a marker names — uncommitted-attempt orphans
    * are filtered at plan time by the broadcast ledger join. */
  def readCommitted(spark: SparkSession, table: String,
                    ledgerDir: String): DataFrame = {
    val g = resolveGen(spark, table, ledgerDir)
    spark.table(g.table).join(
      broadcast(ledgerOf(spark, g)), Seq("batch_id", "attempt"),
      "left_semi")
  }

  /** Fold the committed view into one fresh generation — see the object
    * doc. `beforeCommit` is the spec's crash-injection seam: it runs
    * after the rewrite and the new marker are durable but BEFORE the
    * HEAD create, i.e. inside the window the protocol must survive. */
  def compact(spark: SparkSession, table: String, nBuckets: Int,
              ledgerDir: String, beforeCommit: () => Unit = () => ()): Unit = {
    val g = resolveGen(spark, table, ledgerDir)
    val fs = fsOf(spark, ledgerDir)
    val root = new Path(ledgerDir)
    // Sweep leftovers of generations that never committed or were
    // superseded (idempotent; a crash here re-sweeps next time). Runs
    // again after the commit below so a completed compact leaves
    // exactly one generation's files behind.
    sweepStale(spark, fs, root, table, g)
    val led = ledgerOf(spark, g)
    val batches = led.select("batch_id").collect().map(_.getLong(0))
    if (batches.isEmpty) return // nothing committed — nothing to fold
    val hw = math.max(batches.max, g.hw)
    val newGen = g.gen + 1
    val newTable = s"${table}_gen$newGen"
    val attempt = java.util.UUID.randomUUID().toString
    val committed = spark.table(g.table)
      .join(broadcast(led), Seq("batch_id", "attempt"), "left_semi")
      .drop("batch_id", "attempt")
      .withColumn("batch_id", lit(-newGen))
      .withColumn("attempt", lit(attempt))
    // Staging from a crashed previous attempt at this generation may
    // hold a catalog entry, an orphaned location, or both — clear both
    // (the trainedIndexArtifacts lesson) before the rewrite.
    spark.sql(s"DROP TABLE IF EXISTS $newTable")
    val loc = new Path(
      spark.conf.get("spark.sql.warehouse.dir"), newTable.toLowerCase)
    val wfs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (wfs.exists(loc)) { wfs.delete(loc, true); () }
    graft.sources.Sinks.writeBucketed(committed, newTable, "cell", nBuckets)
    val genDir = new Path(root, s"gen-$newGen")
    fs.delete(genDir, true)
    fs.mkdirs(genDir)
    atomicCreate(fs, new Path(genDir, s"b${-newGen}"), attempt)
    beforeCommit()
    // COMMIT POINT: creating HEAD-<newGen> atomically reroutes every
    // reader/writer to the new generation; until it exists they all
    // still resolve the old one, whose files were never touched.
    atomicCreate(fs, new Path(root, s"HEAD-$newGen"), s"$newTable\t$hw")
    // Post-commit truncation: the superseded generation's markers,
    // HEAD, and table are dead now — best-effort delete (a crash here
    // costs bytes, never answers; the next compact re-sweeps).
    sweepStale(spark, fs, root, table,
      Gen(newGen, newTable, hw, new Path(root, s"gen-$newGen")))
  }

  /** Delete every ledger file and staged table not belonging to the
    * generation `g` — safe whenever `g` is the committed generation. */
  private def sweepStale(spark: SparkSession,
                         fs: org.apache.hadoop.fs.FileSystem, root: Path,
                         baseTable: String, g: Gen): Unit = {
    if (fs.exists(root)) {
      fs.listStatus(root).toSeq.foreach { s =>
        val name = s.getPath.getName
        val stale =
          (name.startsWith("HEAD-") && name.drop(5).toLong < g.gen) ||
          (name.startsWith("gen-") && name.drop(4).toLong != g.gen) ||
          (s.isFile && name.startsWith("b") && g.gen > 0) || // gen-0 root markers
          name.endsWith(".tmp")
        if (stale) { fs.delete(s.getPath, true); () }
      }
      for (n <- 1L until g.gen) {
        val t = s"${baseTable}_gen$n"
        if (t != g.table) spark.sql(s"DROP TABLE IF EXISTS $t")
      }
      if (g.gen > 0) spark.sql(s"DROP TABLE IF EXISTS $baseTable")
    }
  }
}
