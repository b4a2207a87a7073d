package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Curation
import graft.sources.{Outbox, OutboxProvider, UpdateLog, UpdateLogProvider}

/** The COMPOSED exactly-once ingest door at volume (round-19, verdict
  * item 3): the CurationStreamSpec composition — UpdateLog micro-batch
  * source → quality gate → contamination gate → idempotent Outbox sink
  * under a FORCED epoch replay — re-run over the ×10 replica's
  * documents table, with measured throughput (rows/s through the full
  * door), checkpoint footprint, and the delivered-set ≡ batch-run
  * equality asserted at volume. The eval shingle set derives from the
  * corpus's own eval slice (doc_id % EvalMod == 0, the funnel's
  * convention), so the contamination gate does real work: in the
  * neardup replica every copy of an eval doc shares its shingles.
  *
  * The gates are stateless (no state store, no watermark), so the
  * recorded state is the checkpoint's offset/commit log only — the
  * door's whole replay story rides on source offsets + sink
  * idempotence, which is exactly what this measures.
  *
  * Usage: StressIngest [x10Dir] [epochs]
  */
object StressIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sfx10r19")
    val epochs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Prof.session()
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val evalTexts = docs.collect {
      case (id, t) if id % Curation.EvalMod == 0 && t != null => t
    }.toSeq
    val eval = Curation.EvalShingles.fromTexts(
      Curation.ShingleWidth, evalTexts)
    println(s"[ingest] ${docs.length} docs, ${evalTexts.size} eval docs, " +
      s"${eval.shingles.size} eval shingles")
    val qn = "stress-door-in"; val bx = "stress-door-out"
    val ckpt = java.nio.file.Files.createTempDirectory("stress-ckpt").toString
    def pipe() = Curation.contaminationGate(
        Curation.qualityGate(
          spark.readStream.format(classOf[UpdateLogProvider].getName)
            .option("queue", qn).load()),
        eval)
      .select(col("chat_id"), col("text"))
      .writeStream.format(classOf[OutboxProvider].getName)
      .option("box", bx)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
    try {
      val chunks = docs.grouped(
        math.max(1, docs.length / epochs)).toSeq
      val q1 = pipe().start()
      val t0 = System.nanoTime()
      try {
        for (chunk <- chunks) {
          chunk.foreach { case (id, t) => UpdateLog.post(qn, id, t) }
          q1.processAllAvailable()
        }
      } finally q1.stop()
      val drainSec = (System.nanoTime() - t0) / 1e9
      val n1 = Outbox.delivered(bx).size
      println(f"[ingest] drained ${docs.length} rows through the door in " +
        f"$drainSec%.2f s = ${docs.length / drainSec}%.0f rows/s " +
        f"(${chunks.size} epochs, $n1 kept)")
      // FORCED EPOCH REPLAY: truncate the newest commit (keep its
      // offsets entry) — the restart re-executes that epoch against
      // the sink with the same epochId.
      val commits = java.nio.file.Paths.get(ckpt, "commits")
      val newest = java.nio.file.Files.list(commits)
        .filter(p => p.getFileName.toString.forall(_.isDigit))
        .max((a, b) => a.getFileName.toString.toLong
          .compareTo(b.getFileName.toString.toLong)).get()
      java.nio.file.Files.delete(newest)
      java.nio.file.Files.deleteIfExists(
        newest.resolveSibling("." + newest.getFileName.toString + ".crc"))
      val t1 = System.nanoTime()
      val q2 = pipe().start()
      try q2.processAllAvailable() finally q2.stop()
      println(f"[ingest] epoch replay absorbed in ${(System.nanoTime() - t1) / 1e9}%.2f s")
      val all = Outbox.delivered(bx)
      require(all.map(_._2).distinct.size == all.size,
        s"duplicate delivery after replay: ${all.size} rows, " +
          s"${all.map(_._2).distinct.size} distinct")
      // Delivered set ≡ the batch run of the same composition.
      import spark.implicits._
      val batchKept = Curation.contaminationGate(
          Curation.qualityGate(
            spark.createDataset(docs.toSeq).toDF("chat_id", "text")),
          eval)
        .select("chat_id").collect().map(_.getLong(0)).toSet
      require(all.map(_._2).toSet == batchKept,
        s"stream != batch: ${all.size} vs ${batchKept.size}")
      val ckptBytes = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      println(f"[ingest] OK exactly-once at volume: ${all.size} delivered " +
        f"(= batch ${batchKept.size}), ${docs.length - all.size} dropped at " +
        f"the door; checkpoint ${ckptBytes / 1024.0}%.1f KiB " +
        "(offset/commit log only - the gates are stateless)")
    } finally { UpdateLog.drop(qn); Outbox.drop(bx) }
    spark.stop()
  }
}
