package graft.tools

import org.apache.spark.sql.functions._

/** Measures INCREMENTAL STORE MAINTENANCE (round-18): cold build vs
  * append-merge task-cpu for the persisted dedup stores, on a scratch
  * copy of the sf corpus grown by a ~5% batch. The SCALE.md evidence
  * that `Warehouse.servedFrameMerged`'s merge lane costs ≪ the cold
  * rebuild it replaces (correctness — merged ≡ cold bit for bit — is
  * WarehouseSpec's job; this is the economics).
  *
  * Usage: ProfMerge [sfDir]  (default /root/testdata/sf0.1)
  */
object ProfMerge {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = Prof.session()
    val clock = graft.Metrics.installTaskClock(spark.sparkContext)
    def window[T](name: String)(f: => T): T = {
      val (r0, c0) = clock.snapshot(spark.sparkContext)
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val (r1, c1) = clock.snapshot(spark.sparkContext)
      println(f"[merge] $name%-34s cpu ${c1 - c0}%6.2f run ${r1 - r0}%6.2f wall $wall%6.2f")
      r
    }
    // Scratch corpus: re-write the documents table as a DIRECTORY of
    // part files (the sf corpora ship as a single parquet FILE, which
    // nothing can append to — growth there is always a full-overwrite
    // miss; the directory layout is the production ingest shape this
    // tool measures), then grow it by a ~5% batch of doc-id-shifted
    // copies landing as ONE appended part file.
    val dir = java.nio.file.Files.createTempDirectory("mergeprof").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    spark.read.parquet(s"$src/documents.parquet").coalesce(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    val mx = docs0.agg(max("doc_id")).head().getLong(0)
    val n0 = docs0.count()
    val fp1 = graft.sources.Warehouse.fpToken(n0, mx,
      graft.sources.Warehouse.corpusBytes(spark, dir, "documents"))
    def appendBatch(): Long = {
      val tmp = java.nio.file.Files.createTempDirectory("mergebat").toString
      val batch = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 20 === 0)
        .withColumn("doc_id", col("doc_id") + mx + 1L)
      val nb = batch.count()
      batch.coalesce(1).write.mode("overwrite").parquet(tmp)
      new java.io.File(tmp).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$dir/documents.parquet/${f.getName}")))
      nb
    }
    def fam(name: String, fp: String)
           (cold: => org.apache.spark.sql.DataFrame)
           (merge: (org.apache.spark.sql.DataFrame,
                    org.apache.spark.sql.DataFrame) =>
                     Option[org.apache.spark.sql.DataFrame]): Long =
      graft.sources.Warehouse.servedFrameMerged(
        spark, name, dir, "documents", fp)(cold)(merge).count()
    val docs = () => spark.read.parquet(s"$dir/documents.parquet")
    // COLD builds at the base corpus.
    window("minhash_bands COLD")(fam("pm_bands", fp1)(
      graft.operators.Dedup.minhashBandIndex(docs()))(
      (old, b) => Some(old.unionByName(
        graft.operators.Dedup.minhashBandIndex(b)))))
    window("cdc_chunks COLD")(fam("pm_cdc", fp1)(
      graft.operators.Dedup.cdcChunks(docs()))(
      (old, b) => Some(old.unionByName(graft.operators.Dedup.cdcChunks(b)))))
    window("ngram_pairs COLD")(fam("pm_ngram", fp1)(
      graft.operators.Dedup.ngramPairs(docs()))(
      (old, b) => Some(old.unionByName(
        graft.operators.Dedup.ngramPairsTouching(docs(),
          b.select(col("doc_id")))))))
    // Grow the corpus ~5% (one appended part file), then resolve the
    // new fingerprint: the MERGE lane.
    val nb = appendBatch()
    println(s"[merge] corpus $n0 docs + batch $nb appended")
    val fp2 = graft.sources.Warehouse.fpToken(n0 + nb, 2 * mx + 1,
      graft.sources.Warehouse.corpusBytes(spark, dir, "documents"))
    window("minhash_bands MERGE (+5%)")(fam("pm_bands", fp2)(
      sys.error("cold must not run"): org.apache.spark.sql.DataFrame)(
      (old, b) => Some(old.unionByName(
        graft.operators.Dedup.minhashBandIndex(b)))))
    window("cdc_chunks MERGE (+5%)")(fam("pm_cdc", fp2)(
      sys.error("cold must not run"): org.apache.spark.sql.DataFrame)(
      (old, b) => Some(old.unionByName(graft.operators.Dedup.cdcChunks(b)))))
    window("ngram_pairs MERGE (+5%)")(fam("pm_ngram", fp2)(
      sys.error("cold must not run"): org.apache.spark.sql.DataFrame)(
      (old, b) => Some(old.unionByName(
        graft.operators.Dedup.ngramPairsTouching(docs(),
          b.select(col("doc_id")))))))
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    spark.stop()
  }
}
