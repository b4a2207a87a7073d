package graft.operators
import org.apache.spark.sql.functions._
/** Scratch profiler for the funnel artifact build: replicates
  * funnelFrames stage by stage so each checkpoint's cost is visible
  * (dev utility, like ProfCuration; lives in graft.operators for
  * access to the package-private stage pieces). */
object ProfFunnel {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.tools.Prof.session()
    val docs = graft.Tables.documents(spark, dir)
    val embeddings = graft.Tables.embeddings(spark, dir)
    docs.count(); embeddings.count() // warm
    def calProbe(): Double = {
      val t0 = System.nanoTime()
      spark.range(20000000L).selectExpr("id % 997 AS k", "id")
        .groupBy("k").agg(sum("id")).agg(count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    calProbe()
    println(f"[prof] cal_probe ${(1 to 3).map(_ => calProbe()).min}%6.3f s")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    import Curation._
    val nInput = docs.count()
    val width = deriveShingleWidth(nInput)
    val s1 = time("s1 qualityGate ckpt") { qualityGate(docs).localCheckpoint(true) }
    val dropExact = time("dropExact ckpt") {
      s1.select(col("doc_id"), sha2(col("text"), 256).as("digest"))
        .withColumn("keep_id", min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("digest")))
        .filter(col("doc_id") =!= col("keep_id"))
        .select("doc_id").localCheckpoint(true)
    }
    val s2 = s1.join(broadcast(dropExact), Seq("doc_id"), "left_anti")
    val corpus3 = s2.filter(col("doc_id") % EvalMod =!= 0)
    val flagged = time("flagged decontaminate ckpt") {
      decontaminateBatch(corpus3, evalShingleIndex(docs, width), width)
        .select("doc_id").localCheckpoint(true)
    }
    val s3 = corpus3.join(broadcast(flagged), Seq("doc_id"), "left_anti")
    val evalBands = Dedup
      .minhashBandIndex(docs.filter(col("doc_id") % EvalMod === 0))
      .select(col("band_id"), col("band_hash"), col("doc_id").as("doc_b"))
    val fuzzyFlagged = time("fuzzyFlagged minhash ckpt") {
      val fuzzyCands = Dedup.minhashBandIndex(s3)
        .join(broadcast(evalBands), Seq("band_id", "band_hash"))
        .select(col("doc_id").as("doc_a"), col("doc_b")).distinct()
      Dedup.verifyJaccard(fuzzyCands, docs, 0.8)
        .select(col("doc_a").as("doc_id")).distinct()
        .localCheckpoint(true)
    }
    val s4 = s3.join(broadcast(fuzzyFlagged), Seq("doc_id"), "left_anti")
    val s4docs = s4.select(col("doc_id"), col("text"))
    val s4Shingles = time("s4 shingles ckpt") {
      shinglesWithPos(s4docs, width).localCheckpoint(true) }
    val s4Index = time("s4 index ckpt") {
      s4Shingles.join(
        s4Shingles.groupBy("sh_key")
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") <= VerbatimMaxDf)
          .select("sh_key"),
        Seq("sh_key")).localCheckpoint(true) }
    val emptied = time("emptied verbatimRemove ckpt") {
      verbatimRemoveFrom(s4docs,
        verbatimOffsetsFrom(verbatimMatchesFrom(s4Index), width), width)
        .filter(col("n_removed") === col("n_tokens"))
        .select("doc_id").localCheckpoint(true)
    }
    val s5 = s4.join(broadcast(emptied), Seq("doc_id"), "left_anti")
    val vecs = embeddings.select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
      .as("v"))
    val k = Dedup.deriveSemCells(vecs.count())
    val cents = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val survivorVecs = vecs.join(
      s5.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val semanticDrops = time("semanticDrops ckpt") {
      Dedup.semanticDedup(survivorVecs, cents)
        .filter(!col("keep")).select(col("vec_id").as("doc_id"))
        .localCheckpoint(true)
    }
    val s6 = s5.join(broadcast(semanticDrops), Seq("doc_id"), "left_anti")
    time("s6 count (lazy chain)") { s6.count() }
    println(f"[prof] cal_probe_end ${(1 to 3).map(_ => calProbe()).min}%6.3f s")
  }
}
