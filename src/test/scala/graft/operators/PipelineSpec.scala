package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-duplicate and recall tests for the no-oracle pipeline ops. */
class PipelineSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while the spark engine " +
    "shuffles partitions across the cluster and aggregates tokens"

  test("minhash finds planted near-duplicates and skips unrelated docs") {
    val docs = docsDf(Seq(
      1L -> base,
      2L -> (base + " tail"),                       // near-dup of 1
      3L -> base.replace("quick", "rapid"),         // near-dup of 1
      4L -> "completely different content about databases columnar storage vectorized execution engines",
      5L -> "unrelated words entirely disjoint vocabulary zebra xylophone quartz"))
    val pairs = Dedup.minhashPairs(docs, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"missing (1,2) in $pairs")
    assert(pairs.contains((1L, 3L)), s"missing (1,3) in $pairs")
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L },
      s"disjoint doc 5 wrongly paired: $pairs")
  }

  test("minhash signature: identical docs share signatures, disjoint docs do not") {
    val sig = Dedup.minhashSignatures(docsDf(Seq(
        1L -> base, 2L -> base,
        3L -> "zebra xylophone quartz entirely different")))
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("simhash: near-identical docs within hamming 12, disjoint docs far apart") {
    val sk = Dedup.simhashed(docsDf(Seq(
        1L -> base, 2L -> (base + " tail"),
        3L -> "zebra xylophone quartz granite marble onyx slate basalt pumice")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sk(1L), sk(2L)) <= 12,
      s"near-dup hamming ${hamming(sk(1L), sk(2L))}")
    assert(hamming(sk(1L), sk(3L)) > 12,
      s"disjoint hamming ${hamming(sk(1L), sk(3L))}")
  }

  test("LSH knn: planted near-identical vectors are found as top-1") {
    import spark.implicits._
    // 64-dim deterministic pseudo-random corpus + a planted near-copy of
    // each probe (same direction, scaled — cos = 1, so every table's sign
    // bits agree and LSH MUST surface it).
    def mix(x0: Long): Long = { // splitmix64 finalizer
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def vec(seed: Long): Seq[Long] =
      (0 until 64).map(d => Math.floorMod(mix(seed * 64 + d), 1000L) - 500)
    val corpus =
      (0L until 200L).map(i => (i, vec(i))) ++
      (0L until 16L).map(i => (1000L + i, vec(i).map(x => x * 9 / 10)))
    val df = corpus.toDF("vec_id", "v")
    val top1 = Similarity.lshTopK(df, col("vec_id") < 16, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 16L).foreach { i =>
      assert(top1.get(i).contains(1000L + i),
        s"probe $i top-1 was ${top1.get(i)}, expected planted ${1000 + i}")
    }
  }

  test("embedding dedup: planted scaled twins pair up, candidates stay pruned") {
    import spark.implicits._
    def mix(x0: Long): Long = { // splitmix64 finalizer
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def vec(seed: Long): Seq[Long] =
      (0 until 64).map(d => Math.floorMod(mix(seed * 64 + d), 1000L) - 500)
    // 200 pseudo-random vectors + a scaled copy of the first 16 (cos = 1:
    // every plane's sign agrees, so each twin collides in ALL 8 tables).
    val corpus =
      (0L until 200L).map(i => (i, vec(i))) ++
      (0L until 16L).map(i => (1000L + i, vec(i).map(x => x * 9 / 10)))
    val pairs = Dedup.embeddingPairs(corpus.toDF("vec_id", "v"), 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 16L).foreach { i =>
      assert(pairs.contains((i, 1000L + i)), s"planted twin ($i, ${1000 + i}) missing")
    }
  }

  test("LSH knn prunes: candidate volume is well below brute force") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val n = e.count()
    val q = Similarity.bucketed(e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("v")))
    val probes = q.filter(col("vec_id") < 16)
      .select(col("bucket"), col("vec_id").as("probe_id"))
    val cands = q.select(col("bucket"), col("vec_id").as("cand_id"))
    val pairs = probes.join(cands, Seq("bucket"))
      .select("probe_id", "cand_id").distinct().count()
    // 8 tables × 64 buckets ⇒ expect ~12.5% of probes×corpus; assert the
    // pruning is at least 2× (vs 16 × n for brute force).
    assert(pairs < 16L * n / 2, s"LSH candidates $pairs vs brute ${16L * n}")
  }

  test("multimodal: mapPartitions decode path agrees with the declarative plan") {
    val payloads = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val decoded = Multimodal.decodePartitions(payloads)
    assert(decoded.schema == Multimodal.mediaMetaSchema)
    val viaPlan = graft.SparkEntry.queries("q_mm_meta")(spark, sfDir)
      .select("doc_id", "n_bytes", "format", "width", "height")
    val a = decoded.select("doc_id", "n_bytes", "format", "width", "height")
      .collect().map(_.toSeq).toSet
    val b = viaPlan.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("connected components: chains merge, islands stay, extra round is a no-op") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // Convergence on the real corpus: one more round changes nothing.
    val pairs = Dedup.ngramPairs(graft.Tables.documents(spark, sfDir))
      .select(col("doc_a"), col("doc_b"))
    val r8 = Dedup.connectedComponents(pairs, 8).collect().map(_.toSeq).toSet
    val r9 = Dedup.connectedComponents(pairs, 9).collect().map(_.toSeq).toSet
    assert(r8 == r9, "label propagation had not converged after 8 rounds")
  }

  test("chunker-oracle corpus assumption holds: no paragraph/sentence breaks") {
    // q_udf_chunk's oracle reduces the chunker to hard 112-char splits,
    // valid ONLY while the corpus has no "\n\n" and no ". " — guard it.
    val n = graft.Tables.documents(spark, sfDir)
      .filter(col("text").contains("\n\n") || col("text").contains(". "))
      .count()
    assert(n == 0, s"$n documents break the chunker-oracle reduction")
  }

  test("exact dedup: planted copies collapse to one survivor") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = docs.groupBy(sha2(col("text"), 256))
      .agg(min("doc_id").as("survivor"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }
}
