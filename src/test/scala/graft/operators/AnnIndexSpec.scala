package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted IVF-PQ index — the production ANN serving path: the
  * (cand_id, cell, m, code) index is written ONCE via the bucketed-write
  * API (bucketed by `cell`), and every query rereads only the buckets of
  * its probed cells. At 100 TB this is the difference between scanning a
  * compressed multi-TB index per query and reading nprobe buckets of it. */
class AnnIndexSpec extends SparkSpec {

  test("bucketed IVF-PQ index: query scan prunes to probed cells, results match in-memory") {
    val quant =
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(quant).as("v"))
    val n = e.count()
    val kCentroids = math.ceil(math.sqrt(n.toDouble)).toInt
    val kCodes = Similarity.derivePqCodes(n)
    val centroids = e.filter(col("vec_id") < kCentroids)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val codebook = Similarity.pqCodebook(e, kCodes)
    val nBuckets = 32
    val nProbes = 4
    try {
      Similarity.writeIvfPqIndex(e, centroids, codebook, "ivfpq_idx", nBuckets)
      // Probe→cell ranking happens BEFORE the index scan is planned —
      // the centroid table is tiny (√N rows), so this is a bounded
      // driver action, and the literal cell list is what lets Catalyst
      // prune buckets at plan time.
      val probeVecs = e.filter(col("vec_id") < nProbes)
        .select(col("vec_id").as("probe_id"), col("v"))
      // THE engine's own cell ranking (Similarity.probeCells) — the
      // test's pruning list can never drift from what the search body
      // actually probes.
      val cells = Similarity.probeCells(probeVecs, centroids, Similarity.IvfNprobe)
        .select("cell").distinct().collect().map(_.getLong(0)).toSeq
      assert(cells.nonEmpty && cells.size <= nProbes * Similarity.IvfNprobe)

      // The serving-session posture (see readIvfPqIndexPruned's doc):
      // DisableUnnecessaryBucketedScan's cost model only values bucket
      // layout for avoided exchanges, so a pruning-only read gets its
      // bucketed scan planned away unless auto-bucketed-scan is off.
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val pruned = Similarity.readIvfPqIndexPruned(spark, "ivfpq_idx", cells)
      val scanPlan = pruned.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(scanPlan)
      assert(sel.isDefined, s"no bucket pruning in scan:\n$scanPlan")
      val (selected, total) = (sel.get.group(1).toInt, sel.get.group(2).toInt)
      assert(total == nBuckets && selected < total,
        s"expected pruned scan, got $selected out of $total buckets")
      assert(selected <= cells.size,
        s"$selected buckets for ${cells.size} cells")

      // The pruned-index search returns EXACTLY what the in-memory
      // composition returns — persistence changes the I/O shape, not
      // the answer.
      val fromDisk = Similarity
        .searchIvfPqIndex(pruned, e, centroids, codebook, nProbes, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val inMemory = Similarity
        .ivfPqTopKWith(e, centroids, codebook, nProbes, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(fromDisk == inMemory,
        s"disk path diverges: ${fromDisk.take(5)} vs ${inMemory.take(5)}")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS ivfpq_idx")
    }
  }

  test("residual index persists through the same bucketed path: pruned scan, identical results") {
    val quant =
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(quant).as("v"))
    val n = e.count()
    val kCentroids = math.ceil(math.sqrt(n.toDouble)).toInt
    val kCodes = Similarity.derivePqCodes(n)
    val centroids = e.filter(col("vec_id") < kCentroids)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    // The codebook the index was built with must come back at search
    // time — it trains on the RESIDUAL frame.
    val codebook = Similarity.pqCodebook(
      Similarity.residualFrame(e, centroids).select(col("vec_id"), col("v")),
      kCodes)
    val nBuckets = 32
    val nProbes = 4
    try {
      Similarity.writeIvfPqResIndex(e, centroids, codebook, "ivfpq_res_idx", nBuckets)
      val probeVecs = e.filter(col("vec_id") < nProbes)
        .select(col("vec_id").as("probe_id"), col("v"))
      // THE engine's own cell ranking (Similarity.probeCells) — the
      // test's pruning list can never drift from what the search body
      // actually probes.
      val cells = Similarity.probeCells(probeVecs, centroids, Similarity.IvfNprobe)
        .select("cell").distinct().collect().map(_.getLong(0)).toSeq
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val pruned = Similarity.readIvfPqIndexPruned(spark, "ivfpq_res_idx", cells)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(pruned.queryExecution.executedPlan.toString)
      assert(sel.isDefined && sel.get.group(1).toInt < nBuckets,
        s"residual index scan not pruned: $sel")
      val fromDisk = Similarity
        .searchIvfPqResidualIndex(pruned, e, centroids, codebook, nProbes, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val inMemory = Similarity
        .ivfPqResidualTopK(e, kCentroids, kCodes, nProbes, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(fromDisk == inMemory,
        s"residual disk path diverges: ${fromDisk.take(5)} vs ${inMemory.take(5)}")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS ivfpq_res_idx")
    }
  }

  test("TRAINED residual index end-to-end: kmeans cells + kmeans codebooks persist, prune, and answer identically") {
    // The full production lifecycle in one case: TRAIN the coarse
    // quantizer (spark.ml KMeans cells) and the residual PQ codebooks
    // (per-subspace KMeans over the residual frame), BUILD + PERSIST
    // the best-quality index through the bucketed path, then SERVE a
    // query from the pruned read. The in-memory comparison reuses the
    // SAME trained artifacts (training is partitioning-dependent — a
    // refit could legitimately differ; persistence, the thing under
    // test, must not).
    val quant =
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(quant).as("v"))
    val n = e.count()
    val kCentroids = math.ceil(math.sqrt(n.toDouble)).toInt
    val kCodes = Similarity.derivePqCodes(n)
    val centroids = Similarity.kmeansCentroids(e, kCentroids)
      .localCheckpoint(true) // pin the fit: both paths must see ONE artifact
    val codebook = Similarity.kmeansPqCodebook(
        Similarity.residualFrame(e, centroids).select(col("vec_id"), col("v")),
        kCodes)
      .localCheckpoint(true)
    val nBuckets = 32
    val nProbes = 4
    try {
      Similarity.writeIvfPqResIndex(e, centroids, codebook, "ivfpq_tr_idx", nBuckets)
      val probeVecs = e.filter(col("vec_id") < nProbes)
        .select(col("vec_id").as("probe_id"), col("v"))
      // THE engine's own cell ranking (Similarity.probeCells) — the
      // test's pruning list can never drift from what the search body
      // actually probes.
      val cells = Similarity.probeCells(probeVecs, centroids, Similarity.IvfNprobe)
        .select("cell").distinct().collect().map(_.getLong(0)).toSeq
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val pruned = Similarity.readIvfPqIndexPruned(spark, "ivfpq_tr_idx", cells)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(pruned.queryExecution.executedPlan.toString)
      assert(sel.isDefined && sel.get.group(1).toInt < nBuckets,
        s"trained index scan not pruned: $sel")
      val fromDisk = Similarity
        .searchIvfPqResidualIndex(pruned, e, centroids, codebook, nProbes, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val inMemory = Similarity
        .searchIvfPqResidualIndex(
          Similarity.ivfPqResidualIndex(e, centroids, codebook),
          e, centroids, codebook, nProbes, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(fromDisk == inMemory,
        s"trained disk path diverges: ${fromDisk.take(5)} vs ${inMemory.take(5)}")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS ivfpq_tr_idx")
    }
  }

  test("FILTERED serving from a persisted assignment index: pruned scan + label predicate, identical results") {
    // The metadata-constrained production pattern end-to-end: the
    // label-carrying assignment index (vec_id, v, label, cell)
    // persists bucketed by cell; a filtered query prunes to its probed
    // buckets at plan time and the label predicate rides the broadcast
    // probe join inside them.
    val quant =
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(quant).as("v"), col("label"))
    val n = e.count()
    val kCentroids = math.ceil(math.sqrt(n.toDouble)).toInt
    val centroids = e.filter(col("vec_id") < kCentroids)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val nBuckets = 32
    val nProbes = 4
    try {
      graft.sources.Sinks.writeBucketed(
        Similarity.assignCells(e, centroids, carry = Seq("label")),
        "ivf_filtered_idx", "cell", nBuckets)
      val probes = e.filter(col("vec_id") < nProbes)
        .select(col("vec_id").as("probe_id"), col("v").as("v_p"),
          col("label").as("lbl_p"))
      val cells = Similarity.probeCells(
          probes.select(col("probe_id"), col("v_p").as("v")),
          centroids, Similarity.FilteredNprobe)
        .select("cell").distinct().collect().map(_.getLong(0)).toSeq
      assert(cells.nonEmpty, "no probed cells")
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val pruned = Similarity.readIvfPqIndexPruned(spark, "ivf_filtered_idx", cells)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(pruned.queryExecution.executedPlan.toString)
      assert(sel.isDefined && sel.get.group(1).toInt < nBuckets,
        s"filtered index scan not pruned: $sel")
      val fromDisk = Similarity
        .searchFilteredAssignIndex(pruned, probes, centroids, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val inMemory = Similarity
        .ivfFilteredTopKWith(e, centroids, nProbes, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(fromDisk.nonEmpty,
        "filtered serving returned no rows — the equality below would be vacuous")
      assert(fromDisk == inMemory,
        s"filtered disk path diverges: ${fromDisk.take(5)} vs ${inMemory.take(5)}")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS ivf_filtered_idx")
    }
  }

  test("index MAINTENANCE: a batch appended into the bucketed index serves identically to a rebuild") {
    // The ingest-time story for the served index: new vectors assign
    // against the FROZEN centroid artifact and APPEND into their
    // buckets (Sinks.appendBucketed) — no rebuild, pruning intact, and
    // the served answer equals a from-scratch index over corpus+batch.
    val quant =
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(quant).as("v"), col("label"))
    val n = e.count()
    val kCentroids = math.ceil(math.sqrt(n.toDouble)).toInt
    val centroids = e.filter(col("vec_id") < kCentroids)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val batchPred = col("vec_id") % 5 === 0
    val nBuckets = 32
    val nProbes = 4
    try {
      graft.sources.Sinks.writeBucketed(
        Similarity.assignCells(e.filter(!batchPred), centroids,
          carry = Seq("label")),
        "ivf_app_idx", "cell", nBuckets)
      graft.sources.Sinks.appendBucketed(
        Similarity.assignCells(e.filter(batchPred), centroids,
          carry = Seq("label")),
        "ivf_app_idx", "cell", nBuckets)
      val probes = e.filter(col("vec_id") < nProbes)
        .select(col("vec_id").as("probe_id"), col("v").as("v_p"),
          col("label").as("lbl_p"))
      val cells = Similarity.probeCells(
          probes.select(col("probe_id"), col("v_p").as("v")),
          centroids, Similarity.FilteredNprobe)
        .select("cell").distinct().collect().map(_.getLong(0)).toSeq
      assert(cells.nonEmpty, "no probed cells")
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val pruned = Similarity.readIvfPqIndexPruned(spark, "ivf_app_idx", cells)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(pruned.queryExecution.executedPlan.toString)
      assert(sel.isDefined && sel.get.group(1).toInt < nBuckets,
        s"appended index scan not pruned: $sel")
      val fromDisk = Similarity
        .searchFilteredAssignIndex(pruned, probes, centroids, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val rebuilt = Similarity
        .ivfFilteredTopKWith(e, centroids, nProbes, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(fromDisk.nonEmpty && fromDisk == rebuilt,
        s"appended index diverges from rebuild: ${fromDisk.take(5)} vs ${rebuilt.take(5)}")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS ivf_app_idx")
    }
  }
}
