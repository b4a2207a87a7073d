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

  test("STREAMING ingest: ledger-gated appends survive replays AND the append-then-crash window") {
    // The exactly-once contract of IndexIngest, attacked at both holes
    // a plain-parquet append has: (a) a REPLAYED committed epoch must
    // be a no-op (marker gate); (b) an append that crashed BEFORE its
    // marker must leave only INVISIBLE orphans — the replay commits a
    // fresh attempt, and serving (table ⋉ ledger on (batch_id,
    // attempt)) sees exactly one copy of every row.
    val quant =
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(quant).as("v"))
    val n = e.count()
    val kCentroids = math.ceil(math.sqrt(n.toDouble)).toInt
    val centroids = e.filter(col("vec_id") < kCentroids)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val assign = (b: org.apache.spark.sql.DataFrame) =>
      Similarity.assignCells(b, centroids)
    val ledgerDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-ledger").toString
    val table = "ivf_stream_idx"
    val nBuckets = 32
    try {
      import graft.streaming.IndexIngest
      IndexIngest.ingestBatch(e.filter(col("vec_id") % 3 === 0), 0L,
        assign, table, nBuckets, ledgerDir)
      IndexIngest.ingestBatch(e.filter(col("vec_id") % 3 === 1), 1L,
        assign, table, nBuckets, ledgerDir)
      // (a) replay of the committed epoch 1 — must append nothing.
      val before = spark.table(table).count()
      IndexIngest.ingestBatch(e.filter(col("vec_id") % 3 === 1), 1L,
        assign, table, nBuckets, ledgerDir)
      assert(spark.table(table).count() == before,
        "replayed committed epoch must be a no-op")
      // (b) the crash window: batch 2's first attempt appends its rows
      // and dies before the marker — simulated by the raw tagged
      // append IndexIngest would have done, with no ledger commit.
      val b2 = e.filter(col("vec_id") % 3 === 2)
      graft.sources.Sinks.appendBucketed(
        assign(b2).withColumn("batch_id", lit(2L))
          .withColumn("attempt", lit("dead-attempt")),
        table, "cell", nBuckets)
      // The streaming replay of epoch 2 re-ingests and commits.
      IndexIngest.ingestBatch(b2, 2L, assign, table, nBuckets, ledgerDir)
      val served = IndexIngest.readCommitted(spark, table, ledgerDir)
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      val want = e.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(served == want,
        s"served view must hold exactly one copy of every vector (got ${served.size}, want ${want.size})")
      // Non-vacuity: the orphan attempt's rows really are in the raw
      // table — only the ledger join hides them.
      assert(spark.table(table).count() > want.size,
        "the dead attempt should exist in the raw table")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val d = new java.io.File(ledgerDir)
      Option(d.listFiles()).foreach(_.foreach(_.delete())); d.delete()
      ()
    }
  }

  test("STREAMING ingest COMPACTION: fold to one marker, exactly-once across the rewrite/commit crash window") {
    val quant =
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(quant).as("v"))
    val kCentroids = math.ceil(math.sqrt(e.count().toDouble)).toInt
    val centroids = e.filter(col("vec_id") < kCentroids)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val assign = (b: org.apache.spark.sql.DataFrame) =>
      Similarity.assignCells(b, centroids)
    val ledgerDir = java.nio.file.Files
      .createTempDirectory("graft-compact-ledger").toString
    val table = "ivf_compact_idx"
    val nBuckets = 32
    def served() = graft.streaming.IndexIngest
      .readCommitted(spark, table, ledgerDir)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def markers() = {
      def walk(d: java.io.File): Seq[String] =
        Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(f =>
          if (f.isDirectory) walk(f) else Seq(f.getName))
      walk(new java.io.File(ledgerDir)).filter(_.startsWith("b"))
    }
    try {
      import graft.streaming.IndexIngest
      IndexIngest.ingestBatch(e.filter(col("vec_id") % 3 === 0), 0L,
        assign, table, nBuckets, ledgerDir)
      IndexIngest.ingestBatch(e.filter(col("vec_id") % 3 === 1), 1L,
        assign, table, nBuckets, ledgerDir)
      // A dead attempt (append, no marker): compaction must DROP it.
      graft.sources.Sinks.appendBucketed(
        assign(e.filter(col("vec_id") % 3 === 2))
          .withColumn("batch_id", lit(2L))
          .withColumn("attempt", lit("dead-attempt")),
        table, "cell", nBuckets)
      val before = served()
      assert(markers().size == 2)

      // (a) CRASH inside the window: rewrite + new marker are durable,
      // HEAD never lands. Serving must still be the OLD view, exactly.
      val boom = new RuntimeException("injected crash before commit")
      val thrown = intercept[RuntimeException] {
        IndexIngest.compact(spark, table, nBuckets, ledgerDir,
          beforeCommit = () => throw boom)
      }
      assert(thrown eq boom)
      assert(served() == before,
        "crashed compaction must leave the old generation serving")

      // (b) The retry completes: same rows, ONE marker, orphans gone.
      IndexIngest.compact(spark, table, nBuckets, ledgerDir)
      assert(served() == before, "compaction must not change the answer")
      assert(markers().size == 1, s"ledger not truncated: ${markers()}")
      val servedTable = spark.table(s"${table}_gen1")
      assert(servedTable.count() == before.size,
        "rewrite must carry exactly the committed rows (no dead attempts)")

      // (c) A replay of a FOLDED epoch is a no-op (high-water gate).
      IndexIngest.ingestBatch(e.filter(col("vec_id") % 3 === 1), 1L,
        assign, table, nBuckets, ledgerDir)
      assert(served() == before, "replayed folded epoch must be a no-op")

      // (d) The stream continues into the new generation, and a second
      // compaction folds the tail back to one marker.
      IndexIngest.ingestBatch(e.filter(col("vec_id") % 3 === 2), 2L,
        assign, table, nBuckets, ledgerDir)
      val withTail = served()
      assert(withTail.size == e.count(),
        "post-compaction append must serve alongside the folded rows")
      IndexIngest.compact(spark, table, nBuckets, ledgerDir)
      assert(served() == withTail)
      assert(markers().size == 1)
    } finally {
      Seq(table, s"${table}_gen1", s"${table}_gen2", s"${table}_gen3")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ledgerDir))
      ()
    }
  }

  test("STREAMING ingest end-to-end: foreachBatch over a MemoryStream builds the served index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val centroids = Seq((0L, Seq(1000L, 0L)), (1L, Seq(0L, 1000L)))
      .toDF("cid", "c")
    val assign = (b: org.apache.spark.sql.DataFrame) =>
      Similarity.assignCells(b, centroids)
    val ledgerDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-e2e-ledger").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ingest-e2e-ckpt").toString
    val table = "ivf_stream_e2e"
    try {
      import graft.streaming.IndexIngest
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Long])]
      val q = in.toDF().toDF("vec_id", "v").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          IndexIngest.ingestBatch(b, id, assign, table, 8, ledgerDir))
        .start()
      try {
        in.addData((10L, Seq(900L, 100L)), (11L, Seq(100L, 900L)))
        q.processAllAvailable()
        in.addData((12L, Seq(800L, 50L)))
        q.processAllAvailable()
      } finally q.stop()
      val got = graft.streaming.IndexIngest
        .readCommitted(spark, table, ledgerDir)
        .select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == Seq((10L, 0L), (11L, 1L), (12L, 0L)),
        s"served index after two epochs: $got")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      Seq(ledgerDir, ckpt).foreach { p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)); ()
      }
    }
  }

  test("phash IVF persisted: pruned bucketed serve equals in-memory; caller conf untouched") {
    // The registered served key runs the full lifecycle: build +
    // persist (Artifacts-cached) + pruned serve on a forked session.
    val before = spark.conf.getOption(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    val served = graft.SparkEntry
      .queries("q_mm_phash_ivf_served")(spark, sfDir)
    // The executed plan must carry a PRUNED bucketed scan of the index
    // table — SelectedBucketsCount strictly below the bucket count.
    val plan = served.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in served plan:\n$plan")
    val (selected, total) = (sel.get.group(1).toInt, sel.get.group(2).toInt)
    assert(total == Multimodal.PhashIdxBuckets && selected < total,
      s"expected pruned scan, got $selected out of $total buckets")
    // Persistence changes the I/O shape, not the answer: row-for-row
    // equal to the in-memory key (both ordered (probe_id, rk)).
    val inMem = graft.SparkEntry.queries("q_mm_phash_ivf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    val disk = served
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(disk.toSeq == inMem.toSeq,
      s"served diverges: ${disk.take(3).toSeq} vs ${inMem.take(3).toSeq}")
    // The conf flip rode the forked serving session — the caller's
    // session conf is exactly what it was (the ivfTrainedServe leak
    // regression guard).
    assert(spark.conf.getOption(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled") == before,
      "serving leaked autoBucketedScan into the caller's session")
  }
}
