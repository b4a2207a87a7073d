package graft.streaming

import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Curation
import graft.sources.{Outbox, OutboxProvider, UpdateLog, UpdateLogProvider}

/** End-to-end streaming curation: the custom micro-batch SOURCE feeds
  * the round-5 contamination GATE and lands in the exactly-once SINK —
  * the ingest-time composition of the batch `q_decontaminate` audit
  * (documents arriving on a stream are dropped at the door instead of
  * flagged after the fact). The gate is a stateless per-row filter, so
  * it adds no streaming state, no watermark requirement, and survives
  * replay for free (the sink's idempotent commit does the rest).
  */
class CurationStreamSpec extends SparkSpec {

  test("streamed docs pass the contamination gate; eval-overlapping ones are dropped") {
    val qn = "cur-in"; val bx = "cur-out"
    val ckpt = java.nio.file.Files.createTempDirectory("cur-ckpt").toString
    try {
      val evalText = "alpha beta gamma delta epsilon zeta"
      val evalShingles =
        Curation.EvalShingles.fromTexts(Curation.ShingleWidth, Seq(evalText))
      // Contaminated: embeds a full eval 5-gram verbatim.
      UpdateLog.post(qn, 1L, "intro words alpha beta gamma delta epsilon trailing tail")
      // Clean: shares words with eval but never a full-width shingle.
      UpdateLog.post(qn, 2L, "alpha beta gamma changed words entirely here now")
      // Clean and below shingle width: must pass, not crash sequence().
      UpdateLog.post(qn, 3L, "tiny doc")
      val q = Curation.contaminationGate(
          spark.readStream.format(classOf[UpdateLogProvider].getName)
            .option("queue", qn).load(),
          evalShingles)
        .select(col("chat_id"), col("text"))
        .writeStream.format(classOf[OutboxProvider].getName)
        .option("box", bx)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      try q.processAllAvailable() finally q.stop()
      val delivered = Outbox.delivered(bx).map(r => (r._2, r._3)).sorted
      assert(delivered == Seq(
        (2L, "alpha beta gamma changed words entirely here now"),
        (3L, "tiny doc")), s"gate delivered: $delivered")
    } finally { UpdateLog.drop(qn); Outbox.drop(bx) }
  }

  test("composed ingest door: quality -> contamination through source+sink, exactly-once across a REAL epoch replay, verdicts == batch") {
    // The full production shape in one pipeline: the micro-batch SOURCE
    // feeds two chained stateless gates and lands in the idempotent
    // SINK; then the checkpoint commit log is truncated (the
    // OutboxSinkSpec replay trick) so Spark RE-EXECUTES an epoch —
    // the gates re-compute identical verdicts (stateless, integer
    // rules) and the sink absorbs the replay, so the delivered set is
    // exactly the batch run of the same gate composition over all
    // posted rows. This is the end-to-end exactly-once claim the
    // per-gate specs each pin half of.
    val qn = "door-in"; val bx = "door-out"
    val ckpt = java.nio.file.Files.createTempDirectory("door-ckpt").toString
    try {
      val evalShingles = Curation.EvalShingles.fromTexts(
        Curation.ShingleWidth, Seq("alpha beta gamma delta epsilon zeta"))
      def pipe() = Curation.contaminationGate(
          Curation.qualityGate(
            spark.readStream.format(classOf[UpdateLogProvider].getName)
              .option("queue", qn).load()),
          evalShingles)
        .select(col("chat_id"), col("text"))
        .writeStream.format(classOf[OutboxProvider].getName)
        .option("box", bx)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
      val rows = Seq(
        // contaminated (full eval 5-gram embedded) -> contamination drop
        1L -> "intro words alpha beta gamma delta epsilon trailing tail",
        // clean, long enough -> KEEP
        2L -> "a long enough clean document with many words inside",
        // under 5 tokens -> quality drop
        3L -> "too short doc",
        // bigram-repetitive -> quality drop
        4L -> "spam spam spam spam spam spam",
        // clean -> KEEP (arrives in epoch 2, the one we replay)
        5L -> "another perfectly ordinary document with plenty of words",
        // contaminated in epoch 2 -> drop there too
        6L -> "more words alpha beta gamma delta epsilon again here")
      rows.take(4).foreach { case (id, t) => UpdateLog.post(qn, id, t) }
      val q1 = pipe().start()
      try {
        q1.processAllAvailable()
        rows.drop(4).foreach { case (id, t) => UpdateLog.post(qn, id, t) }
        q1.processAllAvailable()
      } finally {
        q1.stop(); q1.awaitTermination()
        val dl = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (spark.streams.active.exists(_.id == q1.id) && System.nanoTime() < dl)
          Thread.sleep(20)
      }
      // Truncate the newest commit (keep its offsets entry): restart
      // re-executes that epoch against the sink with the same epochId.
      val commits = java.nio.file.Paths.get(ckpt, "commits")
      val newest = java.nio.file.Files.list(commits)
        .filter(p => p.getFileName.toString.forall(_.isDigit))
        .max((a, b) => a.getFileName.toString.toLong
          .compareTo(b.getFileName.toString.toLong)).get()
      java.nio.file.Files.delete(newest)
      java.nio.file.Files.deleteIfExists(
        newest.resolveSibling("." + newest.getFileName.toString + ".crc"))
      val late = 7L -> "a final clean arrival after the replayed restart"
      val q2 = pipe().start()
      try {
        q2.processAllAvailable() // replays the dropped epoch through BOTH gates
        UpdateLog.post(qn, late._1, late._2)
        q2.processAllAvailable()
      } finally q2.stop()
      val all = Outbox.delivered(bx)
      // Exactly-once: nothing delivered twice despite the replay.
      assert(all.map(_._2).distinct.size == all.size, s"duplicate delivery: $all")
      // Stream verdicts == the BATCH run of the same composition over
      // every posted row (the gates are batch/stream agnostic).
      import spark.implicits._
      val batchKept = Curation.contaminationGate(
          Curation.qualityGate((rows :+ late).toDF("chat_id", "text")),
          evalShingles)
        .select("chat_id").collect().map(_.getLong(0)).toSet
      assert(all.map(_._2).toSet == batchKept, s"$all vs $batchKept")
      assert(batchKept == Set(2L, 5L, 7L), s"fixture drift: $batchKept")
    } finally { UpdateLog.drop(qn); Outbox.drop(bx) }
  }

  test("eval shingles survive messy whitespace; null text passes BOTH gate paths") {
    import spark.implicits._
    // Consecutive/trailing spaces: Spark's split keeps empty tokens, so
    // fromTexts must too (limit −1) — and the width validation counts
    // separators instead of re-splitting (Scala split(\" \") drops
    // trailing empties and would false-reject legitimate shingles).
    val messy = Curation.EvalShingles.fromTexts(5, Seq("one two three four  five six "))
    assert(messy.shingles.nonEmpty)
    // Null text has no shingles ⟹ cannot be contaminated ⟹ must PASS —
    // and identically on the inline (array-literal) and broadcast
    // paths: pre-fix the inline path's bare arrays_overlap returned
    // NULL and silently DROPPED null rows while the broadcast path kept
    // them, flipping verdicts when the eval size crossed GateInlineMax.
    val docs = Seq((1L, null.asInstanceOf[String]),
      (2L, "alpha beta gamma delta epsilon tail words"),
      (3L, "completely clean other words here now")).toDF("chat_id", "text")
    val evalSmall = Curation.EvalShingles.fromTexts(5,
      Seq("alpha beta gamma delta epsilon"))
    val evalBig = Curation.EvalShingles(5,
      bigEvalSet :+ "alpha beta gamma delta epsilon")
    assert(evalBig.shingles.size > Curation.GateInlineMax)
    val inlineKept = Curation.contaminationGate(docs, evalSmall)
      .collect().map(_.getLong(0)).toSet
    val bcastKept = Curation.contaminationGate(docs, evalBig)
      .collect().map(_.getLong(0)).toSet
    assert(inlineKept == Set(1L, 3L), s"inline path kept: $inlineKept")
    assert(bcastKept == inlineKept, s"paths disagree: $inlineKept vs $bcastKept")
  }

  /** 100k synthetic eval shingles: realistic eval-set scale. */
  private def bigEvalSet: IndexedSeq[String] = {
    val rnd = new scala.util.Random(42L)
    (1 to 100000).map(_ =>
      Seq.fill(Curation.ShingleWidth)("w" + rnd.nextInt(100000)).mkString(" "))
  }

  test("gate at a derived (non-5) width drops planted contamination and widths can't mismatch") {
    val qn = "cur-w7-in"; val bx = "cur-w7-out"
    val ckpt = java.nio.file.Files.createTempDirectory("cur-w7-ckpt").toString
    try {
      // The batch path derives width 7 at a 500-doc corpus — the exact
      // scenario the round-7 verdict flagged: eval shingles built at the
      // derived width used to meet a gate defaulting to width 5 and
      // match NOTHING. Width now travels inside EvalShingles.
      val width = Curation.deriveShingleWidth(500L)
      assert(width == 7 && width != Curation.ShingleWidth)
      val evalText = "alpha beta gamma delta epsilon zeta eta theta"
      val eval = Curation.EvalShingles.fromTexts(width, Seq(evalText))
      assert(eval.shingles.nonEmpty && eval.shingles.forall(_.split(" ").length == 7))
      // Contaminated: embeds a full 7-gram of the eval text verbatim.
      UpdateLog.post(qn, 1L, "intro alpha beta gamma delta epsilon zeta eta tail words")
      // Shares a 5-gram (the OLD default width) but never a 7-gram:
      // must PASS at width 7 — the case that silently inverted before.
      UpdateLog.post(qn, 2L, "alpha beta gamma delta epsilon changed words entirely")
      UpdateLog.post(qn, 3L, "tiny doc")
      val q = Curation.contaminationGate(
          spark.readStream.format(classOf[UpdateLogProvider].getName)
            .option("queue", qn).load(),
          eval)
        .select(col("chat_id"), col("text"))
        .writeStream.format(classOf[OutboxProvider].getName)
        .option("box", bx)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      try q.processAllAvailable() finally q.stop()
      val delivered = Outbox.delivered(bx).map(_._2).sorted
      assert(delivered == Seq(2L, 3L), s"gate delivered: $delivered")
      // A mismatched hand-rolled set fails at construction, not silently.
      intercept[IllegalArgumentException] {
        Curation.EvalShingles(7, Seq("only five tokens wide here"))
      }
    } finally { UpdateLog.drop(qn); Outbox.drop(bx) }
  }

  test("inline gate at 100k shingles: one literal node, no codegen fallback") {
    import spark.implicits._
    // The literal-array form of the gate expression on a BATCH frame
    // (same expression tree the stream runs): must stay fully codegen'd
    // — a 100k-element array is ONE Literal node, not 100k nodes — and
    // must actually execute. CodegenFallback in the executed plan would
    // mean Janino gave up.
    val evalShingles = bigEvalSet :+ "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, "intro alpha beta gamma delta epsilon tail"),
      (2L, "totally clean words that never overlap anything")).toDF("chat_id", "text")
    val gated = docs.filter(!org.apache.spark.sql.functions.arrays_overlap(
      Curation.shingleArray(col("text")),
      org.apache.spark.sql.functions.lit(evalShingles.toArray)))
    val out = gated.collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L), s"gate kept: $out")
    val fallbacks = gated.queryExecution.executedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
          if !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal] => e
      })
    }.flatten
    assert(fallbacks.isEmpty,
      s"CodegenFallback expressions in the gate plan: ${fallbacks.map(_.getClass.getSimpleName)}")
  }

  test("streaming quality gate: repetitive/short/null docs dropped at the door, stream == batch") {
    val qn = "qual-in"; val bx = "qual-out"
    val ckpt = java.nio.file.Files.createTempDirectory("qual-ckpt").toString
    try {
      // Passes: ≥ 5 tokens, every bigram distinct.
      UpdateLog.post(qn, 1L, "clean document with enough distinct words here")
      // Dropped: 9 bigram instances, 1 distinct — (9−1)×10 > 9.
      UpdateLog.post(qn, 2L, "spam spam spam spam spam spam spam spam spam spam")
      // Dropped: 2 tokens < QualityMinTokens.
      UpdateLog.post(qn, 3L, "tiny doc")
      // Passes: exactly at the boundary — 10 bigrams, 1 duplicated
      // INSTANCE would need dup×10 > 10; zero duplicates here.
      UpdateLog.post(qn, 4L, "a b c d e f g h i j k")
      val q = Curation.qualityGate(
          spark.readStream.format(classOf[UpdateLogProvider].getName)
            .option("queue", qn).load())
        .select(col("chat_id"), col("text"))
        .writeStream.format(classOf[OutboxProvider].getName)
        .option("box", bx)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      try q.processAllAvailable() finally q.stop()
      val delivered = Outbox.delivered(bx).map(_._2).sorted
      assert(delivered == Seq(1L, 4L), s"quality gate delivered: $delivered")
      // Same filter on a BATCH frame (the gate is stream/batch
      // agnostic): identical verdicts, and a null text is dropped —
      // the opposite default from the contamination gate, asserted
      // here so the divergence is pinned, not accidental.
      import spark.implicits._
      val docs = Seq(
        (1L, "clean document with enough distinct words here"),
        (2L, "spam spam spam spam spam spam spam spam spam spam"),
        (3L, "tiny doc"),
        (4L, "a b c d e f g h i j k"),
        (5L, null.asInstanceOf[String])).toDF("chat_id", "text")
      val batchKept = Curation.qualityGate(docs)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(batchKept == Seq(1L, 4L), s"batch gate kept: $batchKept")
    } finally { UpdateLog.drop(qn); Outbox.drop(bx) }
  }

  test("broadcast gate above the inline threshold: same verdicts on a 100k-shingle stream") {
    val qn = "cur-big-in"; val bx = "cur-big-out"
    val ckpt = java.nio.file.Files.createTempDirectory("cur-big-ckpt").toString
    try {
      val evalShingles = Curation.EvalShingles(Curation.ShingleWidth,
        bigEvalSet :+ "alpha beta gamma delta epsilon")
      assert(evalShingles.shingles.size > Curation.GateInlineMax) // broadcast path
      UpdateLog.post(qn, 1L, "intro alpha beta gamma delta epsilon tail")
      UpdateLog.post(qn, 2L, "totally clean words that never overlap anything")
      UpdateLog.post(qn, 3L, "tiny doc")
      val q = Curation.contaminationGate(
          spark.readStream.format(classOf[UpdateLogProvider].getName)
            .option("queue", qn).load(),
          evalShingles)
        .select(col("chat_id"), col("text"))
        .writeStream.format(classOf[OutboxProvider].getName)
        .option("box", bx)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      try q.processAllAvailable() finally q.stop()
      val delivered = Outbox.delivered(bx).map(_._2).sorted
      assert(delivered == Seq(2L, 3L), s"gate delivered: $delivered")
    } finally { UpdateLog.drop(qn); Outbox.drop(bx) }
  }

  test("semantic gate: near-eval vectors dropped mid-stream, orthogonal and null pass; stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Eval embedding (the frozen artifact). τ = 7/20: vec 1 is a
    // near-copy (cos ≈ 1), vec 2 is orthogonal (dot < 0 ⇒ passes),
    // vec 3 sits at cos ≈ 0.19 < τ, vec 4 is null.
    val eval = Seq(Seq(1000L, 10L))
    val in = MemoryStream[(Long, Option[Seq[Long]])]
    in.addData(
      (1L, Some(Seq(995L, 12L))),
      (2L, Some(Seq(-10L, 1000L))),
      (3L, Some(Seq(200L, -980L))),
      (4L, None))
    val gated = Curation.semanticGate(
      in.toDF().toDF("vec_id", "v"), eval)
    val q = gated.writeStream.format("memory")
      .queryName("sem_gate_out").outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("sem_gate_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 3L, 4L), s"semantic gate kept: $kept")
    // Batch parity: the same filter over a batch frame.
    val batchKept = Curation.semanticGate(
        Seq((1L, Some(Seq(995L, 12L))), (2L, Some(Seq(-10L, 1000L))),
          (3L, Some(Seq(200L, -980L))), (4L, Option.empty[Seq[Long]]))
          .toDF("vec_id", "v"), eval)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(batchKept == kept, s"batch gate kept: $batchKept")
  }

  test("phash gate drops near-dup images through the DECODE (re-encodes caught), stream == batch") {
    import spark.implicits._
    import graft.operators.Multimodal
    import java.awt.image.BufferedImage
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The PipelineSpec fixture geometry: 256×1 gray images whose 60
    // sampled pixels sit far from the mean, so one flipped sample
    // flips exactly one sketch bit.
    def image(highs: Set[Int]): BufferedImage = {
      val img = new BufferedImage(256, 1, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 256) img.setRGB(x, 0, 10 * 0x010101)
      highs.foreach { k => img.setRGB(255 * k / 59, 0, 240 * 0x010101); () }
      img
    }
    def enc(img: BufferedImage, fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
      out.toByteArray
    }
    val indexed = image((30 until 60).toSet)
    // Index holds the PNG's decoded sketch; the stream re-encodes the
    // same pixels as BMP (byte-different) — only a decoding gate can
    // catch it. near = 2 bits inside the radius; far = 60 bits out.
    val index = Seq(Multimodal.phashOf(
      Multimodal.lumaSamples(enc(indexed, "png")).get))
    val rows = Seq(
      (1L, enc(indexed, "bmp")),                            // re-encoded dup
      (2L, enc(image((30 until 60).toSet + 0 + 1), "png")), // near, in radius
      (3L, enc(image((0 until 30).toSet), "png")),          // far
      (4L, Array.emptyByteArray))                           // empty: passes
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    in.addData(rows: _*)
    val q = Multimodal.phashGate(
        in.toDF().toDF("doc_id", "payload"), index)
      .writeStream.format("memory")
      .queryName("phash_gate_out").outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("phash_gate_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 4L), s"phash gate kept: $kept")
    val batchKept = Multimodal.phashGate(rows.toDF("doc_id", "payload"), index)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(batchKept == kept, s"batch gate kept: $batchKept")
  }

  test("importance gate: corpus-copy verdicts equal the batch key's; junk and null drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Train the frozen model on the PipelineSpec importance fixture
    // corpus; stream COPIES of its docs — a copy's tokens carry the
    // corpus cf values, so the gate's score equals the batch key's
    // imp_score for that doc, making stream == batch checkable
    // verdict-for-verdict.
    val corpus = Seq(
      (0L, "alpha alpha beta", Curation.DsirTarget),
      (1L, "alpha beta", "src1"),
      (2L, "gamma gamma", "src1")
    ).toDF("doc_id", "text", "source")
    val model = Curation.ImportanceModel.fromCorpus(corpus)
    val batchSelected = Curation.importanceWeights(corpus)
      .filter(col("selected") === 1)
      .collect().map(_.getLong(0)).toSet
    assert(batchSelected == Set(0L, 1L), batchSelected)
    val rows = Seq(
      (10L, "alpha alpha beta"),  // copy of doc 0 → selected
      (11L, "alpha beta"),        // copy of doc 1 → selected
      (12L, "gamma gamma"),       // copy of doc 2 → out-of-domain, drops
      (13L, "zzz zzz"),           // unseen tokens → score 0, drops
      (14L, null.asInstanceOf[String])) // null → drops
    val in = MemoryStream[(Long, String)]
    in.addData(rows: _*)
    val q = Curation.importanceGate(in.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory")
      .queryName("imp_gate_out").outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("imp_gate_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(10L, 11L), s"importance gate kept: $kept")
    val batchKept = Curation.importanceGate(rows.toDF("doc_id", "text"), model)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(batchKept == kept, s"batch gate kept: $batchKept")
    // A degenerate model fails at construction, not by gating nothing.
    assertThrows[IllegalArgumentException] {
      Curation.ImportanceModel(Map(), Map(), 0L, 0L)
    }
  }

  test("bigram importance gate: stream == batch verdicts; kernel matches the batch hash expression") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Bigram-discriminating corpus: the target's dominant PAIR is
    // (alpha,beta); (beta,alpha) is raw-common but target-rare, so the
    // two orderings split the verdict — exactly what the unigram tier
    // cannot see (both docs have identical token multisets).
    //   cf_t: (a,b)=2, (b,a)=1, N_t=3; cf_r: (a,b)=3, (b,a)=2, N_r=5
    //   r(a,b) = (1e6·2·5) div (3·3) = 1111111 ≥ 1e6 → target-like
    //   r(b,a) = (1e6·1·5) div (2·3) =  833333 < 1e6 → drops
    val corpus = Seq(
      (0L, "alpha beta alpha beta", Curation.DsirTarget),
      (1L, "alpha beta", "src1"),
      (2L, "beta alpha", "src1")
    ).toDF("doc_id", "text", "source")
    val model = Curation.ImportanceModelBigram.fromCorpus(corpus)
    val batchSel = Curation.importanceWeightsBigram(corpus)
      .filter(col("selected") === 1)
      .collect().map(_.getLong(0)).toSet
    assert(batchSel == Set(0L, 1L), batchSel)
    val rows = Seq(
      (10L, "alpha beta"),   // copy of doc 1 → selected
      (11L, "beta alpha"),   // copy of doc 2 → target-rare pair, drops
      (12L, "alpha"),        // single token: no bigram features, drops
      (13L, "zz qq"),        // unseen pair → score 0, drops
      (14L, null.asInstanceOf[String])) // null → drops
    val in = MemoryStream[(Long, String)]
    in.addData(rows: _*)
    val q = Curation
      .importanceGateBigram(in.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory")
      .queryName("imp_bg_gate_out").outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("imp_bg_gate_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(10L), s"bigram gate kept: $kept")
    val batchKept = Curation
      .importanceGateBigram(rows.toDF("doc_id", "text"), model)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(batchKept == kept, s"batch gate kept: $batchKept")
    // The JVM kernel and the batch md5-bucket expression must agree
    // on every feature id — including empty and non-ASCII tokens
    // (md5 runs over UTF-8 bytes in both engines).
    val pairs = Seq(("alpha", "beta"), ("beta", "alpha"), ("", "x"),
      ("zzqx", "Über"), ("café", ""))
    val exprIds = pairs.toDF("w1", "w2")
      .select(expr("cast(conv(substr(md5(concat(w1, ' ', w2)), 1, 8)" +
        s", 16, 10) as bigint) % ${Curation.DsirBuckets}"))
      .collect().map(_.getLong(0)).toSeq
    val kernelIds = pairs.map { case (a, b) => Curation.bigramFeatureOf(a, b) }
    assert(exprIds == kernelIds, s"expr $exprIds vs kernel $kernelIds")
  }

  test("line gate: frozen boilerplate cut mid-stream, emptied docs drop, stream == batch, both paths") {
    val qn = "lines-in"; val bx = "lines-out"
    val ckpt = java.nio.file.Files.createTempDirectory("lines-ckpt").toString
    try {
      import spark.implicits._
      val corpus = Seq(
        (101L, "join our mailing list\nalpha body"),
        (102L, "join our mailing list\nbeta body"),
        (103L, "join our mailing list\ngamma body")).toDF("doc_id", "text")
      val keys = graft.operators.Dedup.lineBoilerplateIndex(corpus)
        .collect().map(_.getString(0)).toSeq
      assert(keys.size == 1, "exactly the shared banner is boilerplate")

      UpdateLog.post(qn, 1L, "join our mailing list\nfresh arriving body")
      UpdateLog.post(qn, 2L, "join our mailing list") // all boilerplate
      UpdateLog.post(qn, 3L, "untouched arriving doc")
      val q = graft.operators.Dedup.lineGate(
          spark.readStream.format(classOf[UpdateLogProvider].getName)
            .option("queue", qn).load(), keys)
        .select(col("chat_id"), col("text"))
        .writeStream.format(classOf[OutboxProvider].getName)
        .option("box", bx)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      try q.processAllAvailable() finally q.stop()
      val delivered = Outbox.delivered(bx).map(_._2).sorted
      assert(delivered == Seq(1L, 3L), s"line gate delivered: $delivered")

      // Batch parity incl. the REWRITE content and the null pass-through;
      // then the broadcast path (5000 decoy keys) must agree verbatim.
      val arriving = Seq(
        (1L, "join our mailing list\nfresh arriving body"),
        (2L, "join our mailing list"),
        (3L, "untouched arriving doc"),
        (4L, null.asInstanceOf[String])).toDF("chat_id", "text")
      val expect = Map(1L -> "fresh arriving body",
        3L -> "untouched arriving doc", 4L -> null)
      val inline = graft.operators.Dedup.lineGate(arriving, keys)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(inline == expect, s"inline path: $inline")
      val big = keys ++ (1 to 5000).map(i => f"$i%032x")
      val bcast = graft.operators.Dedup.lineGate(arriving, big)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(bcast == expect, s"broadcast path: $bcast")
    } finally { UpdateLog.drop(qn); Outbox.drop(bx) }
  }

  test("cdc gate: mostly-recycled docs dropped at the door, exact-half kept, stream == batch, both paths") {
    val qn = "cdc-in"; val bx = "cdc-out"
    val ckpt = java.nio.file.Files.createTempDirectory("cdc-ckpt").toString
    try {
      import spark.implicits._
      // 'aaaaaaai' is the constructed CDC cut (whole-doc chunk);
      // repeating it across two corpus docs makes its key the dup set.
      val corpus = Seq((101L, "s", "aaaaaaai"), (102L, "s", "aaaaaaai"))
        .toDF("doc_id", "source", "text")
      val keys = graft.operators.Dedup.cdcDupIndex(corpus)
        .collect().map(_.getLong(0)).toSeq
      assert(keys.size == 1, s"exactly the shared chunk is indexed: $keys")

      UpdateLog.post(qn, 1L, "aaaaaaai") // 100% recycled -> drop
      UpdateLog.post(qn, 2L, "entirely fresh arriving body")
      UpdateLog.post(qn, 3L, "aaaaaaai" + "bcdefghj") // exactly half -> keep
      val q = graft.operators.Dedup.cdcGate(
          spark.readStream.format(classOf[UpdateLogProvider].getName)
            .option("queue", qn).load(), keys)
        .select(col("chat_id"), col("text"))
        .writeStream.format(classOf[OutboxProvider].getName)
        .option("box", bx)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()
      try q.processAllAvailable() finally q.stop()
      val delivered = Outbox.delivered(bx).map(_._2).sorted
      assert(delivered == Seq(2L, 3L), s"cdc gate delivered: $delivered")

      // Batch parity incl. null pass-through AND the non-ASCII
      // pass-through (byte/char offsets diverge -> conservative keep;
      // doc 5 is the dup chunk plus one multi-byte char, which the
      // pre-fix UDF path would have crashed or dropped on), then the
      // broadcast path (5000 decoy keys) must agree verbatim.
      val arriving = Seq((1L, "aaaaaaai"),
        (2L, "entirely fresh arriving body"),
        (3L, "aaaaaaai" + "bcdefghj"),
        (4L, null.asInstanceOf[String]),
        (5L, "aaaaaaai" + "é")).toDF("chat_id", "text")
      val expect = Set(2L, 3L, 4L, 5L)
      val inline = graft.operators.Dedup.cdcGate(arriving, keys)
        .collect().map(_.getLong(0)).toSet
      assert(inline == expect, s"inline path: $inline")
      val big = keys ++ (1 to 5000).map(i => 1000000000000000L + i)
      val bcast = graft.operators.Dedup.cdcGate(arriving, big)
        .collect().map(_.getLong(0)).toSet
      assert(bcast == expect, s"broadcast path: $bcast")
    } finally { UpdateLog.drop(qn); Outbox.drop(bx) }
  }
}
