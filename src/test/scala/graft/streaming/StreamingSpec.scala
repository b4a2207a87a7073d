package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.Sessions.{Msg, Turn}

/** MemoryStream-driven validation of the §2.9 streaming capabilities. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
    .getTime  // not used for event-time; helper for readability

  test("sessionization: first message opens, turns bump, /reset clears") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Msg]
    val q = Sessions.sessionize(in.toDS(), ttl = false)
      .writeStream.format("memory").queryName("turns")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Msg(1, 100, "hello"), Msg(1, 200, "again"), Msg(2, 150, "hi"))
      q.processAllAvailable()
      in.addData(Msg(1, 300, "/reset"))
      q.processAllAvailable()
      in.addData(Msg(1, 400, "fresh"))
      q.processAllAvailable()
      val turns = spark.table("turns").as[Turn].collect().toSeq
      val chat1 = turns.filter(_.chatId == 1).sortBy(t => (t.sessionId, t.turn))
      // Before reset: one session, turns 1 and 2; after: a NEW session id.
      assert(chat1.map(_.text) == Seq("hello", "again", "fresh"))
      assert(chat1(0).sessionId == "s-1-100" && chat1(1).sessionId == "s-1-100")
      assert(chat1(2).sessionId == "s-1-400" && chat1(2).turn == 1)
      // Chat 2 is isolated state.
      val chat2 = turns.filter(_.chatId == 2)
      assert(chat2.map(t => (t.sessionId, t.turn)) == Seq(("s-2-150", 1)))
    } finally q.stop()
  }

  private def eventStream(implicit sqlCtx: org.apache.spark.sql.SQLContext) = {
    import spark.implicits._
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    (in, in.toDF().toDF("event_id", "ts", "user_id", "event_type"))
  }

  test("tumbling daily window buckets counts per day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (in, df) = eventStream
    val q = StreamOps.tumblingDaily(df)
      .writeStream.format("memory").queryName("daily")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "click"),
        (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 7L, "click"),
        (3L, Timestamp.valueOf("2024-01-02 09:00:00"), 7L, "click"))
      q.processAllAvailable()
      val out = spark.table("daily")
        .select(date_format(col("day"), "yyyy-MM-dd").as("d"), col("count"))
        .as[(String, Long)].collect().toMap
      assert(out == Map("2024-01-01" -> 2L, "2024-01-02" -> 1L))
    } finally q.stop()
  }

  test("session windows split on the activity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (in, df) = eventStream
    val q = StreamOps.sessionWindows(df, "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "a"),
        (2L, Timestamp.valueOf("2024-01-01 10:10:00"), 7L, "b"),  // same session
        (3L, Timestamp.valueOf("2024-01-01 12:00:00"), 7L, "c"))  // gap > 30m → new
      q.processAllAvailable()
      val out = spark.table("sessions").select("user_id", "n_events")
        .as[(Long, Long)].collect().toSeq.sorted
      assert(out == Seq((7L, 1L), (7L, 2L)))
    } finally q.stop()
  }

  test("stateful dedup drops re-delivered event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (in, df) = eventStream
    val q = StreamOps.dedup(df)
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "a"),
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "a"))  // same batch dup
      q.processAllAvailable()
      in.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:01"), 7L, "a"),  // redelivery
        (2L, Timestamp.valueOf("2024-01-01 10:01:00"), 7L, "b"))
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id").as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("sliding windows assign events to overlapping panes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (in, df) = eventStream
    val q = StreamOps.sliding(df)
      .writeStream.format("memory").queryName("slid")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((1L, Timestamp.valueOf("2024-01-01 10:07:00"), 7L, "a"))
      q.processAllAvailable()
      // A 10m window sliding by 5m covers each event twice.
      val n = spark.table("slid").count()
      assert(n == 2, s"expected 2 panes, got $n")
    } finally q.stop()
  }

  test("stream-static join: stream rows enrich against a broadcast dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val (in, df) = eventStream
    val q = df.join(broadcast(dim), Seq("user_id"), "left_outer")
      .select(col("event_id"), coalesce(col("tier"), lit("unknown")).as("tier"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "a"),
        (2L, Timestamp.valueOf("2024-01-01 10:01:00"), 9L, "b")) // no dim row
      q.processAllAvailable()
      val out = spark.table("enriched").as[(Long, String)].collect().toMap
      assert(out == Map(1L -> "gold", 2L -> "unknown"))
    } finally q.stop()
  }

  test("watermark: events older than the watermark are dropped from append output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (in, df) = eventStream
    // Append mode only emits a window once the watermark passes its end —
    // and late rows behind the watermark never resurrect it.
    val q = df.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .count()
      .writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, Timestamp.valueOf("2024-01-01 10:05:00"), 7L, "a"))
      q.processAllAvailable()
      // Advance event time far past the first window + watermark.
      in.addData((2L, Timestamp.valueOf("2024-01-01 12:00:00"), 7L, "b"))
      q.processAllAvailable()
      val emitted = spark.table("late").count()
      assert(emitted == 1, s"first window should have been finalized, got $emitted")
      // A straggler way behind the watermark must not change anything.
      in.addData((3L, Timestamp.valueOf("2024-01-01 10:06:00"), 7L, "late"))
      q.processAllAvailable()
      in.addData((4L, Timestamp.valueOf("2024-01-01 13:00:00"), 7L, "c"))
      q.processAllAvailable()
      val rows = spark.table("late")
        .select(date_format(col("window.start"), "HH:mm").as("w"), col("count"))
        .as[(String, Long)].collect().toMap
      assert(rows.get("10:00").contains(1L), s"late event leaked into $rows")
    } finally q.stop()
  }

  test("sessionization runs on the RocksDB state store (the at-scale backend)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Msg]
    val q = Sessions.sessionize(in.toDS(), ttl = false)
      .writeStream.format("memory").queryName("turns_rocks")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Msg(5, 100, "a"))
      q.processAllAvailable()
      in.addData(Msg(5, 200, "b")) // state must persist across batches
      q.processAllAvailable()
      val turns = spark.table("turns_rocks").as[Turn].collect().sortBy(_.turn)
      assert(turns.map(t => (t.sessionId, t.turn)).toSeq ==
        Seq(("s-5-100", 1), ("s-5-100", 2)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sessionization v2 (transformWithState): same turns, sessions, and /reset behavior") {
    // The arbitrary-state-v2 path must be observably identical to the
    // flatMapGroupsWithState path on the full v1 scenario (open, bump,
    // reset, fresh session, key isolation). Requires RocksDB provider.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Msg]
    val q = Sessions.sessionize(in.toDS(), ttl = false, v2 = true)
      .writeStream.format("memory").queryName("turns_v2")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Msg(1, 100, "hello"), Msg(1, 200, "again"), Msg(2, 150, "hi"))
      q.processAllAvailable()
      in.addData(Msg(1, 300, "/reset"))
      q.processAllAvailable()
      in.addData(Msg(1, 400, "fresh"))
      q.processAllAvailable()
      val turns = spark.table("turns_v2").as[Turn].collect().toSeq
      val chat1 = turns.filter(_.chatId == 1).sortBy(t => (t.sessionId, t.turn))
      assert(chat1.map(_.text) == Seq("hello", "again", "fresh"))
      assert(chat1(0).sessionId == "s-1-100" && chat1(1).sessionId == "s-1-100")
      assert(chat1(2).sessionId == "s-1-400" && chat1(2).turn == 1)
      val chat2 = turns.filter(_.chatId == 2)
      assert(chat2.map(t => (t.sessionId, t.turn)) == Seq(("s-2-150", 1)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("state compaction: transcript snapshots+truncates at 80% of budget, turns survive") {
    // The reference's context compaction (agent-loop.sh:428-455,787-800)
    // as keyed state: budget 100 tokens, 40-char messages = 10 tokens
    // each → the 8th message crosses 80 and must shrink the transcript
    // to ONE summary entry while the turn counter keeps counting.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Msg]
    val q = Sessions.sessionizeCompacting(in.toDS(), budgetTokens = 100L)
      .writeStream.format("memory").queryName("compact_turns")
      .outputMode(OutputMode.Append).start()
    try {
      def msg(i: Int) = Msg(1, 100 + i, f"m$i%02d " + "x" * 36) // 40 chars
      in.addData((1 to 12).map(msg): _*)
      q.processAllAvailable()
      val turns = spark.table("compact_turns").as[Sessions.CompactTurn]
        .collect().toSeq.sortBy(_.turn)
      // Turn counting survives compaction: 1..12 with one session id.
      assert(turns.map(_.turn) == (1 to 12), turns.map(_.turn))
      assert(turns.map(_.sessionId).distinct.size == 1)
      // Before the threshold the transcript grows 1:1 with turns…
      assert(turns.take(7).map(t => (t.kept, t.accTokens, t.compacted)) ==
        (1 to 7).map(i => (i, 10L * i, false)))
      // …the 8th message crosses 80/100 tokens: snapshot + truncate.
      val at = turns(7)
      assert(at.compacted && at.kept == 1, at)
      assert(at.accTokens < 80L, s"summary must be smaller than the budget: $at")
      // …and accumulation resumes FROM the summary, not from zero.
      val after = turns.drop(8)
      assert(after.map(_.kept) == Seq(2, 3, 4, 5), after.map(_.kept))
      assert(after.map(_.accTokens) == (1 to 4).map(at.accTokens + 10L * _), after)
      assert(after.forall(!_.compacted))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream join: watermarked interval join matches events to follow-ups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reqs = MemoryStream[(Long, Timestamp)]
    val acks = MemoryStream[(Long, Timestamp)]
    val r = reqs.toDF().toDF("user_id", "req_ts").withWatermark("req_ts", "10 minutes")
    val a = acks.toDF().toDF("ack_user", "ack_ts").withWatermark("ack_ts", "10 minutes")
    val q = r.join(a,
        col("user_id") === col("ack_user") &&
        col("ack_ts") >= col("req_ts") &&
        col("ack_ts") <= col("req_ts") + org.apache.spark.sql.functions.expr("interval 5 minutes"))
      .select(col("user_id"), col("req_ts"), col("ack_ts"))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()
    try {
      reqs.addData((7L, Timestamp.valueOf("2024-01-01 10:00:00")),
                   (8L, Timestamp.valueOf("2024-01-01 10:00:00")))
      acks.addData((7L, Timestamp.valueOf("2024-01-01 10:03:00")),  // within 5m
                   (8L, Timestamp.valueOf("2024-01-01 10:30:00")))  // outside
      q.processAllAvailable()
      val out = spark.table("ss_join").select("user_id").as[Long].collect().toSeq
      assert(out == Seq(7L), s"got $out")
    } finally q.stop()
  }

  test("keyed session state survives a query restart via checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-ckpt").toString
    val in = MemoryStream[Msg]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Turn]
    // foreachBatch supports checkpoint recovery (the memory sink does not).
    def start() = Sessions.sessionize(in.toDS(), ttl = false)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Turn], _: Long) =>
        seen.synchronized { seen ++= batch.collect() }
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    val q1 = start()
    try {
      in.addData(Msg(1, 100, "first"), Msg(1, 200, "second"))
      q1.processAllAvailable()
    } finally q1.stop()
    // Restart from the checkpoint: the chat's session id and turn counter
    // must resume, not reset.
    val q2 = start()
    try {
      in.addData(Msg(1, 300, "third"))
      q2.processAllAvailable()
      val turns = seen.synchronized(seen.filter(_.text == "third").toSeq)
      assert(turns.length == 1)
      assert(turns(0).sessionId == "s-1-100" && turns(0).turn == 3,
        s"state did not survive restart: $turns")
    } finally q2.stop()
  }

  test("chunked sink: foreachBatch splits long payloads with [i/N] labels") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = in.toDF().toDF("user_id", "payload")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= StreamOps.chunkBatch(batch, 50)
          .as[(Long, String)].collect()
        ()
      }
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((7L, "x" * 120), (8L, "short"))
      q.processAllAvailable()
      val byUser = seen.groupBy(_._1)
      assert(byUser(8L).map(_._2) == Seq("short"))
      val chunks = byUser(7L).map(_._2)
      assert(chunks.length == 3 && chunks.head.startsWith("[1/3] "))
      assert(chunks.forall(_.length <= 50))
    } finally q.stop()
  }

  test("fair-scheduler pools: chat query progresses while task pool saturates all cores") {
    // The reference's executor isolation (telegram-agent.py:612-616,
    // tests/test-telegram-agent.py:66-100): a saturated task pool must
    // never starve chat. Spark analogue: two concurrent streaming
    // queries in separate FAIR pools (conf/fairscheduler.xml). Under
    // FIFO the chat batch would park behind all 128 slow task-pool
    // tasks; under FAIR it gets slots as they free (~250 ms).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    assert(spark.sparkContext.getConf.get("spark.scheduler.mode") == "FAIR")
    // stop() interrupts in-flight tasks — swallow so teardown is quiet.
    val slow = udf((x: Long) => {
      try Thread.sleep(250) catch { case _: InterruptedException => () }; x
    })
    val heavyIn = MemoryStream[Long]
    // 128 × 250 ms on 4 cores ≈ 8 s batch — a contention window wide
    // enough that a loaded machine can't finish it before chat lands.
    val heavy = heavyIn.toDF().repartition(128).select(slow(col("value")).as("v"))
    val chatIn = MemoryStream[Long]
    val chat = chatIn.toDF().select((col("value") * 2).as("v"))
    // Scheduler-level evidence, independent of machine speed: record the
    // pool each job ACTUALLY starts under (job-start events carry the
    // submitting thread's local properties — the same ones the fair
    // scheduler reads to route the job).
    val poolsSeen = java.util.Collections.synchronizedSet(
      new java.util.HashSet[String]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val p = js.properties.getProperty("spark.scheduler.pool")
        if (p != null) { poolsSeen.add(p); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val qTask = Pools.inPool(spark, Pools.Task) {
      heavy.writeStream.format("memory").queryName("pool_task")
        .outputMode(OutputMode.Append).start()
    }
    val qChat = Pools.inPool(spark, Pools.Chat) {
      chat.writeStream.format("memory").queryName("pool_chat")
        .outputMode(OutputMode.Append).start()
    }
    try {
      heavyIn.addData(0L until 128L: _*)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!qTask.status.isTriggerActive && System.nanoTime() < deadline)
        Thread.sleep(20)
      Thread.sleep(300) // let the heavy batch's tasks occupy the cores
      val t0 = System.nanoTime()
      chatIn.addData(1L, 2L, 3L)
      qChat.processAllAvailable()
      val chatSecs = (System.nanoTime() - t0) / 1e9
      val heavyStillRunning = qTask.status.isTriggerActive ||
        !qTask.recentProgress.exists(_.numInputRows > 0)
      // Correctness evidence first (unconditional): chat delivered, and
      // both queries' jobs were routed to their declared pools.
      assert(spark.table("pool_chat").count() == 3)
      val busDeadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!(poolsSeen.contains(Pools.Chat) && poolsSeen.contains(Pools.Task))
          && System.nanoTime() < busDeadline)
        Thread.sleep(20) // listener bus is async — poll, don't assume
      assert(poolsSeen.contains(Pools.Chat) && poolsSeen.contains(Pools.Task),
        s"jobs not routed through declared pools; saw: $poolsSeen")
      // Wall-clock evidence is only meaningful while the heavy batch is
      // still mid-flight. On a machine loaded enough to have finished it
      // already, CANCEL this half (scalatest `assume`) rather than fail —
      // the pool-routing assertions above have already run either way.
      assume(heavyStillRunning,
        "heavy batch finished before chat landed — contention window " +
        "missed on this machine; wall-clock half skipped")
      // Chat completed without waiting out the task backlog (FIFO would
      // hold it ~8 s; FAIR lands it in well under half).
      assert(chatSecs < 4.0, f"chat took $chatSecs%.1f s under task-pool saturation")
    } finally {
      qTask.stop(); qChat.stop()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("streaming funnel: incremental depth equals the batch funnel, both window settings") {
    funnelScenario(v2 = false)
  }

  test("streaming funnel v2 (transformWithState): same depth advances, both window settings") {
    // The arbitrary-state-v2 port (round-18) must be observably
    // identical on the FULL scenario — both APIs delegate to
    // FunnelStream.fold, and this pin keeps the delegation honest.
    withRocksDB { funnelScenario(v2 = true) }
  }

  private def funnelScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.FunnelStream.{Ev, DepthAdvance}
    val W = graft.operators.Events.FunnelWindowNs
    val tag = if (v2) "_v2" else ""
    // u1 completes; u2's click is one ns outside the window (windowed
    // depth 1, unwindowed 2); u3 never starts; u4 skips a stage.
    val batch1 = Seq(
      Ev(1, 0, 1, "view"), Ev(1, 10, 2, "click"),
      Ev(2, 0, 5, "view"),
      Ev(3, 0, 7, "click"),
      Ev(4, 0, 8, "view"))
    val batch2 = Seq(
      Ev(1, 20, 3, "signup"), Ev(1, 30, 4, "purchase"),
      Ev(2, W + 1L, 6, "click"),
      Ev(4, 40, 9, "purchase"))
    for ((windowNs, name0) <- Seq((Long.MaxValue, "adv_unwin"), (W, "adv_win"))) {
      val name = name0 + tag
      val in = MemoryStream[Ev]
      val q = FunnelStream.funnelDepthStream(in.toDS(), windowNs, v2 = v2)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        in.addData(batch1: _*); q.processAllAvailable()
        in.addData(batch2: _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(name).as[DepthAdvance].collect()
        .groupBy(_.userId).map { case (u, as) => u -> as.map(_.depth).max }
      val all = (batch1 ++ batch2)
        .map(e => (e.eventId, e.userId, e.tsNs, e.eventType))
        .toDF("event_id", "user_id", "ts_ns", "event_type")
      val batchDepth = (if (windowNs == W)
          graft.operators.Events.funnelDepthWindowed(all)
        else graft.operators.Events.funnelDepth(all))
        .collect().map(r => r.getLong(0) -> r.getInt(1))
        .filter(_._2 > 0).toMap
      assert(streamed == batchDepth, s"$name: $streamed vs $batchDepth")
    }
  }

  test("streaming active users: first-activity rows equal the batch distinct (user, day) frame") {
    activeScenario(v2 = false)
  }

  test("streaming active users v2 (transformWithState): same first-activity feed, batch equality") {
    withRocksDB { activeScenario(v2 = true) }
  }

  private def activeScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.ActiveStream.{Ev, UserDay}
    val D = graft.operators.Events.DayNs
    val tag = if (v2) "_v2" else ""
    // u1 active days 0,1,2 with a SAME-DAY repeat inside batch 1 and a
    // cross-batch same-day repeat (day 2 closes batch 1, repeats in
    // batch 2: state must suppress it). u2 skips days (0 then 3). u3
    // appears only in batch 2.
    val batch1 = Seq(Ev(1L, 10L), Ev(1L, 20L), Ev(1L, D + 5L),
      Ev(1L, 2L * D + 1L), Ev(2L, 7L))
    val batch2 = Seq(Ev(1L, 2L * D + 99L), Ev(2L, 3L * D + 2L), Ev(3L, D + 3L))
    val in = MemoryStream[Ev]
    val q = ActiveStream.userDayStream(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("user_days" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("user_days" + tag).as[UserDay].collect()
      .map(u => (u.userId, u.day)).sorted.toList
    // EXACTLY the batch ud frame — each pair once, repeats suppressed.
    assert(streamed == List((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L),
      (2L, 3L), (3L, 1L)), s"$streamed")
    // And the batch DAU key over the same events reconciles: counting
    // the streamed first-activity rows per day IS the dau column.
    val all = (batch1 ++ batch2).map(e => (e.tsNs, e.userId))
      .toDF("ts_ns", "user_id")
    val batchDau = graft.operators.Events.eventsActiveUsers(all)
      .select("day", "dau").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    val streamedDau = streamed.groupBy(_._2).view
      .mapValues(_.size.toLong).toList.map { case (d, n) => (d, n) }.sorted
    assert(streamedDau == batchDau, s"$streamedDau vs $batchDau")
    // The feed is a SUFFICIENT STATISTIC for the stickiness key too:
    // re-materializing one event per streamed (user, day) and running
    // the batch rollup reproduces q_events_stickiness over the raw
    // events row-for-row (DAU/MAU30 depend only on the distinct
    // user-day frame the stream delivers).
    val fromFeed = streamed.map { case (u, d) => (d * D + 1L, u) }
      .toDF("ts_ns", "user_id")
    val viaFeed = graft.operators.Events.eventsStickiness(fromFeed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    val direct = graft.operators.Events.eventsStickiness(all)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(viaFeed == direct, s"$viaFeed vs $direct")
  }

  test("streaming attribution: late earlier event re-attributes; final states equal the batch key") {
    attributionScenario(v2 = false)
  }

  test("streaming attribution v2 (transformWithState): same correction log, batch equality") {
    withRocksDB { attributionScenario(v2 = true) }
  }

  private def attributionScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.AttributionStream.{Ev, Touch}
    val tag = if (v2) "_v2" else ""
    // u1 converts after a view first touch; u2 never converts; u3's
    // batch-2 event is EARLIER than its batch-1 one (cross-batch
    // out-of-order) — the running minimum must re-attribute u3 from
    // 'click' to 'signup' and the change log must show the correction.
    val batch1 = Seq(Ev(1L, 10L, 1L, "view"), Ev(1L, 20L, 2L, "purchase"),
      Ev(2L, 10L, 3L, "view"), Ev(3L, 50L, 4L, "click"))
    val batch2 = Seq(Ev(3L, 5L, 5L, "signup"), Ev(2L, 30L, 6L, "click"))
    val in = MemoryStream[Ev]
    val q = AttributionStream.firstTouchStream(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("attribution_touches" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val touches = spark.table("attribution_touches" + tag).as[Touch].collect().toList
    // u3's correction is IN the log (click first, then signup)…
    assert(touches.count(_.userId == 3L) == 2, s"$touches")
    assert(touches.filter(_.userId == 3L).map(_.firstType)
      .contains("signup"), s"$touches")
    // u2's batch-2 'click' changes nothing (later ts, no conversion):
    // exactly one u2 row ever emitted.
    assert(touches.count(_.userId == 2L) == 1, s"$touches")
    // Last touch per user == the batch per-user frame; rolled up it
    // reconciles with q_events_attribution over the same events.
    val last = touches.zipWithIndex.groupBy(_._1.userId).view
      .mapValues(_.maxBy(_._2)._1).values
      .map(t => (t.firstType, t.converted)).toList
    val streamedRollup = last.groupBy(_._1).view.mapValues(ts =>
      (ts.size.toLong, ts.count(_._2).toLong)).toMap
    val all = (batch1 ++ batch2)
      .map(e => (e.eventId, e.userId, e.tsNs, e.eventType))
      .toDF("event_id", "user_id", "ts_ns", "event_type")
    val batchRollup = graft.operators.Events.eventsAttribution(all)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(streamedRollup == batchRollup, s"$streamedRollup vs $batchRollup")
  }

  test("streaming volume anomaly: closed days equal the batch k-sigma flags; late events ignored") {
    anomalyScenario(v2 = false)
  }

  test("streaming volume anomaly v2 (transformWithState): same closed-day flags, late guard") {
    withRocksDB { anomalyScenario(v2 = true) }
  }

  private def anomalyScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.AnomalyStream.{Ev, AnomalyFlag}
    val D = graft.operators.Events.DayNs
    val tag = if (v2) "_v2" else ""
    def evs(tp: String, counts: Seq[Int]): Seq[Ev] =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i => Ev(tp, d.toLong * D + i))
      }
    // "anm": trailing 1..7 then an 11-count day (anomaly), closed by a
    // day-8 event. The micro-batch split lands mid-stream so the
    // trailing window must survive state. "zvm": zero-variance window,
    // at-mean day — closed, NOT an anomaly.
    val batch1 = evs("anm", Seq(1, 2, 3, 4, 5)) ++ evs("zvm", Seq(3, 3, 3, 3))
    val batch2 = (evs("anm", Seq(0, 0, 0, 0, 0, 6, 7, 11)) :+ Ev("anm", 8L * D)) ++
      evs("zvm", Seq(0, 0, 0, 0, 3, 3, 3, 3)) :+ Ev("zvm", 8L * D) :+
      Ev("anm", 2L * D + 999L) // late event for closed day 2: must be ignored
    val in = MemoryStream[Ev]
    val q = AnomalyStream.anomalyFlagStream(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("anomaly_flags" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("anomaly_flags" + tag).as[AnomalyFlag].collect()
      .map(f => (f.eventType, f.day, f.n, f.dev2, f.bound, f.isAnomaly))
      .sortBy(t => (t._1, t._2)).toList
    // Batch twin over the SAME events, minus each type's still-open
    // newest day (the only row the stream has not yet closed) and
    // minus the ignored late event.
    val all = (batch1 ++ batch2)
      .filterNot(e => e.eventType == "anm" && e.tsNs == 2L * D + 999L)
      .map(e => (e.tsNs, e.eventType)).toDF("ts_ns", "event_type")
    val batchRows = graft.operators.Events.eventsAnomaly(all)
      .withColumn("maxd", max(col("day")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .filter(col("day") < col("maxd"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5)))
      .sortBy(t => (t._1, t._2)).toList
    assert(streamed == batchRows, s"$streamed vs $batchRows")
    // The anomaly day itself is in the closed set and flagged.
    assert(streamed.contains(("anm", 7L, 11L, 2401L, 1764L, 1)), s"$streamed")
    assert(streamed.exists(t => t._1 == "zvm" && t._6 == 0), s"$streamed")
  }

  /** Aggregate a streamed (day, kind) growth feed to the batch growth
    * frame shape (one row per day, four zero-filled class counts). */
  private def growthFrameOf(rows: Seq[(Long, String)])
      : List[(Long, Long, Long, Long, Long)] = {
    val agg = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.map(_._1).distinct.sorted.map { d =>
      (d, agg.getOrElse((d, "new"), 0L), agg.getOrElse((d, "retained"), 0L),
        agg.getOrElse((d, "resurrected"), 0L),
        agg.getOrElse((d, "churned"), 0L))
    }.toList
  }

  test("streaming growth: classification + gap-churn rows aggregate to the batch growth frame") {
    growthScenario(v2 = false)
  }

  test("streaming growth v2 (transformWithState): same classification feed, batch equality") {
    withRocksDB { growthScenario(v2 = true) }
  }

  private def growthScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.GrowthStream.{Ev, GrowthEv}
    val D = graft.operators.Events.DayNs
    val tag = if (v2) "_v2" else ""
    // u1 {0,1,3}, u2 {0,2,3}, u3 {1,2,3}, u4 {3}: every gap closes
    // before the window ends and every user's last day is the global
    // max, so the stream's return-gap churn covers ALL batch churn
    // (the dormant-user asymmetry is documented in GrowthStream's
    // Scaladoc and exercised nowhere here by construction). The
    // micro-batch split lands mid-stream; batch 2 carries a same-day
    // repeat for u3's day 1 that state must suppress.
    val batch1 = Seq(Ev(1L, 1L), Ev(1L, D + 1L), Ev(2L, 2L), Ev(3L, D + 2L))
    val batch2 = Seq(Ev(3L, D + 50L), // cross-batch same-day repeat
      Ev(1L, 3L * D + 1L), Ev(2L, 2L * D + 2L), Ev(2L, 3L * D + 2L),
      Ev(3L, 2L * D + 3L), Ev(3L, 3L * D + 3L), Ev(4L, 3L * D + 4L))
    val in = MemoryStream[Ev]
    val q = GrowthStream.growthStream(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("growth_rows" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = growthFrameOf(spark.table("growth_rows" + tag).as[GrowthEv]
      .collect().map(g => (g.day, g.kind)).toSeq)
    val all = (batch1 ++ batch2).map(e => (e.tsNs, e.userId))
      .toDF("ts_ns", "user_id")
    val batch = graft.operators.Events.eventsGrowth(all).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(streamed == batch, s"$streamed vs $batch")
  }

  test("streaming growth: an all-quiet day's churn row arrives on the user's return") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.GrowthStream.{Ev, GrowthEv}
    val D = graft.operators.Events.DayNs
    // One user active {0, 2}: day 1 has ZERO active users; the stream
    // emits its churn row when the user resurrects — matching the
    // batch key's full-outer dead-day frame (round-14 advice fix).
    val in = MemoryStream[Ev]
    val q = GrowthStream.growthStream(in.toDS())
      .writeStream.format("memory").queryName("growth_dead_day")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Ev(1L, 5L), Ev(1L, 2L * D + 5L)); q.processAllAvailable()
    } finally q.stop()
    val streamed = growthFrameOf(spark.table("growth_dead_day")
      .as[GrowthEv].collect().map(g => (g.day, g.kind)).toSeq)
    val batch = graft.operators.Events.eventsGrowth(
      Seq((5L, 1L), (2L * D + 5L, 1L)).toDF("ts_ns", "user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(streamed == List((0L, 1L, 0L, 0L, 0L),
      (1L, 0L, 0L, 0L, 1L), (2L, 0L, 0L, 1L, 0L)), s"$streamed")
    assert(streamed == batch, s"$streamed vs $batch")
  }

  test("streaming growth: per-user last-day state survives a query restart via checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.GrowthStream.{Ev, GrowthEv}
    val D = graft.operators.Events.DayNs
    val ckpt = java.nio.file.Files.createTempDirectory("graft-growth-ckpt").toString
    val in = MemoryStream[Ev]
    val seen = scala.collection.mutable.ArrayBuffer.empty[GrowthEv]
    def start() = GrowthStream.growthStream(in.toDS())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[GrowthEv], _: Long) =>
        seen.synchronized { seen ++= batch.collect() }
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    val q1 = start()
    try {
      in.addData(Ev(1L, 5L)); q1.processAllAvailable() // new@0
    } finally q1.stop()
    // Restart: day 2 must classify against the CHECKPOINTED last day
    // (0) — churn@1 + resurrected@2, not a fresh "new".
    val q2 = start()
    try {
      in.addData(Ev(1L, 2L * D + 5L)); q2.processAllAvailable()
      val after = seen.synchronized(
        seen.filter(g => !(g.day == 0L && g.kind == "new")).toList)
        .map(g => (g.day, g.kind)).sorted
      assert(after == List((1L, "churned"), (2L, "resurrected")),
        s"state did not survive restart: $after")
    } finally q2.stop()
  }

  test("streaming dow counters: running counts equal the batch profile; late events are correct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val D = graft.operators.Events.DayNs
    // Epoch day 0 was a Thursday: (day+4)%7 -> day0=4, day1=5, day2=6,
    // day8=5. Batch 2 delivers a LATE day-0 event — dow counters have
    // no closing semantics, so it lands correctly, not ignored.
    val b1 = Seq((1L, "a"), (D + 2L, "a"), (8L * D + 3L, "b"))
    val b2 = Seq((2L * D + 9L, "a"), (7L, "a"), (D + 8L, "b"))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.DowStream.dowCounts(
        in.toDS().toDF("ts_ns", "event_type"))
      .writeStream.format("memory").queryName("dow_counts")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val counts = spark.table("dow_counts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // Stateless downstream share derivation over the final counts...
    val tot = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val derived = counts.map { case (t, dw, n) =>
      (t, dw.toInt, n, n * 10000L / tot(t)) }.sortBy(x => (x._1, x._2)).toList
    // ...equals the batch profile key over the same events verbatim.
    val batch = graft.operators.Events.eventsDowProfile(
      (b1 ++ b2).toDF("ts_ns", "event_type")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(derived == batch, s"$derived vs $batch")
  }

  test("streaming sessionization: closed sessions equal the batch key across a mid-session split; late guard") {
    sessionizationScenario(v2 = false)
  }

  test("streaming sessionization v2 (transformWithState): same closed sessions, batch equality, late guard") {
    // The arbitrary-state-v2 port (round-17) must be observably
    // identical to the flatMapGroupsWithState path on the FULL
    // scenario — both APIs delegate to SessionStream.fold, and this
    // pin is what keeps that delegation honest. Requires RocksDB.
    withRocksDB { sessionizationScenario(v2 = true) }
  }

  private def sessionizationScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SessionStream.{Ev, Sess}
    val tag = if (v2) "_v2" else ""
    val G = graft.operators.Events.SessionGapNs
    // u1: session A (3 events) SPLIT MID-SESSION across the batch
    // boundary, then session B (1 event) after a gap — only A closes.
    // u2: one session whose second event lands EXACTLY at the gap
    // threshold (stays in-session — the batch boundary rule), then a
    // beyond-gap event opens session 2.
    // u3: a LATE batch-2 event PREDATING its open session — ignored.
    val batch1 = Seq(Ev(1L, 100L, 1L), Ev(1L, 200L, 2L),
      Ev(2L, 50L, 3L), Ev(3L, 2L * G, 4L))
    val batch2 = Seq(Ev(1L, 300L, 5L), Ev(1L, 300L + G + 1L, 6L),
      Ev(2L, 50L + G, 7L), Ev(2L, 50L + 2L * G + 1L, 8L),
      Ev(3L, G, 9L)) // u3's late event: before its open session's start
    val in = MemoryStream[Ev]
    val q = SessionStream.sessionStream(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("closed_sessions" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val closed = spark.table("closed_sessions" + tag).as[Sess].collect()
      .map(s => (s.userId, s.nEvents, s.durNs)).sorted.toList
    // u1's session A: 3 events across the split, duration 200 ns; u2's
    // session 1: 2 events G apart (the at-threshold event stayed).
    // u3's late event emitted nothing. Open sessions (u1 B, u2 #2,
    // u3's) are not yet knowable — absent.
    assert(closed == List((1L, 3L, 200L), (2L, 2L, G)), s"$closed")
    // Batch reconciliation: streamed closed sessions == the batch
    // per-user session frame MINUS each user's LAST (still-open)
    // session, computed over the same events (late u3 event excluded —
    // the documented omission the guard case pins).
    val batchable = (batch1 ++ batch2).filterNot(e => e.eventId == 9L)
      .map(e => (e.userId, e.tsNs, e.eventId))
      .toDF("user_id", "ts_ns", "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy("ts_ns", "event_id")
    val perSess = batchable
      .withColumn("gap", col("ts_ns") - lag(col("ts_ns"), 1).over(w))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > G, 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(w))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n"),
        (max(col("ts_ns")) - min(col("ts_ns"))).as("dur"))
    val lastSess = perSess.groupBy("user_id")
      .agg(max(col("sess")).as("last_sess"))
    val batchSessions = perSess.join(lastSess, Seq("user_id"))
      .filter(col("sess") < col("last_sess"))
      .select("user_id", "n", "dur").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toList
    assert(closed == batchSessions, s"$closed vs $batchSessions")
    // DRAIN: one beyond-gap closer per user flushes the open sessions;
    // the report rollup over ALL streamed rows then equals the batch
    // key q_events_sessions over the same (closer-free) events exactly
    // — the session feed is a sufficient statistic for the key.
    val in2 = MemoryStream[Ev]
    val q2 = SessionStream.sessionStream(in2.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("closed_sessions2" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in2.addData(batch1: _*); q2.processAllAvailable()
      in2.addData(batch2: _*); q2.processAllAvailable()
      in2.addData(Seq(1L, 2L, 3L).map(u =>
        Ev(u, 100L * G, 1000L + u)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val drained = SessionStream.report(
      spark.table("closed_sessions2" + tag))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    val batchKey = graft.operators.Events.eventsSessions(batchable)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(drained == batchKey, s"$drained vs $batchKey")
  }

  test("streaming sessionization v2 TTL: an idle open session expires; the next event opens a fresh one") {
    // The TTL arm of SessProcessor (TimeMode.ProcessingTime + per-state
    // TTLConfig), exercised end to end (round-18 advice): an open
    // session whose user goes quiet past the TTL reads as ABSENT — it
    // is silently dropped, never emitted as closed — and the next
    // event opens a FRESH session instead of extending the expired
    // one. Requires RocksDB (every transformWithState path).
    withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.SessionStream.{Ev, Sess}
      val G = graft.operators.Events.SessionGapNs
      val in = MemoryStream[Ev]
      // NOTE processAllAvailable is UNUSABLE under TimeMode
      // .ProcessingTime: the engine keeps running (empty) batches to
      // advance the TTL clock, so "all available processed" never
      // latches — the test polls consumed-input progress instead, and
      // the TTL (10 s — wide enough that a CI stall or GC pause
      // between the post-idle micro-batches cannot expire the FRESH
      // session; round-19 flake-margin fix) is far above the poll
      // cadence so only the DELIBERATE idle (15 s) ever expires state.
      val q = SessionStream.sessionStream(in.toDS(), v2 = true,
          ttl = Some(java.time.Duration.ofSeconds(10)))
        .writeStream.format("memory").queryName("ttl_sessions")
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("50 milliseconds"))
        .start()
      // Await the MemoryStream's committed offset (0-BASED, one per
      // addData call: the first batch ends at offset 0) — MONOTONE, so
      // immune to recentProgress's bounded-buffer eviction under the
      // fast empty-batch cadence.
      def awaitOffset(k: Long): Unit = {
        val deadline = System.currentTimeMillis() + 60000L
        def cur(): Long = {
          val p = q.lastProgress
          if (p == null || p.sources.isEmpty || p.sources(0).endOffset == null)
            Long.MinValue
          else {
            val digits = p.sources(0).endOffset.replaceAll("[^-0-9]", "")
            if (digits.isEmpty || digits == "-") Long.MinValue else digits.toLong
          }
        }
        while (cur() < k && System.currentTimeMillis() < deadline)
          Thread.sleep(50L)
        assert(cur() >= k, s"stream never reached offset $k")
      }
      try {
        // Open a 2-event session (event-time duration 100 ns).
        in.addData(Ev(1L, 100L, 1L), Ev(1L, 200L, 2L))
        awaitOffset(0L)
        // Idle past the TTL in PROCESSING time (generous margin — the
        // running empty batches advance the expiry clock).
        Thread.sleep(15000L)
        // IN-GAP event (event-time gap 100 ns ≪ G): with live state it
        // would extend the open session to 3 events; after expiry the
        // state reads absent, so this OPENS a fresh 1-event session.
        in.addData(Ev(1L, 300L, 3L)); awaitOffset(1L)
        // Beyond-gap closer, added well inside the fresh session's TTL:
        // emits whatever session is open NOW.
        in.addData(Ev(1L, 300L + G + 1L, 4L)); awaitOffset(2L)
        val deadline = System.currentTimeMillis() + 60000L
        while (spark.table("ttl_sessions").count() < 1 &&
               System.currentTimeMillis() < deadline)
          Thread.sleep(50L)
      } finally q.stop()
      val closed = spark.table("ttl_sessions").as[Sess].collect()
        .map(s => (s.userId, s.nEvents, s.durNs)).sorted.toList
      // Without expiry the closer would emit the extended (1, 3, 200)
      // session; with it, the expired session is ABSENT (dropped, per
      // the documented TTL contract) and the closer emits the fresh
      // single-event session opened at ts 300.
      assert(closed == List((1L, 1L, 0L)), s"$closed")
    }
  }

  test("streaming transitions: paths/markov/markov2/dwell off the pair feed equal the batch keys") {
    transitionsScenario(v2 = false)
  }

  test("streaming transitions v2 (transformWithState): same feed, same batch equality") {
    // The arbitrary-state-v2 port must be observably identical on the
    // FULL scenario — both APIs delegate to TransitionStream.fold.
    // Requires RocksDB.
    withRocksDB { transitionsScenario(v2 = true) }
  }

  private def transitionsScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.TransitionStream.{Ev, Trans}
    val tag = if (v2) "_v2" else ""
    // u1's five events SPLIT MID-CHAIN across the batch boundary (the
    // (click,view) two-event context spans it — state must carry
    // prev2); u2 contributes a competing (view -> purchase) edge and a
    // repeated (view -> click) so the modal counts have real ties to
    // break; u3's batch-2 event is LATE (before its stored last ts) —
    // ignored, pinned by omission.
    val batch1 = Seq(
      Ev(1L, 10L, 1L, "view"), Ev(1L, 25L, 2L, "click"),
      Ev(1L, 47L, 3L, "view"),
      Ev(2L, 5L, 4L, "view"), Ev(2L, 9L, 5L, "click"),
      Ev(3L, 100L, 6L, "view"), Ev(3L, 200L, 7L, "click"))
    val batch2 = Seq(
      Ev(1L, 60L, 8L, "purchase"), Ev(1L, 90L, 9L, "view"),
      Ev(2L, 30L, 10L, "view"), Ev(2L, 42L, 11L, "click"),
      Ev(3L, 150L, 12L, "signup"), // late: before u3's last ts 200
      // u4's single event: a type that only ever appears as a FIRST
      // event — in pagerank's node set, in no transition pair.
      Ev(4L, 10L, 13L, "landing"))
    val in = MemoryStream[Ev]
    val q = TransitionStream.transitionStream(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("transitions" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val feed = spark.table("transitions" + tag)
    // u3: one first-event row (null prev) + one transition; the LATE
    // event emitted nothing.
    val u3rows = feed.as[Trans].collect().filter(_.userId == 3L)
    assert(u3rows.length == 2 && u3rows.count(_.prevType == null) == 1,
      s"${u3rows.toList}")
    // Batch keys over the SAME events minus the late one (the
    // documented omission).
    val all = (batch1 ++ batch2).filterNot(_.eventId == 12L)
      .map(e => (e.eventId, e.userId, e.tsNs, e.eventType))
      .toDF("event_id", "user_id", "ts_ns", "event_type")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toList
    assert(rows(TransitionStream.pathsOf(feed)) ==
      rows(graft.operators.Events.eventsPaths(all)))
    assert(rows(TransitionStream.markovOf(feed)) ==
      rows(graft.operators.Events.eventsMarkov(all)))
    assert(rows(TransitionStream.markov2Of(feed)) ==
      rows(graft.operators.Events.eventsMarkov2(all)))
    assert(rows(TransitionStream.dwellOf(feed)) ==
      rows(graft.operators.Events.eventsDwell(all)))
    assert(rows(TransitionStream.markovGainOf(feed)) ==
      rows(graft.operators.Events.eventsMarkovGain(all)))
    // Pagerank rides the null-INCLUSIVE pair frame: the first-event
    // rows keep first-event-only types in the node set, so the fixed
    // point over the feed equals the batch key exactly.
    assert(rows(TransitionStream.pagerankOf(feed)) ==
      rows(graft.operators.Events.eventsPageRank(all)))
    assert(rows(TransitionStream.pagerankOf(feed))
      .exists(_.head == "landing"),
      "a first-event-only type must be in the node set")
    // The two-event context really crossed the split: u1's
    // (click, view) -> purchase row exists with prev2 from batch 1.
    assert(feed.as[Trans].collect().exists(t =>
      t.userId == 1L && t.prev2 == "click" && t.prevType == "view" &&
        t.eventType == "purchase" && t.gapNs == 13L))
  }

  test("streaming type feed: affinity off the first-occurrence rows equals the batch key") {
    typeScenario(v2 = false)
  }

  test("streaming type feed v2 (transformWithState): same first-occurrence feed, affinity equality") {
    withRocksDB { typeScenario(v2 = true) }
  }

  private def typeScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.TypeStream.{Ev, UserType}
    val tag = if (v2) "_v2" else ""
    // u1 sees view/click in batch 1 and repeats BOTH across the batch
    // boundary (suppression must survive state) before adding signup;
    // u2 shares only view; u3 (batch 2 only) shares click+signup with
    // u1 — co-occurrence without co-timing, which is the point of the
    // distinct-set semantics.
    val batch1 = Seq(Ev(1L, "view"), Ev(1L, "click"), Ev(1L, "view"),
      Ev(2L, "view"))
    val batch2 = Seq(Ev(1L, "click"), Ev(1L, "signup"), Ev(2L, "view"),
      Ev(3L, "click"), Ev(3L, "signup"))
    val in = MemoryStream[Ev]
    val q = TypeStream.userTypeStream(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("user_types" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val feed = spark.table("user_types" + tag)
    // Exactly the distinct (user, type) frame — repeats suppressed
    // within AND across batches.
    assert(feed.as[UserType].collect().map(u => (u.userId, u.eventType))
      .sorted.toList == List((1L, "click"), (1L, "signup"), (1L, "view"),
      (2L, "view"), (3L, "click"), (3L, "signup")))
    val all = (batch1 ++ batch2).zipWithIndex
      .map { case (e, i) => (i.toLong, e.userId, i.toLong * 1000L, e.eventType) }
      .toDF("event_id", "user_id", "ts_ns", "event_type")
    val viaFeed = TypeStream.affinityOf(feed).collect().map(_.toSeq).toList
    val direct = graft.operators.Events.eventsAffinity(all)
      .collect().map(_.toSeq).toList
    assert(viaFeed == direct, s"$viaFeed vs $direct")
    assert(viaFeed.nonEmpty)
  }

  test("streaming bot screen: verdict log is monotone; last verdict equals the batch key") {
    botScenario(v2 = false)
  }

  test("streaming bot screen v2 (transformWithState): same verdict log, batch equality") {
    withRocksDB { botScenario(v2 = true) }
  }

  private def botScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.BotStream.{Ev, Verdict}
    val D = graft.operators.Events.DayNs
    val tag = if (v2) "_v2" else ""
    val G = graft.operators.Events.BotMinGapNs
    val cap = graft.operators.Events.BotDayCap.toInt
    // u1: exactly BotDayCap events on one day (NOT a bot — strict >),
    // spread G ns apart (gap boundary: exactly the threshold is NOT a
    // bot). u2: crosses the day cap with its (cap+1)th event — the
    // flip lands mid-batch-2. u3: human volume but ONE sub-threshold
    // gap that spans the batch boundary (state must carry lastTs).
    val u1 = (0 until cap).map(i => Ev(1L, i.toLong * G, 100L + i))
    val u2a = (0 until cap).map(i => Ev(2L, i.toLong * G, 200L + i))
    val u2b = Seq(Ev(2L, cap.toLong * G, 200L + cap))
    val u3a = Seq(Ev(3L, 0L, 300L))
    val u3b = Seq(Ev(3L, G - 1L, 301L))
    val in = MemoryStream[Ev]
    val q = BotStream.botStream(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("bot_verdicts" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(u1 ++ u2a ++ u3a: _*); q.processAllAvailable()
      in.addData(u2b ++ u3b: _*); q.processAllAvailable()
    } finally q.stop()
    val log = spark.table("bot_verdicts" + tag).as[Verdict].collect().toList
    // Monotone: at most two rows per user, never bot -> human.
    assert(log.groupBy(_.userId).forall { case (_, vs) =>
      vs.map(_.isBot) == vs.map(_.isBot).sorted && vs.size <= 2 })
    val last = log.zipWithIndex.groupBy(_._1.userId).view
      .mapValues(_.maxBy(_._2)._1.isBot).toMap
    val all = (u1 ++ u2a ++ u2b ++ u3a ++ u3b)
      .map(e => (e.eventId, e.userId, e.tsNs))
      .toDF("event_id", "user_id", "ts_ns")
    val batch = graft.operators.Events.eventsBots(all).collect()
      .map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(last == batch, s"$last vs $batch")
    // The fixture exercised both flips: u2 by volume, u3 by cadence.
    assert(last == Map(1L -> 0, 2L -> 1, 3L -> 1), s"$last")
  }

  test("streaming cohort twins: retention and stickiness off the active feed equal the batch keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.ActiveStream.{Ev, UserDay}
    val D = graft.operators.Events.DayNs
    // Three users across four weeks with gaps, same-day repeats, and a
    // user who appears only in batch 2 — enough cohort structure that
    // retention has multiple (cohort, offset) rows and stickiness a
    // moving MAU30.
    val batch1 = Seq(
      Ev(1L, 1L), Ev(1L, 3L * D + 5L), Ev(1L, 3L * D + 9L),
      Ev(2L, 7L * D + 2L), Ev(2L, 8L * D + 1L))
    val batch2 = Seq(
      Ev(1L, 14L * D + 4L), Ev(2L, 21L * D + 3L),
      Ev(3L, 9L * D + 8L), Ev(3L, 23L * D + 6L))
    val in = MemoryStream[Ev]
    val q = ActiveStream.userDayStream(in.toDS())
      .writeStream.format("memory").queryName("cohort_feed")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val feed = spark.table("cohort_feed")
    val all = (batch1 ++ batch2).map(e => (e.tsNs, e.userId))
      .toDF("ts_ns", "user_id")
    val retStream = CohortStream.retentionOf(feed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val retBatch = graft.operators.Events.eventsRetention(all).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(retStream == retBatch, s"$retStream vs $retBatch")
    assert(retStream.size > 3, s"fixture too thin: $retStream")
    val stStream = CohortStream.stickinessOf(feed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    val stBatch = graft.operators.Events.eventsStickiness(all).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(stStream == stBatch, s"$stStream vs $stBatch")
  }
}
