package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.Guards._

class GuardsSpec extends SparkSpec {

  test("in-flight guard: busy chat rejects work until done, chats isolated") {
    guardScenario(v2 = false)
  }

  test("in-flight guard v2 (transformWithState): same decisions") {
    withRocksDB { guardScenario(v2 = true) }
  }

  private def guardScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tag = if (v2) "_v2" else ""
    val in = MemoryStream[Work]
    val q = Guards.inFlight(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("guard" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Work(1, 1, "msg"), Work(1, 2, "msg"), Work(2, 3, "msg"))
      q.processAllAvailable()
      in.addData(Work(1, 4, "done"), Work(1, 5, "msg"))
      q.processAllAvailable()
      val out = spark.table("guard" + tag).as[Decision].collect()
        .map(d => d.seq -> d.accepted).toMap
      // seq 1 accepted; seq 2 rejected (chat 1 busy); chat 2 unaffected;
      // after done, seq 5 accepted again.
      assert(out == Map(1L -> true, 2L -> false, 3L -> true, 5L -> true))
    } finally q.stop()
  }

  test("in-flight guard v2 TTL: an expired busy bit reads idle — the next message is re-admitted") {
    // The guard's crash-recovery semantics (the inFlight scaladoc),
    // exercised end to end on RocksDB — the engine's SECOND TTL expiry
    // witness (round-19; SessionStream's is the first): a chat whose
    // in-flight work died with its worker (no `done` ever arrives)
    // must not stay locked forever — past the TTL the busy bit reads
    // ABSENT and new work is accepted again. Unlike the skip-write
    // twins, guardFold always returns Some(state), so every touched
    // batch refreshes the TTL clock: only TRUE idleness expires.
    withRocksDB {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Work]
      // TTL 10 s with a 15 s deliberate idle — the SessionStream TTL
      // test's flake margins (a CI stall between post-idle batches must
      // not expire the refreshed bit). processAllAvailable never
      // latches under TimeMode.ProcessingTime (empty batches keep
      // advancing the TTL clock) — poll the 0-based source offset.
      val q = Guards.inFlight(in.toDS(), v2 = true,
          ttl = Some(java.time.Duration.ofSeconds(10)))
        .writeStream.format("memory").queryName("guard_ttl")
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("50 milliseconds"))
        .start()
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
        // Take the lock; the worker then "dies" — no done ever arrives.
        in.addData(Work(1, 1, "msg")); awaitOffset(0L)
        // Sanity within the TTL: the bit is live, work is rejected.
        in.addData(Work(1, 2, "msg")); awaitOffset(1L)
        // Idle past the TTL in processing time.
        Thread.sleep(15000L)
        // With live state this would be rejected; after expiry the bit
        // reads idle and the chat is RE-ADMITTED.
        in.addData(Work(1, 3, "msg")); awaitOffset(2L)
        val deadline = System.currentTimeMillis() + 60000L
        while (spark.table("guard_ttl").count() < 3 &&
               System.currentTimeMillis() < deadline)
          Thread.sleep(50L)
      } finally q.stop()
      val out = spark.table("guard_ttl").as[Decision].collect()
        .map(d => d.seq -> d.accepted).toMap
      assert(out == Map(1L -> true, 2L -> false, 3L -> true), s"$out")
    }
  }

  test("compaction fires at 80% of the context window and resets state") {
    compactionScenario(v2 = false)
  }

  test("compaction v2 (transformWithState): same accumulator, same reset") {
    withRocksDB { compactionScenario(v2 = true) }
  }

  private def compactionScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tag = if (v2) "_v2" else ""
    val in = MemoryStream[Usage]
    val q = Guards.compaction(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("ctx" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Usage(1, 1, 100000L))              // 100k — under 160k
      q.processAllAvailable()
      in.addData(Usage(1, 2, 70000L), Usage(1, 3, 500L)) // 170k → compact → 2k; then 2.5k
      q.processAllAvailable()
      val out = spark.table("ctx" + tag).as[Context].collect().sortBy(_.seq)
      assert(out.map(c => (c.accTokens, c.compacted)).toSeq ==
        Seq((100000L, false), (2000L, true), (2500L, false)))
    } finally q.stop()
  }

  test("model failover: last-successful model carries across tasks in keyed state") {
    failoverScenario(v2 = false)
  }

  test("model failover v2 (transformWithState): same routes, same carried state") {
    withRocksDB { failoverScenario(v2 = true) }
  }

  private def failoverScenario(v2: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tag = if (v2) "_v2" else ""
    val in = MemoryStream[Attempt]
    val q = Guards.modelRouter(in.toDS(), v2 = v2)
      .writeStream.format("memory").queryName("router" + tag)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Attempt(1, 1, "rate_limit"), // primary rate-limited → toggle
        Attempt(1, 2, "ok"))         // fallback succeeds → carried
      q.processAllAvailable()
      in.addData( // a later task on the SAME chat, separate micro-batch:
        Attempt(1, 3, "timeout"),    // starts on carried fallback; toggles
        Attempt(1, 4, "auth"))       // abort — revert to carried, not toggled
      q.processAllAvailable()
      in.addData(Attempt(1, 5, "unknown"), Attempt(2, 6, "ok"))
      q.processAllAvailable()
      val out = spark.table("router" + tag).as[Route].collect().sortBy(_.seq)
      assert(out.map(r => (r.seq, r.model, r.nextModel)).toSeq == Seq(
        (1L, "primary", "fallback"),  // toggle after rate limit
        (2L, "fallback", "fallback"), // success pins fallback
        (3L, "fallback", "primary"),  // carried across batches, then toggled
        (4L, "primary", "fallback"),  // auth → back to last successful
        (5L, "fallback", "fallback"), // unknown retries the same model
        (6L, "primary", "primary")))  // chat 2 isolated: fresh primary
    } finally q.stop()
  }
}
