package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.Guards._

class GuardsSpec extends SparkSpec {

  test("in-flight guard: busy chat rejects work until done, chats isolated") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Work]
    val q = Guards.inFlight(in.toDS())
      .writeStream.format("memory").queryName("guard")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Work(1, 1, "msg"), Work(1, 2, "msg"), Work(2, 3, "msg"))
      q.processAllAvailable()
      in.addData(Work(1, 4, "done"), Work(1, 5, "msg"))
      q.processAllAvailable()
      val out = spark.table("guard").as[Decision].collect()
        .map(d => d.seq -> d.accepted).toMap
      // seq 1 accepted; seq 2 rejected (chat 1 busy); chat 2 unaffected;
      // after done, seq 5 accepted again.
      assert(out == Map(1L -> true, 2L -> false, 3L -> true, 5L -> true))
    } finally q.stop()
  }

  test("compaction fires at 80% of the context window and resets state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Usage]
    val q = Guards.compaction(in.toDS())
      .writeStream.format("memory").queryName("ctx")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Usage(1, 1, 100000L))              // 100k — under 160k
      q.processAllAvailable()
      in.addData(Usage(1, 2, 70000L), Usage(1, 3, 500L)) // 170k → compact → 2k; then 2.5k
      q.processAllAvailable()
      val out = spark.table("ctx").as[Context].collect().sortBy(_.seq)
      assert(out.map(c => (c.accTokens, c.compacted)).toSeq ==
        Seq((100000L, false), (2000L, true), (2500L, false)))
    } finally q.stop()
  }
}
