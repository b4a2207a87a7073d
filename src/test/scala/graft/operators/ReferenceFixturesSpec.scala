package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's own function-level test cases, replayed against the
  * engine's expressions (tests/test-features.sh — slugify :283-310,
  * backoff :92-125, daily log :312-365). The engine must give a reference
  * user the same answers their tests assert. */
class ReferenceFixturesSpec extends SparkSpec {

  private def slugOf(s: String, n: Int = 30): String = {
    import spark.implicits._
    Seq(s).toDF("s").select(Scalars.slug(col("s"), n)).collect()(0).getString(0)
  }

  test("slugify: the reference's 5 cases") {
    assert(slugOf("Hello World") == "hello-world")
    assert(slugOf("  foo---bar  ") == "foo-bar")
    assert(slugOf("---leading") == "leading")
    assert(slugOf("trailing---") == "trailing")
    val long = "abcdefghij abcdefghij abcdefghij abcdefghij abcdefghij abcdefgh"
    assert(slugOf(long, 30).length <= 30)
  }

  test("backoff: bounds, growth, rate-limit doubling (tests/test-features.sh:92-125)") {
    import spark.implicits._
    // delay = min(2^attempt * (rl ? 2 : 1), 60) — the deterministic core
    // (jitter excluded, agent-loop.sh:378).
    val delays = Seq((1, false), (3, false), (1, true), (10, false))
      .toDF("attempt", "rl")
      .select(least(
        expr("shiftleft(1L, attempt)") * when(col("rl"), 2L).otherwise(1L),
        lit(60L)).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(delays(0) > 0 && delays(0) <= 63)  // attempt 1 valid
    assert(delays(1) >= 8)                    // attempt 3 higher base
    assert(delays(2) >= 4)                    // rate limit doubles
    assert(delays(3) == 60)                   // hard cap
  }

  test("daily log: YYYY-MM-DD key and 300-char truncation (tests/test-features.sh:312-365)") {
    import spark.implicits._
    val longResult = "X" * 400
    val row = Seq(("COMPLETED", "MyGroup", "MyTask", longResult))
      .toDF("status", "grp", "task", "result")
      .select(
        date_format(lit("2024-03-05 10:00:00").cast("timestamp"), "yyyy-MM-dd").as("day"),
        concat_ws(" ", col("status"), col("grp"), col("task")).as("line"),
        substring(col("result"), 1, 300).as("result_trunc"))
      .collect()(0)
    assert(row.getString(0) == "2024-03-05")          // not DDMMYYYY
    assert(row.getString(1).contains("MyGroup") && row.getString(1).contains("MyTask"))
    assert(row.getString(2).length <= 300)
  }

  test("log-name synthesis matches the %03d-%s--%s.log shape (agent-loop.sh:274)") {
    import spark.implicits._
    val name = Seq((7L, "setup", "install-deps"))
      .toDF("idx", "grp", "task")
      .select(format_string("%03d-%s--%s.log", col("idx"), col("grp"), col("task")))
      .collect()(0).getString(0)
    assert(name == "007-setup--install-deps.log")
  }
}
