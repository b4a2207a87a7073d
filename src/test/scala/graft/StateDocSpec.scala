package graft

import org.apache.spark.sql.functions._

/** The reference's run-state document (FIXTURES.md §A.2): a nested JSON
  * doc with a tasks[] array. The engine treats it as a flat keyed table;
  * this spec proves the two representations round-trip losslessly —
  * flat rows → nested doc (collect_list of struct) → flat rows
  * (explode) — so a reference user's state files map onto the engine's
  * tables with no information loss. */
class StateDocSpec extends SparkSpec {

  test("flat task rows -> nested state doc -> flat rows round-trips") {
    import spark.implicits._
    val flat = Seq(
      ("run1", 1, "setup", "install deps", "completed", 2),
      ("run1", 2, "setup", "configure", "failed", 5),
      ("run1", 3, "build", "compile", "pending", 0),
      ("run2", 1, "deploy", "ship it", "running", 1))
      .toDF("run_id", "index", "grp", "task", "status", "attempts")

    val nested = flat
      .select(col("run_id"),
        struct(col("index"), col("grp"), col("task"),
               col("status"), col("attempts")).as("t"))
      .groupBy(col("run_id"))
      .agg(array_sort(collect_list(col("t"))).as("tasks"))

    // The document form serializes to the reference's shape.
    val doc = nested.select(col("run_id"), to_json(col("tasks")).as("js"))
      .filter(col("run_id") === "run1").collect()(0).getString(1)
    assert(doc.contains(""""status":"completed""""))
    assert(doc.startsWith("[{\"index\":1"))

    val back = nested
      .select(col("run_id"), explode(col("tasks")).as("t"))
      .select(col("run_id"), col("t.index"), col("t.grp"),
              col("t.task"), col("t.status"), col("t.attempts"))
    assert(back.collect().map(_.toSeq).toSet == flat.collect().map(_.toSeq).toSet)

    // Status point-update in document form == update on the flat table.
    val updated = back
      .withColumn("status",
        when(col("run_id") === "run1" && col("index") === 3, "running")
          .otherwise(col("status")))
    val counts = updated.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("completed" -> 1L, "failed" -> 1L, "running" -> 2L))
  }
}
