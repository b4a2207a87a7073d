package graft.operators


import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located join — the 100 TB lake layout: both tables
  * bucketed on the join key with the same bucket count join WITHOUT a
  * shuffle on either side. */
class BucketingSpec extends SparkSpec {

  test("joining two tables bucketed on the key plans no shuffle exchange") {
    // Warehouse dir is a static conf — SparkSpec's builder points it at a
    // temp directory.
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.Tables.orders(spark, sfDir)
        .write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
      graft.Tables.customer(spark, sfDir)
        .write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
              col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // And it produces the same rows as the unbucketed join.
      val expected = graft.SparkEntry.queries("q_join_inner")(spark, sfDir).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }

  test("date-partitioned events: the trailing-window anomaly reads only the trailing day partitions") {
    // The 100 TB events layout SCALE.md asserts: the fact table is
    // partitioned by epoch day, so a bounded-window monitoring query
    // (q_events_anomaly's k·σ rule needs AnomalyWindow trailing days +
    // the day under test) prunes to those partitions at PLAN time and
    // never lists, let alone scans, the historical corpus.
    val dir = java.nio.file.Files.createTempDirectory("evpart").toString
    val dayNs = graft.operators.Events.DayNs
    graft.Tables.events(spark, sfDir)
      .withColumn("day", expr(s"ts_ns div ${dayNs}L"))
      .write.mode("overwrite").partitionBy("day")
      .parquet(s"$dir/events_by_day")
    val part = spark.read.parquet(s"$dir/events_by_day")
    // Partition-directory values read back as the narrowest inferred
    // type (int here) — the filter stays on the RAW partition column so
    // pruning is plan-time; the count frame casts back to the key's
    // bigint day.
    val allDays = part.select("day").distinct().collect()
      .map(_.getAs[Number](0).longValue()).sorted
    assert(allDays.length > graft.operators.Events.AnomalyWindow + 1,
      s"fixture too small to demonstrate pruning: ${allDays.length} days")
    val cut = allDays(allDays.length - 1 - graft.operators.Events.AnomalyWindow)
    // The bounded monitoring query: trailing window + the last day,
    // with the day filter on the PARTITION column.
    val bounded = graft.operators.Events.anomalyFromDayCounts(
      part.filter(col("day") >= lit(cut.toInt))
        .groupBy(col("event_type"), col("day").cast("bigint").as("day"))
        .agg(count(lit(1)).as("n")))
    // The scan sits under the AQE wrapper — recurse into it (the
    // pre-execution plan is enough: partition pruning is plan-time).
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      }.flatten
    val scan = scansOf(bounded.queryExecution.executedPlan)
    assert(scan.nonEmpty, "no file scan in the bounded plan")
    val selected = scan.map(_.selectedPartitions.partitionCount).sum
    assert(selected == graft.operators.Events.AnomalyWindow + 1 &&
      selected < allDays.length,
      s"expected ${graft.operators.Events.AnomalyWindow + 1} pruned day " +
        s"partitions of ${allDays.length}, scan reads $selected")
    // And the plan carries the partition filter (pruning is plan-time,
    // not a post-scan filter).
    val ps = scan.head.toString
    assert(ps.contains("PartitionFilters") && ps.contains("day"),
      ps.linesIterator.take(8).mkString("\n"))
    // The pruned derivation agrees with the unpartitioned key over the
    // same day slice (the count frame is day-local, so the slice is
    // exact for every day with a full in-slice window — the last day).
    val expected = graft.operators.Events.eventsAnomaly(
      graft.Tables.events(spark, sfDir)
        .filter(expr(s"ts_ns div ${dayNs}L") >= cut))
      .collect().map(_.toSeq).toList
    assert(bounded.collect().map(_.toSeq).toList == expected)
  }

  test("lineitem⋈orders through Sinks.writeBucketed: Exchange-free sort-merge join") {
    // The BIG-BIG case — the fact-fact join whose shuffle dominates at
    // 100 TB. Written through the production API, both sides bucketed
    // on the orderkey; the plan must be a SortMergeJoin with no
    // hash-partitioning Exchange on either side, and must agree with
    // the unbucketed q_join_multiway aggregate it feeds.
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.Sinks.writeBucketed(
        graft.Tables.lineitem(spark, sfDir), "lineitem_b", "l_orderkey", 4)
      graft.sources.Sinks.writeBucketed(
        graft.Tables.orders(spark, sfDir), "orders_b2", "o_orderkey", 4)
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b2"),
              col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("o_orderstatus"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join:\n${plan.linesIterator.take(20).mkString("\n")}")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed big-big join still shuffles:\n${plan.linesIterator.take(30).mkString("\n")}")
      val expected = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir),
              col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }
}
