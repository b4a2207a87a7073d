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
