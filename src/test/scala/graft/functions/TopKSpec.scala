package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  test("TopK.perKey equals the window row_number idiom on the knn workload") {
    // Same scored pairs both ways: brute-force knn scores ranked by the
    // window idiom (q_knn_topk) vs the combining aggregator.
    val viaWindow = graft.operators.Similarity.brute(spark, sfDir, 8, 5)
      .select("probe_id", "cand_id", "dot", "rk")
      .collect().map(_.toSeq).toSet

    val e = graft.Tables.embeddings(spark, sfDir)
    val q = e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("v"))
    val probes = q.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("v_p"))
    val scored = broadcast(probes)
      .join(q.select(col("vec_id").as("cand_id"), col("v").as("v_c")),
            col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"),
        VectorOps.longDot(col("v_p"), col("v_c")).as("dot"), col("cand_id"))
    val viaAgg = TopK.perKey(scored, "probe_id", "dot", "cand_id", 5)
      .select("probe_id", "cand_id", "dot", "rk")
      .collect().map(_.toSeq).toSet

    assert(viaAgg == viaWindow)
  }

  test("TopK.perKey shuffles partials, not rows: plan has partial_topkbyscore") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i % 7, i * 31 % 997, i)).toDF("key", "score", "id")
    val plan = TopK.perKey(df, "key", "score", "id", 3)
      .queryExecution.executedPlan.toString
    // Partial aggregation before the exchange is what bounds the shuffle.
    assert(plan.contains("partial_topkbyscore"), plan)
    // And correctness on a small known case:
    val top = TopK.perKey(df, "key", "score", "id", 3)
      .filter(col("key") === 0).select("rk", "score").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expect = (1L to 1000L).filter(_ % 7 == 0).map(i => i * 31 % 997)
      .sorted(Ordering[Long].reverse).take(3)
    assert(top == Map(1 -> expect(0), 2 -> expect(1), 3 -> expect(2)))
  }
}
