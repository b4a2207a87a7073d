package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native LongDot kernel must agree exactly with the composable
  * higher-order-function formulation, in both codegen and interpreted
  * paths. */
class VectorOpsSpec extends SparkSpec {

  test("LongDot matches aggregate∘zip_with on the embeddings corpus") {
    val q = graft.Tables.embeddings(spark, sfDir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("v"))
    val both = q.select(col("vec_id"),
        VectorOps.longDot(col("v"), col("v")).as("native"),
        expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0L, (a, x) -> a + x)").as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(both.count() == 0)
  }

  test("LongDot null and edge semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),   // 4+10+18 = 32
      (2L, Seq.empty[Long], Seq.empty[Long]),    // 0
      (3L, Seq(2L), Seq(3L, 99L)))               // common prefix → 6
      .toDF("id", "a", "b")
    val out = df.select(col("id"), VectorOps.longDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 32L, 2L -> 0L, 3L -> 6L))
    // Null array → null result.
    val n = df.select(VectorOps.longDot(lit(null).cast("array<bigint>"), col("a")).as("d"))
      .collect()
    assert(n.forall(_.isNullAt(0)))
  }
}
