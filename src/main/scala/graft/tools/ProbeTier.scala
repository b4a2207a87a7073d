package graft.tools

import org.apache.spark.sql.execution.debug._

/** Focused probe for the knn_tier_policy ×10 cpu row (round 20): print
  * every whole-stage span's generated-method bytecode size for each
  * tier chain at the target dir's derived knob values — the KnobAudit
  * rule (> 8000 bytes never JIT-compiles) applied to FUSED PIPELINES
  * rather than single expressions.
  *
  * Usage: ProbeTier [dir]  (default /tmp/sfx10r20)
  */
object ProbeTier {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = args.lift(0).getOrElse("/tmp/sfx10r20")
    import graft.operators.Similarity
    val e = Similarity.quantizedVectors(graft.Tables.embeddings(spark, dir))
    val n = e.count()
    val kk = math.ceil(math.sqrt(n.toDouble)).toInt
    val kc = Similarity.derivePqCodes(n)
    println(s"[probe] n=$n kk=$kk kCodes=$kc")
    val chains = Seq(
      "brute" -> Similarity.brute(spark, dir, 64, 5),
      "pq" -> Similarity.pqTopK(e, kc, 64, 5),
      "ivfpq_res" -> Similarity.ivfPqResidualTopK(e, kk, kc, 64, 5))
    for ((nm, df) <- chains) {
      df.count() // force AQE to materialize the final plan
      val stats = codegenStringSeq(df.queryExecution.executedPlan)
        .map(_._3.maxMethodCodeSize)
      val top = stats.sortBy(x => -x).take(6)
      println(s"[probe] $nm spans=${stats.size} " +
        s"max=${if (stats.isEmpty) 0 else stats.max} top=$top " +
        (if (stats.exists(_ > 8000)) "PAST-JIT" else "ok"))
    }
    spark.stop()
  }
}
