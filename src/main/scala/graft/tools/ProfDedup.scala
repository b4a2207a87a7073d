package graft.tools
import org.apache.spark.sql.functions._
import graft.tools.Prof.time
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = Prof.session()
    // warm
    graft.Tables.documents(spark, dir).count()
    graft.Tables.embeddings(spark, dir).count()
    time("ngramPairs (edges)") {
      graft.operators.Dedup.ngramPairs(graft.Tables.documents(spark, dir)).count() }
    // Pointer-doubling variant (adopt label-of-label each round): would
    // halve round count on chain-y graphs at the price of one extra
    // self-join per round. Measured here, NOT shipped — near-dup
    // components are clique-like (diameter 1-2), so the shipped
    // min-label loop is already at its floor.
    time("cc pointer-doubling variant") {
      val edges = graft.operators.Dedup.ngramPairs(graft.Tables.documents(spark, dir))
        .select(col("doc_a"), col("doc_b"))
      val und = edges.select(col("doc_a").as("n"), col("doc_b").as("peer"))
        .unionByName(edges.select(col("doc_b").as("n"), col("doc_a").as("peer")))
        .localCheckpoint(true)
      var labels = und.select(col("n").as("id")).distinct()
        .withColumn("rep", col("id")).localCheckpoint(true)
      def sumReps = labels.agg(coalesce(sum(col("rep")), lit(0L))).collect()(0).getLong(0)
      var prev = -1L; var cur = sumReps; var rounds = 0
      while (cur != prev) {
        prev = cur
        val viaPeers = und.join(labels, col("peer") === col("id"))
          .select(col("n").as("id"), col("rep"))
        val minLab = labels.union(viaPeers)
          .groupBy(col("id")).agg(min(col("rep")).as("rep"))
          .localCheckpoint(true)
        // the doubling step: follow rep -> rep(rep)
        val y = minLab.toDF("rid", "rrep")
        val doubled = minLab.join(y, minLab("rep") === y("rid"), "left")
          .select(minLab("id"), coalesce(y("rrep"), minLab("rep")).as("rep"))
        val old = labels
        labels = doubled.localCheckpoint(true)
        old.unpersist(); minLab.unpersist()
        cur = sumReps; rounds += 1
      }
      println(s"[prof]   doubling rounds=$rounds")
      labels.count() }
    val vecs = graft.Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("v"))
    val planes = graft.operators.Similarity.derivePlanes(vecs.count())
    time("cc over edges") {
      graft.operators.Dedup.connectedComponents(
        graft.operators.Dedup.ngramPairs(graft.Tables.documents(spark, dir))
          .select(col("doc_a"), col("doc_b"))).count() }
    time("embedding buckets only") {
      graft.operators.Similarity.bucketed(vecs, planes).count() }
    time("embedding candidates") {
      val b = graft.operators.Similarity.bucketed(vecs, planes).select(col("vec_id"), col("bucket"))
      b.as("a").join(b.as("b"), Seq("bucket"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id")).distinct().count() }
    time("embeddingPairs full") {
      graft.operators.Dedup.embeddingPairs(vecs, 0.35, planes).count() }
    spark.stop()
  }
}
