package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-30s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    // warm
    graft.Tables.documents(spark, dir).count()
    graft.Tables.embeddings(spark, dir).count()
    time("ngramPairs (edges)") {
      graft.operators.Dedup.ngramPairs(graft.Tables.documents(spark, dir)).count() }
    time("cc over edges") {
      graft.operators.Dedup.connectedComponents(
        graft.operators.Dedup.ngramPairs(graft.Tables.documents(spark, dir))
          .select(col("doc_a"), col("doc_b"))).count() }
    val vecs = graft.Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("v"))
    val planes = graft.operators.Similarity.derivePlanes(vecs.count())
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
