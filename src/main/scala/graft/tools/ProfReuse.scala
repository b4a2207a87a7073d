package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfReuse {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = graft.Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("v"))
    val planes = graft.operators.Similarity.derivePlanes(vecs.count())
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    // A: current shape (self-join recomputes bucketed on both sides)
    val bA = graft.operators.Similarity.bucketed(vecs, planes).select(col("vec_id"), col("bucket"))
    time("A self-join plain") {
      bA.as("a").join(bA.as("b"), Seq("bucket"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id")).distinct().count() }
    // B: repartition on bucket first -> exchange reuse
    val bB = graft.operators.Similarity.bucketed(vecs, planes)
      .select(col("vec_id"), col("bucket")).repartition(col("bucket"))
    time("B self-join repart") {
      bB.as("a").join(bB.as("b"), Seq("bucket"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id")).distinct().count() }
    // did ReusedExchange appear?
    val plan = bB.as("a").join(bB.as("b"), Seq("bucket"))
      .filter(col("a.vec_id") < col("b.vec_id")).queryExecution.executedPlan.toString
    println("[prof] ReusedExchange in B: " + plan.contains("ReusedExchange"))
    // repeat warm
    time("A warm") { bA.as("a").join(bA.as("b"), Seq("bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id")).distinct().count() }
    time("B warm") { bB.as("a").join(bB.as("b"), Seq("bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id")).distinct().count() }
    spark.stop()
  }
}
