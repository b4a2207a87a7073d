package graft.operators
import org.apache.spark.sql.functions._
object ProfPhash {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.tools.Prof.session()
    val docs = graft.Tables.documents(spark, dir)
    docs.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (_ <- 1 to 2) {
      time("registered q_mm_phash") {
        graft.SparkEntry.queries("q_mm_phash")(spark, dir).agg(count(lit(1))).collect() }
      time("sketch only (with twins)") {
        val twins = docs.filter(col("doc_id") < Multimodal.PhashPlantCount)
          .select((col("doc_id") + Multimodal.PhashPlantBase).as("doc_id"), col("text"))
        val corpus = docs.select(col("doc_id"), col("text")).unionByName(twins)
        Multimodal.phashSketch(Multimodal.stagePayloadsFrom(corpus))
          .agg(count(lit(1))).collect() }
      time("pairs without twins (old shape)") {
        Multimodal.phashPairs(Multimodal.stagedPayloads(spark, dir),
          Multimodal.phashChunkWidth(5000)).agg(count(lit(1))).collect() }
    }
  }
}
