package graft.operators

/** Times the ACTUAL warmFunnelFrames build (what Bench bills as the
  * funnel_frames artifact row) with the calibration probe bracket. */
object ProfFunnelWarm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.tools.Prof.session()
    graft.Tables.documents(spark, dir).count()
    graft.Tables.embeddings(spark, dir).count()
    def calProbe(): Double = {
      val t0 = System.nanoTime()
      spark.range(20000000L)
        .selectExpr("id % 997 AS k", "id")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("id"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[prof] cal_probe ${(1 to 3).map(_ => calProbe()).min}%6.3f s")
    val t0 = System.nanoTime()
    Curation.warmFunnelFrames(spark, dir)
    println(f"[prof] warmFunnelFrames ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    println(f"[prof] cal_probe_end ${calProbe()}%6.3f s")
  }
}
