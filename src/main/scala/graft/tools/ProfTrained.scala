package graft.tools

import graft.operators.Multimodal

/** Task-cpu windows INSIDE the trained phash build (dev utility,
  * round-17): attributes the cold `phash_ivf_trained` ledger row to
  * its phases — training rounds vs final assignment vs bucketed
  * write — against a prebuilt untrained index, mirroring the Bench
  * build order. */
object ProfTrained {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.tools.Prof.session()
    graft.Tables.documents(spark, dir).count()
    val clock = graft.Metrics.installTaskClock(spark.sparkContext)
    def window[T](name: String)(f: => T): T = {
      val (r0, c0) = clock.snapshot(spark.sparkContext)
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val (r1, c1) = clock.snapshot(spark.sparkContext)
      println(f"[proftr] $name%-28s cpu ${c1 - c0}%6.2f run ${r1 - r0}%6.2f wall $wall%6.2f")
      r
    }
    window("phash_ivf_index")(Multimodal.warmPhashIvfIndex(spark, dir))
    val fp = graft.sources.Warehouse.docsFp(spark, dir)
    val cents0 = spark.table(
      graft.sources.Warehouse.tableName("phash_cents", dir, fp))
      .localCheckpoint(true)
    val assigned0 = spark.table(
      graft.sources.Warehouse.tableName("phash_ivf", dir, fp))
    import org.apache.spark.sql.functions.col
    println(s"[proftr] N=${assigned0.count()} K=${cents0.count()}")
    val asgCk = window("assigned0 localCheckpoint")(
      assigned0.localCheckpoint(true))
    val tcA = window("train iters=2 FROM TABLE")(
      Multimodal.phashMajorityCentroidsFrom(assigned0, cents0, 2))
    val tcB = window("train iters=2 FROM CHECKPOINT")(
      Multimodal.phashMajorityCentroidsFrom(asgCk, cents0, 2))
    val asg = window("final assign from table (count)") {
      val a = Multimodal.phashIvfAssign(
        assigned0.select(col("doc_id"), col("phash")), tcA)
        .select(col("doc_id"), col("phash"), col("cell"))
      a.count(); a
    }
    window("final assign from checkpoint (count)") {
      Multimodal.phashIvfAssign(
        asgCk.select(col("doc_id"), col("phash")), tcB).count()
    }
    // Session-unique scratch name: a fixed name would collide with a
    // concurrent run's write/drop in the shared warehouse (round-18
    // advice).
    val scratch = "proftr_tmp_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    window("bucketed write")(
      graft.sources.Sinks.writeBucketed(asg, scratch, "cell", 16))
    spark.sql(s"DROP TABLE IF EXISTS $scratch")
    ()
  }
}
