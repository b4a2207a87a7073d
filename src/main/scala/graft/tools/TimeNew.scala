package graft.tools
import org.apache.spark.sql.SparkSession
object TimeNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warmup
    graft.SparkEntry.queries("q_scan_full")(spark, dir).collect()
    val clock = graft.Metrics.installTaskClock(spark.sparkContext)
    for (k <- args) {
      val (r0, c0) = clock.snapshot(spark.sparkContext)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(k)(spark, dir).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val (r1, c1) = clock.snapshot(spark.sparkContext)
      println(f"$k: wall $wall%.3f s  cpu ${c1 - c0}%.3f  run ${r1 - r0}%.3f")
    }
  }
}
