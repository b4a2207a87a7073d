package graft.tools

import org.apache.spark.sql.functions._

/** Dev profiler for the ANN quality/latency trade-off: mean recall@5 and
  * wall time for the LSH (multi-probe) and IVF paths vs brute-force
  * ground truth at a given SF dir. Backs the README's measured-recall
  * table and the multi-probe tuning decisions. */
object ProfAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Prof.session()
    def meanRecall(name: String): Unit = Prof.time(name) {
      val df = graft.SparkEntry.queries(name)(s, dir)
      val m = df.agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"[prof] $name mean recall = $m%.4f")
      df.agg(count(lit(1))).collect()(0).getLong(0)
    }
    meanRecall("q_knn_recall")
    meanRecall("q_knn_ivf_recall")
    Prof.time("q_knn_lsh") {
      graft.SparkEntry.queries("q_knn_lsh")(s, dir)
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    s.stop()
  }
}
