package graft.tools
import graft.tools.Prof.time
/** Dev utility: dump + time q_decontaminate at a given SF for a
  * targeted DuckDB twin check (full Verify runs all 100 keys; iterating
  * on the shingle key function needs just this one).
  * Usage: runMain graft.tools.DecontDump [sfDir] [outDir]
  */
object DecontDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/decont_out"
    val spark = Prof.session()
    val docs = graft.Tables.documents(spark, dir)
    docs.count() // warm
    for (_ <- 1 to 3)
      time("decontaminate")(graft.operators.Curation.decontaminate(docs).count())
    graft.operators.Curation.queries("q_decontaminate")(spark, dir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
