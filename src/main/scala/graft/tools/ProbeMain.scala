package graft.tools
import org.apache.spark.sql.functions._
/** Host-phase probe (dev utility): Bench's calProbe alone, so a bench
  * orchestration loop can sample the bimodal host cheaply instead of
  * paying a full suite run to discover a slow phase. Prints the
  * minimum of three probe timings. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    def calProbe(): Double = {
      val t0 = System.nanoTime()
      spark.range(20000000L).selectExpr("id % 997 AS k", "id")
        .groupBy("k").agg(sum("id")).agg(count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    calProbe()
    println(f"[probe] ${(1 to 3).map(_ => calProbe()).min}%.4f")
  }
}
