package graft.operators

/** Times the BPE train/apply keys at sf0.1. */
object ProfBpe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.tools.Prof.session()
    graft.Tables.documents(spark, dir).count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    time("bpe_train")(
      graft.SparkEntry.queries("q_text_bpe_train")(spark, dir).collect())
    time("bpe_apply")(
      graft.SparkEntry.queries("q_text_bpe_apply")(spark, dir).collect())
    time("bpe_apply_2nd")(
      graft.SparkEntry.queries("q_text_bpe_apply")(spark, dir).collect())
  }
}
