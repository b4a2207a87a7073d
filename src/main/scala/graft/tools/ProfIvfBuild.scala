package graft.operators

/** Times the hamming-IVF artifact family's clean-run builds at sf0.1 —
  * the round-15 build-saver check (trained build target ≤ ~3 s). */
object ProfIvfBuild {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.tools.Prof.session()
    graft.Tables.documents(spark, dir).count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    time("phash_ivf_index")(Multimodal.warmPhashIvfIndex(spark, dir))
    time("phash_ivf_trained")(Multimodal.warmPhashIvfTrained(spark, dir))
    time("phash_ivf_policy")(Multimodal.warmPhashIvfPolicy(spark, dir))

    // Retrain-cycle economics (round-20): cold train+assign vs the
    // below-ratio growth step (quantizer reused, index append-merged —
    // Lloyd skipped, reassign batch-linear). Staged append the
    // MergeStage way; embeddings stride 50 keeps every plane-knob lane
    // in-block AND the +2% growth under RetrainGrowthRatio.
    val out = "/tmp/profretrain"
    graft.tools.MergeStage.stage(spark, dir, out, "embeddings")
    time("ivf_trained cold (train+assign)")(
      Similarity.warmTrainedIndex(spark, out))
    graft.tools.MergeStage.append(spark, out, "embeddings", "vec_id", 50)
    time("ivf_trained reuse+merge (+2%)")(
      Similarity.warmTrainedIndex(spark.newSession(), out))
    graft.tools.MergeStage.cleanup(spark, out)
  }
}
