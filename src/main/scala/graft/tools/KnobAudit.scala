package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.debug._
import org.apache.spark.sql.functions._

/** Derived-knob scale audit (round-20, the r19 verdict's top ask): for
  * every operator whose generated code COULD grow with a corpus-derived
  * knob, measure — at the current knob value, the next derivation
  * steps, and the knob ceiling —
  *
  *   1. the largest whole-stage generated-method bytecode size
  *      (Spark's own codegen stats; > 8000 bytes = past HotSpot's
  *      -XX:DontCompileHugeMethods limit = runs INTERPRETED forever,
  *      the round-19 148× LSH pathology), and
  *   2. task-cpu with whole-stage codegen ON vs OFF over a fixed
  *      synthetic frame — if OFF wins at some knob step, the fused
  *      method fell off the JIT exactly there.
  *
  * KnobJitSpec asserts the bounds; this tool prints the measured table
  * SCALE.md records. Exit code 1 if any knob-bearing plan exceeds the
  * JIT limit at any swept value.
  *
  * Reading the cpu columns: each query generates a FRESH whole-stage
  * class, which HotSpot starts interpreting and only C2-compiles after
  * ~10k invocations — so at small row counts cpuOn is mostly class
  * warmup (measured ~8 s constant at 20k rows regardless of knob)
  * while cpuOff reuses the session's already-hot interpreted-Catalyst
  * methods. Run with ≥500k rows for steady state; the signal is cpu
  * LINEARITY in the knob (a superlinear step = a JIT cliff), not the
  * on/off ratio at one point. The byte column is row-count-independent
  * and is the hard gate.
  *
  * Usage: KnobAudit [nVectors] (default 20000)
  */
object KnobAudit {
  private val JitLimit = 8000

  def maxMethodBytes(df: DataFrame): Int =
    codegenStringSeq(df.queryExecution.executedPlan)
      .map(_._3.maxMethodCodeSize).foldLeft(0)(math.max)

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20000)
    val spark = Prof.session()
    import graft.operators.{Curation, Dedup, Similarity}
    val clock = graft.Metrics.installTaskClock(spark.sparkContext)
    var bad = 0

    def vecs(rows: Int): DataFrame =
      spark.range(rows).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), d -> (id * 31 + d * 7) % 201 - 100)")
          .as("v")).localCheckpoint(true)

    def cpuOf(df: => DataFrame): Double = {
      val before = clock.snapshot(spark.sparkContext)._2
      df.selectExpr("count(*)").collect()
      clock.snapshot(spark.sparkContext)._2 - before
    }

    def row(family: String, knob: String, df: => DataFrame,
            exec: Boolean): Unit = {
      val bytes = maxMethodBytes(df)
      val jit = if (bytes <= JitLimit) "ok" else { bad += 1; "PAST-JIT" }
      val (on, off) =
        if (!exec) (Double.NaN, Double.NaN)
        else {
          val cOn = cpuOf(df)
          spark.conf.set("spark.sql.codegen.wholeStage", "false")
          val cOff = try cpuOf(df)
          finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
          (cOn, cOff)
        }
      println(f"[knob] $family%-22s $knob%-12s maxMethod=$bytes%6d B  " +
        f"jit=$jit%-8s cpuOn=$on%7.2f s  cpuOff=$off%7.2f s")
    }

    val v = vecs(n)
    // derivePlanes steps: 8 = sf0.1 today, 9/12 the next derivations,
    // 16/20 the 100 TB region, 40 = MaxPlanes (the ceiling).
    for (planes <- Seq(8, 9, 12, 16, 20, 40)) {
      row("lsh.bucketed", s"planes=$planes",
        Similarity.bucketed(v, planes), exec = true)
      row("lsh.probeBuckets", s"planes=$planes",
        Similarity.probeBuckets(v, planes), exec = true)
    }
    // Simhash banding: chunk count falls as the corpus grows (widths
    // 2→60 divide the 60-bit sketch), so the SMALL-corpus end has the
    // most chunks — audit both ends plus the sf0.1 value.
    val sk = spark.range(n).select(col("id").as("doc_id"),
      (col("id") * 2654435761L % 1152921504606846976L).as("sh"))
      .localCheckpoint(true)
    for (chunks <- Seq(4, 12, 30))
      row("simhash.banding", s"chunks=$chunks",
        Dedup.simhashPairsFrom(sk, chunks, 8), exec = false)
    // Verbatim shingle index: width derives 4 + digits(N), ceiling 13
    // (a 10^9-doc corpus) — the lambda spelling must hold flat.
    import spark.implicits._
    val docs = (0L until 64L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta eta theta token$i " * 2))
      .toDF("doc_id", "text").localCheckpoint(true)
    for (w <- Seq(6, 9, 13))
      row("verbatim.shingles", s"width=$w",
        Curation.verbatimIndexStore(docs, w), exec = false)
    println(if (bad == 0) "[knob] ALL JIT-ABLE" else s"[knob] $bad PAST-JIT rows")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
