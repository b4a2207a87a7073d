package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.debug._
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Derived-knob JIT audit (round-20, the r19 verdict's top ask): any
  * whole-stage-generated method whose bytecode grows with a
  * corpus-derived knob (planes, chunk width, shingle width) must stay
  * under HotSpot's JIT compile limit AT THE KNOB VALUES LARGER CORPORA
  * DERIVE — the round-19 LSH pathology (148× at the ×10 corpus's
  * 12-plane step, SCALE.md) was exactly a method that crossed the limit
  * only when the knob grew. These tests make that failure mode a gate:
  * the generated-method byte size is read mechanically from Spark's own
  * codegen stats (`debug.codegenStringSeq`) at the CURRENT knob value,
  * the next TWO derivation steps, and the knob ceiling.
  *
  * Why 8000: HotSpot's -XX:DontCompileHugeMethods threshold is 8000
  * bytecode bytes. Spark only bails to interpreted-plan mode above
  * spark.sql.codegen.hugeMethodLimit (65535), so a method between the
  * two COMPILES but never JIT-compiles — it runs in the bytecode
  * interpreter forever, the silent 30× the round-19 kernel fixed. */
class KnobJitSpec extends SparkSpec {

  private val JitLimit = 8000

  /** Largest generated-method bytecode size across every whole-stage
    * span of the df's executed plan (0 if the plan has no codegen). */
  private def maxMethodBytes(df: DataFrame): Int =
    codegenStringSeq(df.queryExecution.executedPlan)
      .map(_._3.maxMethodCodeSize).foldLeft(0)(math.max)

  /** Deterministic synthetic quantized vectors — 64 dims, values in
    * [-100, 100], no corpus dependency (knob values are passed
    * explicitly; the corpus only ever chooses them). */
  private def vecs(n: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> (id * 31 + d * 7) % 201 - 100)")
        .as("v"))

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString()).toSeq

  /** The PRE-round-20 composed probe expansion, verbatim (named
    * per-plane projections + array_sort margin ranking) — the spec's
    * reference implementation for the kernel rewrite. */
  private def composedProbe(vectors: DataFrame, planes: Int,
                            pb: Int): DataFrame = {
    import Similarity.{NumTables, planeWeight}
    val projCols = for (t <- 0 until NumTables; i <- 0 until planes)
      yield graft.functions.VectorOps.longDot(col("v"),
        typedLit((0 until 64).map(d => planeWeight(t * planes + i, d))))
        .as(s"s_${t}_$i")
    val projected = vectors.select(col("vec_id") +: col("v") +: projCols: _*)
    val tableCols = (0 until NumTables).flatMap { t =>
      val bits = (0 until planes).map(i =>
        when(col(s"s_${t}_$i") >= 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
      val order = array_sort(array((0 until planes).map(i =>
        struct(abs(col(s"s_${t}_$i")).as("m"), lit(i).as("j"))): _*))
      bits.as(s"bits_$t") +: (0 until pb).map(k =>
        order.getItem(k).getField("j").as(s"j_${t}_$k"))
    }
    val staged = projected.select(col("vec_id") +: col("v") +: tableCols: _*)
    val buckets = for (t <- 0 until NumTables; mask <- 0 until (1 << pb)) yield {
      val flips = (0 until pb).filter(k => (mask & (1 << k)) != 0)
        .map(k => s"shiftleft(CAST(1 AS BIGINT), j_${t}_$k)")
      expr(s"${(1L << planes) * t}L + (${(s"bits_$t" +: flips).mkString(" ^ ")})")
    }
    staged.select(col("vec_id"), col("v"),
      explode(array(buckets: _*)).as("bucket"))
  }

  test("bucketed / probeBuckets generated methods stay JIT-able at every future derivePlanes step") {
    // 8 planes = today's sf0.1 knob; 9 and 12 the next derivations;
    // 16/20 the 100 TB region; 40 = MaxPlanes (the derivation ceiling,
    // ~8.8 T vectors). The kernels are compact loops over a referenced
    // weight matrix, so method size must be plane-count-invariant —
    // assert the hard JIT bound, and that the ceiling's method isn't
    // even materially bigger than today's.
    val sizes = Seq(8, 9, 12, 16, 20, 40).map { planes =>
      val b = maxMethodBytes(Similarity.bucketed(vecs(4), planes))
      val p = maxMethodBytes(Similarity.probeBuckets(vecs(4), planes))
      assert(b <= JitLimit && b > 0,
        s"bucketed at $planes planes: generated method $b bytes (JIT limit $JitLimit)")
      assert(p <= JitLimit && p > 0,
        s"probeBuckets at $planes planes: generated method $p bytes (JIT limit $JitLimit)")
      (planes, b, p)
    }
    val (_, b0, p0) = sizes.head
    val (_, bMax, pMax) = sizes.last
    assert(bMax <= b0 + 64 && pMax <= p0 + 64,
      s"kernel method size must not grow with the plane knob: $sizes")
  }

  test("probeBuckets kernels ≡ the composed projection form, bit for bit, at current and future plane steps") {
    // The rewrite's correctness oracle: identical (vec_id, bucket)
    // multisets at every knob value — base buckets, margin ordering
    // (|s| then plane index), XOR expansion. 12 planes is the step the
    // composed form stopped JIT-ing at; 16 the one after.
    val v = vecs(64).localCheckpoint(true)
    for (planes <- Seq(5, 8, 12, 16)) {
      val kernel = rows(Similarity.probeBuckets(v, planes)
        .select(col("vec_id"), col("bucket")))
      val composed = rows(composedProbe(v, planes, Similarity.ProbeBits)
        .select(col("vec_id"), col("bucket")))
      assert(kernel == composed,
        s"kernel probe expansion diverged from the composed form at $planes planes")
    }
  }

  test("PlaneFlips interpreted eval ≡ generated code (codegen-off agreement)") {
    val v = vecs(64).localCheckpoint(true)
    val on = rows(Similarity.probeBuckets(v, 12))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = rows(Similarity.probeBuckets(v, 12))
      assert(on == off, "doGenCode and nullSafeEval disagree")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("PlaneFlips clamps probeBits to the plane count (round-21 ADVICE: the public Column API passed the knob through raw and crashed past planes)") {
    val v = vecs(8).localCheckpoint(true)
    def flips(planes: Int, pb: Int) = rows(v.select(col("vec_id"),
      graft.functions.VectorOps.planeFlips(col("v"), planes, pb).as("f")))
    // probeBits > planes must not throw, and must equal the all-planes
    // selection (there are only `planes` distinct flip bits to rank).
    assert(flips(4, 8) == flips(4, 4),
      "over-asked probeBits must clamp to the plane count")
    // In-range values are untouched by the clamp.
    assert(flips(8, 2) == flips(8, 2))
  }

  test("lambda-based knob families: generated method size is knob-INVARIANT (simhash banding, phash chunks, verbatim shingles)") {
    import spark.implicits._
    // These families spell the knob inside transform(sequence(...))
    // lambdas, which do not unroll into the whole-stage method — so
    // the method size must not move across knob steps. If someone
    // rewrites one as an unrolled per-chunk expression family, this
    // fails at the step where it outgrows the JIT.
    val sk = spark.range(32).select(col("id").as("doc_id"),
      (col("id") * 2654435761L % 1152921504606846976L).as("sh"))
      .localCheckpoint(true)
    val simSizes = Seq(4, 12, 30).map(chunks =>
      maxMethodBytes(Dedup.simhashPairsFrom(sk, chunks, 8)))
    assert(simSizes.distinct.size == 1 && simSizes.head <= JitLimit,
      s"simhash banding method size moved with the chunk knob: $simSizes")
    val docs = (0L until 16L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta token$i " * 3))
      .toDF("doc_id", "text").localCheckpoint(true)
    val shSizes = Seq(5, 9, 13).map(w =>
      maxMethodBytes(Curation.verbatimIndexStore(docs, w)))
    assert(shSizes.distinct.size == 1 && shSizes.head <= JitLimit,
      s"shingle index method size moved with the width knob: $shSizes")
  }
}
