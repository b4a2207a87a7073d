package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the quantized-vector dot product.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)` —
  * allocates an intermediate array per row and runs interpreted (Spark
  * higher-order functions don't participate in whole-stage codegen). This
  * expression generates a tight primitive loop instead: no allocation, no
  * virtual dispatch, stays inside WholeStageCodegen. This is the §2.10
  * escalation path (b): a custom `Expression` with `doGenCode`, reached
  * because the built-in composition genuinely can't express the efficient
  * form.
  *
  * Null semantics: null if either array is null (standard binary-op
  * nulls); null ELEMENTS contribute 0 — quantized vectors never carry
  * null elements, but speculative inputs shouldn't crash the kernel.
  * Mismatched lengths dot the common prefix (zip semantics).
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // No ExpectsInputTypes: AbstractDataType is private[sql] in Spark 4.
  // Call sites are library-internal and always pass ARRAY<BIGINT>.
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

/** ALL EIGHT LSH table buckets of one quantized vector, as one kernel
  * (round-19). The composed form — `array(8 × (Σ_planes when(LongDot ≥
  * 0, bit)))` — is semantically identical but fuses 8·planes separate
  * inlined dot loops plus the case-when chains into ONE whole-stage
  * method: at 12 planes (the ×10 corpus) the generated method passes
  * HotSpot's huge-method bytecode limit, never JIT-compiles, and runs
  * in the JVM's bytecode INTERPRETER — measured 92 task-cpu s for a
  * 20k-row bucketing that evaluates in 3 s with codegen off. This
  * expression is the same arithmetic as one compact triple loop over a
  * referenced weight matrix: a few hundred bytecodes, always JIT-able,
  * and the surrounding whole-stage method shrinks back to normal size.
  *
  * Parity: weights are [[graft.operators.Similarity.planeWeight]] at
  * plane p = t·planes + i over dims 0..63, dot over the common prefix
  * with null elements contributing 0 (the LongDot rules), bit i set ⟺
  * dot ≥ 0, bucket offset t·2^planes — bit-identical buckets to the
  * composed form and to the oracle's SQL twin at every plane count.
  * Null semantics: a null vector yields a null array (its row drops
  * from the exploded index — a null embedding is not a servable index
  * row; the previous composed form kept it at the bare table offsets
  * with a null payload, equally unservable and unobservable in every
  * gate). */
case class PlaneBuckets(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "plane_buckets"

  private def numTables: Int = graft.operators.Similarity.NumTables

  /** weights(t·planes + i)(d) — the planeWeight matrix, built once per
    * expression instance (deterministic integers; retries agree). */
  @transient private lazy val weights: Array[Array[Long]] =
    Array.tabulate(numTables * planes)(p =>
      Array.tabulate(64)(d => graft.operators.Similarity.planeWeight(p, d)))

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), 64)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = (1L << planes) * t
      var i = 0
      while (i < planes) {
        val w = weights(t * planes + i)
        var acc = 0L
        var d = 0
        while (d < n) {
          if (!x.isNullAt(d)) acc += x.getLong(d) * w(d)
          d += 1
        }
        if (acc >= 0L) bucket += (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val wRef = ctx.addReferenceObj("planeWeights", weights, "long[][]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val w = ctx.freshName("w")
      s"""
         |long[] $out = new long[$numTables];
         |int $n = java.lang.Math.min($v.numElements(), 64);
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $bucket = (1L << $planes) * $t;
         |  for (int $i = 0; $i < $planes; $i++) {
         |    long[] $w = $wRef[$t * $planes + $i];
         |    long $acc = 0L;
         |    for (int $d = 0; $d < $n; $d++) {
         |      if (!$v.isNullAt($d)) $acc += $v.getLong($d) * $w[$d];
         |    }
         |    if ($acc >= 0L) $bucket += (1L << $i);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneBuckets =
    copy(child = newChild)
}

/** The multi-probe FLIP BITS of one quantized vector, as one kernel
  * (round-20, the r19 verdict's derived-knob audit): per LSH table, the
  * `probeBits` plane bits with the smallest |projection| margin — the
  * low-confidence signs a multi-probe query XOR-perturbs. The composed
  * form named 8·planes dot projections plus 8 array_sorts in ONE
  * select: the same whole-stage shape that outgrew HotSpot's JIT
  * bytecode limit at 12 planes ([[PlaneBuckets]]'s history), latent on
  * the probe side because probe frames are tiny. This kernel is one
  * compact loop over the SAME [[graft.operators.Similarity.planeWeight]]
  * matrix — method size is plane-count-INVARIANT (KnobJitSpec pins it).
  *
  * Output: flat ARRAY<BIGINT> of NumTables·probeBits flip VALUES
  * (1L << plane-index), table-major, each table's `probeBits` entries
  * ordered by ascending (|margin|, plane-index) — exactly the
  * `array_sort(struct(abs(s), j))` rule the composed form applied and
  * the oracle's ORDER BY replays. Margin parity note: these dots are a
  * second spelling of the projection arithmetic (same weights, prefix
  * dot, null elements → 0); a drift here could only change WHICH extra
  * buckets get probed (recall) — the mask-0 base bucket always comes
  * from the shared [[PlaneBuckets]] kernel, so the candidate join can
  * never silently empty. Null vector → null (row drops, like the base).
  */
case class PlaneFlips(child: Expression, planes: Int, probeBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "plane_flips"

  private def numTables: Int = graft.operators.Similarity.NumTables

  /** probeBits clamped to the plane count (round-21, ADVICE): past all
    * `planes` usable flip bits the selection loop's `best` stays -1 and
    * indexes out of bounds — probeBuckets clamps at its call site, but
    * the public Column API passed the knob through raw, so the
    * expression itself must not be constructible in a crashing shape. */
  private def pb: Int = math.min(probeBits, planes)

  @transient private lazy val weights: Array[Array[Long]] =
    Array.tabulate(numTables * planes)(p =>
      Array.tabulate(64)(d => graft.operators.Similarity.planeWeight(p, d)))

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), 64)
    val out = new Array[Long](numTables * pb)
    val m = new Array[Long](planes)
    val used = new Array[Boolean](planes)
    var t = 0
    while (t < numTables) {
      var i = 0
      while (i < planes) {
        val w = weights(t * planes + i)
        var acc = 0L
        var d = 0
        while (d < n) {
          if (!x.isNullAt(d)) acc += x.getLong(d) * w(d)
          d += 1
        }
        m(i) = math.abs(acc)
        used(i) = false
        i += 1
      }
      // probeBits-pass selection of the (|margin|, index)-ascending
      // minima — the array_sort(struct(m, j)) rule, ties on index.
      var k = 0
      while (k < pb) {
        var best = -1
        var j = 0
        while (j < planes) {
          if (!used(j) && (best < 0 || m(j) < m(best))) best = j
          j += 1
        }
        used(best) = true
        out(t * pb + k) = 1L << best
        k += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val wRef = ctx.addReferenceObj("planeWeights", weights, "long[][]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val w = ctx.freshName("w")
      val m = ctx.freshName("m")
      val used = ctx.freshName("used")
      val best = ctx.freshName("best")
      s"""
         |long[] $out = new long[${numTables * pb}];
         |int $n = java.lang.Math.min($v.numElements(), 64);
         |long[] $m = new long[$planes];
         |boolean[] $used = new boolean[$planes];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  for (int $i = 0; $i < $planes; $i++) {
         |    long[] $w = $wRef[$t * $planes + $i];
         |    long $acc = 0L;
         |    for (int $d = 0; $d < $n; $d++) {
         |      if (!$v.isNullAt($d)) $acc += $v.getLong($d) * $w[$d];
         |    }
         |    $m[$i] = java.lang.Math.abs($acc);
         |    $used[$i] = false;
         |  }
         |  for (int $k = 0; $k < $pb; $k++) {
         |    int $best = -1;
         |    for (int $j = 0; $j < $planes; $j++) {
         |      if (!$used[$j] && ($best < 0 || $m[$j] < $m[$best])) $best = $j;
         |    }
         |    $used[$best] = true;
         |    $out[$t * $pb + $k] = 1L << $best;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneFlips =
    copy(child = newChild)
}

/** The multi-probe XOR expansion over the two kernel arrays (round-20):
  * base buckets from [[PlaneBuckets]] (left) × flip bits from
  * [[PlaneFlips]] (right) → the flat NumTables·2^probeBits probe-bucket
  * array, table-major, mask-minor (mask bit k selects flip k). Spelled
  * as NumTables·2^probeBits element_at/XOR expressions this fused into
  * a ~24 KB whole-stage method — past HotSpot's 8 KB JIT limit at ANY
  * plane count (KnobJitSpec found it; latent only because probe frames
  * are tiny). This kernel is one compact loop: method size is constant.
  * Parity: pure arithmetic over the kernels' outputs — the mask-0
  * entries are the [[PlaneBuckets]] values untouched, so index/probe
  * base-bucket parity still rests on the one shared kernel. */
case class BucketExpand(left: Expression, right: Expression, probeBits: Int)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bucket_expand"

  override protected def nullSafeEval(b: Any, f: Any): Any = {
    val base = b.asInstanceOf[ArrayData]
    val flips = f.asInstanceOf[ArrayData]
    val tables = base.numElements()
    val masks = 1 << probeBits
    val out = new Array[Long](tables * masks)
    var t = 0
    while (t < tables) {
      var mask = 0
      while (mask < masks) {
        var v = base.getLong(t)
        var k = 0
        while (k < probeBits) {
          if ((mask & (1 << k)) != 0) v ^= flips.getLong(t * probeBits + k)
          k += 1
        }
        out(t * masks + mask) = v
        mask += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, f) => {
      val out = ctx.freshName("out")
      val tables = ctx.freshName("tables")
      val t = ctx.freshName("t")
      val mask = ctx.freshName("mask")
      val k = ctx.freshName("k")
      val v = ctx.freshName("v")
      val masks = 1 << probeBits
      s"""
         |int $tables = $b.numElements();
         |long[] $out = new long[$tables * $masks];
         |for (int $t = 0; $t < $tables; $t++) {
         |  for (int $mask = 0; $mask < $masks; $mask++) {
         |    long $v = $b.getLong($t);
         |    for (int $k = 0; $k < $probeBits; $k++) {
         |      if (($mask & (1 << $k)) != 0) $v ^= $f.getLong($t * $probeBits + $k);
         |    }
         |    $out[$t * $masks + $mask] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketExpand =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Column API: exact dot product of two ARRAY<BIGINT> columns. */
  def longDot(a: Column, b: Column): Column =
    Bridge.column(LongDot(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: the 8-table LSH bucket array of a quantized vector. */
  def planeBuckets(v: Column, planes: Int): Column =
    Bridge.column(PlaneBuckets(Bridge.expression(v), planes))

  /** Column API: the multi-probe flip-bit array of a quantized vector. */
  def planeFlips(v: Column, planes: Int, probeBits: Int): Column =
    Bridge.column(PlaneFlips(Bridge.expression(v), planes, probeBits))

  /** Column API: the full probe-bucket expansion over the two kernel
    * arrays (base × 2^probeBits XOR masks, table-major). */
  def bucketExpand(base: Column, flips: Column, probeBits: Int): Column =
    Bridge.column(BucketExpand(
      Bridge.expression(base), Bridge.expression(flips), probeBits))
}
