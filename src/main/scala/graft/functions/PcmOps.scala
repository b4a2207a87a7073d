package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst kernel for the per-window PCM feature fold
  * (`q_mm_audio_energy`'s inner loop): given the raw PCM byte section
  * and a window index, return (n_samples, energy, zcr) for that
  * 8-bit-unsigned-sample window in one tight byte loop.
  *
  * The composable form — `transform(split(...))` to an INT array, then
  * three `aggregate`/`transform` lambdas per window — materializes a
  * boxed array per doc and runs every lambda interpreted (higher-order
  * functions don't participate in whole-stage codegen); measured ~2 s
  * for ~5M samples at sf0.1. This expression reads the payload BYTES
  * directly (no array, no boxing, no UTF-8 detour) and stays inside
  * WholeStageCodegen — the §2.10 escalation path (b), same rationale
  * as [[LongDot]]. Semantics are byte-for-byte those of the composed
  * form on single-byte text (the staged corpus; the oracle replays the
  * per-char form and the equality is spec-pinned on the hand fixture).
  *
  * Window w covers byte offsets [w·`window`, min((w+1)·`window`, n)):
  *   - energy = Σ (s − 128)²            (8-bit PCM centers at 128)
  *   - zcr    = sign changes of s·m − Σs (mean-centered, integer
  *              cross-multiply — no division, no floats)
  *   - n_clip = count of rail samples (s = 0 or s = 255 — the 8-bit
  *              saturation values; the clipping screen's numerator)
  * Out-of-range windows yield (0, 0, 0, 0); null inputs yield null.
  */
case class PcmWindowStats(left: Expression, right: Expression, window: Int)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("zcr", LongType, nullable = false),
    StructField("n_clip", LongType, nullable = false)))
  override def prettyName: String = "pcm_window_stats"

  override protected def nullSafeEval(pcm: Any, win: Any): Any = {
    val a = pcm.asInstanceOf[Array[Byte]]
    val w = win.asInstanceOf[Long]
    val start = (w * window).toInt
    val end = math.min(start + window, a.length)
    val m = math.max(end - start, 0)
    var ssum = 0L
    var energy = 0L
    var nclip = 0L
    var i = start
    while (i < end) {
      val v = (a(i) & 0xFF).toLong
      ssum += v
      val c = v - 128L
      energy += c * c
      if (v == 0L || v == 255L) nclip += 1
      i += 1
    }
    var zcr = 0L
    if (m >= 2) {
      var prev = (a(start) & 0xFF).toLong * m - ssum >= 0
      i = start + 1
      while (i < end) {
        val s = (a(i) & 0xFF).toLong * m - ssum >= 0
        if (s != prev) zcr += 1
        prev = s
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](m.toLong, energy, zcr, nclip))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pcm, win) => {
      val start = ctx.freshName("start")
      val end = ctx.freshName("end")
      val m = ctx.freshName("m")
      val ssum = ctx.freshName("ssum")
      val energy = ctx.freshName("energy")
      val zcr = ctx.freshName("zcr")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val c = ctx.freshName("c")
      val prev = ctx.freshName("prev")
      val sg = ctx.freshName("sg")
      val nclip = ctx.freshName("nclip")
      s"""
         |int $start = (int)($win * $window);
         |int $end = java.lang.Math.min($start + $window, $pcm.length);
         |int $m = java.lang.Math.max($end - $start, 0);
         |long $ssum = 0L; long $energy = 0L; long $nclip = 0L;
         |for (int $i = $start; $i < $end; $i++) {
         |  long $v = (long)($pcm[$i] & 0xFF);
         |  $ssum += $v;
         |  long $c = $v - 128L;
         |  $energy += $c * $c;
         |  if ($v == 0L || $v == 255L) $nclip++;
         |}
         |long $zcr = 0L;
         |if ($m >= 2) {
         |  boolean $prev = ((long)($pcm[$start] & 0xFF)) * $m - $ssum >= 0;
         |  for (int $i = $start + 1; $i < $end; $i++) {
         |    boolean $sg = ((long)($pcm[$i] & 0xFF)) * $m - $ssum >= 0;
         |    if ($sg != $prev) $zcr++;
         |    $prev = $sg;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{(long)$m, $energy, $zcr, $nclip});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PcmWindowStats =
    copy(left = newLeft, right = newRight)
}

object PcmOps {
  /** Column API: per-window (n_samples, energy, zcr) over a BINARY
    * PCM column and a BIGINT window index. */
  def pcmWindowStats(pcm: Column, win: Column, window: Int): Column =
    Bridge.column(PcmWindowStats(
      Bridge.expression(pcm), Bridge.expression(win), window))
}
