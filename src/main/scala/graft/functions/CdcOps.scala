package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernel for CONTENT-DEFINED CHUNKING boundaries
  * (the `q_dedup_cdc` family's inner loop): given a document's text,
  * return the 1-indexed INCLUSIVE end offset of every chunk.
  *
  * Position i (i ≥ [[CdcOps.Window]]) closes a chunk iff the
  * polynomial hash of the trailing window,
  * h = Σ_{j=0}^{w−1} c_{i−j}·B^j with B = [[CdcOps.Base]], satisfies
  * h mod [[CdcOps.CutMod]] = 0 — the Rabin-fingerprint cut rule that
  * makes chunk boundaries CONTENT-anchored: an insertion early in a
  * document shifts byte offsets but not the downstream cut positions,
  * so unchanged content re-chunks to the SAME chunks (the property
  * fixed-size blocking lacks, and the reason dedup-capable stores
  * chunk this way). The final position n is always an end.
  *
  * The rule is deliberately STATELESS (no min/max chunk bound): every
  * position's verdict depends only on its own trailing window, which
  * is what keeps the DuckDB oracle a pure per-position filter and the
  * operator one independent linear pass per document. The windowed sum
  * is exact in a long — Σ 255·37^j over 8 terms ≈ 2.5e13 — so there is
  * no modular-reduction step to keep congruent across engines.
  *
  * Bytes are hashed (`UTF8String.getBytes`), the oracle hashes
  * per-char `ascii()` — equal on single-byte text, the corpus
  * convention shared with the audio kernel. Empty text yields an
  * empty array; null yields null.
  */
case class CdcEnds(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_ends"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CdcOps.endsOf(input.asInstanceOf[UTF8String].getBytes)
        .map(Int.box(_): Any))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes0 => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      s"""
         |byte[] $bytes = $bytes0.getBytes();
         |int $n = $bytes.length;
         |java.util.ArrayList<Object> $out = new java.util.ArrayList<Object>();
         |if ($n > 0) {
         |  for (int $i = ${CdcOps.Window}; $i <= $n; $i++) {
         |    long $h = 0L;
         |    for (int $p = $i - ${CdcOps.Window}; $p < $i; $p++) {
         |      $h = $h * ${CdcOps.Base}L + (long)($bytes[$p] & 0xFF);
         |    }
         |    if ($h % ${CdcOps.CutMod}L == 0L) $out.add($i);
         |  }
         |  if ($out.isEmpty() ||
         |      ((Integer) $out.get($out.size() - 1)).intValue() != $n) {
         |    $out.add($n);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcEnds =
    copy(child = newChild)
}

object CdcOps {
  /** Rolling-window width in bytes. */
  val Window = 8
  /** Polynomial base — 37 keeps the 8-term windowed sum exact in a
    * long (≈ 2.5e13 max) with a non-degenerate power cycle mod 64
    * (37² ≡ 25, 37⁴ ≡ 49, 37⁸ ≡ 33). */
  val Base = 37L
  /** Cut when h mod this is 0 — expected chunk length ≈ 64 bytes. */
  val CutMod = 64L

  /** The chunking rule as plain JVM code — the interpreted body of
    * [[CdcEnds]] AND the byte-identical reference for the gate's
    * broadcast UDF path (one implementation, so the paths can't
    * drift; the codegen template mirrors this loop and the spec pins
    * their agreement through the kernel fixtures). */
  def endsOf(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length
    if (n == 0) return Array.empty[Int]
    val out = new java.util.ArrayList[Int]()
    var i = Window
    while (i <= n) {
      var h = 0L
      var p = i - Window
      while (p < i) { h = h * Base + (bytes(p) & 0xFF); p += 1 }
      if (h % CutMod == 0L) out.add(i)
      i += 1
    }
    if (out.isEmpty || out.get(out.size - 1) != n) out.add(n)
    out.toArray(new Array[Integer](out.size)).map(_.intValue)
  }

  /** Column API: 1-indexed inclusive chunk-end offsets for a text
    * column. */
  def cdcEnds(text: Column): Column =
    Bridge.column(CdcEnds(Bridge.expression(text)))
}
