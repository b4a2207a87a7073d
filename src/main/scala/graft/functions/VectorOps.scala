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

object VectorOps {
  /** Column API: exact dot product of two ARRAY<BIGINT> columns. */
  def longDot(a: Column, b: Column): Column =
    Bridge.column(LongDot(Bridge.expression(a), Bridge.expression(b)))
}
