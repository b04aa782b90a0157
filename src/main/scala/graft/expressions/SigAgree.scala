package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Number of positions where two `array<long>` MinHash signatures agree.
  *
  * Replaces the `size(filter(zip_with(a, b, ...)))` higher-order-function
  * estimate on the LSH candidate hot path: HOFs are CodegenFallback and
  * allocate two intermediate arrays per candidate pair, which dominates
  * verification at scale (measured ~3.5× slower than the codegen'd
  * array walk at 40k docs). Signatures of different lengths indicate
  * malformed input (signatures are fixed-k by construction) and return
  * NULL — failing loudly, unlike the HOF, which silently counts
  * agreement over the shorter prefix.
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_agree"
  // NULL on length mismatch even for non-nullable children (see
  // FloatVecDot — same silent-zero degradation otherwise).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $c = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getLong($i) == $b.getLong($i)) $c++;
         |  }
         |  ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

object SigAgree {
  /** Column API: sig_agree(a, b) — count of agreeing positions. */
  def agree(a: Column, b: Column): Column =
    GraftBridge.column(
      SigAgree(GraftBridge.expression(a), GraftBridge.expression(b)))
}
