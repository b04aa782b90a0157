package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two `array<float>` columns, accumulated in double with a
  * sequential left-to-right loop.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * composition on the embedding hot path: HOFs are CodegenFallback and
  * materialize an intermediate array per row, which at millions of
  * candidate pairs dominates the runtime. This expression loops over the
  * primitive values directly (no allocation) and generates Java code so it
  * stays inside whole-stage codegen.
  *
  * Numerics are IDENTICAL to the HOF version and to the DuckDB oracle SQL
  * (`list_sum(list_transform(...))`): float widened to double exactly,
  * then one sequential fold — keep it that way or the oracle hash breaks.
  *
  * Null semantics also mirror `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (s,v) -> s+v)`: mismatched lengths null-pad the shorter array and
  * a null element poisons the sum, so both cases return NULL — malformed
  * rows fail loudly (oracle-hash-visibly) instead of silently dotting a
  * prefix.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"
  // Can produce NULL (length mismatch / null element) even for
  // non-nullable children — without this, codegen keeps isNull=false and
  // the malformed-row NULL silently degrades to 0.0.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column API: float_vec_dot(a, b). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatVecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
