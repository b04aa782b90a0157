package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Squared-L2 argmin of a subvector against a candidate array — the
  * native form of [[graft.operators.Similarity]]'s `l2Assign` HOF
  * composition:
  *
  * {{{
  * array_min(transform(cands, ct => struct(
  *   round(aggregate(zip_with(sub, ct.c, (a,b) => (a-b)*(a-b)),
  *     0.0D, (acc,x) => acc + x), 6).as("d2"),
  *   ct.cl.as("cl")))).getField("cl")
  * }}}
  *
  * That composition is the hot inner loop of every PQ/IVF encode and
  * fit-assignment pass, and every piece of it is a CodegenFallback
  * higher-order function allocating an intermediate array per
  * (row × candidate) — at m=16 subspaces × ksub=16 codewords that is
  * 256 allocations per encoded row (guide §1.2: fix per-task work once
  * the job shape is right; the [[FloatVecDot]] precedent). This
  * expression loops over the primitive values directly and generates
  * Java code, so encode stays inside whole-stage codegen.
  *
  * Numerics and EVERY null edge mirror the HOF composition exactly —
  * the bit layout of persisted PQ codes depends on it:
  *   - d2 accumulates left-to-right in double, then Spark's
  *     round(_, 6) (java BigDecimal HALF_UP — the identical call
  *     Round generates for DoubleType).
  *   - zip_with null-pads length mismatches and a null element poisons
  *     the sum, so d2 is NULL when `sub` is null, lengths differ, or
  *     any element is null.
  *   - array_min orders structs field-by-field with NULL smallest:
  *     a null d2 sorts before every real distance (all-null rows
  *     deterministically take the smallest cl), ties break on cl asc.
  *   - a null or empty candidate array yields NULL; null candidate
  *     STRUCTS are skipped (array_min's null-element rule).
  *
  * Inputs: `cands` array<struct<cl:int, c:array<double>>> (a literal
  * at the encode sites, a broadcast-joined column in the fit), `sub`
  * array<double>. Gated element-wise equal to the HOF form in
  * `ExpressionCodegenSpec`.
  */
case class L2ArgminCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "l2_argmin_code"
  // NULL on null/empty cands regardless of child nullability.
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val candsV = left.eval(input)
    if (candsV == null) return null
    val cands = candsV.asInstanceOf[ArrayData]
    val sub = right.eval(input).asInstanceOf[ArrayData] // may be null
    val r = L2ArgminCode.argminEval(cands, sub)
    if (r == Int.MinValue) null else Integer.valueOf(r)
  }

  // Manual codegen (not nullSafeCodeGen): a null `sub` must still
  // evaluate — the HOF form returns the smallest cl there, not NULL.
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val candsGen = left.genCode(ctx)
    val subGen = right.genCode(ctx)
    val res = ctx.freshName("argminRes")
    ev.copy(code =
      code"""
        ${candsGen.code}
        ${subGen.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = -1;
        if (!${candsGen.isNull}) {
          int $res = graft.expressions.L2ArgminCode.argminEval(
            ${candsGen.value},
            ${subGen.isNull} ? null : ${subGen.value});
          if ($res != Integer.MIN_VALUE) {
            ${ev.isNull} = false;
            ${ev.value} = $res;
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2ArgminCode =
    copy(left = newLeft, right = newRight)
}

object L2ArgminCode {

  /** Column API: l2_argmin_code(cands, sub). */
  def argmin(cands: Column, sub: Column): Column =
    GraftBridge.column(
      L2ArgminCode(GraftBridge.expression(cands), GraftBridge.expression(sub)))

  /** Shared by interpreted eval and generated code. Returns the winning
    * `cl`, or Int.MinValue for the NULL result (null/empty/all-skipped
    * candidate array) — a sentinel no real cl uses (cl values are
    * non-negative codeword/list indices by construction everywhere this
    * expression is planted; the HOF form would return whatever cl the
    * caller put in the struct, and callers only ever use 0..k−1). */
  def argminEval(cands: ArrayData, sub: ArrayData): Int = {
    val n = cands.numElements()
    var bestCl = 0
    var bestD2 = 0.0
    var bestNull = false
    var found = false
    var k = 0
    while (k < n) {
      if (!cands.isNullAt(k)) {
        val st = cands.getStruct(k, 2)
        val cl = st.getInt(0)
        // d2: null (isNull=true) when sub is null, the struct's c is
        // null, lengths differ, or any element is null — zip_with's
        // padding + aggregate's poisoning, verbatim.
        var d2 = 0.0
        var d2Null = false
        if (sub == null || st.isNullAt(1)) d2Null = true
        else {
          val c = st.getArray(1)
          val len = sub.numElements()
          if (c.numElements() != len) d2Null = true
          else {
            var i = 0
            while (i < len && !d2Null) {
              if (sub.isNullAt(i) || c.isNullAt(i)) d2Null = true
              else {
                val t = sub.getDouble(i) - c.getDouble(i)
                d2 += t * t
              }
              i += 1
            }
          }
        }
        if (!d2Null) {
          // Spark's round(_, 6) for DoubleType: BigDecimal HALF_UP.
          d2 = java.math.BigDecimal.valueOf(d2)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        }
        // struct-min comparison: (d2 with NULL smallest, then cl asc);
        // double order via Double.compare (NaN largest) — Spark's
        // physical double ordering.
        val lt =
          if (!found) true
          else if (d2Null && bestNull) cl < bestCl
          else if (d2Null) true
          else if (bestNull) false
          else {
            val c = java.lang.Double.compare(d2, bestD2)
            if (c != 0) c < 0 else cl < bestCl
          }
        if (lt) { bestCl = cl; bestD2 = d2; bestNull = d2Null; found = true }
      }
      k += 1
    }
    if (!found) Int.MinValue else bestCl
  }
}
