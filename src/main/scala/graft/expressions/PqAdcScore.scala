package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The batch ADC lookup sum ⟨q, decode(codes)⟩ — the native form of
  * [[graft.operators.Similarity]]'s per-(query, code) scoring chain in
  * `ivfPqShortlistBatch`:
  *
  * {{{
  * (0 until m).map { j =>
  *   aggregate(zip_with(slice(transform(qv, cast double),
  *     j*dsub+1, dsub), cb[j][code_j], (x,y) => x*y), 0.0, (s,v) => s+v)
  * }.reduce(_ + _)
  * }}}
  *
  * Every piece of that chain is a CodegenFallback higher-order function
  * allocating intermediate arrays per (row × subspace) — m=16 slices +
  * 16 zip_with results per scored pair (guide §1.2; the
  * [[L2ArgminCode]]/[[FloatVecDot]] discipline). This expression reads
  * the float query vector and the packed long directly: per subspace it
  * extracts the codeword index from the code's bit field, accumulates
  * the dsub-term dot in its own double (left-to-right), then adds the
  * subspace terms left-to-right — the same float association as the HOF
  * chain AND as [[graft.operators.Similarity]]'s driver LUT
  * (`adcApproxCol`), so single-query and batch stay bit-mirrored.
  *
  * Codebooks ride in the expression as a constant [m][ksub][dsub]
  * array; codewords that died in training are NegativeInfinity-filled,
  * exactly like the literal array the HOF chain indexed. NULL when
  * `qv` is null, shorter than m·dsub (zip_with's null padding), or has
  * a null element in the first m·dsub positions — the HOF chain's
  * poisoning, verbatim. The unrounded sum is returned; callers keep
  * the 6-dp round (and the residual offset) in column land.
  *
  * Gated element-wise equal to the HOF chain in
  * `ExpressionCodegenSpec`.
  */
case class PqAdcScore(
    left: Expression, right: Expression,
    cb: Array[Array[Array[Double]]], bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"
  override def nullable: Boolean = true

  override def nullSafeEval(qvAny: Any, codesAny: Any): Any = {
    val r = PqAdcScore.scoreEval(
      qvAny.asInstanceOf[ArrayData],
      codesAny.asInstanceOf[java.lang.Long].longValue(), cb, bits)
    if (r == null) null else r
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("adcCb", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, (qv, codes) => {
      val boxed = ctx.freshName("adcBoxed")
      s"""
         |java.lang.Double $boxed = graft.expressions.PqAdcScore.scoreEval(
         |  $qv, $codes, $cbRef, $bits);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {

  /** Column API: pq_adc_score(qv, codes) against constant codebooks —
    * `cb` indexed [subspace][codeword][dim], `bits` = log2(ksub). */
  def score(qv: Column, codes: Column,
      cb: Array[Array[Array[Double]]], bits: Int): Column =
    GraftBridge.column(PqAdcScore(
      GraftBridge.expression(qv), GraftBridge.expression(codes), cb, bits))

  /** Shared by interpreted eval and generated code. Null (boxed) on the
    * HOF chain's poisoning cases; otherwise the per-subspace-then-total
    * left-to-right sum. */
  def scoreEval(qv: ArrayData, codes: Long,
      cb: Array[Array[Array[Double]]], bits: Int): java.lang.Double = {
    val m = cb.length
    val dsub = if (m == 0) 0 else cb(0)(0).length
    if (qv.numElements() < m * dsub) return null
    val mask = (1L << bits) - 1L
    var total = 0.0
    var j = 0
    while (j < m) {
      val cw = cb(j)(((codes >> (j * bits)) & mask).toInt)
      var term = 0.0
      var i = 0
      val off = j * dsub
      while (i < dsub) {
        if (qv.isNullAt(off + i)) return null
        term += qv.getFloat(off + i).toDouble * cw(i)
        i += 1
      }
      total += term
      j += 1
    }
    java.lang.Double.valueOf(total)
  }
}
