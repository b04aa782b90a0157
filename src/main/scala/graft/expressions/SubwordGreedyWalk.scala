package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** The greedy subword walk over a PRE-MATERIALIZED longest-match map —
  * the native form of [[graft.operators.Subword.encodeWithVocabJoin]]'s
  * per-distinct-word walk: `pmap` maps position → (piece length, vid)
  * (the join path's per-word aggregate), the walk emits the position's
  * best piece and jumps its length, UNK −1 and advance 1 on a missing
  * position, a NULL map (left-join miss — zero matches anywhere) is
  * all-UNK. Same CodegenFallback-aggregate rationale as
  * [[SubwordGreedyEncode]] (the literal-probe twin): the HOF ran
  * `length(word)` iterations per distinct word, each allocating the
  * accumulator struct and probing the map column via `element_at`.
  *
  * NULL word → NULL (the HOF aggregate over `sequence(1, null)`);
  * empty word → empty array. Gated element-wise equal to the HOF form
  * in `ExpressionCodegenSpec`.
  */
case class SubwordGreedyWalk(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "subword_greedy_walk"
  override def nullable: Boolean = true

  // Manual eval (not nullSafeEval): a NULL map must still walk (all-UNK).
  override def eval(input: InternalRow): Any = {
    val wordV = left.eval(input)
    if (wordV == null) return null
    val pmapV = right.eval(input)
    SubwordGreedyWalk.walkEval(
      wordV.asInstanceOf[UTF8String],
      if (pmapV == null) null else pmapV.asInstanceOf[MapData])
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val wordGen = left.genCode(ctx)
    val pmapGen = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${wordGen.code}
        ${pmapGen.code}
        boolean ${ev.isNull} = ${wordGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.expressions.SubwordGreedyWalk.walkEval(
            ${wordGen.value}, ${pmapGen.isNull} ? null : ${pmapGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubwordGreedyWalk =
    copy(left = newLeft, right = newRight)
}

object SubwordGreedyWalk {

  /** Column API: subword_greedy_walk(word, pmap) — `pmap` a
    * map<int, struct<l:int, vid:int>> column. */
  def walk(word: Column, pmap: Column): Column =
    GraftBridge.column(SubwordGreedyWalk(
      GraftBridge.expression(word), GraftBridge.expression(pmap)))

  /** Shared by interpreted eval and generated code. `pmap` may be null
    * (all-UNK). */
  def walkEval(word: UTF8String, pmap: MapData): ArrayData = {
    val len = word.numChars()
    if (len == 0) return new GenericArrayData(Array.empty[Int])
    val nKeys = if (pmap == null) 0 else pmap.numElements()
    val keys = if (pmap == null) null else pmap.keyArray()
    val vals = if (pmap == null) null else pmap.valueArray()
    // position → (l, vid), densely indexed; positions are 1..len by
    // construction (substring positions of the word)
    val lByPos = new Array[Int](len + 1)
    val vidByPos = new Array[Int](len + 1)
    var k = 0
    while (k < nKeys) {
      val p = keys.getInt(k)
      if (p >= 1 && p <= len) {
        val st = vals.getStruct(k, 2)
        lByPos(p) = st.getInt(0)
        vidByPos(p) = st.getInt(1)
      }
      k += 1
    }
    val ids = new scala.collection.mutable.ArrayBuffer[Int](len)
    var pos = 1
    while (pos <= len) {
      if (lByPos(pos) == 0) { ids += -1; pos += 1 }
      else { ids += vidByPos(pos); pos += lByPos(pos) }
    }
    new GenericArrayData(ids.toArray)
  }
}
