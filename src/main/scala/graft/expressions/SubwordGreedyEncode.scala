package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword encode of ONE word against a constant
  * (piece → id) vocabulary — the native form of
  * [[graft.operators.Subword.encodeWithVocab]]'s per-word walk:
  *
  * {{{
  * aggregate(sequence(1, length(w)), struct(pos=1, ids=[]), (acc, _) =>
  *   ...filter(transform(sequence(1, M), l =>
  *        struct(l, element_at(vmapLit, substr(w, pos, l))))...
  *      array_max ... )
  * }}}
  *
  * That chain is a CodegenFallback aggregate running `length(w)`
  * iterations per word OCCURRENCE, each allocating a candidate array
  * of `maxPieceLen` structs and probing a map LITERAL at O(V) per
  * probe (Catalyst's array-backed map) — measured ~3 s of the
  * q121-shaped encode at sf0.1 (guide §1.2; the
  * [[L2ArgminCode]]/[[FloatVecDot]] discipline). This expression walks
  * the word's chars directly against a driver-built hash map: at each
  * position it takes the LONGEST vocabulary piece that fits the
  * remaining suffix (identical to array_max over (l, vid) — one piece
  * per (position, length), so the longest candidate is the max),
  * emitting UNK −1 and advancing one char on no match. Substrings use
  * `UTF8String.substringSQL` — the same kernel `Column.substr`
  * evaluates — and map keys compare as UTF8String bytes, exactly like
  * the literal map probe.
  *
  * NULL in → NULL out (the HOF aggregate over `sequence(1, null)` is
  * null); empty word → empty array (the `when(length === 0)` guard).
  * Gated element-wise equal to the HOF form in
  * `ExpressionCodegenSpec`.
  */
case class SubwordGreedyEncode(
    child: Expression, vocab: Map[String, Int], maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "subword_greedy_encode"

  // The UTF8String-keyed probe table, built once per expression
  // instance (driver side; ships with the serialized expression).
  @transient private lazy val table = SubwordGreedyEncode.tableOf(vocab)

  override def nullSafeEval(wordAny: Any): Any =
    SubwordGreedyEncode.encodeEval(
      wordAny.asInstanceOf[UTF8String], table, maxPieceLen)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("subwordVocab", table,
      classOf[java.util.HashMap[UTF8String, Integer]].getName)
    nullSafeCodeGen(ctx, ev, w => {
      s"""
         |${ev.value} = graft.expressions.SubwordGreedyEncode.encodeEval(
         |  $w, $tableRef, $maxPieceLen);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): SubwordGreedyEncode =
    copy(child = newChild)
}

object SubwordGreedyEncode {

  /** Column API: subword_greedy_encode(word) against a constant
    * vocabulary. */
  def encode(word: Column, vocab: Map[String, Int],
      maxPieceLen: Int): Column =
    GraftBridge.column(SubwordGreedyEncode(
      GraftBridge.expression(word), vocab, maxPieceLen))

  def tableOf(vocab: Map[String, Int]): java.util.HashMap[UTF8String, Integer] = {
    val t = new java.util.HashMap[UTF8String, Integer](vocab.size * 2)
    vocab.foreach { case (p, vid) => t.put(UTF8String.fromString(p), vid) }
    t
  }

  /** Shared by interpreted eval and generated code: the greedy
    * longest-match walk. */
  def encodeEval(word: UTF8String,
      table: java.util.HashMap[UTF8String, Integer],
      maxPieceLen: Int): ArrayData = {
    val len = word.numChars()
    if (len == 0) return new GenericArrayData(Array.empty[Int])
    val ids = new scala.collection.mutable.ArrayBuffer[Int](len)
    var pos = 1
    while (pos <= len) {
      // longest match first — array_max over (l, vid) structs picks the
      // largest l (one piece per (position, length))
      var l = math.min(maxPieceLen, len - pos + 1)
      var hit: Integer = null
      while (l >= 1 && hit == null) {
        hit = table.get(word.substringSQL(pos, l))
        if (hit == null) l -= 1
      }
      if (hit == null) { ids += -1; pos += 1 }
      else { ids += hit.intValue(); pos += l }
    }
    new GenericArrayData(ids.toArray)
  }
}
