package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) key: interleaves the low `bits` bits of two
  * non-negative long coordinates — x on even positions, y on odd — so
  * that sorting by the key clusters rows that are close in BOTH
  * dimensions. This is the data-layout operator behind multi-dimension
  * file clustering (Delta/Iceberg `OPTIMIZE ZORDER BY`): a table
  * rewritten in z-key order gives every file a tight min/max bounding
  * box in x AND y, so a two-dimensional predicate prunes files the way
  * a one-dimensional sort can only prune for its single leading column.
  *
  * The engine-side operator is just this key (a pure row-local
  * expression — the sort/write that consumes it is ordinary Spark); at
  * 100 TB the caller range-partitions by the key (`repartitionByRange`)
  * and writes, and parquet row-group stats do the pruning from then on.
  *
  * Contract: both inputs must already be bucketed into [0, 2^bits) —
  * out-of-range (including negative) values return NULL rather than
  * silently folding distant rows into one locality bucket (same
  * loud-malformed-row discipline as [[FloatVecDot]]). `bits` ≤ 31 keeps
  * the interleaved key inside a positive long.
  *
  * A native expression rather than a 2·bits-term `shiftright/and/or`
  * Column tree: the unrolled tree is hundreds of codegen nodes per row
  * at bits=20 and threatens the 64 KB JIT method limit inside wider
  * projections; this generates one tight loop and stays inside
  * whole-stage codegen. Interpreted/codegen parity is pinned in
  * `ZOrderSpec`.
  */
case class ZOrderKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"
  // NULL for out-of-range inputs even when children are non-nullable.
  override def nullable: Boolean = true

  private val limit: Long = 1L << bits

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    if (x < 0L || y < 0L || x >= limit || y >= limit) return null
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    java.lang.Long.valueOf(z)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |if ($a < 0L || $b < 0L || $a >= ${limit}L || $b >= ${limit}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $z = 0L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    $z |= (($a >> $i) & 1L) << (2 * $i);
         |    $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |  }
         |  ${ev.value} = $z;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Column API: zorder_key(x, y) over `bits`-bit bucketed coords. */
  def zorder(x: Column, y: Column, bits: Int): Column =
    GraftBridge.column(
      ZOrderKey(GraftBridge.expression(x), GraftBridge.expression(y), bits))
}
