package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over an `array<string>` token column.
  *
  * Classic Charikar scheme: each token contributes ±1 to 64 bit counters
  * according to its 64-bit hash; the sign of each counter becomes the
  * output bit. Near-duplicate texts land within small Hamming distance.
  *
  * Implemented as a native Catalyst `Expression` (not a UDF) with real
  * codegen: `doGenCode` emits a call to the shared [[SimHash64.Kernel]]
  * so the (expensive) child expression stays inside whole-stage codegen —
  * a `CodegenFallback` here would re-evaluate the whole child tree
  * through the interpreted path on every row. Interpreted eval delegates
  * to the same kernel, so both paths agree by construction.
  *
  * The token hash must be stable across JVMs/executors: we use two 32-bit
  * Murmur3 hashes of the UTF-8 bytes with fixed seeds, packed to 64 bits.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      SimHash64.Kernel.simhash(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("simhashKernel", SimHash64.Kernel)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kernel.simhash($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** JVM-stable 64-bit hash of a UTF8String (two seeded Murmur3_x86_32
    * passes over the raw bytes, packed). */
  private[graft] def stableHash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x85ebca6b)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** Shared interpreted/codegen kernel (referenced from generated Java). */
  object Kernel extends Serializable {
    def simhash(arr: ArrayData): Long = {
      val counters = new Array[Int](64)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = stableHash64(arr.getUTF8String(i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (counters(b) > 0) out |= (1L << b)
        b += 1
      }
      out
    }
  }

  /** Column API: simhash64(tokensColumn). */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
  }
}
