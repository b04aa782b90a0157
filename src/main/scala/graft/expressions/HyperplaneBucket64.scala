package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Random-hyperplane LSH bucket of an `array<float>` embedding: sign bits
  * of `nBits` pseudo-random projections packed into a long.
  *
  * Bit-exact re-expression of the HOF formulation in
  * [[graft.functions.VectorFunctions.hyperplaneBucket]]'s original form —
  * plane b's ±1 coefficient for dimension i is the parity of Spark's
  * `hash(i, b)` (Murmur3, seed 42), and each projection folds
  * sequentially over i in double. The HOF version runs nBits interpreted
  * aggregate/zip_with passes per row (CodegenFallback, 2·nBits array
  * allocations); this expression computes all planes in ONE pass over
  * the vector with no allocation, inside whole-stage codegen.
  */
case class HyperplaneBucket64(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 32, "bucket bits must be in [1, 32]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      HyperplaneBucket64.Kernel.bucket(input.asInstanceOf[ArrayData], nBits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // addReferenceObj, NOT a source-level "Outer$Kernel.MODULE$" path:
    // nested Scala objects have no mirror class, so the latter fails
    // janino compilation and the expression silently runs interpreted
    // with a recompile attempt per task.
    val kernel = ctx.addReferenceObj("hyperplaneKernel", HyperplaneBucket64.Kernel)
    defineCodeGen(ctx, ev, a => s"$kernel.bucket($a, $nBits)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket64 =
    copy(child = newChild)
}

object HyperplaneBucket64 {

  /** Shared interpreted/codegen kernel (same object serves both paths, so
    * equality between them is structural, not tested-in). */
  object Kernel extends Serializable {
    def bucket(v: ArrayData, nBits: Int): Long = {
      val n = v.numElements()
      val projs = new Array[Double](nBits)
      var i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble
        // Spark's hash(i, b): murmur3 int chain from seed 42.
        val h1 = Murmur3_x86_32.hashInt(i, 42)
        var b = 0
        while (b < nBits) {
          val h = Murmur3_x86_32.hashInt(b, h1)
          // pmod(h, 2): +1 when odd, -1 when even (matches pmod semantics
          // for negative hashes)
          val sign = if (((h % 2) + 2) % 2 == 1) 1.0 else -1.0
          projs(b) += x * sign
          b += 1
        }
        i += 1
      }
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        if (projs(b) >= 0) bucket |= (1L << b)
        b += 1
      }
      bucket
    }
  }

  /** Column API: hyperplane_bucket(vec, nBits). */
  def bucket(a: Column, nBits: Int): Column =
    GraftBridge.column(HyperplaneBucket64(GraftBridge.expression(a), nBits))
}
