package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-permutation MinHash signature of an `array<string>` shingle set.
  *
  * Each shingle is hashed ONCE (stable 64-bit Murmur, shared with
  * [[SimHash64]]); the k "permutations" are affine mixes
  * `a_i * h + b_i` of that base hash (standard universal-hash trick), so
  * the per-row cost is |shingles| string hashes + k·|shingles| long
  * multiply-adds in a tight loop — versus the naive HOF formulation
  * (`transform(seq(k), s -> array_min(transform(shingles, xxhash64)))`)
  * which re-hashes every string k times through interpreted lambdas and
  * was the single hottest stage in the first benchmark run.
  *
  * Codegen calls the shared [[MinHashSig.Kernel]] so the child expression
  * stays inside whole-stage codegen; interpreted eval uses the same
  * kernel (both paths agree by construction).
  *
  * Signature equality properties (what MinHash needs) only require the
  * mixes to be pairwise-independent-ish; exact hash choice is free since
  * this operator is approximate (no SQL oracle).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSig.Kernel.signature(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("minhashKernel", MinHashSig.Kernel)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $kernel.signature($a, $k));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private[expressions] val MultA = 0x9e3779b97f4a7c15L // golden-ratio odd
  private[expressions] val MultB = 0xc2b2ae3d27d4eb4fL

  /** Murmur3 64-bit finalizer. */
  private[expressions] def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Shared interpreted/codegen kernel (referenced from generated Java). */
  object Kernel extends Serializable {
    def signature(arr: ArrayData, k: Int): Array[Long] = {
      val n = arr.numElements()
      val sig = Array.fill[Long](k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = SimHash64.stableHash64(arr.getUTF8String(i))
          var j = 0
          while (j < k) {
            val a = MultA + 2L * j
            val b = MultB * (j + 1)
            val m = fmix64(a * h + b)
            if (m < sig(j)) sig(j) = m
            j += 1
          }
        }
        i += 1
      }
      sig
    }
  }

  /** Column API: minhash_sig(shingles, k). */
  def minhashSig(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingles), k))

  /** Column API: minhash signature from PRE-HASHED shingles
    * (`array<long>`, e.g. [[HashedShingles]]) — skips the string hashing
    * entirely; the k affine mixes run on the existing 64-bit values. */
  def minhashSigFromHashes(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSigHashed(GraftBridge.expression(hashes), k))
}

/** [[MinHashSig]] over an `array<long>` of pre-hashed shingles: the same
  * k affine-mix minimums, with the base hash taken from the input array
  * (shared with the verification path via [[HashedShingles]], so the
  * dedup chain hashes each shingle string exactly once). MinHash only
  * needs a uniform base hash; xxhash64 (HashedShingles) and the string
  * kernel's Murmur both qualify. */
case class MinHashSigHashed(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_hashed"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSigHashed.Kernel.signature(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("minhashHashedKernel", MinHashSigHashed.Kernel)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $kernel.signature($a, $k));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigHashed =
    copy(child = newChild)
}

object MinHashSigHashed {
  /** Shared interpreted/codegen kernel (referenced from generated Java). */
  object Kernel extends Serializable {
    def signature(arr: ArrayData, k: Int): Array[Long] = {
      val n = arr.numElements()
      val sig = Array.fill[Long](k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val a = MinHashSig.MultA + 2L * j
          val b = MinHashSig.MultB * (j + 1)
          val m = MinHashSig.fmix64(a * h + b)
          if (m < sig(j)) sig(j) = m
          j += 1
        }
        i += 1
      }
      sig
    }
  }
}
