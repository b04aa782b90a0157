package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * All arithmetic is widened to double FIRST (float→double widening is
  * exact), then folded sequentially — both choices mirrored in the DuckDB
  * oracle SQL so cosine scores are bit-identical across engines.
  * Compositions of built-in higher-order functions; no UDFs.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double, sequential fold. Native codegen'd expression
    * (see [[graft.expressions.FloatVecDot]]); requires `array<float>`
    * inputs. Numerically identical to the HOF composition
    * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, +)`. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.FloatVecDot.dot(a, b)

  /** Σ aᵢ² in double. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity: dot / (√‖a‖² · √‖b‖²) — this exact association is
    * mirrored in oracle SQL; do not refactor to sqrt(na*nb). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Random-hyperplane LSH bucket: sign bits of `nBits` pseudo-random
    * hyperplane projections packed into a long. The "hyperplanes" are
    * deterministic per (bit, dim) via a hash-seeded ±1 pattern — no stored
    * model, so the same expression computes the same bucket on any
    * executor at any scale. Native codegen'd expression (see
    * [[graft.expressions.HyperplaneBucket64]]): one pass over the vector
    * for all planes; the original nBits-HOF-passes formulation is pinned
    * equal in `ExpressionCodegenSpec`. */
  def hyperplaneBucket(a: Column, nBits: Int): Column =
    graft.expressions.HyperplaneBucket64.bucket(a, nBits)

  /** The pre-native HOF formulation of [[hyperplaneBucket]] — retained
    * ONLY as the equality oracle for the native expression's tests. */
  private[graft] def hyperplaneBucketHof(a: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { b =>
      val proj = aggregate(
        zip_with(a, sequence(lit(0), size(a) - 1), (x, i) =>
          x.cast("double") *
            (pmod(hash(i, lit(b)), lit(2)).cast("double") * 2.0 - 1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
