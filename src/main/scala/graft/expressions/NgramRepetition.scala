package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** q62's repetition kernel as ONE native codegen pass: per document,
  * the number of word 2-grams and the count of the single most frequent
  * one, packed into a long (`n_grams << 32 | top_count`).
  *
  * Why a native expression (round-15, attempt 2 on the q62 engine
  * constant): the shipped shape is explode + two hash aggregations —
  * the right SPARK shape for per-doc micro-aggregation, but it pays a
  * shuffle-partitioned pipeline for what is row-LOCAL arithmetic; and
  * the round-14 `Q62AB` A/B killed the sorted-array `aggregate` HOF
  * alternative (4.6× SLOWER: struct-accumulator lambdas never reach
  * whole-stage codegen). This expression is the [[TextProfile]] mold
  * instead — a single kernel call that STAYS inside codegen: tokenize
  * once (the exact `split(lower(trim(text)), "\\s+")` semantics
  * [[TextProfile]] already pinned bit-identical), hash each adjacent
  * pair into a row-local open-addressed table, track max. No explode,
  * no aggregation, no shuffle, no per-row allocation beyond two flat
  * arrays sized to the doc.
  *
  * Gram identity is the combined 64-bit hash of the two token hashes —
  * the same accepted ~2⁻⁶⁴-per-in-doc-pair collision class as the
  * shipped `xxhash64(gram_string)` pre-aggregation projection (tokens
  * contain no whitespace, so pair identity ⟺ gram-string identity).
  * Documents with fewer than two tokens (including empty/blank text)
  * pack (1, 1): their single gram is the joined token string — the
  * shipped `when(size < 2, array(array_join(toks, " ")))` rule. Null
  * text → null (the shipped shape DROPS null-text rows at its explode;
  * callers filter `text.isNotNull` for parity — q62 does). */
case class NgramRepPacked(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ngram_rep_packed"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      NgramRepPacked.Kernel.packed(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("ngramRepKernel", NgramRepPacked.Kernel)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kernel.packed($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramRepPacked =
    copy(child = newChild)
}

object NgramRepPacked {

  /** (n_grams << 32 | top_count) of `text`'s word 2-grams. */
  def packed(text: Column): Column =
    GraftBridge.column(NgramRepPacked(GraftBridge.expression(text)))

  /** Shared interpreted/codegen kernel (referenced from generated Java). */
  object Kernel extends Serializable {

    // 64-bit avalanche (MurmurHash3 fmix64) — applied to the combined
    // pair hash so adjacent small differences spread over all bits
    // before the table mask takes the low ones.
    private def fmix64(x0: Long): Long = {
      var x = x0
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33
      x
    }

    // FNV-1a over UTF-16 chars: stable across JVMs (no JDK hashCode
    // dependence), allocation-free, and only combined pairs ever meet
    // the table (fmix64 provides the avalanche).
    private def hashToken(s: String): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < s.length) {
        h = (h ^ s.charAt(i)) * 0x100000001b3L
        i += 1
      }
      h
    }

    def packed(text: UTF8String): Long = {
      // Exact tokens() semantics: trim (0x20 only, the SQL trim),
      // lowercase, split on \s+ — the composition TextProfile pinned
      // bit-identical to split(lower(trim(text)), "\\s+").
      val lowered = text.trim().toLowerCase.toString
      val toks = TextProfile.Whitespace.split(lowered, -1)
      val n = toks.length
      if (n < 2) return (1L << 32) | 1L
      val m = n - 1
      // Token hashes once; pair hash = fmix64(h_i * C + h_{i+1}).
      val th = new Array[Long](n)
      var i = 0
      while (i < n) { th(i) = hashToken(toks(i)); i += 1 }
      // Open-addressed table, linear probing, capacity = pow2 ≥ 2m
      // (load factor ≤ 0.5). 0 is the empty sentinel; a real 0 hash
      // remaps to a fixed odd constant.
      var cap = 4
      while (cap < (m << 1)) cap <<= 1
      val keys = new Array[Long](cap)
      val cnt = new Array[Int](cap)
      val mask = cap - 1
      var best = 0
      i = 0
      while (i < m) {
        var h = fmix64(th(i) * 0x9e3779b97f4a7c15L + th(i + 1))
        if (h == 0L) h = 0x9e3779b97f4a7c15L
        var slot = (h & mask).toInt
        while (keys(slot) != 0L && keys(slot) != h) slot = (slot + 1) & mask
        keys(slot) = h
        cnt(slot) += 1
        if (cnt(slot) > best) best = cnt(slot)
        i += 1
      }
      (m.toLong << 32) | best.toLong
    }
  }
}
