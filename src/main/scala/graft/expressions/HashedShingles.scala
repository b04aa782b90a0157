package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct xxhash64 hashes of a text's word n-gram shingles —
  * the whole shingling pipeline of the dedup operators as ONE codegen'd
  * expression.
  *
  * Semantics are identical (parity pinned in `ExpressionCodegenSpec`) to
  * the builtin composition the operators previously ran:
  *
  *   array_sort(transform(
  *     <lower/trim/split-\s+/n-gram-join/array_distinct shingling>,
  *     s => xxhash64(s)))
  *
  * which crossed three CodegenFallback higher-order functions and
  * materialized every shingle string twice. Fewer than n tokens →
  * the whole text is the single shingle (matching the HOF's
  * `when(size < n, array(array_join(toks)))` branch).
  */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HashedShingles.Kernel.shingleHashes(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("shingleKernel", HashedShingles.Kernel)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $kernel.shingleHashes($a, $n));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a text whose xxhash64 falls in a
  * given (small, sorted) hash set — the "rehydrate only the winners"
  * second pass of corpus n-gram statistics as ONE codegen'd expression.
  *
  * Tokenization/shingling is byte-identical to [[HashedShingles]] (same
  * kernel), so a gram emitted here hashes to exactly the value the
  * counting pass aggregated. Every distinct gram still materializes
  * per-document inside the kernel (the dedup set needs the strings), but
  * non-matching grams are dropped there: they never become output rows,
  * never reach the operator above, and are never shuffled.
  *
  * `sortedHashes` is a Seq (not Array) so the case-class equals/hashCode
  * compare elementwise — Array's reference equality would break
  * expression canonicalization and plan-cache matching.
  */
case class ShinglesInHashSet(child: Expression, n: Int, sortedHashes: Seq[Long])
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  // The kernel binary-searches a primitive array; built once per
  // expression instance, shipped to executors inside the expression.
  private lazy val sortedArr: Array[Long] = sortedHashes.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_in_hash_set"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HashedShingles.Kernel.gramsInSet(
        input.asInstanceOf[UTF8String], n, sortedArr))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("shingleKernel", HashedShingles.Kernel)
    val set = ctx.addReferenceObj("winnerHashes", sortedArr, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $kernel.gramsInSet($a, $n, $set));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesInHashSet =
    copy(child = newChild)
}

object HashedShingles {

  /** Shared interpreted/codegen kernel (referenced from generated Java). */
  object Kernel extends Serializable {

    // Precompiled once: String.split("\\s+") has no single-char fast path,
    // so it would recompile the regex on EVERY document.
    private val Whitespace = java.util.regex.Pattern.compile("\\s+")

    /** Distinct shingle strings in first-occurrence order — the exact
      * builtin-chain semantics (trim+lower, \s+ split, n-gram join,
      * array_distinct; < n tokens → whole text as one shingle). */
    private def distinctShingles(text: UTF8String, n: Int): java.util.LinkedHashSet[String] = {
      // Match the builtin chain exactly: UTF8String trim+toLowerCase
      // (locale-independent, same as Lower/StringTrim), then Java-regex
      // \s+ split (same as StringSplit with limit -1).
      val lowered = text.trim().toLowerCase.toString
      val toks = Whitespace.split(lowered, -1)
      val distinct = new java.util.LinkedHashSet[String]()
      if (toks.length < n) {
        distinct.add(toks.mkString(" "))
      } else {
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          distinct.add(sb.toString)
          i += 1
        }
      }
      distinct
    }

    def shingleHashes(text: UTF8String, n: Int): Array[Long] = {
      val distinct = distinctShingles(text, n)
      val out = new Array[Long](distinct.size())
      val it = distinct.iterator()
      var k = 0
      while (it.hasNext) {
        out(k) = XxHash64Function.hash(
          UTF8String.fromString(it.next()), StringType, 42L)
        k += 1
      }
      java.util.Arrays.sort(out)
      out
    }

    /** Shingles whose hash is in `sorted` (binary search), as UTF8Strings.
      * Emits in first-occurrence order; callers dedup/order globally. */
    def gramsInSet(text: UTF8String, n: Int, sorted: Array[Long]): Array[Any] = {
      val distinct = distinctShingles(text, n)
      val out = new java.util.ArrayList[Any](4)
      val it = distinct.iterator()
      while (it.hasNext) {
        val u = UTF8String.fromString(it.next())
        val h = XxHash64Function.hash(u, StringType, 42L)
        if (java.util.Arrays.binarySearch(sorted, h) >= 0) out.add(u)
      }
      out.toArray
    }
  }

  /** Column API: hashed_shingles(text, n). */
  def shingles(text: Column, n: Int): Column =
    GraftBridge.column(HashedShingles(GraftBridge.expression(text), n))

  /** Column API: shingles_in_hash_set(text, n, hashes) — hashes need not
    * be pre-sorted; sorted defensively here for the kernel's binary search. */
  def shinglesInSet(text: Column, n: Int, hashes: Array[Long]): Column =
    GraftBridge.column(
      ShinglesInHashSet(GraftBridge.expression(text), n,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(hashes.sorted)))
}
