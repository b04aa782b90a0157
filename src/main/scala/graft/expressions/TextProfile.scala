package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All per-document text metrics in ONE pass: token count, punctuation
  * ratio, EN-stopword ratio, mean token length, the 0–4 quality score,
  * and the argmax language ID — as a single struct-returning expression.
  *
  * Why: the metric battery built from per-metric columns tokenizes the
  * document once PER METRIC (and language-ID once per language), and a
  * filter on computed metrics gets alias-substituted by the optimizer, so
  * the whole battery evaluates AGAIN inside the pushed predicate — where
  * the oversized expression tree also falls out of whole-stage codegen
  * and loses common-subexpression elimination (measured 5.8× slower than
  * the projection alone on the quality-filter query). One kernel call
  * computes everything; even when the optimizer duplicates it into a
  * predicate, the cost is two cheap passes, and identical subtrees
  * collapse to one evaluation under codegen CSE.
  *
  * Field semantics are BIT-IDENTICAL to the legacy per-metric column
  * compositions in [[graft.functions.TextFunctions]] (parity pinned in
  * `ExpressionCodegenSpec`), including: `length(trim)` space-only trim
  * guard for the zero-token case, Java-regex `[\w\s]` (ASCII) punct
  * classes over the RAW text, lowercase-then-split tokenization,
  * int/int → double division, and the en>es>de>fr first-match argmax
  * with "und" for no hits.
  */
case class TextProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextProfile.schema
  override def prettyName: String = "text_profile"

  override def nullSafeEval(input: Any): Any =
    TextProfile.Kernel.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("textProfileKernel", TextProfile.Kernel)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kernel.profile($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
}

object TextProfile {

  // Precompiled once: String.split("\\s+") has no single-char fast path,
  // so it would recompile the regex on EVERY document.
  private[expressions] val Whitespace = java.util.regex.Pattern.compile("\\s+")

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("avg_token_len", DoubleType, nullable = false),
    StructField("quality", IntegerType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  /** Shared interpreted/codegen kernel (referenced from generated Java). */
  object Kernel extends Serializable {
    import graft.functions.TextFunctions.{StopDe, StopEn, StopEs, StopFr}

    @transient private lazy val sets: Array[java.util.HashSet[String]] =
      Array(StopEn, StopEs, StopDe, StopFr).map { words =>
        val s = new java.util.HashSet[String](words.size * 2)
        words.foreach(s.add)
        s
      }

    // Java default regex classes (ASCII): \w = [a-zA-Z0-9_],
    // \s = [ \t\n\x0B\f\r] — the classes regexp_replace(c,"[\\w\\s]","")
    // uses, applied per code point.
    private def isWordChar(cp: Int): Boolean =
      (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9') || cp == '_'
    private def isSpaceChar(cp: Int): Boolean =
      cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'

    def profile(text: UTF8String): InternalRow = {
      // punct count over the RAW text, in code points (== length()
      // of the regex-stripped string)
      val raw = text.toString
      var punct = 0
      var rawCp = 0
      var i = 0
      while (i < raw.length) {
        val cp = raw.codePointAt(i)
        if (!isWordChar(cp) && !isSpaceChar(cp)) punct += 1
        rawCp += 1
        i += Character.charCount(cp)
      }
      // tokenCount guard: length(trim(text)) == 0 → 0 tokens
      // (UTF8String.trim strips 0x20 spaces only, same as the trim() SQL
      // function the legacy composition used)
      val trimmed = text.trim()
      val lowered = trimmed.toLowerCase.toString
      val toks = TextProfile.Whitespace.split(lowered, -1)
      val nTokens = if (trimmed.numChars() == 0) 0 else toks.length
      var sumTokLen = 0
      val hits = new Array[Int](4)
      var t = 0
      while (t < toks.length) {
        val tok = toks(t)
        sumTokLen += tok.codePointCount(0, tok.length)
        var l = 0
        while (l < 4) {
          if (sets(l).contains(tok)) hits(l) += 1
          l += 1
        }
        t += 1
      }
      val punctRatio = punct.toDouble / math.max(rawCp, 1).toDouble
      val nTokFloor = math.max(nTokens, 1)
      val stopRatio = hits(0).toDouble / nTokFloor.toDouble
      val avgTokLen = sumTokLen.toDouble / nTokFloor.toDouble
      val quality =
        (if (nTokens >= 5 && nTokens <= 5000) 1 else 0) +
          (if (punctRatio < 0.3) 1 else 0) +
          (if (stopRatio > 0.05) 1 else 0) +
          (if (avgTokLen >= 2.0 && avgTokLen <= 15.0) 1 else 0)
      val best = math.max(math.max(hits(0), hits(1)), math.max(hits(2), hits(3)))
      val lang =
        if (best == 0) "und"
        else if (hits(0) == best) "en"
        else if (hits(1) == best) "es"
        else if (hits(2) == best) "de"
        else "fr"
      new GenericInternalRow(Array[Any](
        nTokens, punctRatio, stopRatio, avgTokLen, quality,
        UTF8String.fromString(lang)))
    }
  }

  /** Column API: text_profile(text) → struct of all metrics. */
  def profile(c: Column): Column =
    GraftBridge.column(TextProfile(GraftBridge.expression(c)))
}
