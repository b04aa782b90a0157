package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the one piece of
  * text CANONICALIZATION Spark's built-ins cannot express (the
  * control-char strip and whitespace collapse around it are plain
  * `regexp_replace`/`trim`, composed in
  * [[graft.functions.TextFunctions.canonicalize]]).
  *
  * Dedup correctness depends on this at corpus scale: "café" composed
  * (U+00E9) and decomposed (e + U+0301) are byte-distinct, so every
  * hash-keyed operator — exact dedup, shingles, MinHash, token counts —
  * silently treats visually identical documents as different unless
  * text is normalized first. NFC is the standard-mandated form, stable
  * across implementations (DuckDB's `nfc_normalize` produces
  * byte-identical output, which is what makes the q131 oracle an md5
  * gate).
  *
  * Native Catalyst expression with real codegen (the [[SimHash64]]
  * kernel pattern): `doGenCode` calls the shared kernel so the child
  * stays inside whole-stage codegen; interpreted eval delegates to the
  * same kernel, so both paths agree by construction
  * (ExpressionCodegenSpec). The kernel fast-paths already-normalized
  * strings (the overwhelmingly common case — ASCII is always NFC):
  * `Normalizer.isNormalized` is a scan without allocation, and the
  * input UTF8String is returned as-is when it holds. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.Kernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("nfcKernel", NfcNormalize.Kernel)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kernel.nfc($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared interpreted/codegen kernel (referenced from generated Java). */
  object Kernel extends Serializable {
    def nfc(s: UTF8String): UTF8String = {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  def nfc(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
  }
}
