package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{Epsg2263ToWgs84, FloatVecDot, HashedShingles, MinHashSig, MinHashSigHashed, NfcNormalize, SigAgree, SimHash64, StopwordHits, TextProfile, ZOrderKey}

/** Registers the engine's custom Catalyst expressions as SQL functions:
  *
  *   simhash64(array<string>)            -> bigint
  *   minhash_sig(array<string>, k)       -> array<bigint>
  *   float_vec_dot(array<float>, array<float>) -> double
  *   sig_agree(array<bigint>, array<bigint>)   -> int
  *   epsg2263_to_wgs84(x, y)             -> array<double> [lon, lat]
  *
  * Two wirings: `spark.sql.extensions=graft.GraftExtensions` at session
  * build, or [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // Custom whole-operator plans (tier (c) of the extension ladder).
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (exprs => SimHash64(exprs.head)),
    "minhash_sig" -> (exprs =>
      MinHashSig(exprs.head, intArg(exprs(1), "minhash_sig"))),
    "float_vec_dot" -> (exprs => FloatVecDot(exprs.head, exprs(1))),
    "sig_agree" -> (exprs => SigAgree(exprs.head, exprs(1))),
    "hashed_shingles" -> (exprs =>
      HashedShingles(exprs.head, intArg(exprs(1), "hashed_shingles"))),
    "minhash_sig_hashed" -> (exprs =>
      MinHashSigHashed(exprs.head, intArg(exprs(1), "minhash_sig_hashed"))),
    "text_profile" -> (exprs => TextProfile(exprs.head)),
    "epsg2263_to_wgs84" -> (exprs => Epsg2263ToWgs84(exprs.head, exprs(1))),
    "nfc_normalize" -> (exprs => NfcNormalize(exprs.head)),
    "zorder_key" -> (exprs =>
      ZOrderKey(exprs.head, exprs(1), intArg(exprs(2), "zorder_key"))),
  )

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
