package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a 64-bit hash against a pre-built Bloom filter —
  * the map-side pruning primitive behind
  * [[graft.operators.Dedup.crossCorpusOverlapBloom]].
  *
  * Spark ships this capability two ways, neither usable here: the
  * `might_contain` expression exists but lives in the internal function
  * registry (not resolvable from user SQL/Column code), and
  * `Column.isin`/broadcast-hash semi joins carry the full element SET
  * (~8+ bytes/element plus hash-table overhead) where a Bloom filter at
  * 1% false-positive rate costs ~1.2 BYTES per element — ~10× more
  * reference-set reach for the same broadcast/memory budget, at the
  * price of a bounded false-positive rate. The filter is carried as the
  * serialized `BloomFilter` sketch (java-serializable, so it rides the
  * plan's reference array to executors once, NOT per row) and
  * deserialized lazily once per executor.
  *
  * Input is the already-hashed long (the shingle pipeline's native
  * currency — [[HashedShingles]]); `mightContainLong` is a pure bitset
  * probe, codegen'd to a direct method call. False positives only, no
  * false negatives: every inserted hash answers true.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // Enforced at analysis, not discovered at runtime: without this, a
  // non-long child passes analysis and dies per-row in a
  // ClassCastException inside nullSafeEval/codegen.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a LONG (64-bit hash) input, got ${child.dataType.catalogString}")

  // Array[Byte] under case-class equals is reference equality, which
  // would make two semantically identical probes never compare equal —
  // Catalyst canonicalization (subexpression elimination, exchange
  // reuse) keys on expression equality. Compare filter CONTENTS.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(filterBytes, b.filterBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(filterBytes)

  // Deserialized at most once per (de)serialized plan copy — i.e. once
  // per executor, not per row/partition.
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    java.lang.Boolean.valueOf(filter.mightContainLong(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
  }

  // The raw bitset has no place in a plan string (it can be MBs).
  override def toString: String =
    s"bloom_might_contain($child, <${filterBytes.length} bytes>)"

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column API: true iff `hash` (long) might be in the serialized
    * filter; false ⇒ definitely absent. */
  def mightContain(hash: Column, filterBytes: Array[Byte]): Column =
    GraftBridge.column(
      BloomMightContain(GraftBridge.expression(hash), filterBytes))

  /** Serialize a driver-side [[BloomFilter]] for [[mightContain]]. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}
