package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary over a string column: at most
  * `capacity` counters that are guaranteed to contain EVERY value whose
  * true frequency exceeds N/(capacity+1), with each reported count an
  * underestimate by at most N/(capacity+1) (N = non-null rows seen).
  *
  * This is the shuffle-free screen for "frequent terms over a corpus
  * whose vocabulary is billions wide": a plain `groupBy(term).count`
  * shuffles the full vocabulary; this aggregate ships ≤ capacity
  * counters per partition (partial aggregation works — the summaries
  * are mergeable, Agarwal et al., "Mergeable Summaries", PODS'12), and
  * the caller then computes EXACT counts for the ≤ capacity surviving
  * candidates only (a broadcast membership filter — the second pass
  * shuffles only candidate-term rows). The one-sided guarantee makes
  * the composition exact: candidates ⊇ true heavy hitters, so the
  * rerank's threshold filter returns exactly the true heavy-hitter set
  * — the same screen-then-verify shape as the Bloom decontamination
  * path (`Dedup.crossCorpusOverlapBloom`).
  *
  * The raw summary itself is ORDER-DEPENDENT (which of the light terms
  * ride along depends on arrival order and partitioning) — only the
  * guarantee is deterministic. Queries must therefore consume it as a
  * candidate screen (what [[graft.operators.Ranking.frequentTerms]]
  * does), never expose it as a result surface; `MisraGriesSpec` pins
  * the superset guarantee and the merge bound property-style.
  *
  * Returns map&lt;string,bigint&gt; (term → lower-bound count).
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    // The input UTF8String may point into a reused row buffer — the
    // kernel's insert path copies before retaining beyond this call.
    MisraGriesTopK.Kernel.update(
      buffer, v.asInstanceOf[UTF8String], capacity,
      (s: UTF8String) => s.clone())
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    MisraGriesTopK.Kernel.merge(buffer, other, capacity)
    buffer
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    // Sorted by term for a stable map layout (the map VALUE is still
    // order-dependent data — see the scaladoc contract).
    val entries = buffer.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, v) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)
}

object MisraGriesTopK {
  /** Aggregate Column: misra_gries(term) → map&lt;string,bigint&gt; summary. */
  def summary(term: Column, capacity: Int): Column =
    GraftBridge.column(
      MisraGriesTopK(GraftBridge.expression(term), capacity)
        .toAggregateExpression())

  /** The key-type-generic Misra–Gries kernel, shared by the aggregate
    * expression (UTF8String keys) and the streaming bucket-sharded
    * screen ([[graft.streaming.StreamingHeavyHitters]], String keys) —
    * one definition of the guarantee-carrying arithmetic. */
  object Kernel {
    /** One stream element. `retain` copies a key before it is stored
      * (identity for immutable key types). */
    def update[K](
        buffer: mutable.HashMap[K, Long], key: K, capacity: Int,
        retain: K => K = (k: K) => k): Unit =
      buffer.get(key) match {
        case Some(c) => buffer.update(key, c + 1L)
        case None =>
          if (buffer.size < capacity) {
            buffer.update(retain(key), 1L)
          } else {
            // Classic decrement-all step: every resident counter pays
            // one, zeros evicted. O(capacity) per non-resident row —
            // the price of bounded memory, trivial at screen capacities.
            val dead = mutable.ArrayBuffer.empty[K]
            buffer.keysIterator.foreach { k =>
              val nc = buffer(k) - 1L
              if (nc == 0L) dead += k else buffer.update(k, nc)
            }
            dead.foreach(buffer.remove)
          }
      }

    /** Mergeable-summaries combine (Agarwal et al., PODS'12): sum
      * counts, then subtract the (capacity+1)-th largest from every
      * counter and drop the non-positive — ≤ capacity survive with the
      * cumulative underestimate still within N_total/(capacity+1). */
    def merge[K](
        buffer: mutable.HashMap[K, Long], other: scala.collection.Map[K, Long],
        capacity: Int): Unit = {
      other.foreach { case (k, v) =>
        buffer.update(k, buffer.getOrElse(k, 0L) + v)
      }
      if (buffer.size > capacity) {
        val counts = buffer.values.toArray
        java.util.Arrays.sort(counts)
        val sub = counts(counts.length - capacity - 1)
        val dead = mutable.ArrayBuffer.empty[K]
        buffer.keysIterator.foreach { k =>
          val nc = buffer(k) - sub
          if (nc <= 0L) dead += k else buffer.update(k, nc)
        }
        dead.foreach(buffer.remove)
      }
    }
  }
}
