package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable non-equi (range) joins.
  *
  * A point-in-interval join `p.x BETWEEN i.lo AND i.hi` has no equality
  * key, so Spark plans it as a nested-loop join — broadcast NL when one
  * side is small (fine), but O(|P|·|I|) work when both sides are big:
  * the classic scale cliff.
  *
  * [[pointInInterval]] restores an equality key by bucketing the range
  * domain: each interval explodes to the fixed-width buckets it overlaps,
  * each point maps to exactly ONE bucket, the join runs as a plain
  * shuffle hash/sort-merge join on the bucket id, and the original range
  * predicate re-applies as a post-filter — results are EXACT for
  * arbitrary (unaligned, overlapping) intervals. Shuffle volume is
  * |P| + Σ(interval width / bucketWidth): linear, tunable via
  * `bucketWidth` (≈ median interval width is a good default; smaller →
  * more interval replicas, larger → more false candidates filtered
  * post-join).
  */
object RangeJoin {

  /** Join `points` to every interval (from `intervals`) containing them:
    * keeps rows with `lo <= x < hi` (half-open). Both inputs may be
    * arbitrarily large; neither is broadcast.
    *
    * @param bucketWidth width of the equality buckets in domain units
    */
  def pointInInterval(
      points: DataFrame, x: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // An interval [lo, hi) overlaps buckets floor(lo/w) .. floor(hi/w)
    // (hi exclusive, but the bucket containing hi may still hold points
    // < hi, so it is included; the post-filter discards the rest).
    val iv = intervals
      .withColumn("__b",
        explode(sequence(
          floor(lo / bucketWidth).cast("long"),
          floor(hi / bucketWidth).cast("long"))))
    val pt = points.withColumn("__b", floor(x / bucketWidth).cast("long"))
    pt.join(iv, Seq("__b"))
      .filter(x >= lo && x < hi)
      .drop("__b")
  }
}
