package graft

import org.apache.spark.sql.functions._

import graft.expressions.ZOrderKey

/** ZOrderKey: bit-level correctness vs a reference interleave, the
  * out-of-range→NULL contract, and the locality property the operator
  * exists for — z-sorted blocks have small bounding boxes in BOTH
  * dimensions (the parquet min/max pruning story). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zorder_key equals the reference interleave (codegen path)") {
    val rnd = new scala.util.Random(42)
    val pts = (0 until 500).map(_ =>
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = pts.toDF("x", "y")
      .repartition(3) // defeat ConvertToLocalRelation so codegen runs
      .select(col("x"), col("y"),
        ZOrderKey.zorder(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refZ(x, y, 16), s"($x, $y)")
    }
  }

  test("zorder_key is NULL for negative or out-of-range inputs") {
    val got = Seq((-1L, 5L), (5L, -1L), (1L << 16, 0L), (0L, 1L << 16),
        (65535L, 65535L))
      .toDF("x", "y")
      .repartition(2)
      .select(ZOrderKey.zorder(col("x"), col("y"), 16).as("z"))
      .collect().map(r => Option(r.get(0)))
    assert(got.take(4).forall(_.isEmpty), s"out-of-range must be NULL: ${got.toSeq}")
    assert(got(4).contains(refZ(65535L, 65535L, 16)), "max in-range value is valid")
  }

  test("interpreted path agrees with codegen (local-relation fold)") {
    // No repartition: ConvertToLocalRelation evaluates interpreted.
    val interp = Seq((123L, 456L)).toDF("x", "y")
      .select(ZOrderKey.zorder(col("x"), col("y"), 16)).collect()(0).getLong(0)
    assert(interp == refZ(123L, 456L, 16))
  }

  test("z-sorted blocks bound both dimensions tighter than a 1-D sort") {
    // 4096 grid points; block = 64 consecutive rows (a "file"). Under a
    // z-order sort each block's bbox covers both dims locally; under the
    // 1-D x-sort the y-extent of every block is the full domain.
    val n = 64
    val pts = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val keyed = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrderKey.zorder(col("x"), col("y"), 6).as("z"))
      .orderBy(col("z")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val zSpread = keyed.grouped(64).map { blk =>
      val ys = blk.map(_._2)
      ys.max - ys.min
    }.toSeq
    // Perfect 64-wide z-curve blocks are 8x8 tiles: y-extent 7 each.
    assert(zSpread.forall(_ == 7), s"z blocks must be 8x8 tiles: $zSpread")
    // The 1-D comparison: x-sorted blocks span the whole y domain.
    val xSorted = pts.sortBy(_._1)
    val xSpread = xSorted.grouped(64).map { blk =>
      val ys = blk.map(_._2)
      ys.max - ys.min
    }.toSeq
    assert(xSpread.forall(_ == 63), "x-sorted blocks span the full y domain")
  }
}
