package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // 90% of big rows share one hot key
    val big = (0 until 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong))
      .toDF("key", "id")
    val small = Seq(("HOT", 1.0), ("k1", 2.0), ("k3", 3.0)).toDF("key", "w")
    val plain = big.join(small, "key")
      .orderBy("key", "id").collect().map(_.toSeq)
    val salted = SkewJoin.saltedInnerJoin(big, small, "key", col("id"), salts = 8)
      .orderBy("key", "id").collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted LSH band join equals unsalted on a planted hot band") {
    // 120 IDENTICAL docs: every MinHash band collides, so one (band, bh)
    // key carries the whole quadratic pair load — the realistic hot-band
    // case (mass-duplicated boilerplate). Salting must not change the
    // verified pair set.
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val hot = (0 until 120).map(i =>
      (100000L + i, "mass duplicated boilerplate page body text repeated verbatim across the corpus"))
      .toDF("doc_id", "text")
    val all = corpus.unionByName(hot)
    def run(salts: Int) =
      graft.operators.Dedup.minhashLshVerifiedPairs(
          all, col("doc_id"), col("text"), bandSalts = salts)
        .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val unsalted = run(1)
    val salted = run(8)
    assert(salted == unsalted)
    // the planted group alone contributes C(120,2) exact-duplicate pairs
    assert(unsalted.count { case Seq(a: Long, b: Long, _) =>
      a >= 100000L && b >= 100000L } == 120 * 119 / 2)
  }

  test("salting spreads a hot key across distinct salt values") {
    val big = (0 until 1000).map(i => ("HOT", i.toLong)).toDF("key", "id")
    val nSalts = big
      .withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts == 8)
  }
}
