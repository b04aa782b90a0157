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

  test("salting spreads a hot key across distinct salt values") {
    val big = (0 until 1000).map(i => ("HOT", i.toLong)).toDF("key", "id")
    val nSalts = big
      .withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts == 8)
  }
}
