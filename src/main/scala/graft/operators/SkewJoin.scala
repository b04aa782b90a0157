package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual key-salting for joins with pathological key skew — the
  * fallback when AQE's skew-join splitting isn't available (e.g. the
  * skewed side feeds a non-shuffle operator) or a single key exceeds what
  * one task can hold.
  *
  * The skewed (large) side gets a deterministic salt in [0, salts); the
  * small side is replicated once per salt value; the join key becomes
  * (key, salt), spreading each hot key over `salts` tasks. Results are
  * identical to the unsalted join (every original match pairs with
  * exactly one replica).
  */
object SkewJoin {

  /** Inner-join `big ⋈ small` on `key`, with the big side salted.
    * `saltSource` should be any big-side column with per-row variation
    * (an id); the salt is `pmod(hash(saltSource), salts)` — deterministic,
    * so repeated runs produce identical partitioning. */
  def saltedInnerJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
