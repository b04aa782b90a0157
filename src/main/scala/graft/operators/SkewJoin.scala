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

  /** Join-key skew profile: the advisory pass a pipeline runs BEFORE
    * choosing between a plain shuffle join, AQE skew splitting, and
    * [[saltedInnerJoin]] — per heavy key, how far above the mean key
    * load it sits and the salt factor that would level it. One row per
    * top-`topN` key by row count:
    *
    *   - `share`          — key's fraction of all rows (6 dp),
    *   - `skew_vs_mean`   — count / (N / n_keys) (4 dp); 1.0 = uniform,
    *   - `recommended_salt` — ⌈count·n_keys / N⌉ floored at 1: the
    *     replica count that brings the key's per-task load back to the
    *     mean (exactly the `salts` argument [[saltedInnerJoin]] wants).
    *
    * All arithmetic is integer (ceil via `(a + b − 1) DIV b`) or a
    * single correctly-rounded rational, so the profile is
    * engine-exact. Scale shape: one hash aggregate on the key
    * (map-side combine; group cardinality crosses the exchange), a
    * 1-row totals broadcast, TakeOrdered for the top-N. The key is
    * cast to string so one profile schema serves any key type. */
  def skewProfile(
      df: DataFrame, key: Column, topN: Int): DataFrame = {
    require(topN >= 1, "topN must be positive")
    val counts = df.select(key.cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("n"),
        round(col("n").cast("double") / col("n_rows").cast("double"), 6)
          .as("share"),
        round(col("n").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double"), 4).as("skew_vs_mean"),
        greatest(lit(1L),
          expr("(n * n_keys + n_rows - 1) DIV n_rows")).as("recommended_salt"))
      .orderBy(col("n").desc, col("key").asc_nulls_first)
      .limit(topN)
  }
}
