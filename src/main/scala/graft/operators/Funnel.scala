package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered conversion funnels and retention
  * cohorts — the product-analytics counterpart of the corpus-side
  * reporting operators.
  */
object Funnel {

  /** Ordered conversion funnel over an arbitrary step sequence: a user
    * advances to step i only with an event AT OR AFTER their first
    * qualifying step-(i−1) event — the strict-ordering semantics that
    * separates a funnel from N independent counts (a purchase BEFORE
    * the first view does not convert). Ties count: an event at exactly
    * the previous step's timestamp qualifies. With `maxGapMicros` set,
    * a step must also land within that gap of the previous step's
    * anchor — FIRST-TOUCH semantics: each step anchors at its earliest
    * qualifying event, so a conversion reachable only through a LATER
    * step-1 touch is not counted (the deterministic, oracle-expressible
    * attribution convention; any-touch windowed matching is a different
    * and quadratically heavier operator). Output: one row per step
    * — (step, event_type, n_users, rate), rate = n_users / step-1
    * users rounded to 4 dp (null when step 1 is empty).
    *
    * Scale shape: each step is a user-keyed `min(ts)` aggregate joined
    * to the next step's filtered events — every exchange hashes on the
    * user, so the ≤ |users|-row step frames reuse one partitioning and
    * the event scan is filtered to one step's type before it ever
    * shuffles; the final |steps|-row union crosses the 1-row step-1
    * count. No windows over raw events, no per-user state, and the
    * step count bounds the join chain, not the data. Each ≤|users|-row
    * step frame is pinned ([[Materialize.pin]], default on) before the
    * next step derives from it — without that, step i's plan re-derives
    * every earlier step from scratch (an O(steps²) re-scan of the event
    * table: measured 7 scans for 3 steps), and the frames are orders of
    * magnitude smaller than the events they summarize. */
  def conversionFunnel(
      events: DataFrame, user: Column, ts: Column, eventType: Column,
      steps: Seq[String], materialize: Boolean = true,
      maxGapMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(maxGapMicros.forall(_ > 0), "maxGapMicros must be positive")
    val ev = events.select(user.as("__u"), ts.as("__ts"),
      eventType.as("__et"))
    def pin(df: DataFrame): DataFrame =
      if (materialize) Materialize.pin(df) else df
    def withinGap: Column = maxGapMicros match {
      case Some(g) =>
        unix_micros(col("__ts")) <= unix_micros(col("__prev")) + lit(g)
      case None => lit(true)
    }
    val stepFrames = steps.tail.scanLeft(
      pin(ev.filter(col("__et") === steps.head)
        .groupBy(col("__u")).agg(min(col("__ts")).as("__t")))) {
      (prev, s) =>
        pin(ev.filter(col("__et") === s)
          .join(prev.select(col("__u"), col("__t").as("__prev")), Seq("__u"))
          .filter(col("__ts") >= col("__prev") && withinGap)
          .groupBy(col("__u")).agg(min(col("__ts")).as("__t")))
    }
    val counts = stepFrames.zip(steps).zipWithIndex.map {
      case ((f, name), i) =>
        f.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(name).as("event_type"),
            col("n_users"))
    }.reduce(_ unionByName _)
    val base = stepFrames.head.agg(count(lit(1)).as("__n1"))
    counts.crossJoin(broadcast(base))
      .select(col("step"), col("event_type"), col("n_users"),
        when(col("__n1") > 0,
          round(col("n_users").cast("double") / col("__n1").cast("double"), 4))
          .as("rate"))
  }

  /** Retention cohort triangle: users grouped by their first active
    * DAY, counted distinct on each day-offset they return — the
    * standard activation/retention report. Cohort assignment is one
    * user-keyed `min(date)` aggregate joined back (both exchanges hash
    * on the user), the triangle a (cohort, offset) aggregate; offsets
    * are exact integer day differences. Output:
    * (cohort, offset_days, n_users). */
  def retentionCohorts(
      events: DataFrame, user: Column, ts: Column): DataFrame = {
    val d = events.select(user.as("__u"), to_date(ts).as("__d"))
    val first = d.groupBy(col("__u")).agg(min(col("__d")).as("cohort"))
    d.join(first, Seq("__u"))
      .groupBy(col("cohort"),
        datediff(col("__d"), col("cohort")).as("offset_days"))
      .agg(countDistinct(col("__u")).as("n_users"))
  }
}
