package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-windowing and analytic windows over the `events` table
  * (SURVEY.md §2.8/§2.9). Money-like doubles are summed as integer cents
  * (`round(x*100)::long`) — integer sums are associative, so partial/final
  * aggregation order can never change the result (and the DuckDB oracle
  * matches bit-for-bit).
  */
object EventWindows {

  def cents(x: Column): Column = round(x * 100, 0).cast("long")

  /** Tumbling 1-hour buckets per event type. The bucket is emitted as a
    * string so timestamp precision (ns parquet vs µs Spark) can't leak into
    * the comparison.
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd HH:00:00").as("hour_bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
      .orderBy("hour_bucket", "event_type")

  /** Gap-fill / resample (time-series densification): each user's hourly
    * value series completed onto the full hour grid between their first
    * and last active hour, missing hours FORWARD-FILLED from the last
    * observed value — the resample step every downstream time-series
    * consumer (drift monitors, per-user rate limits, training-window
    * slicers) assumes has already happened. Reported as the per-user
    * fill profile (hours, present, forward-filled sum, gap rate).
    *
    * Scale shape: one hourly aggregation (cents-exact sums), a bounded
    * per-user (min, max) agg whose `sequence()` explode generates the
    * grid map-side, one left equi-join back, and a per-user ordered
    * window for the fill — everything partitions by user, no global
    * sort. The leading row is always present (the grid starts at the
    * user's OWN first hour), so the fill never reads before the window.
    */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hr = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(cents(col("value"))).as("v"))
    val grid = hr
      .groupBy("user_id")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(
        col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hr, Seq("user_id", "h"), "left")
      .withColumn("fv", last(col("v"), ignoreNulls = true).over(w))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_hours"),
        sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_present"),
        sum(col("fv")).as("sum_filled_cents"))
      .withColumn(
        "gap_rate",
        round(lit(1.0) - col("n_present").cast("double") / col("n_hours"), 6))
      .orderBy("user_id")
  }

  /** Per-user ordered running aggregates: row_number + cumulative cents.
    * Window ordering is (ts, event_id) — event_id breaks timestamp ties
    * deterministically.
    */
  def userRunningTotals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum_cents", sum(cents(col("value"))).over(w))
      .select(col("user_id"), col("event_id"), col("rn"), col("cum_cents"))
      .orderBy("user_id", "rn")
  }

  /** Gap-based sessionization as window functions (the oracle-able form):
    * a session boundary opens where the gap to the previous event of the
    * same user exceeds `gapMinutes`; session index = running sum of
    * boundary flags. Works in exact integer microseconds (Spark
    * `unix_micros` ≡ DuckDB `epoch_us`, both truncating) so both engines
    * agree bit-for-bit. One shuffle on user_id serves both windows and the
    * final per-session aggregation.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn(
        "is_new",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs, 1L)
          .when(lag(col("us"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("sess_idx", sum(col("is_new")).over(w))
      .groupBy("user_id", "sess_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        (max(col("us")) - min(col("us"))).as("duration_us"),
        sum(cents(col("value"))).as("value_cents"))
      .orderBy("user_id", "sess_idx")
  }

  /** The same sessions via Spark's built-in `session_window` (usable in
    * batch and Structured Streaming; not DuckDB-expressible, so it is
    * cross-checked against [[sessionize]] in tests instead of the oracle).
    */
  def sessionWindowAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_cents"))
      .select(
        col("user_id"),
        col("session_window.start").as("sess_start"),
        col("n_events"),
        col("value_cents"))
      .orderBy("user_id", "sess_start")

  /** P1 + value predicates: non-null rows with value >= threshold, per type. */
  def filteredTypeStats(events: DataFrame, minValue: Double): DataFrame =
    events
      .na.drop("any", Seq("props", "value"))
      .filter(col("value") >= minValue)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
      .orderBy("event_type")

  /** Ordered-sequence funnel: per step k, the users whose first `steps(k)`
    * event is STRICTLY after their step-(k−1) time (first-touch semantics).
    * Output: one row per step, (step label, n_users).
    *
    * Scale shape: step k is a filter + same-key join + groupBy, ALL keyed
    * by user — after the step-1 aggregation every stage re-joins on the
    * same partitioning, and the per-step count branches re-reference the
    * identical aggregate subtree, so the physical plan reuses one exchange
    * per step (ReusedExchange) instead of re-running the chain per count.
    * No window over the full event stream and no per-user event-array
    * collect — a billion-event user costs the same as any other groupBy.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col("user_id"), col("event_type").as("et"), col("ts"))
    var cur = e.filter(col("et") === steps.head)
      .groupBy("user_id").agg(min(col("ts")).as("t"))
    def stepCount(df: DataFrame, i: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(s"${i + 1}_$name").as("step"), col("n_users"))
    var out = stepCount(cur, 0, steps.head)
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      cur = e.filter(col("et") === st)
        .join(cur, "user_id")
        .filter(col("ts") > col("t"))
        .groupBy("user_id").agg(min(col("ts")).as("t"))
      out = out.unionByName(stepCount(cur, i + 1, st))
    }
    out.orderBy("step")
  }

  /** Weekly retention cohorts: users grouped by the Monday of their FIRST
    * event; for each (cohort, week offset), how many of that cohort were
    * active — the triangular retention matrix behind every "wk-4
    * retention" dashboard.
    *
    * Exactness: weeks via `date_trunc('week', ·)` (Monday-start in both
    * Spark and DuckDB), offsets as exact day arithmetic on DATEs divided
    * by 7 (both dates are week-truncated, so the difference is an exact
    * multiple — no timezone or DST drift; sessions pin UTC). Scale shape:
    * ONE shuffle keyed user_id serves the distinct (user, week) set AND
    * the per-user min-week derivation from it (exchange reused); the
    * cohort roll-up aggregates the per-(user, week) relation, orders of
    * magnitude smaller than raw events. `countDistinct(user)` after a
    * per-user reduction is exact and cheap — each (cohort, offset) group
    * sees each user once by construction, so no expand-distinct blowup.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val first = uw.groupBy("user_id").agg(min(col("week")).as("cohort"))
    uw.join(first, "user_id")
      .groupBy(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("week"), col("cohort")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }
}
