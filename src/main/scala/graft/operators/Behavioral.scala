package graft.operators

import graft.streaming.Events
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.B extension: behavioral / event-sequence analytics over the
  * `events` stream table — the funnel / retention / slowly-changing-
  * dimension passes an event-log consumer of the reference's scan
  * layer (ArgodbMapreduceRecordReader.java feeding rows into a
  * MapReduce job) would hand-write as chained MR stages. Here each is
  * a single declarative plan whose only wide exchange is the
  * per-user hash partition, reused across every window/aggregate
  * step (one shuffle of the event log, however many analysis steps).
  *
  * Scale notes (100 TB event log):
  *  - Everything below partitions by `user_id` exactly once; window
  *    functions with the same partitioning reuse the Exchange, and
  *    the per-user groupBy that follows is shuffle-free.
  *  - No collect_list: funnel state is computed with partition-
  *    constant window minima (codegen'd), so per-user memory is O(1),
  *    not O(events-per-user) — a hot user cannot OOM an executor.
  *  - Final outputs are tiny aggregates (levels / cohort cells), so
  *    the second exchange moves kilobytes.
  */
object Behavioral {

  /** B55: 3-step conversion funnel (view → click → purchase) within a
    * 24-hour window anchored at the user's FIRST view — greedy
    * earliest-anchor semantics, deterministic and oracle-expressible:
    *   t1 = min ts of 'view'
    *   t2 = min ts of 'click'    with t1 <= t2 <= t1+24h
    *   t3 = min ts of 'purchase' with t2 <= t3 <= t1+24h
    * funnel_level = highest step reached (0 = never viewed).
    *
    * Three chained unbounded window minima over the same
    * `partitionBy(user_id)` spec: one Exchange, no per-user state
    * beyond three timestamps, whole-stage codegen throughout.
    */
  def qFunnelConversion(s: SparkSession, dir: String): DataFrame =
    funnelLevels(Events.eventsTable(s, dir))

  /** The funnel over an arbitrary event frame (user_id, event_type,
    * ts). Over a table BUCKETED by user_id the whole computation
    * plans with zero Exchange (spec-asserted) — at 100 TB, bucketing
    * the event log once pays for every behavioral pass after it.
    */
  private[graft] def funnelLevels(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val horizon = col("t1") + expr("INTERVAL 24 HOURS")
    events
      .select("user_id", "event_type", "ts")
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts") >= col("t1") && col("ts") <= horizon, col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts") >= col("t2") && col("ts") <= horizon, col("ts"))).over(w))
      .groupBy("user_id")
      .agg(min("t1").as("u1"), min("t2").as("u2"), min("t3").as("u3"))
      .select(when(col("u3").isNotNull, 3)
        .when(col("u2").isNotNull, 2)
        .when(col("u1").isNotNull, 1)
        .otherwise(0).as("funnel_level"))
      .groupBy("funnel_level")
      .agg(count(lit(1)).as("users"))
      .orderBy("funnel_level")
  }

  /** B56: weekly cohort retention — users bucketed by the week of
    * their first activity (day-exact arithmetic, no engine-specific
    * week-truncation semantics), counted distinct in each later week
    * offset. The classic triangular retention matrix.
    */
  def qCohortRetention(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Events.eventsTable(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .withColumn("cohort_d", min(col("d")).over(w))
      .select(
        floor(datediff(col("cohort_d"), lit("2024-01-01").cast("date")) / 7)
          .cast("int").as("cohort_week"),
        floor(datediff(col("d"), col("cohort_d")) / 7)
          .cast("int").as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** B63: first-order Markov transition matrix over the event stream —
    * P(next event type | current event type), the navigation-model /
    * next-action-prediction pass (and the edge table a journey graph
    * or a Markov-chain attribution model starts from). The reference's
    * consumers would chain two MR jobs (adjacent-pair emit, then
    * count); here it is one window + one aggregate.
    *
    * Shape: `lead()` over the SAME (user_id, ts, event_id) window
    * spec as B57 — adjacent-pair extraction is one Exchange on
    * user_id. The pair aggregate that follows collapses map-side to
    * |types|² rows, and the per-source probability normalization
    * runs as a window over that TINY aggregate (kilobytes), never
    * over the event log. Probabilities are exact integer micros
    * (n·1e6 div row-total) — no FP anywhere, value-exact in any
    * engine at any partitioning.
    */
  def qMarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Events.eventsTable(s, dir)
      .select("user_id", "event_type", "ts", "event_id")
      .withColumn("next_type", lead(col("event_type"), 1).over(wOrd))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_micro",
        expr("n * 1000000L div sum(n) over (partition by prev_type)"))
      .orderBy("prev_type", "next_type")
  }

  /** B64: top user-journey paths — sessionize (30-minute inactivity
    * gap, B57's deterministic tie-break), render each session's first
    * 5 steps as a `view>click>purchase` path string, count sessions
    * per path. The "what do users actually do" report every event
    * pipeline ends up writing.
    *
    * Scale shape: session assignment (lag + running sum of
    * boundaries), per-session step numbering, and the per-session
    * path fold all partition by user_id — ONE Exchange of the event
    * log shared by both window specs and the groupBy. Steps are
    * truncated to 5 with row_number BEFORE the collect, so per-group
    * state is a bounded 5-element array even for a runaway session
    * (collect-then-slice would buffer the whole session). The path
    * aggregate output is |distinct paths| ≤ |types|^5 rows, and the
    * final top-20 is a tree-reduced TakeOrdered, never a global sort.
    * Path assembly sorts the ≤5 collected (step, type) structs —
    * deterministic under any partitioning, no order-dependent
    * collect_list assumption.
    */
  def qSessionPaths(s: SparkSession, dir: String): DataFrame =
    sessionPaths(Events.eventsTable(s, dir))

  /** The path fold over an arbitrary (user_id, event_type, ts,
    * event_id) frame — the testable core of B64.
    */
  private[graft] def sessionPaths(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapped = events
      .select("user_id", "event_type", "ts", "event_id")
      .withColumn("new_session",
        when(col("ts").cast("long") -
          lag(col("ts"), 1).over(wOrd).cast("long") > 1800L, 1L)
          .when(lag(col("ts"), 1).over(wOrd).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("new_session")).over(wOrd))
    val wSess = Window.partitionBy("user_id", "session_no")
      .orderBy(col("ts"), col("event_id"))
    gapped
      .withColumn("step", row_number().over(wSess))
      .where(col("step") <= 5)
      .groupBy("user_id", "session_no")
      .agg(collect_list(struct(col("step"), col("event_type"))).as("steps"))
      .select(array_join(
        expr("transform(array_sort(steps), x -> x.event_type)"), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  /** B57: slowly-changing-dimension (type 2) build from the event
    * log — per user, collapse consecutive repeats of `event_type`
    * into status intervals [valid_from, valid_to) with an is_current
    * flag on the open interval. lag() finds change points, lead()
    * AFTER the change filter closes each interval at the next
    * change (not the next raw event). Both windows share one
    * partitioning+ordering → a single Exchange+Sort.
    * (event_id breaks timestamp ties deterministically.)
    */
  def qScd2UserStatus(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    Events.eventsTable(s, dir)
      .select("user_id", "event_type", "ts", "event_id")
      .withColumn("prev_type", lag(col("event_type"), 1).over(wOrd))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(wOrd))
      .select(
        col("user_id"),
        col("event_type").as("status"),
        date_format(col("ts"), fmt).as("valid_from"),
        date_format(col("valid_to_ts"), fmt).as("valid_to"),
        col("valid_to_ts").isNull.cast("int").as("is_current"))
      .orderBy("user_id", "valid_from")
  }
}
