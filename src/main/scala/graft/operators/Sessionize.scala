package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: events of the same key
  * belong to one session while consecutive gaps stay ≤ `gap`.
  *
  * Same gaps-and-islands core as [[EraBuilder]] (the reference's era
  * algorithm, /root/reference/pedsnetdcc/era.py:29-133) lifted from
  * dates to timestamps — the classic batch sessionizer a training-data
  * pipeline needs for log/event corpora. The streaming twin (state-store
  * based) lives in graft.streaming.
  *
  * Scale: one shuffle on the key; both windows share the same
  * partitioning so Catalyst plans a single Exchange + Sort.
  */
object Sessionize {

  /** Assign `session_id` (1-based per key, in time order) to each
    * event. `tsCol` must be a numeric epoch column (any unit); `gap`
    * is in the same unit. `tiebreak` makes ordering total when
    * timestamps collide.
    */
  def assign(df: DataFrame, keys: Seq[String], tsCol: String, gap: Long,
      tiebreak: Seq[String]): DataFrame = {
    val order = col(tsCol).asc +: tiebreak.map(col(_).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val newSession =
      when(col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1L)
        .otherwise(when(lag(col(tsCol), 1).over(w).isNull, 1L).otherwise(0L))
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Roll sessions up to one row per (keys, session_id) with start,
    * end, and event count.
    */
  def sessions(df: DataFrame, keys: Seq[String], tsCol: String, gap: Long,
      tiebreak: Seq[String]): DataFrame =
    assign(df, keys, tsCol, gap, tiebreak)
      .groupBy((keys.map(col) :+ col("session_id")): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Ordered conversion funnel: for the stage sequence
    * s₁ → s₂ → … → sₙ, a user reaches stage i when an sᵢ event exists
    * STRICTLY AFTER their earliest qualifying sᵢ₋₁ event (earliest-
    * completion semantics: tᵢ = min ts of sᵢ with ts > tᵢ₋₁ — the
    * standard greedy funnel, which maximizes the number of users
    * counted at every stage). Output is one row per stage with the
    * user count and exact integer conversion rates from the first
    * stage and from the previous one.
    *
    * Scale shape: one (user)-keyed min-aggregation per stage, each a
    * partial-aggregated shuffle of the stage's FILTERED events joined
    * to the (shrinking) reached-user table on the same key — n stages
    * = n co-keyed exchanges, no windows, no per-user event lists. The
    * final counts are single-row aggregates unioned stage-wise.
    */
  /** Weekly retention cohorts — the classic activity triangle: users
    * are cohorted by the epoch week of their FIRST event; each later
    * week they appear in contributes one active row at offset
    * k = week − cohort_week, and retention is the exact integer
    * fraction of the cohort still active at offset k (k=0 is the
    * cohort itself, retention 1.0 by construction). Epoch weeks are
    * integer `ts_us div 604800000000` — no calendar/timezone
    * arithmetic, so every engine buckets identically.
    *
    * Scale shape: one (user, week) distinct shuffle, a user-keyed min
    * for the cohort, one co-keyed join back, and two small grouped
    * aggregations — all partial-aggregated; no windows.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"),
        expr("(ts_ns div 1000) div 604800000000").as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_cohort"))
    uw.join(cohort, Seq("user_id"))
      .withColumn("k", col("week") - col("cohort_week"))
      .groupBy(col("cohort_week"), col("k"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("k"), col("n_active"),
        col("n_cohort"),
        expr("(n_active * 1000000) div n_cohort").as("retention_micro"))
  }

  /** Per-user stage-completion times of [[funnel]]'s greedy chain:
    * one row per stage-1 user with nullable `t1..tn` micro-epochs.
    * Shared by the stage-count rollup ([[funnel]]) and the
    * time-to-convert quantiles ([[funnelTiming]]).
    */
  private[graft] def funnelTimes(events: DataFrame,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(col("user_id"), col("event_type"),
      expr("ts_ns div 1000").as("ts_us"))
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(col("ts_us")).as("t1"))
    stages.zipWithIndex.drop(1)
      .foldLeft(first) { case (acc, (st, i)) =>
        val nxt = ev.filter(col("event_type") === st)
          .join(acc.select(col("user_id"), col(s"t$i")), Seq("user_id"))
          .filter(col("ts_us") > col(s"t$i"))
          .groupBy("user_id").agg(min(col("ts_us")).as(s"t${i + 1}"))
        acc.join(nxt, Seq("user_id"), "left")
      }
  }

  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    val times = funnelTimes(events, stages)
    val counts = times.agg(
      sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n1"),
      stages.indices.drop(1).map(i =>
        sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
          .as(s"n${i + 1}")): _*)
    stages.zipWithIndex.map { case (st, i) =>
      val n = s"n${i + 1}"
      val prev = if (i == 0) "n1" else s"n$i"
      counts.select(lit((i + 1).toLong).as("stage"),
        lit(st).as("event_type"), col(n).as("n_users"),
        expr(s"($n * 1000000) div n1").as("pct_of_start_micro"),
        expr(s"($n * 1000000) div $prev").as("pct_of_prev_micro"))
    }.reduce(_ unionByName _)
  }

  /** Time-to-convert quantiles per funnel transition: exact
    * nearest-rank p25/p50/p75 of tᵢ − tᵢ₋₁ over the users who reached
    * stage i, one row per (stage, quantile) — the latency companion
    * to [[funnel]]'s counts, sharing [[funnelTimes]] so both describe
    * the identical greedy chain. Same nearest-rank construction as
    * the per-source length quantiles (p43): rank = ⌈cnt·q/100⌉ via a
    * per-stage ranking window — exact, engine-portable integers. The
    * window partitions by stage (a handful of partitions holding
    * converted-user counts); at corpus scale swap in an approximate
    * sketch if a stage's converters outgrow one partition's sort.
    */
  def funnelTiming(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.length >= 2, "timing needs at least two stages")
    val times = funnelTimes(events, stages)
    val deltas = stages.indices.drop(1).map { i =>
      times.filter(col(s"t${i + 1}").isNotNull)
        .select(lit((i + 1).toLong).as("stage"),
          lit(stages(i)).as("event_type"),
          (col(s"t${i + 1}") - col(s"t$i")).as("delta_us"))
    }.reduce(_ unionByName _)
    val part = Window.partitionBy("stage")
    val ranked = deltas
      .withColumn("rn", row_number().over(part.orderBy(col("delta_us"))))
      .withColumn("cnt", count(lit(1)).over(part))
    val qs = events.sparkSession.range(1)
      .select(explode(array(lit(25L), lit(50L), lit(75L))).as("q"))
    ranked.crossJoin(broadcast(qs))
      .filter(col("rn") ===
        floor((col("cnt") * col("q") + lit(99)) / lit(100.0)).cast("long"))
      .select(col("stage"), col("event_type"), col("q"), col("delta_us"))
  }

  /** Event-rate spike detection — the robust data-quality monitor an
    * ingest pipeline runs over its own telemetry: hourly event counts
    * per type, flagged where the count exceeds
    * `median + mult·MAD` of that type's hourly history (median ±
    * median-absolute-deviation — the robust location/scale pair:
    * unlike mean/stddev, one broken hour cannot drag the threshold
    * toward itself). A scraper gone hot, a retry storm, a stuck
    * producer all surface as `spike = 1` rows.
    *
    * Exact integer end-to-end: both medians are inverted-CDF order
    * statistics (rank ⌈n/2⌉ under (value, window-start) order — the
    * tie rule that makes the statistic deterministic), deviations are
    * absolute integer differences, and the flag is an integer
    * comparison. Scale shape: one (type, hour) count shuffle with
    * map-side combine; the median windows run PER TYPE over that
    * type's hourly rows (time-bounded however large the corpus — the
    * sketch-sized-window argument), and the deviation pass reuses the
    * same type-keyed exchange.
    */
  def rateSpikes(events: DataFrame, tsCol: String, typeCol: String,
      mult: Long = 3L): DataFrame = {
    val hourly = events
      .groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws_us"),
        col(typeCol).as("event_type"), col("n"))
    val part = Window.partitionBy("event_type")
    def medianOf(df: DataFrame, valueCol: String,
        out: String): DataFrame =
      df.withColumn("rn", row_number().over(
          part.orderBy(col(valueCol), col("ws_us"))))
        .withColumn("cnt", count(lit(1)).over(part))
        .filter(col("rn") ===
          call_function("div", col("cnt") + 1, lit(2L)))
        .select(col("event_type"), col(valueCol).as(out))
    val med = medianOf(hourly, "n", "median_n")
    val dev = hourly.join(med, Seq("event_type"))
      .withColumn("ad", abs(col("n") - col("median_n")))
    val mad = medianOf(dev, "ad", "mad_n")
    dev.join(mad, Seq("event_type"))
      .select(col("event_type"), col("ws_us"), col("n"),
        col("median_n"), col("mad_n"),
        when(col("n") > col("median_n") + lit(mult) * col("mad_n"), 1L)
          .otherwise(0L).as("spike"))
  }
}
