package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the streaming twins of the batch
  * operators, for incremental ingest of the events stream.
  *
  * The reference has no streaming surface (SURVEY.md §2.9) — every
  * pipeline is a batch recompute. These jobs are the beyond-reference
  * extension: the SAME logical plans as the batch queries
  * (PipelineQueries.p14WindowAgg / p13Sessionize), run incrementally
  * with watermarks and state stores, which is how the engine would keep
  * derived tables current at 100 TB instead of recomputing them.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * horizon × group cardinality; sessionization state by open sessions
  * per key, closed deterministically by event-time timeout. Both
  * shuffle once on the grouping key, exactly like their batch twins.
  */
object StreamingJobs {

  /** Tumbling 1-hour windowed counts/sums per event type over a
    * streaming DataFrame with schema (ts TIMESTAMP, event_type STRING,
    * value DOUBLE). Late data beyond 2 hours is dropped by the
    * watermark; emit-on-close via Append mode.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n"), col("sum_value"))

  val outputMode: OutputMode = OutputMode.Append()

  /** Stream-static enrichment — the streaming twin of the
    * concept-name broadcast lookup (J2): each micro-batch left-joins
    * the static dimension, which Spark re-plans per batch (a
    * broadcast-hash join for a dimension-sized static side; no stream
    * state at all, so nothing to bound). This is how per-event
    * decoration (concept names, site labels) stays current at ingest
    * time instead of in a nightly rewrite.
    */
  def enrich(
      events: DataFrame,
      dim: DataFrame,
      keyCol: String,
      dimKeyCol: String,
      dimCols: Seq[String]): DataFrame = {
    val d = broadcast(
      dim.select((col(dimKeyCol).as(keyCol) +: dimCols.map(col)): _*))
    events.join(d, Seq(keyCol), "left")
  }

  /** Streaming exact dedup: drop re-deliveries of the same key within
    * the watermark horizon — the streaming twin of
    * [[graft.pipeline.Dedup.exact]]. State holds one entry per key seen
    * inside the horizon and is evicted by the watermark, which is what
    * keeps it bounded on an unbounded stream.
    */
  def dedupByKey(events: DataFrame, eventTimeCol: String,
      keyCols: Seq[String], watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  case class Event(user_id: Long, event_id: Long, ts_us: Long)
  case class SessionState(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long)
  case class TimedEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)

  /** Production sessionization with EVENT-TIME state expiry: an open
    * session also closes when the watermark passes `session_end + gap`
    * — idle users' state is emitted and freed without waiting for
    * their next event, which is what bounds state-store size on an
    * unbounded stream. Input needs a TimestampType event-time column
    * (watermark requirement).
    */
  def sessionizeEventTime(events: Dataset[TimedEvent], gapUs: Long,
      watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[TimedEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.end, s.n))
          } else {
            val sorted = rows.toSeq
              .map(e => (e.ts.getTime * 1000L, e.event_id))
              .sortBy(identity)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { case (tsUs, _) =>
              cur match {
                case Some(s) if tsUs - s.end <= gapUs =>
                  cur = Some(SessionState(s.start, math.max(s.end, tsUs), s.n + 1))
                case Some(s) =>
                  closed += Session(userId, s.start, s.end, s.n)
                  cur = Some(SessionState(tsUs, tsUs, 1))
                case None =>
                  cur = Some(SessionState(tsUs, tsUs, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // expire once the watermark passes the session's close
              state.setTimeoutTimestamp((s.end + gapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Gap-based sessionization as custom state: one open session per
    * user; an event beyond `gapUs` of the running end closes and emits
    * the previous session. Simplest variant (no state expiry) — see
    * [[sessionizeEventTime]] for the watermark-bounded production form.
    */
  def sessionize(events: Dataset[Event], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // within a micro-batch, order by event time (state sees batches whole)
          val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts_us - s.end <= gapUs =>
                cur = Some(SessionState(s.start, math.max(s.end, e.ts_us), s.n + 1))
              case Some(s) =>
                closed += Session(userId, s.start, s.end, s.n)
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              case None =>
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
