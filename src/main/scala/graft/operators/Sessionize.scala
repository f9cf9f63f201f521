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
}
