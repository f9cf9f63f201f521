package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands era construction.
  *
  * Parity target: the reference's condition/drug era SQL
  * (/root/reference/pedsnetdcc/era.py:16-258) — merge per-(person,
  * concept) date intervals that overlap or fall within a gap tolerance
  * (30 days there), emitting one era per island with MIN(start),
  * island-closing end date, and the contributing row count.
  *
  * The reference implements this with the OHDSI "2*start_ordinal −
  * overall_ord = 0" trick over a UNION of start/padded-end events. We
  * re-derive it Spark-first with a single window pass, which is
  * semantically identical for interval merging:
  *
  *  - order rows within (partition) by (start, end, tiebreak);
  *  - running `max(end)` over all *previous* rows: a row opens a new era
  *    iff its start is later than `prev_max_end + gap`;
  *  - `sum(flag)` running total assigns the era ordinal; group by it.
  *
  * Scale: one shuffle on the partition keys (the window), then the
  * group-by reuses the same hash partitioning — Catalyst collapses it to
  * a single exchange. No self-join (the reference's formulation joins the
  * event stream to itself, which would be a second shuffle plus skew risk
  * on hot persons at 100 TB).
  */
object EraBuilder {

  /** Per-row era assignment: the input rows with an `era_id` column
    * appended (1-based ordinal within the partition). This is the
    * window pass [[eras]] aggregates over, exposed for derivations
    * that need row↔era membership before rolling up (e.g. the SCDF
    * drug-era variant groups exposures by era AND drug type,
    * /root/reference/pedsnetdcc/era.py:353-386). One shuffle on the
    * partition keys; callers whose follow-up groupBy starts with the
    * same keys reuse the partitioning.
    *
    * Rows with end < start extend the running max only by their raw
    * end (callers pre-normalize inverted intervals if they can occur).
    */
  def eraIds(
      df: DataFrame,
      partition: Seq[String],
      start: String,
      end: String,
      gapDays: Int,
      tiebreak: Seq[String] = Seq.empty): DataFrame = {
    val pcols = partition.map(col)
    val order: Seq[Column] = (Seq(start, end) ++ tiebreak).map(col)
    val w = Window.partitionBy(pcols: _*).orderBy(order: _*)
    val prevMaxEnd = max(col(end))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newEra = when(
      prevMaxEnd.isNull ||
        col(start) > date_add(prevMaxEnd, gapDays),
      lit(1)).otherwise(lit(0))
    df.withColumn("__new_era", newEra)
      .withColumn(
        "era_id",
        sum(col("__new_era")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_era")
  }

  /** @param df        input intervals
    * @param partition grouping keys (e.g. person_id, concept_id)
    * @param start     interval start column name
    * @param end       interval end column name (rows with end < start
    *                  extend the running max only by their raw end —
    *                  callers pre-normalize inverted intervals)
    * @param gapDays   merge intervals whose start is within gapDays after
    *                  the running max end
    * @param tiebreak  extra ordering columns making the within-partition
    *                  order total (determinism at equal (start,end))
    * @return one row per era: partition cols, era_id (1-based ordinal
    *         within the partition), era_start, era_end, row_count
    */
  def eras(
      df: DataFrame,
      partition: Seq[String],
      start: String,
      end: String,
      gapDays: Int,
      tiebreak: Seq[String] = Seq.empty): DataFrame = {
    val pcols = partition.map(col)
    eraIds(df, partition, start, end, gapDays, tiebreak)
      .groupBy((pcols :+ col("era_id")): _*)
      .agg(
        min(col(start)).as("era_start"),
        max(col(end)).as("era_end"),
        count(lit(1)).as("row_count"))
  }

  /** Timestamp-gap variant (for point events / sessionization): gap in
    * seconds over a single timestamp column. An "interval" here is the
    * degenerate [ts, ts].
    */
  def sessionize(
      df: DataFrame,
      partition: Seq[String],
      ts: String,
      gapSeconds: Long,
      tiebreak: Seq[String] = Seq.empty): DataFrame = {
    val pcols = partition.map(col)
    val order: Seq[Column] = (Seq(ts) ++ tiebreak).map(col)
    val w = Window.partitionBy(pcols: _*).orderBy(order: _*)
    val prevTs = lag(col(ts), 1).over(w)
    val newEra = when(
      prevTs.isNull ||
        col(ts).cast("long") - prevTs.cast("long") > gapSeconds,
      lit(1)).otherwise(lit(0))
    df.withColumn("__new_era", newEra)
      .withColumn(
        "session_id",
        sum(col("__new_era")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((pcols :+ col("session_id")): _*)
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("event_count"))
  }
}
