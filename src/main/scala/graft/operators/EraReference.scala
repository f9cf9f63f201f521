package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's LITERAL era formulation — the OHDSI
  * "2 × start_ordinal − overall_ordinal = 0" algorithm
  * (/root/reference/pedsnetdcc/era.py:16-133): start events interleave
  * with gap-padded end events; a running count detects the moment every
  * opened interval has closed, which marks an era end; a min-end range
  * join then assigns each source row its era.
  *
  * This exists to VALIDATE [[EraBuilder.eras]] (the single-window
  * re-derivation used in production): EraSemanticsSpec asserts both
  * produce identical eras, including the tie cases SURVEY.md §7.4
  * flags. The literal form costs two extra shuffles and a range join
  * (skew-prone on hot persons), which is why it is not the production
  * path.
  */
object EraReference {

  /** Same contract as [[EraBuilder.eras]]: one row per merged era with
    * era_id (1-based by start within partition), era_start, era_end,
    * row_count.
    */
  def eras(df: DataFrame, partition: Seq[String], start: String, end: String,
      gapDays: Int): DataFrame = {
    val pcols = partition.map(col)

    // start events: type -1, numbered by start date (the condition-era
    // variant's tiebreak, era.py:49-63)
    val wStart = Window.partitionBy(pcols: _*).orderBy(col(start))
    val starts = df.select((pcols :+ col(start).as("event_date")): _*)
      .withColumn("event_type", lit(-1))
      .withColumn("start_ordinal", row_number().over(
        Window.partitionBy(pcols: _*).orderBy(col("event_date"))))

    // end events: padded +gap, type 1, no ordinal
    val ends = df.select((pcols :+ date_add(col(end), gapDays).as("event_date")): _*)
      .withColumn("event_type", lit(1))
      .withColumn("start_ordinal", lit(null).cast("int"))

    val events = starts.unionByName(ends)
    val wAll = Window.partitionBy(pcols: _*)
      .orderBy(col("event_date"), col("event_type"))
    val numbered = events
      .withColumn("overall_ord", row_number().over(wAll))
      .withColumn("so", max(col("start_ordinal")).over(
        wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // era-close events: opened == closed; unpad the end date
    val eraEnds = numbered
      .filter(col("so") * 2 - col("overall_ord") === 0)
      .select((pcols :+ date_sub(col("event_date"), gapDays).as("era_end_date")): _*)

    // collapse duplicate intervals first (carrying their multiplicity),
    // then range-join each distinct interval to its earliest era-end ≥
    // start (A3) — min over the join fanout
    val rows = df
      .groupBy((pcols :+ col(start).as("__s") :+ col(end).as("__e")): _*)
      .agg(count(lit(1)).as("__dup"))
    val e = eraEnds.withColumnRenamed("era_end_date", "__eed")
    val cond = partition.map(k => rows(k) === e(k)).reduce(_ && _) &&
      e("__eed") >= rows("__s")
    val rowEra = partition.foldLeft(rows.join(e, cond))((d, k) => d.drop(e(k)))
      .groupBy((pcols :+ col("__s") :+ col("__e") :+ col("__dup")): _*)
      .agg(min(col("__eed")).as("era_end"))

    val eras = rowEra
      .groupBy((pcols :+ col("era_end")): _*)
      .agg(
        min(col("__s")).as("era_start"),
        sum(col("__dup")).cast("long").as("row_count"))
    eras
      .withColumn("era_id", row_number().over(
        Window.partitionBy(pcols: _*).orderBy(col("era_start"))).cast("long"))
      .select((pcols :+ col("era_id") :+ col("era_start") :+ col("era_end")
        :+ col("row_count")): _*)
  }
}
