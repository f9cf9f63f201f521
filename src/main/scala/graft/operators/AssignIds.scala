package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.functions._

/** Scalable global sequential id assignment.
  *
  * Parity target: the reference assigns surrogate ids with
  * `row_number() OVER (ORDER BY …) + last_id` against a one-row counter
  * table (/root/reference/pedsnetdcc/id_mapping_transform.py:20-31,
  * /root/reference/pedsnetdcc/era.py:716-733 — PG sequences, including
  * negative ranges).
  *
  * A naive `row_number().over(Window.orderBy(...))` collapses to a single
  * partition — a non-starter at 100 TB. Instead: range-partition by the
  * order columns (so partitions are globally ordered), then zipWithIndex
  * (one lightweight count job + a mapPartitions — the canonical two-phase
  * per-partition-offsets scheme).
  *
  * Determinism requires the caller to pass a total order (the reference's
  * `ORDER BY person_id` is tie-ambiguous; we document the pk tiebreak —
  * SURVEY.md §7.4).
  */
object AssignIds {

  /** Append `idCol` = start, start+1, … following the total order given by
    * orderCols.
    */
  def assign(
      df: DataFrame,
      orderCols: Seq[String],
      idCol: String,
      start: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols.map(col): _*)
    val withIdx = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + start))
    }
    val schema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    spark.createDataFrame(withIdx, schema)
  }
}
