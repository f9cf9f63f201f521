package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-within-tolerance pairing join ("as-of" join).
  *
  * Parity target: the reference's BMI derivation pairs each weight
  * measurement with the nearest height measurement of the same person
  * within `max_time` seconds (default 60 days)
  * (/root/reference/pedsnetdcc/bmi.py:22-48, 267-273 — computed by the
  * external `derive_bmi` Perl tool; we internalize it).
  *
  * Composition: equi-join on the partition key with a range predicate,
  * then keep the row minimizing |Δt| via one row_number window. Ties
  * break on the smaller right-side timestamp then the right id column —
  * deterministic, unlike the external tool's input order.
  *
  * Scale: shuffles both sides once on the key. The range predicate runs
  * inside the shuffled-hash/sort-merge join, so the blow-up is bounded by
  * rows-per-key within the tolerance window; AQE's skew-join splitting
  * handles hot keys. If the right side is dimension-sized the caller can
  * broadcast it beforehand.
  */
object AsOfJoin {

  /** For every left row, attach the single right row with the same `keys`
    * whose `rightTs` is closest to `leftTs` within `toleranceSec`
    * (absolute difference). Left rows with no candidate are dropped
    * (inner semantics, like the reference's BMI pairing).
    *
    * Right columns are prefixed to avoid collisions.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      toleranceSec: Long,
      leftUnique: Seq[String],
      rightTiebreak: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    val r = right.columns.foldLeft(right) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val rTs = s"$rightPrefix$rightTs"
    val cond: Column =
      keys.map(k => left(k) === r(k)).reduce(_ && _) &&
        abs(left(leftTs).cast("long") - r(rTs).cast("long")) <= toleranceSec
    val joined = keys.foldLeft(left.join(r, cond))((d, k) => d.drop(r(k)))
    val diff = abs(col(leftTs).cast("long") - col(rTs).cast("long"))
    val w = Window
      .partitionBy((keys ++ leftUnique).map(col): _*)
      .orderBy(diff.asc +: col(rTs).asc +: rightTiebreak.map(c => col(s"$rightPrefix$c").asc): _*)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
