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
  * Composition: equi-join on (partition key, tolerance-sized time
  * bucket) with the left side exploded to its bucket ±1, a residual
  * |Δt| ≤ tolerance predicate, then keep the row minimizing |Δt| via
  * one row_number window. Ties break on the smaller right-side
  * timestamp then the right id column — deterministic, unlike the
  * external tool's input order.
  *
  * Scale: shuffles the (3×) left and right once on (key, bucket). The
  * bucket in the equi-key is what bounds the join product: a bare
  * person-key join materializes every (left, right) pair for the
  * person and THEN filters on Δt — per-key cost quadratic in facts per
  * person — while bucketing caps each group at the rows inside one
  * tolerance window, which is the quantity the operator's output is
  * bounded by anyway. |Δt| ≤ tol implies the buckets differ by at most
  * one, and each right row lands in exactly one of a left row's three
  * probe buckets, so the rewrite is pair-for-pair identical (no dedup
  * needed). AQE's skew-join splitting handles residual hot
  * (key, bucket) cells; if the right side is dimension-sized the
  * caller can broadcast it beforehand.
  */
object AsOfJoin {

  /** Floor time bucket in pure long arithmetic. `x - pmod(x, tol)` is
    * an exact non-negative-remainder multiple of `tol` (so the `div`
    * is floor division even for negative x), and SQL `div` is integral
    * — the bucket id never routes through a double, so it stays exact
    * past 2^53 (micro/nano-scale timestamps included).
    */
  private def bucketOf(tsCol: String, tol: Long): Column =
    expr(s"(cast(`$tsCol` as long) - pmod(cast(`$tsCol` as long), $tol))" +
      s" div $tol")

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
    require(toleranceSec > 0, "tolerance must be positive")
    val l = left.withColumn("__b",
      explode(array(Seq(-1, 0, 1).map(d =>
        bucketOf(leftTs, toleranceSec) + d): _*)))
    val r0 = right.columns.foldLeft(right) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val rTs = s"$rightPrefix$rightTs"
    val r = r0.withColumn("__b", bucketOf(rTs, toleranceSec))
    val cond: Column =
      (keys.map(k => l(k) === r(k)) :+ (l("__b") === r("__b"))).reduce(_ && _) &&
        abs(l(leftTs).cast("long") - r(rTs).cast("long")) <= toleranceSec
    val joined = keys.foldLeft(l.join(r, cond))((d, k) => d.drop(r(k)))
      .drop("__b")
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
