package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LMS growth-chart z-scores, internalizing the reference's external
  * Perl `derive_z` tool (/root/reference/pedsnetdcc/z_score.py:12,
  * 26-122): the NHANES-2000 method z = ((x/M)^L − 1) / (L·S), where
  * (L, M, S) come from a reference table keyed by stratum (sex ×
  * age-month in the clinical case).
  *
  * Spark shape: a broadcast join of the small LMS lookup plus pure
  * Column math — no external process, no chunking
  * (the reference chunks by person_chunk_size=1000 to bound the Perl
  * tool's memory; Spark partitions make that knob unnecessary,
  * SURVEY.md §4).
  */
object ZScore {

  /** z = ((x/M)^L − 1) / (L·S) — the LMS (Box-Cox) z-score. */
  def lms(x: Column, l: Column, m: Column, s: Column): Column =
    (pow(x / m, l) - lit(1.0)) / (l * s)

  /** Join `lmsTable` (keys ++ [L,M,S]) onto `measurements` and append
    * `zCol`. Rows with no LMS stratum keep a NULL z (left join), like
    * the reference's tool skipping out-of-range ages.
    */
  def attach(measurements: DataFrame, lmsTable: DataFrame, keys: Seq[String],
      valueCol: String, zCol: String): DataFrame =
    measurements
      .join(broadcast(lmsTable), keys, "left")
      .withColumn(zCol, lms(col(valueCol), col("L"), col("M"), col("S")))
      .drop("L", "M", "S")
}
