package graft.derivations

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SetOps

/** LOINC lab remap — the reference's `lab_loinc` derivation package
  * (/root/reference/pedsnetdcc/lab_loinc.py:81-172): an external
  * package produces `updated_measurement` with lab concepts remapped
  * through a LOINC crosswalk, and the engine's post steps re-add the
  * PK and swap the table in place of `measurement`.
  *
  * Spark-native: the remap is an update-join (measurement ×
  * broadcast crosswalk, original concept kept when unmatched), with
  * the original concept preserved in `source_concept_id` — composed
  * entirely from existing operators ([[SetOps.updateJoin]]), which is
  * the point of the package surface: a derivation is a plan, the
  * pre/post machinery is shared.
  */
object LabLoinc extends DerivationPackage {

  override def name: String = "lab_loinc"

  override def requires: Seq[String] = Seq("measurement", "loinc_crosswalk")

  /** crosswalk: (source_concept_id, loinc_concept_id). */
  override def derive(
      spark: SparkSession, lookup: String => DataFrame): DataFrame = {
    val m = lookup("measurement")
    val xwalk = lookup("loinc_crosswalk").select(
      col("source_concept_id"), col("loinc_concept_id"))
    val keyed = m.withColumn("source_concept_id", col("measurement_concept_id"))
    SetOps.updateJoin(
      keyed,
      broadcast(xwalk),
      key = Seq("source_concept_id"),
      targetCol = "measurement_concept_id",
      sourceCol = "loinc_concept_id")
  }
}
