package graft.derivations

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Weight-based dose derivation — the engine's twin of the reference's
  * `run_r_dose` package (/root/reference/pedsnetdcc/r_dose.py:91-193):
  * an external R package derives a per-exposure mg/kg effective dose
  * (pairing each drug exposure with the patient's nearest weight
  * measurement), materializes `drug_exposures_mgkg_derivations`, and
  * the engine then UPDATE-joins the three dose columns back into
  * `drug_exposure` by (person_id, drug_exposure_id)
  * (r_dose.py:19-41 `_update_drug_exposure`).
  *
  * Spark-native: the nearest-weight pairing is the [[AsOfJoin]]
  * operator (one shuffle per side on person_id, candidate blow-up
  * bounded by weights-per-person inside the tolerance window), the
  * dose arithmetic is codegen'd Column math, and the write-back is a
  * left join + matched-row projection instead of an in-place UPDATE.
  *
  * @param toleranceSec max |exposure_ts − weight_ts| for a pairing
  *                     (the reference tool's 60-day default window —
  *                     same default as the BMI pairing, bmi.py:22-48)
  */
final case class DoseDerivation(toleranceSec: Long = 60L * 86400)
    extends DerivationPackage {

  override def name: String = "dose_derivation"

  /** drug_exposure: (drug_exposure_id, person_id, exposure_ts, dose_mg);
    * weight_measurement: (measurement_id, person_id, weight_ts, weight_kg).
    */
  override def requires: Seq[String] =
    Seq("drug_exposure", "weight_measurement")

  /** The derivations table: one row per exposure that found a weight
    * within tolerance — mg/kg dose plus the unit concept columns the
    * reference's R package emits.
    */
  override def derive(
      spark: SparkSession, lookup: String => DataFrame): DataFrame = {
    val de = lookup("drug_exposure")
      .select(col("drug_exposure_id"), col("person_id"),
        col("exposure_ts"), col("dose_mg"))
    val wt = lookup("weight_measurement")
      .select(col("measurement_id"), col("person_id"),
        col("weight_ts"), col("weight_kg"))
    AsOfJoin.nearest(
        de, wt,
        keys = Seq("person_id"),
        leftTs = "exposure_ts", rightTs = "weight_ts",
        toleranceSec = toleranceSec,
        leftUnique = Seq("drug_exposure_id"),
        rightTiebreak = Seq("measurement_id"),
        rightPrefix = "w_")
      .select(
        col("drug_exposure_id"), col("person_id"),
        lit(DoseDerivation.MgPerKgConceptId).as("dose_unit_concept_id"),
        (col("dose_mg") / col("w_weight_kg")).as("effective_drug_dose"),
        lit(DoseDerivation.MgPerKgConceptName).as("dose_unit_concept_name"))
  }
}

object DoseDerivation {

  /** OMOP standard concept for the milligram-per-kilogram dose unit. */
  val MgPerKgConceptId: Long = 9562L
  val MgPerKgConceptName: String = "milligram per kilogram"

  private val DoseCols =
    Seq("dose_unit_concept_id", "effective_drug_dose", "dose_unit_concept_name")

  /** The reference's `_update_drug_exposure` (r_dose.py:19-41): rows of
    * `drugExposure` matched in `derivations` on (person_id,
    * drug_exposure_id) take the derived dose columns — unconditionally,
    * as the UPDATE does — and unmatched rows keep their existing
    * values. Spark tables are immutable, so the UPDATE becomes a left
    * join + matched-flag projection (the engine's J10 shape,
    * [[graft.operators.SetOps.updateJoin]], widened to three columns).
    *
    * Scale: the derivations side is exposure-sized, so no broadcast —
    * a plain key-partitioned join that AQE plans; both sides shuffle
    * once on the composite key.
    */
  def updateDrugExposure(
      drugExposure: DataFrame, derivations: DataFrame): DataFrame = {
    val keys = Seq("person_id", "drug_exposure_id")
    val d = derivations
      .select((keys.map(col) :+ lit(true).as("__matched")) ++
        DoseCols.map(c => col(c).as(s"__new_$c")): _*)
    val joined = drugExposure.join(d, keys, "left")
    val updated = DoseCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c,
        when(col("__matched"), col(s"__new_$c")).otherwise(col(c)))
    }
    updated.drop("__matched").drop(DoseCols.map(c => s"__new_$c"): _*)
  }
}
