package graft.derivations

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.EraBuilder

/** SCDF (Clinical Drug Form) drug-era derivation — the reference's
  * second drug-era variant (/root/reference/pedsnetdcc/era.py:260-386,
  * `DRUG_ERA_SCDF_SQL`), distinct from the ingredient rollup in three
  * ways this package reproduces:
  *
  *  1. exposures roll up to an SCDF ancestor concept via
  *     concept_ancestor × concept filtered to
  *     vocabulary 'RxNorm' / class 'Clinical Drug Form' (era.py:276-281);
  *     exposures with no SCDF ancestor drop out (inner join);
  *  2. end dates are normalized
  *     COALESCE(end, start + days_supply, start + 1) (era.py:273);
  *  3. eras build per (person, scdf_concept) with a 30-day gap, but the
  *     output keeps one row per (person, scdf_concept, drug_type, era) —
  *     exposure counts and era_start split by type while the era_end is
  *     shared across types within the era (era.py:353-386 groups
  *     cteDrug2ExpEnds by person, concept, TYPE, era_end).
  *
  * Scale shape: the rollup is a dimension join (concept_ancestor ×
  * concept broadcast); era assignment is the single-shuffle window pass
  * ([[EraBuilder.eraIds]]); the per-type rollup aggregates FIRST on
  * (person, concept, type, era) — reusing the era shuffle's keys as a
  * prefix — and only then window-maxes the era end over the already-
  * aggregated (tiny) frame.
  */
object ScdfDrugEra extends DerivationPackage {

  override def name: String = "scdf_drug_era"

  override def requires: Seq[String] =
    Seq("drug_exposure", "concept_ancestor", "concept")

  val gapDays = 30

  override def derive(
      spark: SparkSession, lookup: String => DataFrame): DataFrame = {
    val d = lookup("drug_exposure")
    val ca = lookup("concept_ancestor")
      .select(col("descendant_concept_id"), col("ancestor_concept_id"))
    val scdf = lookup("concept")
      .filter(col("vocabulary_id") === "RxNorm" &&
        col("concept_class_id") === "Clinical Drug Form")
      .select(col("concept_id"))

    // era.py:265-281 cteDrug2Target — rollup join + end normalization
    val target = d
      .join(ca, d("drug_concept_id") === ca("descendant_concept_id"))
      .join(broadcast(scdf), ca("ancestor_concept_id") === scdf("concept_id"))
      .select(
        col("person_id"),
        col("concept_id").as("scdf_concept_id"),
        col("drug_type_concept_id"),
        col("drug_exposure_id"),
        col("drug_exposure_start_date").as("start_date"),
        coalesce(
          col("drug_exposure_end_date"),
          date_add(col("drug_exposure_start_date"),
            col("days_supply").cast("int")),
          date_add(col("drug_exposure_start_date"), 1)).as("end_date"))

    // era.py:283-366 — era membership per (person, scdf concept)
    val withEra = EraBuilder.eraIds(target,
      Seq("person_id", "scdf_concept_id"), "start_date", "end_date",
      gapDays, tiebreak = Seq("drug_exposure_id"))

    // era.py:353-386 — per-type rollup first (reuses the era shuffle's
    // key prefix), then share the era end across types via a window
    // over the aggregated frame
    val perType = withEra
      .groupBy(col("person_id"), col("scdf_concept_id"),
        col("drug_type_concept_id"), col("era_id"))
      .agg(
        min(col("start_date")).as("drug_era_start_date"),
        max(col("end_date")).as("type_max_end"),
        count(lit(1)).as("drug_exposure_count"))
    val wEra = Window.partitionBy(
      col("person_id"), col("scdf_concept_id"), col("era_id"))
    perType
      .withColumn("drug_era_end_date", max(col("type_max_end")).over(wEra))
      .select(
        col("person_id"),
        col("scdf_concept_id").as("drug_concept_id"),
        col("drug_type_concept_id"),
        col("era_id"),
        col("drug_era_start_date"),
        col("drug_era_end_date"),
        col("drug_exposure_count"))
  }

  /** era.py:371-375 — constant gap_days on every output row. */
  override def post(df: DataFrame): DataFrame =
    df.withColumn("gap_days", lit(gapDays.toLong))
}
