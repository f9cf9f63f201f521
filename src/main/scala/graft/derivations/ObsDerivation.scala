package graft.derivations

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AssignIds

/** Concept-set observation derivation — the shape of the reference's
  * COVID/RECOVER observation packages
  * (/root/reference/pedsnetdcc/r_obs_covid.py, r_obs_recover.py): an
  * external package selects source facts whose concepts fall in a
  * study concept set, routes each to a derived observation concept,
  * and the engine's post steps fill concept names from the vocabulary
  * (r_obs_covid.py:25-56 `_fill_concept_names`, six broadcast lookups)
  * and assign observation ids (`_add_observation_ids`).
  *
  * Spark-native: derive = fact × broadcast concept-set inner join
  * (drops non-matching facts) + broadcast vocabulary name fill;
  * post = deterministic global id assignment via [[AssignIds]] (the
  * reference's `row_number() over (order by ...)`), so the whole
  * derivation is one broadcast-join pipeline plus the two-phase
  * renumbering — no per-row driver work.
  */
object ObsDerivation extends DerivationPackage {

  override def name: String = "obs_derivation"

  override def requires: Seq[String] =
    Seq("measurement", "concept_set", "concept")

  /** concept_set: (source_concept_id, observation_concept_id);
    * concept: (concept_id, concept_name).
    */
  override def derive(
      spark: SparkSession, lookup: String => DataFrame): DataFrame = {
    val m = lookup("measurement")
    val cs = broadcast(lookup("concept_set")
      .select(col("source_concept_id"), col("observation_concept_id")))
    val names = broadcast(lookup("concept")
      .select(col("concept_id"), col("concept_name")))
    m.join(cs, m("measurement_concept_id") === cs("source_concept_id"))
      .join(names, col("observation_concept_id") === names("concept_id"), "left")
      .select(
        col("measurement_id"),
        col("person_id"),
        col("observation_concept_id"),
        col("concept_name").as("observation_concept_name"),
        col("value_as_number"))
  }

  /** Assign observation ids in measurement order (the reference's
    * row_number post step, made scale-safe by the range-partitioned
    * two-phase numbering). The reference's `ORDER BY measurement_id`
    * is tie-ambiguous when source ids collide, so every remaining
    * output column joins the order as a tiebreak — rows identical in
    * all columns are the only ones with interchangeable ids
    * (SURVEY.md §7.4 determinism rule).
    */
  override def post(df: DataFrame): DataFrame =
    AssignIds.assign(df,
      Seq("measurement_id", "observation_concept_id", "person_id",
        "value_as_number"),
      "observation_id", start = 1L)
}
