package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.derivations.{Derivations, LabLoinc, ObsDerivation, ScdfDrugEra}

class DerivationsSpec extends SparkSpec {

  import spark.implicits._

  private def measurement: DataFrame = Seq(
    // (measurement_id, person_id, concept_id, value)
    (10L, 1L, 100L, 5.0),
    (20L, 1L, 200L, 6.0), // concept not in the set -> dropped
    (30L, 2L, 101L, 7.0),
    (40L, 2L, 100L, 8.0)
  ).toDF("measurement_id", "person_id", "measurement_concept_id",
    "value_as_number")

  private def conceptSet: DataFrame = Seq(
    (100L, 9100L),
    (101L, 9101L)
  ).toDF("source_concept_id", "observation_concept_id")

  // vocabulary misses 9101 -> name must be null, row still kept
  private def concept: DataFrame = Seq(
    (9100L, "Alpha")
  ).toDF("concept_id", "concept_name")

  private def lookup: String => DataFrame = Map(
    "measurement" -> measurement,
    "concept_set" -> conceptSet,
    "concept" -> concept)

  test("obs derivation keeps only set concepts, fills names via left join") {
    val out = ObsDerivation.run(spark, lookup).orderBy("measurement_id")
      .select("measurement_id", "observation_concept_id",
        "observation_concept_name", "observation_id")
      .as[(Long, Long, Option[String], Long)].collect().toSeq
    assert(out === Seq(
      (10L, 9100L, Some("Alpha"), 1L),
      (30L, 9101L, None, 2L),
      (40L, 9100L, Some("Alpha"), 3L)))
  }

  test("observation ids are dense from 1 in measurement order") {
    val ids = ObsDerivation.run(spark, lookup)
      .orderBy("observation_id")
      .select("observation_id", "measurement_id")
      .as[(Long, Long)].collect().toSeq
    assert(ids.map(_._1) === (1L to ids.size).toSeq)
    assert(ids.map(_._2) === ids.map(_._2).sorted)
  }

  test("runAll resolves each package by name against one lookup") {
    val results = Derivations.runAll(spark, Seq(ObsDerivation), lookup)
    assert(results.keySet === Set("obs_derivation"))
    assert(results("obs_derivation").count() === 3L)
  }

  test("package metadata declares its table requirements") {
    assert(ObsDerivation.requires ===
      Seq("measurement", "concept_set", "concept"))
    assert(Seq(ScdfDrugEra, LabLoinc, ObsDerivation).map(_.name).distinct.size === 3)
  }
}
