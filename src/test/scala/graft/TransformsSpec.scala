package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.transforms._

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val person: DataFrame = Seq(
    (1L, "2010-03-15 00:00:00"),
    (2L, "2012-08-01 06:00:00")
  ).toDF("person_id", "birth_datetime")
    .withColumn("birth_datetime", col("birth_datetime").cast("timestamp"))

  private lazy val concept: DataFrame = Seq(
    (100L, "Height"), (200L, "cm")
  ).toDF("concept_id", "concept_name")

  private def ctx = TransformContext(
    spark,
    site = "siteA",
    lookup = Map("person" -> person, "concept" -> concept))

  test("AgeTransform appends _age_in_months per configured column") {
    val meas = Seq(
      (10L, 1L, "2020-03-15 00:00:00"),
      (11L, 2L, "2020-08-01 06:00:00")
    ).toDF("measurement_id", "person_id", "measurement_datetime")
      .withColumn("measurement_datetime", col("measurement_datetime").cast("timestamp"))

    val out = AgeTransform(Map("measurement" -> Seq("measurement_datetime")))
      .apply(ctx, "measurement", meas)
    assert(out.columns.contains("measurement_age_in_months"))
    val ages = out.orderBy("measurement_id").collect().map(_.getDouble(3))
    assert(ages.toSeq == Seq(120.0, 96.0)) // exactly 10y and 8y
  }

  test("ConceptNameTransform appends one name column per concept id column") {
    val meas = Seq((10L, 100L, 200L), (11L, 100L, 999L))
      .toDF("measurement_id", "measurement_concept_id", "unit_concept_id")
    val out = ConceptNameTransform(_ => Seq("measurement_concept_id", "unit_concept_id"))
      .apply(ctx, "measurement", meas)
      .orderBy("measurement_id")
      .collect()
    assert(out(0).getString(3) == "Height" && out(0).getString(4) == "cm")
    assert(out(1).getString(4) == null) // unmatched concept → NULL name
  }

  test("SiteNameTransform appends the site literal; pipeline composes") {
    val meas = Seq((10L, 1L)).toDF("measurement_id", "person_id")
    val out = Transform.runAll(
      ctx,
      "measurement",
      meas,
      Seq(SiteNameTransform()))
    assert(out.head().getString(2) == "siteA")
  }
}
