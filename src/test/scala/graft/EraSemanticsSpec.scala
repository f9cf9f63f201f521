package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.{EraBuilder, EraReference}

/** Cross-validates the production single-window era derivation against
  * the reference's literal "2·start_ordinal − overall_ordinal = 0"
  * formulation (SURVEY.md §7.4 risk 3): identical eras on the driver
  * data AND on the adversarial tie cases (duplicate intervals,
  * zero-length intervals, gaps of exactly the tolerance, contained
  * intervals).
  */
class EraSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.select("person_id", "concept_id", "era_id", "era_start", "era_end",
        "row_count")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDate(3).toString, r.getDate(4).toString, r.getLong(5)))
      .sortBy(t => (t._1, t._2, t._3))
      .toSeq

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    val fast = EraBuilder.eras(df, Seq("person_id", "concept_id"),
      "start_date", "end_date", gapDays = 30)
    val ref = EraReference.eras(df, Seq("person_id", "concept_id"),
      "start_date", "end_date", gapDays = 30)
    assert(norm(fast) == norm(ref))
  }

  test("adversarial tie cases match the literal formulation") {
    def d(s: String) = Date.valueOf(s)
    val df = Seq(
      // duplicate intervals
      (1L, 1L, d("2020-01-01"), d("2020-01-10")),
      (1L, 1L, d("2020-01-01"), d("2020-01-10")),
      // gap of exactly 30 days (must merge)
      (1L, 1L, d("2020-02-09"), d("2020-02-11")),
      // gap of 31 days (must split)
      (1L, 1L, d("2020-03-14"), d("2020-03-15")),
      // zero-length interval
      (1L, 2L, d("2020-06-01"), d("2020-06-01")),
      // contained interval + same-start different-end
      (2L, 1L, d("2020-01-01"), d("2020-12-31")),
      (2L, 1L, d("2020-03-01"), d("2020-03-02")),
      (2L, 1L, d("2020-01-01"), d("2020-02-01"))
    ).toDF("person_id", "concept_id", "start_date", "end_date")
    compare(df)
  }

  test("driver lineitem intervals match the literal formulation") {
    val intervals = graft.core.Tables.read(spark, sf0001, "lineitem").select(
      col("l_suppkey").alias("person_id"),
      (col("l_partkey") % 10).alias("concept_id"),
      col("l_shipdate").cast("date").alias("start_date"),
      date_add(col("l_shipdate").cast("date"),
        col("l_quantity").cast("int")).alias("end_date"))
    compare(intervals)
  }
}
