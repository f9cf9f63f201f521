package graft

import java.time.LocalDateTime
import java.time.ZoneOffset

import org.apache.spark.sql.functions._

import graft.functions.PgAge

class PgAgeSpec extends SparkSpec {

  private def micros(s: String): Long =
    LocalDateTime.parse(s).toInstant(ZoneOffset.UTC).toEpochMilli * 1000L

  // expected decompositions confirmed against PostgreSQL/DuckDB age()
  private val cases = Seq(
    ("1957-06-13T00:00:00", "2001-04-10T00:00:00", (43, 9, 27)),
    ("2001-01-31T00:00:00", "2001-03-01T00:00:00", (0, 1, 1)),
    ("2001-01-31T00:00:00", "2001-03-30T00:00:00", (0, 1, 30)),
    ("2020-06-30T23:59:00", "2020-07-01T00:00:00", (0, 0, 0)),
    ("2020-02-29T13:30:00", "2021-03-01T12:00:00", (1, 0, 0)),
    ("2000-02-29T00:00:00", "2001-02-28T00:00:00", (0, 11, 28))
  )

  test("ageParts matches PostgreSQL age() decomposition") {
    cases.foreach { case (earlier, later, expected) =>
      assert(
        PgAge.ageParts(micros(later), micros(earlier)) == expected,
        s"age($later, $earlier)")
    }
  }

  test("monthsInInterval matches the composed PG formula") {
    // 43y 9m 27d with 31 days in the last month (2001-03-13 → 2001-04-13)
    val got = PgAge.monthsInInterval(
      micros("1957-06-13T00:00:00"),
      micros("2001-04-10T00:00:00"))
    assert(got == 525.8709677419355)
  }

  test("negative interval is antisymmetric in parts") {
    val (y, m, d) =
      PgAge.ageParts(micros("2001-01-31T00:00:00"), micros("2001-03-01T00:00:00"))
    assert((y, m, d) == (0, -1, -1))
  }

  test("Column expression evaluates via codegen over a DataFrame") {
    import spark.implicits._
    val df = Seq(
      ("1957-06-13 00:00:00", "2001-04-10 00:00:00"),
      ("2000-02-29 00:00:00", "2001-02-28 00:00:00")
    ).toDF("a", "b")
      .select(
        PgAge.months_in_interval(col("a").cast("timestamp"), col("b").cast("timestamp"))
          .as("m"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    assert(got.head == 525.8709677419355)
    // age = 0y 11m 28d; last_month = 2000-02-29+11m = 2001-01-29,
    // month_after = 2000-02-29+12m = 2001-02-28 (clamped) → 30 days
    assert(got(1) == 11.0 + 28.0 / 30.0)
  }
}
