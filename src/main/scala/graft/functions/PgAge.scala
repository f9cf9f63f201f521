package graft.functions

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, TimestampType}

/** PostgreSQL `age()`-compatible calendar arithmetic.
  *
  * The reference's only nontrivial scalar function is
  * `months_in_interval(start, end)` — fractional months between two
  * timestamps, defined as
  * `years*12 + months + days / days_in_last_month_of_interval`
  * where years/months/days come from PostgreSQL's `age()` decomposition
  * (/root/reference/pedsnetdcc/age_transform.py:10-46). Spark's
  * `months_between` uses a 31-day convention and is NOT equivalent, so we
  * replicate the PG semantics exactly:
  *
  *  - field-wise diff of (year, month, day, time-of-day) between the two
  *    timestamps (later minus earlier; swapped if negative);
  *  - borrow chain: negative time-of-day borrows a day; negative days
  *    borrow a month, adding the number of days in the *earlier*
  *    timestamp's (calendar) month — PG `timestamp_age`'s
  *    `day_tab[isleap(tm2_year)][tm2_mon-1]`, which is NOT re-evaluated
  *    across borrow iterations; negative months borrow a year;
  *  - `days_in_last_month_of_interval` = days between
  *    `start + years(age) + months(age)` and `start + years(age) +
  *    (months(age)+1)` where the year and month offsets are added in two
  *    separate clamped additions (the reference SQL adds
  *    `interval '1 year' * Y` then `interval '1 month' * M`).
  */
object PgAge {

  private val dayTab: Array[Array[Int]] = Array(
    Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    Array(31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  )

  private def isLeap(y: Int): Int =
    if ((y % 4 == 0 && y % 100 != 0) || y % 400 == 0) 1 else 0

  /** PG `age(later, earlier)` year/month/day decomposition (time-of-day
    * used only for the day borrow, as in PG). Returns (years, months,
    * days) with PG's sign convention (all non-negative when
    * later >= earlier, all non-positive otherwise).
    */
  def ageParts(laterMicros: Long, earlierMicros: Long): (Int, Int, Int) = {
    val neg = laterMicros < earlierMicros
    val (aMicros, bMicros) =
      if (neg) (earlierMicros, laterMicros) else (laterMicros, earlierMicros)
    val a = microsToLdt(aMicros)
    val b = microsToLdt(bMicros)

    var timeDiff = a.toLocalTime.toNanoOfDay - b.toLocalTime.toNanoOfDay
    var days = a.getDayOfMonth - b.getDayOfMonth
    var months = a.getMonthValue - b.getMonthValue
    var years = a.getYear - b.getYear
    if (timeDiff < 0) { timeDiff += 86400L * 1000000000L; days -= 1 }
    // PG borrows days from the EARLIER date's calendar month and does not
    // advance that month across iterations (timestamp.c, timestamp_age).
    val borrowDays = dayTab(isLeap(b.getYear))(b.getMonthValue - 1)
    while (days < 0) { days += borrowDays; months -= 1 }
    while (months < 0) { months += 12; years -= 1 }
    if (neg) (-years, -months, -days) else (years, months, days)
  }

  private def microsToLdt(micros: Long): LocalDateTime = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    LocalDateTime.ofEpochSecond(secs, frac.toInt * 1000, java.time.ZoneOffset.UTC)
  }

  /** PG timestamp + n months with end-of-month clamping (same convention
    * as Spark's add_months / PG's `+ interval 'n month'`).
    */
  private def addMonthsClamped(ldt: LocalDateTime, n: Int): LocalDateTime =
    ldt.plusMonths(n) // java.time clamps day-of-month like PG

  /** `months_in_interval(start, end)` — see object doc. Static so codegen
    * can call it directly.
    */
  def monthsInInterval(startMicros: Long, endMicros: Long): Double = {
    val (y, m, d) = ageParts(endMicros, startMicros)
    val start = microsToLdt(startMicros)
    // reference SQL: $1 + 1y*Y then + 1mon*M — two separate clamped adds
    val lastMonth = addMonthsClamped(start.plusYears(y), m)
    val monthAfter = addMonthsClamped(start.plusYears(y), m + 1)
    val daysInLastMonth = ChronoUnit.DAYS.between(lastMonth, monthAfter).toDouble
    y * 12.0 + m + d / daysInLastMonth
  }

  /** Column API: `months_in_interval(start, end)`. */
  def months_in_interval(start: Column, end: Column): Column =
    ColumnBridge.column(
      MonthsInInterval(
        ColumnBridge.expression(start.cast(TimestampType)),
        ColumnBridge.expression(end.cast(TimestampType))))
}

/** Catalyst expression for `months_in_interval` with whole-stage codegen
  * (emits a static call — no UDF serialization, stays inside
  * WholeStageCodegen spans).
  */
case class MonthsInInterval(left: Expression, right: Expression)
    extends BinaryExpression {

  // children must already be TimestampType; the Column wrapper in PgAge
  // casts, so no ExpectsInputTypes (private[sql]) is needed
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(startMicros: Any, endMicros: Any): Any =
    PgAge.monthsInInterval(startMicros.asInstanceOf[Long], endMicros.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, e) => s"graft.functions.PgAge.monthsInInterval($s, $e)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "months_in_interval"
}
