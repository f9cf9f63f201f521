package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Parity queries: one per operator family in SURVEY.md §2, expressed over
  * the driver's TPC-H-ish synthetic tables.
  *
  * Oracle-safety conventions (the driver hash-compares against DuckDB):
  *  - double aggregation goes through DecimalType so both engines sum
  *    exactly, then casts back to double;
  *  - every ranked/limited result carries a deterministic total order
  *    (unique key tiebreak);
  *  - result column names are aliased identically on both sides.
  */
object ParityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** A2/A4-style grouped aggregation (TPC-H Q1 shape). */
  def q01Agg(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(20,4)"
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))).cast("decimal(28,8)"))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,4)) * (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4))) AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> ((s, dir) => q01Agg(s, dir))
  )

  def oracle: Map[String, String] = Map(
    "q01_agg" -> q01Sql
  )
}
