package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-statistics pass — the reference's `VACUUM ANALYZE` sweep over
  * the model's tables (/root/reference/pedsnetdcc/utils.py:343-388),
  * which keeps the PostgreSQL planner's estimates fresh after batch
  * loads. The Spark analogue is `ANALYZE TABLE … COMPUTE STATISTICS`:
  * row counts + size feed the cost-based optimizer (join reordering,
  * broadcast decisions), and per-column stats enable value-range
  * pruning. Parquet is immutable so there is nothing to VACUUM; the
  * ANALYZE half is the part that matters at scale.
  */
object Statistics {

  private val statsRe = """(\d+)\s+rows""".r

  /** Register each `<dir>/<table>.parquet` as an external catalog
    * table named `stats_<table>`, ANALYZE it (plus optional per-column
    * stats), and report the catalog-recorded row count per table.
    * External tables point at the existing parquet — no data is
    * copied, only catalog metadata is written.
    */
  def analyze(
      spark: SparkSession,
      dir: String,
      tables: Seq[String],
      columns: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val rows = tables.map { t =>
      val tbl = s"stats_$t"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"CREATE TABLE $tbl USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS")
      columns.get(t).foreach { cs =>
        spark.sql(
          s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS ${cs.mkString(", ")}")
      }
      val stats = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
        .filter("col_name = 'Statistics'")
        .collect()
        .headOption.map(_.getString(1)).getOrElse("")
      val rowCount = statsRe.findFirstMatchIn(stats)
        .map(_.group(1).toLong).getOrElse(-1L)
      (t, rowCount)
    }
    import spark.implicits._
    rows.toDF("table_name", "row_count")
  }

  /** Equi-width histogram over a numeric column — the per-column
    * distribution statistic the reference's ANALYZE populates into
    * `pg_stats` for the planner (Spark's `FOR COLUMNS` analogue, here
    * as data a user can read and any engine can reproduce). Values
    * land in `buckets` equal-width bins over the observed [min, max];
    * the max value joins the last bin.
    *
    * Scale shape: the min/max aggregate is one scalar row broadcast
    * back over the scan, and the bucket rollup partial-aggregates
    * map-side — two passes over the column, no wide shuffle.
    */
  def histogram(df: DataFrame, column: String, buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val mm = df.agg(
      min(col(column).cast("double")).as("mn"),
      max(col(column).cast("double")).as("mx"))
    // NULLs carry no position on the [min, max] axis — without the
    // filter, least(buckets-1, null) silently lands them in the TOP
    // bucket (both engines share the LEAST quirk), inflating the tail
    df.select(col(column).cast("double").as("x"))
      .filter(col("x").isNotNull)
      .crossJoin(broadcast(mm))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(buckets - 1L),
            floor((col("x") - col("mn")) * buckets / (col("mx") - col("mn")))))
          .cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
  }
}
