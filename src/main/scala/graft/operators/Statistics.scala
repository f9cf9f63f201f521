package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
