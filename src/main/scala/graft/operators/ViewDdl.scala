package graft.operators

import org.apache.spark.sql.SparkSession

/** View-DDL generation (S7): the reference emits Oracle view DDL over
  * the transformed tables to a SQL file
  * (/root/reference/pedsnetdcc/views.py:9-62). Spark-native twin:
  * render `CREATE OR REPLACE VIEW` statements per table (optionally
  * prefix-qualified) and/or register them in the session catalog.
  */
object ViewDdl {

  /** One view statement per table: `targetSchema.table` →
    * `SELECT col, ... FROM sourceSchema.table`.
    */
  def render(tables: Map[String, Seq[String]], sourceSchema: String,
      targetSchema: String): Seq[String] =
    tables.toSeq.sortBy(_._1).map { case (table, cols) =>
      val colList = cols.mkString(", ")
      s"CREATE OR REPLACE VIEW $targetSchema.$table AS " +
        s"SELECT $colList FROM $sourceSchema.$table;"
    }

  /** Register parquet-backed temp views in the live catalog so
    * `spark.sql` can address `<prefix>_<table>`.
    */
  def registerTempViews(spark: SparkSession, dir: String, tables: Seq[String],
      prefix: String): Unit =
    tables.foreach { t =>
      graft.core.Tables.read(spark, dir, t)
        .createOrReplaceTempView(s"${prefix}_$t")
    }

  /** Union view over split slices (U4): the reference re-exposes the
    * split measurement tables as one `measurements` view —
    * `create view measurements as select * from measurement_anthro
    * union all …` (/root/reference/pedsnetdcc/split_measurement.py:
    * 325-331). Registers each slice as a temp view plus the UNION ALL
    * view itself, and returns the rendered DDL. Reads through the view
    * stay partition-parallel: a UNION ALL view is plan-level only (no
    * shuffle), and per-slice predicates still push down into each
    * slice's scan.
    */
  def unionView(
      spark: SparkSession,
      viewName: String,
      slices: Map[String, org.apache.spark.sql.DataFrame]): String = {
    slices.toSeq.sortBy(_._1).foreach { case (name, df) =>
      df.createOrReplaceTempView(name)
    }
    val ddl = s"CREATE OR REPLACE VIEW $viewName AS " +
      slices.keys.toSeq.sorted.map(n => s"SELECT * FROM $n")
        .mkString(" UNION ALL ") + ";"
    spark.sql(s"CREATE OR REPLACE TEMP VIEW $viewName AS " +
      slices.keys.toSeq.sorted.map(n => s"SELECT * FROM $n")
        .mkString(" UNION ALL "))
    ddl
  }
}
