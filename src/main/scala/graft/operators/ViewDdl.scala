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

  /** Whole-model Oracle-dialect view DDL
    * (/root/reference/pedsnetdcc/views.py:39-57, CLI entry
    * main.py:2248-2261): for EVERY table in the registry model, a
    * lower-case view that re-aliases each upper-cased source column
    * back to its lower-case name, then a GRANT SELECT per view — both
    * blocks sorted by table name, creates before grants, schemas
    * upper-cased. Pure driver-side rendering over registry metadata
    * ([[graft.model.Model]]), no Spark jobs — breadth comes from the
    * model version, so v2.7/v3.3/tpch all render without table lists.
    */
  def oracleViews(model: graft.model.Model, sourceSchema: String,
      targetSchema: String): Seq[String] = {
    val src = sourceSchema.toUpperCase
    val tgt = targetSchema.toUpperCase
    val names = model.tableSeq.map(_.name).sorted
    val creates = names.map { n =>
      val cols = model.table(n).columns
        .map(c => s""""${c.toUpperCase}" AS "$c"""").mkString(", ")
      s"""CREATE OR REPLACE VIEW "$tgt"."$n" AS SELECT $cols""" +
        s""" FROM "$src"."${n.toUpperCase}";"""
    }
    val grants =
      names.map(n => s"""GRANT SELECT ON "$tgt"."$n" TO "$tgt";""")
    creates ++ grants
  }

  /** Registration twin of [[oracleViews]] for a live session: every
    * model table becomes a parquet-backed temp view `<prefix>_<table>`.
    * Returns the registered view names. Reads through the views stay
    * fully pushdown-transparent — a temp view is plan-level only.
    */
  def registerModelViews(spark: SparkSession, dir: String,
      model: graft.model.Model, prefix: String): Seq[String] =
    model.tableSeq.map(_.name).sorted.map { t =>
      graft.core.Tables.read(spark, dir, t)
        .createOrReplaceTempView(s"${prefix}_$t")
      s"${prefix}_$t"
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
