package graft.operators

import graft.model.{Model, TableDef}

/** Registry-driven CREATE TABLE DDL — the engine's twin of the
  * reference's `prepdb` subcommand, which renders and executes the
  * full per-schema table DDL for every site from `stock_metadata`
  * (/root/reference/pedsnetdcc/prepdb.py:164-232 builds
  * `CREATE SCHEMA` + per-table DDL per site; permissions are PG-only
  * and have no Spark analogue).
  *
  * The rendered statements are plain Spark SQL (`CREATE TABLE …
  * USING PARQUET`), so the same registry that drives validation
  * ([[Checks.modelReport]]) and physical layout ([[Layout.write]])
  * also provisions empty schemas — one metadata source end to end.
  * PK/FK/NOT NULL are constraint *metadata* in the registry, not
  * engine-enforced (Spark has no constraint enforcement); they are
  * emitted as trailing comments so the DDL file documents them.
  */
object Ddl {

  /** Spark SQL DDL for one table, optionally schema-qualified. */
  def createTable(td: TableDef, schema: Option[String] = None): String = {
    val qualified = schema.map(s => s"$s.${td.name}").getOrElse(td.name)
    val cols = td.schema.fields
      .map(f => s"  ${f.name} ${f.dataType.sql}")
      .mkString(",\n")
    val notes = Seq(
      if (td.pk.nonEmpty) Some(s"-- primary key (${td.pk.mkString(", ")})")
      else None,
      if (td.notNull.nonEmpty) Some(s"-- not null: ${td.notNull.mkString(", ")}")
      else None) ++
      td.fks.map(fk => Some(
        s"-- foreign key (${fk.cols.mkString(", ")}) references " +
          s"${fk.refTable}(${fk.refCols.mkString(", ")})"))
    val noteLines = notes.flatten.map(n => s"$n\n").mkString
    s"${noteLines}CREATE TABLE $qualified (\n$cols\n) USING PARQUET"
  }

  /** The full prepdb surface: one `CREATE DATABASE` + per-table DDL
    * per site namespace (the reference's `('dcc',) + SITES` loop,
    * prepdb.py:44-57,164-191).
    */
  def prepSchemas(model: Model, sites: Seq[String]): Seq[String] =
    sites.flatMap { site =>
      s"CREATE DATABASE IF NOT EXISTS $site" +:
        model.tableSeq.map(td => createTable(td, Some(site)))
    }
}
