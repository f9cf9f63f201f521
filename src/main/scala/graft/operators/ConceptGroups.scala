package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Index-replacement concept-group tables — the engine's twin of the
  * reference's `create_index_replacement_tables`
  * (/root/reference/pedsnetdcc/concept_group_tables.py:10-60): for a
  * configured (table, value column, id column) map, materialize
  * `<table>_<suffix>` as `SELECT value, id, count(id) GROUP BY value,
  * id` — grouped lookup tables that replace wide btree indexes for the
  * reference's hot name/source-value probes.
  *
  * Spark shape: each group table is one partial-aggregated groupBy
  * (map-side combine), so a table of N rows shuffles only its distinct
  * (value, id) pairs; no ORDER BY is materialized (the reference's
  * `ORDER BY 1` only fed the PK build — Spark layouts order at write
  * time via [[Layout]] hints instead).
  */
object ConceptGroups {

  /** One group table: `name` is the reference's `<table>_<suffix>`. */
  final case class GroupSpec(
      name: String, table: String, valueCol: String, idCol: String)

  def build(
      lookup: String => DataFrame,
      specs: Seq[GroupSpec]): Seq[(String, DataFrame)] =
    specs.map { g =>
      g.name -> lookup(g.table)
        .groupBy(col(g.valueCol), col(g.idCol))
        .agg(count(col(g.idCol)).as("n"))
    }
}
