package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Model

/** Registry-driven whole-schema cohort subsetting — the engine's twin
  * of the reference's `subset_by_cohort` main path
  * (/root/reference/pedsnetdcc/subset_by_cohort.py:152-222), which
  * loops over every `stock_metadata` table and creates
  * `<table>_subset` via an EXISTS against the cohort; the same loop
  * shape drives `subset_pcornet_by_cohort.py`.
  *
  * The reference ties every table to the cohort through its person_id
  * column; here the linkage is the registry's FK graph: the root table
  * subsets on its PK against the cohort keys, and any table with an FK
  * into an already-subsetted table subsets by semi-join on that FK
  * (transitively — lineitem reaches a customer cohort through orders,
  * the way the reference's visit-payer tables chain through visit).
  * When a table has several FKs into the subsetted set, the first in
  * registry order wins (the reference's person FK, by convention first).
  *
  * Scale: only the root cohort key set is broadcast (caller-gated —
  * cohorts are small); every derived level is a plain left-semi join
  * that AQE plans, so fact tables stream through one shuffle each and
  * no fact-sized key set is ever collected or broadcast. Because
  * `fk.refCols` is verified against the parent's registry PK, the
  * parent key sides skip the defensive dropDuplicates shuffle — the
  * registry proves uniqueness.
  */
object ModelSubset {

  /** Subset every FK-reachable table of `model` to the cohort.
    *
    * @param cohort one row per cohort member, keyed by the root's PK
    *               column names
    * @param materialize when set, each level's subset is passed through
    *               this (write parquet + read back) before its children
    *               join against it — the reference materializes every
    *               `<table>_subset` the same way
    *               (subset_by_cohort.py:215-222), so a deep chain scans
    *               the written parent once instead of re-running the
    *               whole ancestor lineage per level. Leave None for a
    *               single-action lazy plan (count reports).
    * @return (table, subsetted rows) in registry order, root first
    */
  def subset(
      model: Model,
      root: String,
      cohort: DataFrame,
      lookup: String => DataFrame,
      broadcastCohort: Boolean = true,
      materialize: Option[(String, DataFrame) => DataFrame] = None): Seq[(String, DataFrame)] = {
    val rootDef = model.table(root)
    require(rootDef.pk.nonEmpty, s"subset root '$root' needs a registry PK")
    val c0 = cohort.select(rootDef.pk.map(col): _*).dropDuplicates()
    val c = if (broadcastCohort) broadcast(c0) else c0

    val seal = materialize.getOrElse((_: String, df: DataFrame) => df)
    val subs = mutable.LinkedHashMap[String, DataFrame](
      root -> seal(root, lookup(root).join(c, rootDef.pk, "left_semi")))
    var changed = true
    while (changed) {
      changed = false
      model.tableSeq.filterNot(td => subs.contains(td.name)).foreach { td =>
        td.fks.find(fk => subs.contains(fk.refTable)).foreach { fk =>
          val parentDef = model.table(fk.refTable)
          val parentKeys0 = subs(fk.refTable).select(
            fk.refCols.zip(fk.cols).map { case (p, ch) => col(p).as(ch) }: _*)
          val parentKeys =
            if (fk.refCols == parentDef.pk) parentKeys0
            else parentKeys0.dropDuplicates()
          subs += td.name ->
            seal(td.name, lookup(td.name).join(parentKeys, fk.cols, "left_semi"))
          changed = true
        }
      }
    }
    subs.toSeq
  }

  /** One-row-per-table row-count report over a subset result — the
    * shape the reference logs after each `CREATE TABLE …_subset`
    * (subset_by_cohort.py:215-222). Composed as ONE lazy plan (each
    * count is a partial-aggregated one-row groupBy, unioned plan-level)
    * so a single action materializes the report.
    */
  def countReport(subs: Seq[(String, DataFrame)]): DataFrame =
    subs.map { case (name, df) =>
      df.groupBy().agg(count(lit(1)).as("n_rows"))
        .select(lit(name).as("table_name"), col("n_rows"))
    }.reduce(_ unionByName _)
}
