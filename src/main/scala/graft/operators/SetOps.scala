package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multi-site merge, table splitting, cohort subsetting, idempotent
  * append — the reference's set-operation surface.
  */
object SetOps {

  /** U1: union one table across N site schema directories into the merged
    * namespace (/root/reference/pedsnetdcc/merge_site_data.py:28-36,
    * 134-168). `fields` fixes the projected column list (the reference
    * derives it from transformed metadata) so sites with extra/missing
    * columns fail loudly rather than silently misalign.
    *
    * Scale: unionByName is plan-level only — no shuffle; each site's scan
    * stays partition-parallel and the write streams through.
    */
  def mergeSites(
      spark: SparkSession,
      siteDirs: Seq[String],
      table: String,
      fields: Seq[String]): DataFrame =
    siteDirs
      .map(dir => Tables.read(spark, dir, table).select(fields.map(col): _*))
      .reduce(_ unionByName _)

  /** P3: split a table into named slices by mutually-exclusive concept-id
    * sets, with a catch-all remainder
    * (/root/reference/pedsnetdcc/split_measurement.py:12-13,86-113 splits
    * measurement into anthro/labs/vitals). One cached scan feeds all
    * outputs.
    */
  def splitByConceptSets(
      df: DataFrame,
      conceptCol: String,
      slices: Map[String, Set[Long]]): Map[String, DataFrame] = {
    val cached = df.cache()
    val named = slices.map { case (name, ids) =>
      name -> cached.filter(col(conceptCol).isin(ids.toSeq: _*))
    }
    val allIds = slices.values.flatten.toSeq
    named + ("other" -> cached.filter(!col(conceptCol).isin(allIds: _*)))
  }

  /** J7: subset a fact table to persons in a cohort via left-semi join
    * (/root/reference/pedsnetdcc/subset_by_cohort.py:152-222). The cohort
    * (distinct person ids) is usually much smaller than facts →
    * broadcast.
    */
  def subsetByCohort(
      facts: DataFrame,
      cohort: DataFrame,
      keys: Seq[String],
      broadcastCohort: Boolean = true): DataFrame = {
    val c0 = cohort.select(keys.map(col): _*).dropDuplicates()
    val c = if (broadcastCohort) broadcast(c0) else c0
    facts.join(c, keys, "left_semi")
  }

  /** S4: idempotent append — `INSERT … ON CONFLICT DO NOTHING`
    * (/root/reference/pedsnetdcc/era.py:422-457) as an anti-join on the
    * key followed by unionByName.
    */
  def idempotentAppend(
      target: DataFrame,
      incoming: DataFrame,
      key: Seq[String]): DataFrame = {
    val fresh = incoming.join(target.select(key.map(col): _*).dropDuplicates(), key, "left_anti")
    target.unionByName(fresh.select(target.columns.map(col).toSeq: _*))
  }

  /** One branch of an OR-of-EXISTS subset: rows matching `pred` are
    * kept iff their `fkCol` value exists among `parent`'s `parentKey`s.
    */
  final case class ExistsBranch(
      pred: org.apache.spark.sql.Column,
      parent: DataFrame,
      fkCol: String,
      parentKey: String,
      broadcastParent: Boolean = true)

  /** OR-of-EXISTS subsetting — the reference's fact_relationship
    * special-case during cohort subsetting, where a row survives if ANY
    * of its per-domain EXISTS predicates matches
    * (/root/reference/pedsnetdcc/subset_by_cohort.py:198-205: visit=8 /
    * drug=13 / measurement=21 / observation=27 branches OR-ed together;
    * same shape in subset_pcornet_by_cohort.py).
    *
    * Branch predicates must be mutually exclusive (the reference's are:
    * each row has exactly one domain code), so the branch semi-joins
    * union WITHOUT a dedup pass — each fact row can satisfy at most one
    * branch. Scale: every branch is filter → semi-join on its own key;
    * cohort/parent key sets broadcast by default (they are the small
    * side), so the fact table streams through once per branch with no
    * fact-side shuffle.
    */
  def subsetByAnyExists(
      facts: DataFrame,
      branches: Seq[ExistsBranch]): DataFrame =
    branches.map { b =>
      val keys0 = b.parent.select(col(b.parentKey).as(b.fkCol)).dropDuplicates()
      val keys = if (b.broadcastParent) broadcast(keys0) else keys0
      facts.filter(b.pred).join(keys, Seq(b.fkCol), "left_semi")
    }.reduce(_ unionByName _)

  /** J10: UPDATE-join as recompute-and-rewrite — replace `targetCol` with
    * the value from `source` matched on `key`, keeping the old value when
    * unmatched (/root/reference/pedsnetdcc/era.py:392-418 updates concept
    * names in place; Spark tables are immutable so we project).
    */
  def updateJoin(
      df: DataFrame,
      source: DataFrame,
      key: Seq[String],
      targetCol: String,
      sourceCol: String): DataFrame = {
    val src = source.select((key.map(col) :+ col(sourceCol).alias("__upd")): _*)
    val joined = df.join(src, key, "left")
    val replaced = df.columns.toSeq.map {
      case c if c == targetCol => coalesce(col("__upd"), col(targetCol)).alias(targetCol)
      case c                   => col(c)
    }
    joined.select(replaced: _*)
  }
}
