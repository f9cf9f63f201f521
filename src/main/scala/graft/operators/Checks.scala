package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Model

/** Constraint validation passes.
  *
  * Parity: the reference enforces PK/FK/NOT NULL as PostgreSQL DDL
  * constraints (/root/reference/pedsnetdcc/primary_keys.py:71-126,
  * foreign_keys.py:85-201, not_nulls.py:39-124). Parquet has no
  * constraints, so these become validation jobs over the written data —
  * each returns the violating rows (empty ⇒ constraint holds), so callers
  * can count, sample, or fail.
  *
  * Scale: pkDuplicates is one hash aggregation; fkOrphans is a left-anti
  * join where the parent side is usually broadcastable (dimension
  * tables); notNullViolations is a scan-only filter that pushes the
  * IS NULL predicate into the parquet reader.
  */
object Checks {

  /** Groups with more than one row for the candidate key → (key cols, n). */
  def pkDuplicates(df: DataFrame, pk: Seq[String]): DataFrame =
    df.groupBy(pk.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Child rows whose FK value has no match in the parent key (NULL FKs
    * are not violations, matching SQL FK semantics).
    */
  def fkOrphans(
      child: DataFrame,
      fkCols: Seq[String],
      parent: DataFrame,
      parentKey: Seq[String],
      broadcastParent: Boolean = false): DataFrame = {
    val parentKeys0 = parent.select(parentKey.map(col): _*).dropDuplicates()
    // deduped key projections of dimension tables are usually tiny; the
    // caller forces broadcast for those, otherwise Catalyst/AQE decides
    // (a huge parent must shuffle — forcing broadcast would OOM).
    val parentKeys = if (broadcastParent) broadcast(parentKeys0) else parentKeys0
    val joinCond = fkCols
      .zip(parentKey)
      .map { case (f, p) => child(f) === parentKeys(p) }
      .reduce(_ && _)
    child
      .filter(fkCols.map(c => col(c).isNotNull).reduce(_ && _))
      .join(parentKeys, joinCond, "left_anti")
  }

  /** Rows violating NOT NULL on any of the given columns. */
  def notNullViolations(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(c => col(c).isNull).reduce(_ || _))

  /** One polymorphic-reference domain for [[badRowReport]]: rows
    * matching `pred` must have `fkCol` present in `parent.parentKey`.
    */
  final case class DomainRef(
      domain: String,
      pred: org.apache.spark.sql.Column,
      fkCol: String,
      parent: DataFrame,
      parentKey: String)

  /** Per-domain bad-row report with example rows — the reference's
    * fact_relationship check emits, per domain and fact-id field, an
    * orphan count plus a `LIMIT 1` sample row for the error log
    * (/root/reference/pedsnetdcc/check_fact_relationship.py:142-248).
    * A LIMIT-1 sample is nondeterministic under parallel scan, so the
    * sample here is the MINIMUM violating id — same diagnostic value,
    * reproducible on any engine. Returns one row per domain:
    * (domain, n_bad, example_id — NULL when the domain is clean).
    */
  def badRowReport(
      facts: DataFrame,
      refs: Seq[DomainRef],
      idCol: String): DataFrame =
    refs.map { r =>
      val parentKeys =
        broadcast(r.parent.select(col(r.parentKey).as(r.fkCol)).dropDuplicates())
      facts.filter(r.pred && col(r.fkCol).isNotNull)
        .join(parentKeys, Seq(r.fkCol), "left_anti")
        .agg(
          count(lit(1)).as("n_bad"),
          min(col(idCol)).as("example_id"))
        .select(lit(r.domain).as("domain"), col("n_bad"), col("example_id"))
    }.reduce(_ unionByName _)

  /** Registry-driven validation report: one row per model table with
    * PK-duplicate / FK-orphan / NOT-NULL-violation counts, the
    * constraint specs resolved from the [[graft.model.Model]] exactly
    * as the reference resolves them from `stock_metadata`
    * (primary_keys.py:19-40, foreign_keys.py:18-44, not_nulls.py:15-36)
    * instead of hand-passed lists.
    *
    * `lookup` resolves a table name to its DataFrame; tables it cannot
    * resolve (not materialized in this run) are skipped, matching the
    * reference's behavior of constraining only existing tables.
    * FK orphan counts sum over every FK of the child table; an FK whose
    * parent is missing from `lookup` is skipped.
    *
    * The whole report is ONE lazy plan (each per-table count is a
    * one-row aggregate, cross-joined within the table and unioned
    * across tables) — Spark schedules every count's stages
    * concurrently in a single job instead of one blocking driver
    * action per constraint.
    */
  def modelReport(
      spark: SparkSession,
      model: Model,
      lookup: String => Option[DataFrame],
      broadcastParents: Boolean = false): DataFrame = {
    def scalar(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).cast("long").as(name))
    val perTable = model.tableSeq.flatMap { t =>
      lookup(t.name).map { df =>
        val pkRow =
          if (t.pk.nonEmpty) scalar(pkDuplicates(df, t.pk), "pk_dups")
          else spark.range(1).select(lit(0L).as("pk_dups"))
        val fkCounts = t.fks.flatMap { fk =>
          lookup(fk.refTable).map { parent =>
            fkOrphans(df, fk.cols, parent, fk.refCols, broadcastParents)
          }
        }
        val fkRow = fkCounts match {
          case Nil => spark.range(1).select(lit(0L).as("fk_orphans"))
          case cs => scalar(cs.reduce(_ unionByName _), "fk_orphans")
        }
        val nnRow =
          if (t.notNull.nonEmpty)
            scalar(notNullViolations(df, t.notNull), "null_violations")
          else spark.range(1).select(lit(0L).as("null_violations"))
        pkRow.crossJoin(fkRow).crossJoin(nnRow)
          .select(lit(t.name).as("table_name"), col("pk_dups"),
            col("fk_orphans"), col("null_violations"))
      }
    }
    perTable.reduce(_ unionByName _)
  }
}
