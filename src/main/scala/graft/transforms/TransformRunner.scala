package graft.transforms

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.operators.{Checks, IdMapStore}

/** The reference's top entry point — `pedsnetdcc transform`
  * (/root/reference/pedsnetdcc/transform_runner.py:809-942) — as one
  * Spark job per site schema:
  *
  *  1. fold the transform pipeline over every table (the reference
  *     compiles the folded SELECT to SQL and CTASes it);
  *  2. write each result atomically (write-staging-then-rename — the
  *     reference's `<schema>_backup` transactional swap,
  *     transform_runner.py:899-927);
  *  3. run the post-load validation passes (PK uniqueness / NOT NULL —
  *     the reference's ADD CONSTRAINT steps, which on parquet become
  *     checks rather than enforced constraints).
  *
  * The reference parallelizes CTAS statements across ≤25 worker
  * connections; here each write is already cluster-parallel, and
  * cross-table concurrency falls out of the Spark scheduler if callers
  * submit tables from parallel driver threads.
  */
object TransformRunner {

  /** Per-table validation spec: PK columns and NOT NULL columns. */
  final case class TableChecks(pk: Seq[String] = Nil, notNull: Seq[String] = Nil)

  /** Derive the per-table validation specs from a schema registry —
    * the registry-driven path matching the reference, where
    * `stock_metadata(model_version)` feeds every constraint pass
    * (primary_keys.py:19-40, not_nulls.py:15-36) rather than callers
    * hand-passing column lists.
    */
  def checksFor(model: graft.model.Model): Map[String, TableChecks] =
    model.tableSeq.map { t =>
      t.name -> TableChecks(pk = t.pk, notNull = t.notNull)
    }.toMap

  /** Registry-driven run: tables and validation specs come from the
    * model; only tables present in the registry are processed.
    */
  def run(
      spark: SparkSession,
      siteDir: String,
      site: String,
      model: graft.model.Model,
      transforms: Seq[Transform],
      lookup: String => DataFrame,
      outDir: String): Seq[TableResult] =
    run(spark, siteDir, site, model.tableSeq.map(_.name), transforms, lookup,
      checksFor(model), outDir)

  final case class TableResult(table: String, rows: Long, pkDuplicates: Long,
      nullViolations: Long)

  /** Transform every `table` in `siteDir` through `transforms`, write
    * to `outDir/<table>.parquet` atomically, validate, and report.
    */
  def run(
      spark: SparkSession,
      siteDir: String,
      site: String,
      tables: Seq[String],
      transforms: Seq[Transform],
      lookup: String => DataFrame,
      checks: Map[String, TableChecks] = Map.empty,
      outDir: String): Seq[TableResult] = {
    val ctx = TransformContext(spark, site, lookup)
    val log = graft.util.JsonLog()
    tables.map { table =>
      log.info("msg" -> "transforming table", "site" -> site, "table" -> table)
      val transformed =
        Transform.runAll(ctx, table, Tables.read(spark, siteDir, table), transforms)
      IdMapStore.atomicWrite(transformed, s"$outDir/$table.parquet")
      val out = Tables.read(spark, outDir, table)
      val spec = checks.getOrElse(table, TableChecks())
      val pkDups =
        if (spec.pk.nonEmpty) Checks.pkDuplicates(out, spec.pk).count() else 0L
      val nulls =
        if (spec.notNull.nonEmpty)
          Checks.notNullViolations(out, spec.notNull).count()
        else 0L
      val result = TableResult(table, out.count(), pkDups, nulls)
      log.info("msg" -> "table transformed", "site" -> site, "table" -> table,
        "rows" -> result.rows, "pk_dups" -> result.pkDuplicates,
        "null_violations" -> result.nullViolations)
      result
    }
  }
}
