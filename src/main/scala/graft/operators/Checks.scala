package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
