package graft.transforms

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Column-append transform composition.
  *
  * Parity: the reference's `Transform.modify_select` contract — each
  * transform receives the running SELECT over a table and appends
  * derived columns/joins; the runner folds all transforms over every
  * table (/root/reference/pedsnetdcc/abstract_transform.py:46-86,
  * transform_runner.py:64-99). In Spark the running SELECT is simply the
  * DataFrame; composition is `df.transform(t1).transform(t2)…`, and
  * Catalyst collapses the chained projections/joins into one plan — the
  * N-stage pipeline costs one pass over the data.
  */
trait Transform {

  /** Whether this transform applies to the given table. */
  def appliesTo(table: String): Boolean = true

  /** Append derived columns to `df` (never remove or reorder existing
    * ones — downstream transforms see the widened schema, exactly like
    * the reference's chained modify_select).
    */
  def apply(ctx: TransformContext, table: String, df: DataFrame): DataFrame
}

/** Shared inputs a transform may need (dimension tables, site label). */
final case class TransformContext(
    spark: SparkSession,
    site: String,
    lookup: String => DataFrame)

object Transform {

  /** Fold a transform pipeline over one table's DataFrame. */
  def runAll(
      ctx: TransformContext,
      table: String,
      df: DataFrame,
      transforms: Seq[Transform]): DataFrame =
    transforms.filter(_.appliesTo(table)).foldLeft(df)((d, t) => t(ctx, table, d))
}
