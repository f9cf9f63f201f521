package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, year}

import graft.model.{LayoutHint, TableDef}

/** Registry-driven physical layout — the Spark mapping of the
  * reference's index DDL (/root/reference/pedsnetdcc/indexes.py:20-199
  * resolves per-table index columns from the model metadata and
  * creates btrees; partition_measurement.py routes writes). Here the
  * registry's [[graft.model.LayoutHint]] decides the write shape:
  *
  *  - `bucketBy` (+ sort by the bucket keys): catalog-managed bucketed
  *    table — joins/aggregations on the bucket keys between co-bucketed
  *    tables need NO shuffle (LayoutSpec proves the Exchange-free
  *    plan), the 100-TB equivalent of the reference's join indexes;
  *  - `partitionBy`: hive-style partitioned directory — predicate
  *    partition pruning on read (the reference's measurement
  *    partition routing);
  *  - no hint: plain parquet.
  */
object Layout {

  /** Write `df` according to `table`'s registry layout hint. Returns
    * what a reader should open: the catalog table name for bucketed
    * layouts, else the output path. Bucketed tables land in the
    * catalog (bucket metadata lives there), named
    * `<prefix><table>`.
    */
  /** Materialize the hint's derived partition columns that `df` lacks
    * (`yearOf`: partition col := year(source date col)) — the writer's
    * twin of the reference trigger deriving its routing value
    * (partition_measurement.py), so callers pass the CDM table as-is.
    */
  private def withDerived(df: DataFrame, h: LayoutHint): DataFrame =
    h.partitionBy.filterNot(df.columns.contains).foldLeft(df) { (d, p) =>
      h.yearOf.get(p) match {
        case Some(src) => d.withColumn(p, year(col(src)).cast("long"))
        case None => sys.error(
          s"Layout: partition column '$p' is neither in the data nor derivable")
      }
    }

  def write(
      df0: DataFrame,
      table: TableDef,
      outDir: String,
      catalogPrefix: String = "graft_"): String = {
    val spark = df0.sparkSession
    val df = table.layout.map(withDerived(df0, _)).getOrElse(df0)
    table.layout match {
      case Some(h) if h.bucketBy.nonEmpty =>
        val name = s"$catalogPrefix${table.name}"
        spark.sql(s"DROP TABLE IF EXISTS $name")
        val w = df.write
          .bucketBy(h.numBuckets, h.bucketBy.head, h.bucketBy.tail: _*)
          .sortBy(h.bucketBy.head, h.bucketBy.tail: _*)
          .mode("overwrite")
        (if (h.partitionBy.nonEmpty) w.partitionBy(h.partitionBy: _*) else w)
          .saveAsTable(name)
        name
      case Some(h) if h.partitionBy.nonEmpty =>
        val path = s"$outDir/${table.name}.parquet"
        df.write.partitionBy(h.partitionBy: _*).mode("overwrite").parquet(path)
        path
      case _ =>
        val path = s"$outDir/${table.name}.parquet"
        df.write.mode("overwrite").parquet(path)
        path
    }
  }
}
