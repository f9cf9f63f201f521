package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the Spark-lake analogue of the reference's
  * post-load `VACUUM` (`/root/reference/pedsnetdcc/utils.py` `vacuum`,
  * called after every merge at `merge_site_data.py:207,413` and after
  * observation-period sync at `sync_observation_period.py:116`).
  *
  * PostgreSQL's vacuum reclaims dead tuples; a parquet lake's
  * equivalent maintenance debt is file fragmentation. Every incremental
  * append or per-site merge leaves task-count-sized files, and at
  * 100 TB a scan's task count — and the driver's listing/planning
  * memory — is O(files). Compaction rewrites a table directory into
  * `ceil(bytes / targetBytes)` files and publishes the rewrite with the
  * same staging → `__prev` → live rename discipline as [[IdMapStore]]
  * (readers see the old or the new file set, never a mix; a crash
  * between the renames leaves `__prev` complete).
  *
  * Scale shape: the rewrite uses `coalesce`, not `repartition` — file
  * merging needs no shuffle, each output task just reads several input
  * files sequentially. The reference's `analyze=True` companion maps to
  * [[Statistics]], invoked separately (CLI `stats`).
  */
object Compact {

  /** @param filesBefore data files before the rewrite
    * @param filesAfter  data files after (ceil(bytes/target), min 1)
    * @param bytes       total data bytes rewritten
    */
  case class Report(filesBefore: Int, filesAfter: Int, bytes: Long)

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(new Path(dir)).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Nil
      else if (s.isFile) Seq(s)
      else dataFiles(fs, s.getPath.toString)
    }

  /** Hive-style partition columns of `dir` (first-level `col=value`
    * entries), empty for a flat table.
    */
  private def partitionCols(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[String] =
    fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath.getName.split("=", 2)(0)).distinct

  /** Compact the parquet directory `dir` in place. A flat table
    * coalesces (no shuffle); a Hive-partitioned table keeps its layout
    * — rows are clustered back onto their partition values (one
    * shuffle) so each partition directory ends up with few full files
    * instead of one shard per historical task.
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Report = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(fs, dir)
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val staging = dir + "__staging"
    fs.delete(new Path(staging), true)
    val df = spark.read.parquet(dir)
    val pcols = partitionCols(fs, dir)
    if (pcols.isEmpty) df.coalesce(nOut).write.parquet(staging)
    else df.repartition(nOut, pcols.map(org.apache.spark.sql.functions.col): _*)
      .write.partitionBy(pcols: _*).parquet(staging)
    IdMapStore.swapIn(fs, staging, dir)
    Report(before.length, dataFiles(fs, dir).length, bytes)
  }
}
