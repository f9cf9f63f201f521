package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Durable id-map lifecycle: the reference's `<t>_ids` map tables and
  * one-row `last_id` counters persist across data cycles and are copied
  * between cycle databases with pg_dump/pg_restore
  * (/root/reference/pedsnetdcc/id_maps.py:20-167, 258-293).
  *
  * Spark-native twin: parquet control tables under a store directory,
  * updated with an atomic directory swap (write staging → rename) — the
  * same write-new-then-repoint discipline the reference implements as a
  * transactional backup-schema swap
  * (/root/reference/pedsnetdcc/transform_runner.py:899-927). Single
  * writer assumed, exactly like the reference's `LOCK TABLE` protocol.
  *
  * Crash safety: the previous live version is renamed to `<path>__prev`
  * BEFORE the new version moves in, and is retained until the NEXT
  * write — so a crash between the two renames leaves `__prev` complete
  * and [[load]] falls back to it (the old, consistent state; never an
  * empty store that would silently restart dcc ids from 1). The map and
  * its last-id counter live inside ONE swapped directory, so they can
  * never be observed from different versions. All paths go through the
  * Hadoop FileSystem API, so the store works on HDFS/S3A/local alike
  * (rename is atomic on HDFS; on object stores the window is the
  * rename's copy, still recoverable via `__prev`).
  */
object IdMapStore {

  private val mapSchema = StructType(Seq(
    StructField("site_id", LongType),
    StructField("dcc_id", LongType)))

  private def tablePath(dir: String, table: String) = s"$dir/${table}_ids"

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The readable version of `path`: the live directory, or `__prev`
    * when a crash stranded the swap between its two renames.
    */
  private def resolve(fs: FileSystem, path: String): Option[String] =
    if (fs.exists(new Path(path))) Some(path)
    else if (fs.exists(new Path(path + "__prev"))) Some(path + "__prev")
    else None

  /** Load (map, lastId) for a table; empty map + 0 when absent. */
  def load(spark: SparkSession, dir: String, table: String): (DataFrame, Long) = {
    val tp = tablePath(dir, table)
    resolve(fsFor(spark, tp), tp) match {
      case Some(p) =>
        val m = spark.read.parquet(s"$p/map")
        val last = spark.read.parquet(s"$p/last_id")
          .select(col("last_id")).head().getLong(0)
        (m, last)
      case None =>
        (spark.createDataFrame(spark.sparkContext.emptyRDD[Row], mapSchema), 0L)
    }
  }

  /** Persist (map, lastId) atomically: both land in one staging
    * directory, which then replaces the live directory in a single
    * rename — a reader never sees a new map with an old counter.
    */
  def save(map: DataFrame, lastId: Long, dir: String, table: String): Unit = {
    val spark = map.sparkSession
    val tp = tablePath(dir, table)
    val staging = tp + "__staging"
    // the write fully materializes before any move, so saving a map
    // whose lineage reads the live path is safe
    map.write.mode("overwrite").parquet(s"$staging/map")
    import spark.implicits._
    Seq(lastId).toDF("last_id").write.mode("overwrite")
      .parquet(s"$staging/last_id")
    swapIn(fsFor(spark, tp), staging, tp)
  }

  /** Copy a table's map + counter into the next data cycle's store
    * (the pg_dump/pg_restore parity, S6).
    */
  def copyCycle(spark: SparkSession, fromDir: String, toDir: String,
      table: String): Unit = {
    val (m, last) = load(spark, fromDir, table)
    save(m, last, toDir, table)
  }

  /** Recompute a table's counter from its map — MAX(dcc_id), 0 when
    * empty — and persist it (the reference's `populate_last_id`
    * command, id_maps.py `populate_last_id`: SELECT MAX into the
    * counter table after a bulk map load). Returns the new last id.
    */
  def populateLastId(spark: SparkSession, dir: String, table: String): Long = {
    val (m, _) = load(spark, dir, table)
    val last = m.agg(coalesce(max(col("dcc_id")), lit(0L))).head().getLong(0)
    save(m, last, dir, table)
    last
  }

  /** Drop the retained `__prev` backup (and any stranded `__staging`)
    * once the current live version is verified — the reference's
    * `cleanup` command, which removes backup schemas after a swap.
    * Returns the paths it removed.
    */
  def cleanup(spark: SparkSession, dir: String, table: String): Seq[String] = {
    val tp = tablePath(dir, table)
    val fs = fsFor(spark, tp)
    // never remove __prev while the live dir is missing — after a
    // stranded swap it is the only consistent copy
    val candidates =
      if (fs.exists(new Path(tp))) Seq(tp + "__prev", tp + "__staging")
      else Seq(tp + "__staging")
    candidates.filter { p =>
      val path = new Path(p)
      fs.exists(path) && fs.delete(path, true)
    }
  }

  /** Write df to `<path>__staging` then swap into `path`. The write
    * fully materializes before any move, so overwriting a path that
    * also feeds `df`'s lineage is safe.
    */
  def atomicWrite(df: DataFrame, path: String): Unit = {
    val staging = path + "__staging"
    df.write.mode("overwrite").parquet(staging)
    swapIn(fsFor(df.sparkSession, path), staging, path)
  }

  /** staging → live, retiring live → `__prev`. The old `__prev` is
    * deleted only now (a complete replacement exists in staging), and
    * the NEW `__prev` is retained after the swap so [[resolve]] can
    * fall back if a crash lands between the two renames.
    */
  private[operators] def swapIn(fs: FileSystem, staging: String, live: String): Unit = {
    val stagingP = new Path(staging)
    val liveP = new Path(live)
    val prevP = new Path(live + "__prev")
    fs.delete(prevP, true)
    if (fs.exists(liveP) && !fs.rename(liveP, prevP))
      sys.error(s"IdMapStore: failed to retire $live")
    if (!fs.rename(stagingP, liveP))
      sys.error(s"IdMapStore: failed to publish $staging -> $live")
  }
}
