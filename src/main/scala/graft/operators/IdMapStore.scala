package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Durable id-map lifecycle: the reference's `<t>_ids` map tables and
  * one-row `last_id` counters persist across data cycles and are copied
  * between cycle databases with pg_dump/pg_restore
  * (/root/reference/pedsnetdcc/id_maps.py:20-167, 258-293).
  *
  * Spark-native twin: parquet control tables under a store directory,
  * updated with an ATOMIC SWAP (write staging → rename) — the same
  * write-new-then-repoint discipline the reference implements as a
  * transactional backup-schema swap
  * (/root/reference/pedsnetdcc/transform_runner.py:899-927). Single
  * writer assumed, exactly like the reference's `LOCK TABLE` protocol.
  */
object IdMapStore {

  private val mapSchema = StructType(Seq(
    StructField("site_id", LongType),
    StructField("dcc_id", LongType)))

  private def mapPath(dir: String, table: String) = s"$dir/${table}_ids"
  private def lastIdPath(dir: String, table: String) = s"$dir/${table}_last_id"

  /** Load (map, lastId) for a table; empty map + 0 when absent. */
  def load(spark: SparkSession, dir: String, table: String): (DataFrame, Long) = {
    val mp = mapPath(dir, table)
    if (Files.exists(Paths.get(mp))) {
      val m = spark.read.parquet(mp)
      val last = spark.read.parquet(lastIdPath(dir, table))
        .select(col("last_id")).head().getLong(0)
      (m, last)
    } else {
      (spark.createDataFrame(spark.sparkContext.emptyRDD[Row], mapSchema), 0L)
    }
  }

  /** Persist (map, lastId) with an atomic directory swap: the new
    * version lands in `<path>__staging`, then replaces the live path in
    * one rename pair. Readers of the old version keep their snapshot
    * (parquet files are immutable); a crash leaves either old or new,
    * never a mix.
    */
  def save(map: DataFrame, lastId: Long, dir: String, table: String): Unit = {
    val spark = map.sparkSession
    atomicWrite(map, mapPath(dir, table))
    import spark.implicits._
    atomicWrite(Seq(lastId).toDF("last_id"), lastIdPath(dir, table))
  }

  /** Copy a table's map + counter into the next data cycle's store
    * (the pg_dump/pg_restore parity, S6).
    */
  def copyCycle(spark: SparkSession, fromDir: String, toDir: String,
      table: String): Unit = {
    val (m, last) = load(spark, fromDir, table)
    save(m, last, toDir, table)
  }

  /** Write df to `<path>__staging` then swap into `path`. The write
    * fully materializes before any move, so overwriting a path that
    * also feeds `df`'s lineage is safe.
    */
  def atomicWrite(df: DataFrame, path: String): Unit = {
    val staging = Paths.get(path + "__staging")
    val live = Paths.get(path)
    val backup = Paths.get(path + "__prev")
    df.write.mode("overwrite").parquet(staging.toString)
    deleteRecursively(backup)
    if (Files.exists(live)) Files.move(live, backup)
    Files.move(staging, live)
    deleteRecursively(backup)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
