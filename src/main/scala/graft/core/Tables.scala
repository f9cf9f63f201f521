package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access layer.
  *
  * Parity: replaces the reference's schema-qualified PG table reads
  * (/root/reference/pedsnetdcc/db.py:146-149) with parquet directories —
  * one directory per "schema" (site namespace), one file/dir per table.
  */
object Tables {

  /** Read a named table from a schema namespace. A namespace is
    * normally a parquet directory (`<dir>/<name>.parquet`); when it
    * is a JDBC connection URL (`jdbc:...`) the same name resolves
    * through `spark.read.jdbc` instead — the S1 source's database leg
    * (the reference reads schema-qualified Postgres tables,
    * `pedsnetdcc/db.py:146-149`; here the "schema" IS the URL, so
    * every operator works unchanged over either backing store).
    *
    * Scale note: a plain JDBC read is a single stream. That is the
    * right shape for dimension/vocabulary tables (they broadcast
    * anyway); partition a large fact-table pull with
    * [[readJdbcPartitioned]] so the scan parallelizes across
    * executors and each task carries its own WHERE range.
    */
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    if (dir.startsWith("jdbc:"))
      spark.read.format("jdbc")
        .option("url", dir)
        .option("dbtable", name)
        .load()
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Write a named table into a schema namespace — the S2 sink's twin
    * of [[read]] (the round-14 review's missing JDBC write-back leg):
    * a parquet namespace lands as `<dir>/<name>.parquet`; a `jdbc:`
    * namespace materializes INTO the database through `df.write.jdbc`
    * — the reference CTAS-es transform results into PostgreSQL
    * (`pedsnetdcc/transform_runner.py:88-95`), and `overwrite` mode
    * here follows the same drop-and-recreate discipline its CTAS
    * runs under.
    *
    * Scale note: a JDBC write opens one connection PER PARTITION and
    * streams batched inserts — the right shape for dimension-sized
    * results; a 100 TB fact write belongs in parquet (the database is
    * the reference's serving layer, not its bulk store), so callers
    * route big outputs to a parquet namespace and hand the database a
    * view or the id-map-sized slice.
    */
  def write(df: DataFrame, dir: String, name: String,
      mode: String = "overwrite"): Unit =
    if (dir.startsWith("jdbc:"))
      df.write.mode(mode).format("jdbc")
        .option("url", dir)
        .option("dbtable", name)
        .save()
    else df.write.mode(mode).parquet(s"$dir/$name.parquet")

  /** JDBC fact-table read with range partitioning: `numPartitions`
    * parallel scans, each pushing `partCol BETWEEN lo AND hi` to the
    * database — Spark's stride splitting over [lower, upper]. Bounds
    * come from the caller (a registry, or a cheap MIN/MAX probe) so
    * the read itself stays one round-trip per task.
    */
  def readJdbcPartitioned(spark: SparkSession, url: String,
      name: String, partCol: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", name)
      .option("partitionColumn", partCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (with
    * spark.sql.legacy.parquet.nanosAsLong the column arrives as Long
    * nanoseconds) and plain TIMESTAMP(MICROS) (arrives as a timestamp
    * type), so dispatch on the ARRIVED type rather than assuming one
    * generation of the testdata. Either way the frame exposes both raw
    * nanos (`ts_ns`, a total order) and a microsecond-precision `ts`
    * TimestampType for date arithmetic.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(read(spark, dir, "events"))

  /** The type dispatch above, as pure column ops — also valid on a
    * STREAMING events frame (no actions, schema-only inspection).
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
      case TimestampType | TimestampNTZType => // micros; session tz is UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case other =>
        // fail fast on schema drift: a silent cast from e.g. STRING or
        // DOUBLE would fabricate nulls / wrong ts_ns downstream
        throw new IllegalArgumentException(
          s"events.ts arrived as $other; expected LONG (nanos), " +
            "TIMESTAMP or TIMESTAMP_NTZ (micros)")
    }
  }
}
