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

  /** Read a named table from a schema directory (`<dir>/<name>.parquet`). */
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
