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

  /** `events` carries parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong the column arrives as Long
    * nanoseconds. Expose both the raw nanos (`ts_ns`, total order even
    * within the same microsecond) and a microsecond-precision `ts`
    * TimestampType for date arithmetic.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    raw
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }
}
