package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External id mapping — the reference's CSV-driven surface for
  * handing out dcc ids to site-submitted external id lists
  * (/root/reference/pedsnetdcc/external_id_mapper.py:49-155): read the
  * requested site_ids from CSV, look each up in the table's id map,
  * reserve a block after the last id for the unmapped ones, insert the
  * new mappings, and write the full (site_id, dcc_id) answer back to
  * CSV.
  *
  * The reference loops row-by-row over a psycopg2 cursor
  * (external_id_mapper.py:127-133) — fine for its interactive scale,
  * but re-expressed here as the set-based [[IdMapping.extendMap]] so
  * the same operator handles a million-row request: one anti-join +
  * range-partitioned numbering, no driver-side loop.
  */
object ExternalIdMapper {

  /** Full mapping for every requested site_id: existing pairs kept,
    * missing ones numbered lastId+1… in site_id order (the reference's
    * sequential `dcc_id++` assignment, made deterministic by ordering).
    * Returns (site_id, dcc_id) with exactly one row per distinct
    * requested id.
    */
  def assign(requested: DataFrame, idMap: DataFrame, lastId: Long): DataFrame = {
    val req = requested.select(col("site_id")).dropDuplicates()
    val (newMap, _) = IdMapping.extendMap(req, "site_id", idMap, lastId)
    req.join(newMap, Seq("site_id"))
  }

  /** CSV-in → CSV-out wrapper matching the reference's file protocol
    * (header `site_id` in, header `site_id,dcc_id` out).
    */
  def mapCsvFile(
      spark: SparkSession,
      inCsv: String,
      outCsv: String,
      idMap: DataFrame,
      lastId: Long): DataFrame = {
    val requested = spark.read
      .schema("site_id LONG")
      .option("header", "true").csv(inCsv)
    val mapped = assign(requested, idMap, lastId)
    mapped.write.mode("overwrite").option("header", "true").csv(outCsv)
    mapped
  }
}
