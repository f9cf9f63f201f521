package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Site-id → dcc-id surrogate key mapping.
  *
  * Parity target: /root/reference/pedsnetdcc/id_mapping_transform.py —
  * per fact table the reference keeps a map table `<t>_ids(site_id,
  * dcc_id)` plus a one-row last-id counter; the transform (1) anti-joins
  * the fact table against the map to find unmapped keys, (2) reserves a
  * contiguous id block by bumping the counter, (3) inserts
  * `row_number() + old_last_id` rows, then (4) rewrites the table joining
  * the map on the PK (inner) and on each FK (outer iff nullable),
  * appending the original PK as `site_id`
  * (id_mapping_transform.py:14-31, 213-294).
  *
  * Spark shape: map tables are per-site and small relative to facts →
  * broadcast joins; the reservation protocol becomes a single-writer
  * read-modify-write on a parquet control table (the reference's LOCK
  * implies the same single-writer assumption).
  */
object IdMapping {

  /** Unmapped natural keys: facts whose `naturalKey` is absent from the
    * map's `site_id` (J5 anti-join).
    */
  def unmappedKeys(facts: DataFrame, naturalKey: String, idMap: DataFrame): DataFrame =
    facts
      .select(col(naturalKey))
      .dropDuplicates()
      .join(idMap, facts(naturalKey) === idMap("site_id"), "left_anti")

  /** Extend the map with new keys, numbering them lastId+1… in naturalKey
    * order (deterministic block allocation — the reference's
    * `row_number() + old_last_id`). Returns (newMap, newLastId).
    */
  def extendMap(
      facts: DataFrame,
      naturalKey: String,
      idMap: DataFrame,
      lastId: Long): (DataFrame, Long) = {
    val fresh = unmappedKeys(facts, naturalKey, idMap)
      .withColumnRenamed(naturalKey, "site_id")
    val numbered = AssignIds
      .assign(fresh, Seq("site_id"), "dcc_id", lastId + 1)
    val newMap = idMap.unionByName(numbered)
    val added = fresh.count()
    (newMap, lastId + added)
  }

  /** Rewrite `df` replacing column `key` with the mapped dcc id (J3).
    * Inner join for PKs; left outer for nullable FKs — an unmatched
    * nullable FK yields NULL, matching the reference's outer-join-iff-
    * nullable rule (id_mapping_transform.py:270-279). When `keepSiteId`
    * the original value is appended as `site_id` (PK case).
    */
  def replaceId(
      df: DataFrame,
      key: String,
      idMap: DataFrame,
      nullable: Boolean,
      keepSiteId: Boolean = false): DataFrame = {
    val m = broadcast(idMap.select(col("site_id"), col("dcc_id")))
    val joined = df.join(m, df(key) === m("site_id"), if (nullable) "left" else "inner")
    val replaced = df.columns.toSeq.map {
      case c if c == key => m("dcc_id").alias(key)
      case c             => df(c)
    }
    val outCols = if (keepSiteId) replaced :+ df(key).alias("site_id") else replaced
    joined.select(outCols: _*)
  }

  /** Polymorphic fact_relationship mapping (J4): `factId` points into a
    * different entity depending on `domainCol`'s code. Per-domain left
    * joins + a coalesce chain — NULL when the domain has no mapped
    * counterpart, matching the reference's CASE semantics
    * (id_mapping_transform.py:296-363).
    *
    * @param maps (domainCode -> idMap) — map tables with (site_id, dcc_id)
    */
  def replacePolymorphicId(
      df: DataFrame,
      domainCol: String,
      factIdCol: String,
      maps: Map[Int, DataFrame]): DataFrame = {
    val joined = maps.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (code, m)) =>
      val mm = broadcast(
        m.select(
          col("site_id").alias(s"__site_id_$code"),
          col("dcc_id").alias(s"__dcc_id_$code")))
      acc.join(
        mm,
        acc(factIdCol) === mm(s"__site_id_$code") && acc(domainCol) === lit(code),
        "left")
    }
    val mapped = coalesce(maps.keys.toSeq.sorted.map(c => col(s"__dcc_id_$c")): _*)
    val keep = df.columns.toSeq.map {
      case c if c == factIdCol => mapped.alias(factIdCol)
      case c                   => col(c)
    }
    joined.select(keep: _*)
  }
}
