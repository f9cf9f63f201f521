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
  * Spark shape: PK map tables are fact-sized (one row per mapped key),
  * so map joins shuffle by default and broadcast only when the caller
  * knows the map is small; the reservation protocol becomes a
  * single-writer read-modify-write on a parquet control table (the
  * reference's LOCK implies the same single-writer assumption).
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
    *
    * The anti-join output is eagerly localCheckpointed so the lineage
    * runs once, shared by the `count` here and every later consumer of
    * the returned map (without it, each consumer re-runs the anti-join
    * + numbering) — block-backed like the dedup detectors
    * ([[graft.core.Caching]]), so no CacheManager entry outlives the
    * call and long-lived sessions need no clearCache() between tables.
    * The new-keys frame is orders of magnitude smaller than the facts.
    */
  def extendMap(
      facts: DataFrame,
      naturalKey: String,
      idMap: DataFrame,
      lastId: Long): (DataFrame, Long) = {
    val fresh = unmappedKeys(facts, naturalKey, idMap)
      .withColumnRenamed(naturalKey, "site_id")
      .localCheckpoint(true)
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
    *
    * PK map tables carry one row per fact row, so the map side is
    * fact-sized — at 100-TB scale an unconditional broadcast is a
    * guaranteed driver/executor OOM. The join therefore defaults to
    * Catalyst/AQE's choice (sort-merge or shuffled-hash for a big map);
    * callers mapping a genuinely small dimension pass
    * `broadcastMap = true` (the same caller-gated pattern as
    * [[Checks.fkOrphans]]).
    */
  def replaceId(
      df: DataFrame,
      key: String,
      idMap: DataFrame,
      nullable: Boolean,
      keepSiteId: Boolean = false,
      broadcastMap: Boolean = false): DataFrame = {
    val m0 = idMap.select(col("site_id"), col("dcc_id"))
    val m = if (broadcastMap) broadcast(m0) else m0
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
    * @param broadcastMaps force-broadcast each per-domain map; leave false
    *   when the maps are fact-sized (same gate as [[replaceId]])
    */
  def replacePolymorphicId(
      df: DataFrame,
      domainCol: String,
      factIdCol: String,
      maps: Map[Int, DataFrame],
      broadcastMaps: Boolean = false): DataFrame = {
    val joined = maps.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (code, m)) =>
      val mm0 =
        m.select(
          col("site_id").alias(s"__site_id_$code"),
          col("dcc_id").alias(s"__dcc_id_$code"))
      val mm = if (broadcastMaps) broadcast(mm0) else mm0
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
