package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.core.Tables
import graft.derivations.{LabLoinc, ObsDerivation, ScdfDrugEra}
import graft.model.PedsnetModel
import graft.operators._

/** Third parity batch — the registry-driven and breadth operators from
  * the round-2 backlog: external id mapping (S5+W2), OR-of-EXISTS
  * cohort subsetting (J7 pcornet variant), the SCDF drug-era
  * derivation package (§2.10), registry-driven constraint validation
  * (stock_metadata parity), the union view over split slices (U4/S7),
  * the ANALYZE statistics pass, per-domain bad-row samples, and the
  * id-map store cycle copy (S6).
  */
object ParityQueries3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  private val dec = "decimal(20,4)"

  private def emptyIdMap(s: SparkSession): DataFrame =
    s.createDataFrame(
      s.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("site_id", LongType),
        StructField("dcc_id", LongType))))

  // ------------------------------------------------------------- S5/W2
  /** External id mapping (external_id_mapper.py:49-155): requested
    * site_ids arrive as CSV; existing map entries are reused, missing
    * ones get fresh dcc ids after the current last id; the full answer
    * goes back out as CSV. The existing map is the orders-custkey map
    * (same derivation as q15).
    */
  def q32ExtId(s: SparkSession, dir: String): DataFrame = {
    val suffix = dir.replaceAll("[^0-9.]", "")
    val inCsv = s"/tmp/graft_extid_in_$suffix"
    val outCsv = s"/tmp/graft_extid_out_$suffix"
    val (existing, lastId) = IdMapping.extendMap(
      t(s, dir, "orders"), "o_custkey", emptyIdMap(s), lastId = 0L)
    t(s, dir, "customer")
      .filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("site_id"))
      .dropDuplicates()
      .write.mode("overwrite").option("header", "true").csv(inCsv)
    ExternalIdMapper.mapCsvFile(s, inCsv, outCsv, existing, lastId)
  }

  // ------------------------------------------------------------------ J7
  /** OR-of-EXISTS cohort subsetting — the fact_relationship special
    * case (subset_by_cohort.py:198-205): an event survives iff its
    * domain branch's EXISTS matches. Domains (event types) are
    * mutually exclusive, exactly like the reference's domain codes.
    */
  def q33OrExists(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("user_id"))
    SetOps.subsetByAnyExists(e, Seq(
      SetOps.ExistsBranch(col("event_type") === "click",
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"),
        "user_id", "c_custkey"),
      SetOps.ExistsBranch(col("event_type") === "purchase",
        t(s, dir, "supplier").filter(col("s_nationkey") < 10),
        "user_id", "s_suppkey"),
      SetOps.ExistsBranch(col("event_type") === "view",
        t(s, dir, "orders").filter(col("o_totalprice") > 300000),
        "user_id", "o_custkey")))
  }

  // ---------------------------------------------------------------- §2.10
  /** SCDF drug-era derivation package over lineitem-shaped exposures:
    * parts with p_size < 25 have an SCDF ancestor (their brand); end
    * dates exercise all three COALESCE branches; exposure counts and
    * era starts split by type (l_linestatus) within shared eras.
    */
  def q34ScdfEra(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    val drugExposure = li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("drug_exposure_id"),
      col("l_suppkey").as("person_id"),
      col("l_partkey").as("drug_concept_id"),
      col("l_shipdate").cast("date").as("drug_exposure_start_date"),
      when(col("l_returnflag") === "R", lit(null).cast("date"))
        .otherwise(date_add(col("l_shipdate").cast("date"), 14))
        .as("drug_exposure_end_date"),
      when(col("l_linestatus") === "O", lit(null).cast("long"))
        .otherwise(col("l_quantity").cast("long")).as("days_supply"),
      col("l_linestatus").as("drug_type_concept_id"))
    val conceptAncestor = part.filter(col("p_size") < 25).select(
      col("p_partkey").as("descendant_concept_id"),
      col("p_brand").as("ancestor_concept_id"))
    val concept = part.select(col("p_brand").as("concept_id")).distinct()
      .withColumn("vocabulary_id", lit("RxNorm"))
      .withColumn("concept_class_id", lit("Clinical Drug Form"))
    val tables = Map(
      "drug_exposure" -> drugExposure,
      "concept_ancestor" -> conceptAncestor,
      "concept" -> concept)
    ScdfDrugEra.run(s, tables(_))
  }

  // ------------------------------------------------------- stock_metadata
  /** Registry-driven constraint validation: PK/FK/NOT-NULL specs come
    * from the schema registry (the reference's stock_metadata pattern),
    * not hand-passed lists — one report row per model table.
    */
  def q35Registry(s: SparkSession, dir: String): DataFrame =
    Checks.modelReport(s, PedsnetModel.tpch,
      name => Some(Tables.read(s, dir, name)))

  // ---------------------------------------------------------------- U4/S7
  /** Union view over split slices (split_measurement.py:325-331): the
    * split slices re-exposed as one UNION ALL view, queried through
    * `spark.sql`. The slices are exhaustive + disjoint, so the view
    * equals the original table — which is what the oracle checks.
    */
  def q36UnionView(s: SparkSession, dir: String): DataFrame = {
    val slices = SetOps.splitByConceptSets(
      t(s, dir, "part").withColumn("p_sizekey", col("p_size").cast("long")),
      "p_sizekey",
      Map(
        "small" -> (1L to 15L).toSet,
        "medium" -> (16L to 30L).toSet,
        "large" -> (31L to 45L).toSet))
    val views = slices.map { case (name, df) =>
      s"graft_part_$name" -> df.drop("p_sizekey")
    }
    ViewDdl.unionView(s, "graft_parts_all", views)
    s.sql(s"""SELECT p_brand, COUNT(*) AS n,
              |  CAST(SUM(CAST(p_retailprice AS $dec)) AS DOUBLE) AS sum_price
              |FROM graft_parts_all GROUP BY p_brand""".stripMargin)
  }

  // ---------------------------------------------------------------- stats
  /** ANALYZE statistics pass (utils.py:343-388): catalog-recorded row
    * counts after COMPUTE STATISTICS must equal the true counts.
    */
  def q37Stats(s: SparkSession, dir: String): DataFrame =
    Statistics.analyze(s, dir, Seq("customer", "orders", "part"),
      columns = Map("orders" -> Seq("o_custkey", "o_totalprice")))

  // ------------------------------------------------------------- sampling
  /** Per-domain bad-row report with deterministic example ids
    * (check_fact_relationship.py:142-248): orphan count + min
    * violating event per domain branch.
    */
  def q38BadRows(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("user_id"))
    Checks.badRowReport(e, Seq(
      Checks.DomainRef("click_customer", col("event_type") === "click",
        "user_id", t(s, dir, "customer"), "c_custkey"),
      Checks.DomainRef("purchase_supplier", col("event_type") === "purchase",
        "user_id", t(s, dir, "supplier"), "s_suppkey"),
      Checks.DomainRef("view_orders", col("event_type") === "view",
        "user_id", t(s, dir, "orders"), "o_custkey")),
      idCol = "event_id")
  }

  // ------------------------------------------------------------------ S6
  /** Id-map store lifecycle: build a map, save it durably, copy it into
    * the next cycle's store (the pg_dump/pg_restore parity), load it
    * back — the loaded rows plus the persisted last id must equal the
    * map derivation the oracle computes directly.
    */
  def q39IdMapCycle(s: SparkSession, dir: String): DataFrame = {
    val suffix = dir.replaceAll("[^0-9.]", "")
    val cycleA = s"/tmp/graft_idmap_cycle_a_$suffix"
    val cycleB = s"/tmp/graft_idmap_cycle_b_$suffix"
    val (m, lastId) = IdMapping.extendMap(
      t(s, dir, "orders"), "o_custkey", emptyIdMap(s), lastId = 0L)
    IdMapStore.save(m, lastId, cycleA, "orders")
    IdMapStore.copyCycle(s, cycleA, cycleB, "orders")
    val (loaded, loadedLast) = IdMapStore.load(s, cycleB, "orders")
    loaded.select(col("site_id"), col("dcc_id"))
      .withColumn("last_id", lit(loadedLast))
  }

  // ---------------------------------------------------------------- §2.10
  /** Second derivation package — LOINC lab remap (lab_loinc.py:81-172):
    * measurement concepts crosswalk-mapped to LOINC, originals kept
    * when unmatched and preserved as source_concept_id. Parts divisible
    * by 3 have a crosswalk entry (their id + 1,000,000).
    */
  def q40LabLoinc(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val measurement = li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("measurement_id"),
      col("l_suppkey").as("person_id"),
      col("l_partkey").as("measurement_concept_id"),
      col("l_quantity").cast("double").as("value_as_number"))
    val crosswalk = t(s, dir, "part")
      .filter(col("p_partkey") % 3 === 0)
      .select(col("p_partkey").as("source_concept_id"),
        (col("p_partkey") + 1000000L).as("loinc_concept_id"))
    val tables = Map("measurement" -> measurement, "loinc_crosswalk" -> crosswalk)
    LabLoinc.run(s, tables(_))
  }

  // ---------------------------------------------------------------- §2.10
  /** Third derivation package — concept-set observation derivation
    * (r_obs_covid.py / r_obs_recover.py shape): measurements whose
    * concept is in the study set become observations routed to a
    * derived concept; names fill from a deliberately partial
    * vocabulary (even partkeys only) so the left-join semantics of
    * `_fill_concept_names` is exercised; observation ids assign
    * globally in measurement order.
    */
  def q41ObsDerivation(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    val measurement = li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("measurement_id"),
      col("l_suppkey").as("person_id"),
      col("l_partkey").as("measurement_concept_id"),
      col("l_quantity").cast("double").as("value_as_number"))
    val conceptSet = part.filter(col("p_size") < 20).select(
      col("p_partkey").as("source_concept_id"),
      (col("p_partkey") + 2000000L).as("observation_concept_id"))
    val concept = part.filter(col("p_partkey") % 2 === 0).select(
      (col("p_partkey") + 2000000L).as("concept_id"),
      col("p_name").as("concept_name"))
    val tables = Map(
      "measurement" -> measurement,
      "concept_set" -> conceptSet,
      "concept" -> concept)
    ObsDerivation.run(s, tables(_))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_ext_id" -> q32ExtId _,
    "q33_or_exists" -> q33OrExists _,
    "q34_scdf_era" -> q34ScdfEra _,
    "q35_registry_checks" -> q35Registry _,
    "q36_union_view" -> q36UnionView _,
    "q37_stats" -> q37Stats _,
    "q38_bad_rows" -> q38BadRows _,
    "q39_idmap_cycle" -> q39IdMapCycle _,
    "q40_lab_loinc" -> q40LabLoinc _,
    "q41_obs_derivation" -> q41ObsDerivation _
  )

  /** DuckDB oracle for q35, rendered FROM the registry — the same
    * metadata drives both engines, so a registry/engine mismatch
    * fails the hash compare.
    */
  private def oModelReport: String =
    PedsnetModel.tpch.tableSeq.map { td =>
      val pk =
        if (td.pk.nonEmpty) {
          val cols = td.pk.mkString(", ")
          s"""(SELECT COUNT(*) FROM (
             |   SELECT $cols FROM ${td.name}
             |   GROUP BY $cols HAVING COUNT(*) > 1))""".stripMargin
        } else "0"
      val fk =
        if (td.fks.nonEmpty) td.fks.map { f =>
          val cond = f.cols.zip(f.refCols)
            .map { case (c, p) => s"p.$p = c.$c" }.mkString(" AND ")
          val notnull = f.cols.map(c => s"c.$c IS NOT NULL").mkString(" AND ")
          s"""(SELECT COUNT(*) FROM ${td.name} c WHERE $notnull
             | AND NOT EXISTS (SELECT 1 FROM ${f.refTable} p WHERE $cond))""".stripMargin
        }.mkString(" + ")
        else "0"
      val nn =
        if (td.notNull.nonEmpty) {
          val conds = td.notNull.map(c => s"$c IS NULL").mkString(" OR ")
          s"(SELECT COUNT(*) FROM ${td.name} WHERE $conds)"
        } else "0"
      s"""SELECT '${td.name}' AS table_name, CAST($pk AS BIGINT) AS pk_dups,
         |  CAST($fk AS BIGINT) AS fk_orphans,
         |  CAST($nn AS BIGINT) AS null_violations""".stripMargin
    }.mkString("\nUNION ALL\n")

  def oracle: Map[String, String] = Map(
    "q32_ext_id" ->
      """WITH existing AS (
        |  SELECT o_custkey AS site_id,
        |    ROW_NUMBER() OVER (ORDER BY o_custkey) AS dcc_id
        |  FROM (SELECT DISTINCT o_custkey FROM orders)),
        |req AS (
        |  SELECT DISTINCT c_custkey AS site_id FROM customer
        |  WHERE c_acctbal > 5000),
        |fresh AS (
        |  SELECT site_id FROM req r
        |  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.site_id = r.site_id)),
        |newmap AS (
        |  SELECT site_id,
        |    ROW_NUMBER() OVER (ORDER BY site_id)
        |      + (SELECT COUNT(*) FROM existing) AS dcc_id
        |  FROM fresh),
        |allmap AS (SELECT * FROM existing UNION ALL SELECT * FROM newmap)
        |SELECT r.site_id, m.dcc_id
        |FROM req r JOIN allmap m ON r.site_id = m.site_id""".stripMargin,
    "q33_or_exists" ->
      """SELECT event_id, event_type, user_id FROM events e
        |WHERE (event_type = 'click' AND EXISTS (
        |         SELECT 1 FROM customer
        |         WHERE c_custkey = e.user_id AND c_mktsegment = 'BUILDING'))
        |   OR (event_type = 'purchase' AND EXISTS (
        |         SELECT 1 FROM supplier
        |         WHERE s_suppkey = e.user_id AND s_nationkey < 10))
        |   OR (event_type = 'view' AND EXISTS (
        |         SELECT 1 FROM orders
        |         WHERE o_custkey = e.user_id AND o_totalprice > 300000))""".stripMargin,
    "q34_scdf_era" ->
      """WITH tgt AS (
        |  SELECT l_suppkey AS person_id, p_brand AS scdf,
        |    l_linestatus AS dtype,
        |    CAST(l_shipdate AS DATE) AS s,
        |    COALESCE(
        |      CASE WHEN l_returnflag = 'R' THEN NULL
        |           ELSE CAST(l_shipdate AS DATE) + 14 END,
        |      CAST(l_shipdate AS DATE) + CAST(
        |        CASE WHEN l_linestatus = 'O' THEN NULL
        |             ELSE CAST(l_quantity AS INT) END AS INTEGER),
        |      CAST(l_shipdate AS DATE) + 1) AS e,
        |    l_orderkey * 10 + l_linenumber AS deid
        |  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_size < 25),
        |flagged AS (
        |  SELECT *,
        |    MAX(e) OVER (PARTITION BY person_id, scdf
        |      ORDER BY s, e, deid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM tgt),
        |islands AS (
        |  SELECT *,
        |    SUM(CASE WHEN pme IS NULL OR s > pme + INTERVAL 30 DAY
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY person_id, scdf ORDER BY s, e, deid
        |            ROWS UNBOUNDED PRECEDING) AS era_id
        |  FROM flagged),
        |per_type AS (
        |  SELECT person_id, scdf, dtype, era_id,
        |    MIN(s) AS drug_era_start_date, MAX(e) AS type_max_end,
        |    COUNT(*) AS drug_exposure_count
        |  FROM islands GROUP BY 1, 2, 3, 4),
        |eras AS (
        |  SELECT *, MAX(type_max_end)
        |    OVER (PARTITION BY person_id, scdf, era_id) AS drug_era_end_date
        |  FROM per_type)
        |SELECT person_id, scdf AS drug_concept_id,
        |  dtype AS drug_type_concept_id, CAST(era_id AS BIGINT) AS era_id,
        |  drug_era_start_date, drug_era_end_date, drug_exposure_count,
        |  CAST(30 AS BIGINT) AS gap_days
        |FROM eras""".stripMargin,
    "q35_registry_checks" -> oModelReport,
    "q36_union_view" ->
      """SELECT p_brand, COUNT(*) AS n,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
        |FROM part GROUP BY p_brand""".stripMargin,
    "q37_stats" ->
      """SELECT 'customer' AS table_name, COUNT(*) AS row_count FROM customer
        |UNION ALL
        |SELECT 'orders' AS table_name, COUNT(*) AS row_count FROM orders
        |UNION ALL
        |SELECT 'part' AS table_name, COUNT(*) AS row_count FROM part""".stripMargin,
    "q38_bad_rows" ->
      """SELECT 'click_customer' AS domain,
        |  (SELECT COUNT(*) FROM events e WHERE event_type = 'click'
        |     AND user_id IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = e.user_id))
        |    AS n_bad,
        |  (SELECT MIN(event_id) FROM events e WHERE event_type = 'click'
        |     AND user_id IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = e.user_id))
        |    AS example_id
        |UNION ALL
        |SELECT 'purchase_supplier' AS domain,
        |  (SELECT COUNT(*) FROM events e WHERE event_type = 'purchase'
        |     AND user_id IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = e.user_id))
        |    AS n_bad,
        |  (SELECT MIN(event_id) FROM events e WHERE event_type = 'purchase'
        |     AND user_id IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = e.user_id))
        |    AS example_id
        |UNION ALL
        |SELECT 'view_orders' AS domain,
        |  (SELECT COUNT(*) FROM events e WHERE event_type = 'view'
        |     AND user_id IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = e.user_id))
        |    AS n_bad,
        |  (SELECT MIN(event_id) FROM events e WHERE event_type = 'view'
        |     AND user_id IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = e.user_id))
        |    AS example_id""".stripMargin,
    "q39_idmap_cycle" ->
      """WITH idmap AS (
        |  SELECT o_custkey AS site_id,
        |    ROW_NUMBER() OVER (ORDER BY o_custkey) AS dcc_id
        |  FROM (SELECT DISTINCT o_custkey FROM orders))
        |SELECT site_id, dcc_id,
        |  (SELECT COUNT(*) FROM idmap) AS last_id
        |FROM idmap""".stripMargin,
    "q40_lab_loinc" ->
      """WITH xwalk AS (
        |  SELECT p_partkey AS source_concept_id,
        |    p_partkey + 1000000 AS loinc_concept_id
        |  FROM part WHERE p_partkey % 3 = 0)
        |SELECT l_orderkey * 10 + l_linenumber AS measurement_id,
        |  l_suppkey AS person_id,
        |  COALESCE(x.loinc_concept_id, l_partkey) AS measurement_concept_id,
        |  CAST(l_quantity AS DOUBLE) AS value_as_number,
        |  l_partkey AS source_concept_id
        |FROM lineitem
        |LEFT JOIN xwalk x ON l_partkey = x.source_concept_id""".stripMargin,
    "q41_obs_derivation" ->
      """WITH cs AS (
        |  SELECT p_partkey AS source_concept_id,
        |    p_partkey + 2000000 AS observation_concept_id
        |  FROM part WHERE p_size < 20),
        |names AS (
        |  SELECT p_partkey + 2000000 AS concept_id, p_name AS concept_name
        |  FROM part WHERE p_partkey % 2 = 0),
        |derived AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS measurement_id,
        |    l_suppkey AS person_id,
        |    cs.observation_concept_id,
        |    n.concept_name AS observation_concept_name,
        |    CAST(l_quantity AS DOUBLE) AS value_as_number
        |  FROM lineitem
        |  JOIN cs ON l_partkey = cs.source_concept_id
        |  LEFT JOIN names n ON cs.observation_concept_id = n.concept_id)
        |SELECT *,
        |  ROW_NUMBER() OVER (ORDER BY measurement_id,
        |    observation_concept_id, person_id, value_as_number)
        |    AS observation_id
        |FROM derived""".stripMargin
  )
}
