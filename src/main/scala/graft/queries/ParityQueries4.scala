package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.derivations.DoseDerivation
import graft.model.PedsnetModel
import graft.operators._

/** Fourth parity batch — the remaining reference subcommand surface:
  * full observation-period sync (distinct start/end + null-max fill),
  * the dose derivation package with its drug_exposure write-back,
  * union-of-domains cohort construction (recover_cohort), and the
  * registry-driven whole-schema cohort subset (subset_by_cohort's main
  * loop over stock_metadata).
  */
object ParityQueries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  // ------------------------------------------------------------ A1/U2/W2
  /** Full observation-period sync (sync_observation_period.py:8-82):
    * domains with DISTINCT start/end expressions where the end can be
    * NULL — lineitem ends are NULL for returned rows, order ends NULL
    * for open orders — exercising the per-domain null-max→min fill and
    * the final coalesce, then the period-type stamp + renumbering.
    */
  def q42SyncObs(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      col("l_suppkey").as("person_id"),
      col("l_shipdate").cast("date").as("s"),
      when(col("l_returnflag") === "R", lit(null).cast("date"))
        .otherwise(date_add(col("l_shipdate").cast("date"), 30)).as("e"))
    val ord = t(s, dir, "orders").select(
      col("o_custkey").as("person_id"),
      col("o_orderdate").cast("date").as("s"),
      when(col("o_orderstatus") === "O", lit(null).cast("date"))
        .otherwise(date_add(col("o_orderdate").cast("date"), 60)).as("e"))
    ObservationPeriod.syncRanges(Seq(
      (li, col("s"), col("e")),
      (ord, col("s"), col("e"))))
  }

  // ---------------------------------------------------------------- §2.10
  /** Dose derivation package (r_dose.py): exposures pair with the
    * nearest weight measurement of the same person within 30 days
    * (as-of join), derive mg/kg effective dose, and the derivations
    * UPDATE-join back into drug_exposure — matched rows take the three
    * dose columns, unmatched keep their NULLs.
    */
  def q43Dose(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val drugExposure = li.filter(col("l_linenumber") >= 2).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("drug_exposure_id"),
      col("l_suppkey").as("person_id"),
      col("l_shipdate").cast("date").cast("timestamp").as("exposure_ts"),
      (col("l_quantity") * 100.0).as("dose_mg"),
      lit(null).cast("long").as("dose_unit_concept_id"),
      lit(null).cast("double").as("effective_drug_dose"),
      lit(null).cast("string").as("dose_unit_concept_name"))
    val weights = li.filter(col("l_linenumber") === 1).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("measurement_id"),
      col("l_suppkey").as("person_id"),
      col("l_shipdate").cast("date").cast("timestamp").as("weight_ts"),
      (col("l_quantity") + 20.0).as("weight_kg"))
    val pkg = DoseDerivation(toleranceSec = 30L * 86400)
    val derivs = pkg.run(s,
      Map("drug_exposure" -> drugExposure, "weight_measurement" -> weights)(_))
    DoseDerivation.updateDrugExposure(drugExposure, derivs)
      .select(col("drug_exposure_id"), col("person_id"),
        col("dose_unit_concept_id"), col("effective_drug_dose"),
        col("dose_unit_concept_name"))
  }

  // ------------------------------------------------------------- recover
  /** Cohort construction (recover_cohort.py:13-120): three branches —
    * a concept-set select (lineitems of small parts), a plain domain
    * select (purchase events), and a join-constrained select (returned
    * lineitems on recent orders) — unioned and deduped once.
    */
  def q44Cohort(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val conceptSet = broadcast(
      t(s, dir, "part").filter(col("p_size") < 10).select(col("p_partkey")))
    val labBranch = li
      .join(conceptSet, li("l_partkey") === conceptSet("p_partkey"), "left_semi")
      .select(col("l_suppkey").as("person_id"))
    val eventBranch = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("person_id"))
    val recentOrders = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("date"))
      .select(col("o_orderkey"))
    val visitBranch = li.filter(col("l_returnflag") === "R")
      .join(recentOrders, li("l_orderkey") === recentOrders("o_orderkey"), "left_semi")
      .select(col("l_suppkey").as("person_id"))
    Cohort.build(Seq(labBranch, eventBranch, visitBranch))
  }

  // -------------------------------------------------------------- subset
  /** Registry-driven whole-schema subset (subset_by_cohort.py:152-222):
    * the cohort is BUILDING-segment customers; orders subset through
    * their customer FK, lineitem transitively through orders — table
    * list, keys, and join columns all come from the registry, and the
    * report is one lazy plan of unioned one-row counts.
    */
  def q45SubsetModel(s: SparkSession, dir: String): DataFrame = {
    val cohort = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val subs = ModelSubset.subset(
      PedsnetModel.tpch, "customer", cohort, name => t(s, dir, name))
    ModelSubset.countReport(subs)
  }

  // ------------------------------------------------------- index-replace
  /** Concept-group index-replacement table
    * (concept_group_tables.py:10-60): grouped (value, id, count)
    * lookup over a fact table — the reference's
    * `measurement_source_value`-style table, over lineitem's
    * (returnflag, partkey) pairs.
    */
  def q46ConceptGroups(s: SparkSession, dir: String): DataFrame =
    ConceptGroups.build(
      name => t(s, dir, name),
      Seq(ConceptGroups.GroupSpec(
        "lineitem_returnflag", "lineitem", "l_returnflag", "l_partkey")))
      .head._2

  // --------------------------------------------------------------- copy
  /** Derived-measurement copy-back (main.py:2106 `copy_to_measurement`,
    * copy_bmi at :1110): BMI rows derived from paired events append
    * into measurement with fresh surrogate ids seeded past the current
    * max (the reference's sequence), via the scale-safe two-phase
    * numbering. Output = the appended table.
    */
  def q47CopyToMeasurement(s: SparkSession, dir: String): DataFrame =
    copyDerivation(s, dir, "bmi")

  /** copy_weight_z: the same append under the weight-z concept id. */
  def q49CopyWeightZ(s: SparkSession, dir: String): DataFrame =
    copyDerivation(s, dir, "wt-z")

  /** The whole copy_* subcommand family (main.py copy_bmi / copy_bmiz /
    * copy_height_z / copy_weight_z): derived rows appended into
    * measurement under the kind's concept id — bmi 3038553
    * (/root/reference/pedsnetdcc/bmi.py:26), bmiz 2000000043, height-z
    * 2000000042, weight-z 2000000041 (z_score.py:33,66,99) — with
    * fresh surrogate ids seeded past the current max.
    */
  def copyDerivation(s: SparkSession, dir: String, kind: String): DataFrame = {
    val m = t(s, dir, "lineitem").select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("measurement_id"),
      col("l_suppkey").as("person_id"),
      col("l_partkey").as("measurement_concept_id"),
      col("l_quantity").cast("double").as("value_as_number"))
    // one-row action, like the reference's sequence read
    val maxId = m.agg(max(col("measurement_id"))).head().getLong(0)
    val (derived, orderCols) = kind match {
      case "bmi" =>
        (ParityQueries2.q30Bmi(s, dir).select(
          col("user_id").as("person_id"),
          lit(3038553L).as("measurement_concept_id"),
          col("bmi").as("value_as_number"),
          col("event_id")), Seq("event_id"))
      case zk =>
        val cid = Map("bmiz" -> 2000000043L, "ht-z" -> 2000000042L,
          "wt-z" -> 2000000041L)(zk)
        (ParityQueries2.q29Zscore(s, dir).select(
          col("l_orderkey").as("person_id"),
          lit(cid).as("measurement_concept_id"),
          col("z").as("value_as_number"),
          col("l_orderkey"), col("l_linenumber")),
          Seq("l_orderkey", "l_linenumber"))
    }
    val numbered = AssignIds
      .assign(derived, orderCols, "measurement_id", start = maxId + 1)
      .drop(orderCols: _*)
      .select(m.columns.map(col).toSeq: _*)
    m.unionByName(numbered)
  }

  /** copy-to-measurement's `neg_ids` variant
    * (/root/reference/pedsnetdcc/bmi.py:436-437: the id sequence runs
    * `INCREMENT 1 START -2147483647 MAXVALUE 0`, so derived rows get
    * ids disjoint from every source id): the q47 derived BMI rows,
    * numbered ascending from INT_MIN+1 with the same two-phase
    * numbering.
    */
  def q48NegIds(s: SparkSession, dir: String): DataFrame = {
    val derived = ParityQueries2.q30Bmi(s, dir).select(
      col("user_id").as("person_id"),
      lit(3038553L).as("measurement_concept_id"),
      col("bmi").as("value_as_number"),
      col("event_id"))
    AssignIds
      .assign(derived, Seq("event_id"), "measurement_id", start = -2147483647L)
      .drop("event_id")
  }

  /** Per-column equi-width histogram — the pg_stats distribution half
    * of the reference's ANALYZE sweep (`utils.py:343-388`), beside
    * q37's row-count/size half.
    */
  def q50Histogram(s: SparkSession, dir: String): DataFrame =
    Statistics.histogram(t(s, dir, "lineitem"), "l_extendedprice",
      buckets = 10)

  /** Pcornet covid slice (r_pcornet_covid_slice.py): event-marked
    * cohort → registry-FK whole-schema subset → per-table counts.
    */
  def q51CovidSlice(s: SparkSession, dir: String): DataFrame =
    graft.derivations.PcornetCovidSlice.run(s, name => t(s, dir, name))

  /** Pcornet adult slice (r_pcornet_adult_slice.py): age-threshold
    * cohort → the same subset machinery.
    */
  def q52AdultSlice(s: SparkSession, dir: String): DataFrame =
    graft.derivations.PcornetAdultSlice.run(s, name => t(s, dir, name))

  /** Whole-model view layer (create_oracle_views, views.py:9-62):
    * render the full DDL+grant set for the tpch registry model, then
    * register every model table as a live view and read each table's
    * row count back THROUGH its view. The oracle replays plain
    * per-table counts, so a pass proves the registered view layer is a
    * transparent projection over every table the model declares — the
    * whole-model breadth of the reference command, not just the
    * split-slice union view q36 covers.
    */
  def q53OracleViews(s: SparkSession, dir: String): DataFrame = {
    val model = graft.model.PedsnetModel.tpch
    val ddl = graft.operators.ViewDdl.oracleViews(model, "site", "dcc")
    require(ddl.size == 2 * model.tableSeq.size,
      s"expected a create and a grant per table, got ${ddl.size}")
    val views = graft.operators.ViewDdl.registerModelViews(s, dir, model, "ora")
    views.map { v =>
      s.table(v).agg(count(lit(1)).as("n_rows"))
        .select(lit(v.stripPrefix("ora_")).as("table_name"), col("n_rows"))
    }.reduce(_ unionByName _)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_oracle_views" -> q53OracleViews _,
    "q51_covid_slice" -> q51CovidSlice _,
    "q52_adult_slice" -> q52AdultSlice _,
    "q50_histogram" -> q50Histogram _,
    "q42_sync_obs" -> q42SyncObs _,
    "q43_dose" -> q43Dose _,
    "q44_cohort" -> q44Cohort _,
    "q45_subset_model" -> q45SubsetModel _,
    "q46_concept_groups" -> q46ConceptGroups _,
    "q47_copy_to_measurement" -> q47CopyToMeasurement _,
    "q48_neg_ids" -> q48NegIds _,
    "q49_copy_weight_z" -> q49CopyWeightZ _
  )

  def oracle: Map[String, String] = Map(
    "q53_oracle_views" ->
      """SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM customer
        |UNION ALL SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem
        |UNION ALL SELECT 'nation', CAST(COUNT(*) AS BIGINT) FROM nation
        |UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM orders
        |UNION ALL SELECT 'part', CAST(COUNT(*) AS BIGINT) FROM part
        |UNION ALL SELECT 'region', CAST(COUNT(*) AS BIGINT) FROM region
        |UNION ALL SELECT 'supplier', CAST(COUNT(*) AS BIGINT) FROM supplier"""
        .stripMargin,
    "q51_covid_slice" ->
      """WITH cohort AS (
        |  SELECT c_custkey FROM customer c
        |  WHERE EXISTS (SELECT 1 FROM orders o
        |                WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderpriority = '1-URGENT'
        |                  AND o.o_orderdate >= DATE '1995-01-01'
        |                  AND o.o_orderdate < DATE '1995-07-01'))
        |SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM customer WHERE c_custkey IN (SELECT c_custkey FROM cohort)
        |UNION ALL
        |SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM cohort)
        |UNION ALL
        |SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = l.l_orderkey
        |                AND o.o_custkey IN (SELECT c_custkey FROM cohort))"""
        .stripMargin,
    "q52_adult_slice" ->
      """WITH cohort AS (
        |  SELECT c_custkey FROM customer
        |  WHERE DATE '1970-01-01' + CAST(c_custkey * 97 % 15000 AS INTEGER)
        |        <= DATE '1995-06-01' - INTERVAL 252 MONTH)
        |SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM customer WHERE c_custkey IN (SELECT c_custkey FROM cohort)
        |UNION ALL
        |SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM cohort)
        |UNION ALL
        |SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = l.l_orderkey
        |                AND o.o_custkey IN (SELECT c_custkey FROM cohort))"""
        .stripMargin,
    "q50_histogram" ->
      """WITH s AS (
        |  SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS mn,
        |         MAX(CAST(l_extendedprice AS DOUBLE)) AS mx
        |  FROM lineitem)
        |SELECT CAST(CASE WHEN mx = mn THEN 0
        |    ELSE LEAST(9, FLOOR((CAST(l_extendedprice AS DOUBLE) - mn) * 10
        |                        / (mx - mn))) END AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem, s
        |WHERE l_extendedprice IS NOT NULL GROUP BY 1""".stripMargin,
    "q42_sync_obs" ->
      """WITH d AS (
        |  SELECT l_suppkey AS person_id,
        |    MIN(CAST(l_shipdate AS DATE)) AS min_dt,
        |    MAX(CASE WHEN l_returnflag = 'R' THEN NULL
        |             ELSE CAST(l_shipdate AS DATE) + 30 END) AS max_dt
        |  FROM lineitem GROUP BY 1
        |  UNION ALL
        |  SELECT o_custkey,
        |    MIN(CAST(o_orderdate AS DATE)),
        |    MAX(CASE WHEN o_orderstatus = 'O' THEN NULL
        |             ELSE CAST(o_orderdate AS DATE) + 60 END)
        |  FROM orders GROUP BY 1),
        |f AS (
        |  SELECT person_id, min_dt, COALESCE(max_dt, min_dt) AS max_dt FROM d),
        |p AS (
        |  SELECT person_id,
        |    MIN(min_dt) AS observation_period_start_date,
        |    COALESCE(MAX(max_dt), MAX(min_dt)) AS observation_period_end_date
        |  FROM f GROUP BY 1)
        |SELECT person_id, observation_period_start_date,
        |  observation_period_end_date,
        |  CAST(44814724 AS BIGINT) AS period_type_concept_id,
        |  ROW_NUMBER() OVER (ORDER BY person_id) AS observation_period_id
        |FROM p""".stripMargin,
    "q43_dose" ->
      """WITH de AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS drug_exposure_id,
        |    l_suppkey AS person_id,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS ts_us,
        |    l_quantity * 100.0 AS dose_mg
        |  FROM lineitem WHERE l_linenumber >= 2),
        |wt AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS mid,
        |    l_suppkey AS person_id,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS ts_us,
        |    l_quantity + 20.0 AS wt_kg
        |  FROM lineitem WHERE l_linenumber = 1),
        |cand AS (
        |  SELECT de.drug_exposure_id, de.person_id,
        |    de.dose_mg / wt.wt_kg AS eff,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY de.person_id, de.drug_exposure_id
        |      ORDER BY abs(de.ts_us - wt.ts_us) ASC, wt.ts_us ASC, wt.mid ASC)
        |      AS rn
        |  FROM de JOIN wt
        |    ON de.person_id = wt.person_id
        |   AND abs(de.ts_us - wt.ts_us) <= 2592000000000),
        |derivs AS (
        |  SELECT drug_exposure_id, person_id, eff FROM cand WHERE rn = 1)
        |SELECT de.drug_exposure_id, de.person_id,
        |  CASE WHEN d.drug_exposure_id IS NOT NULL
        |       THEN CAST(9562 AS BIGINT) END AS dose_unit_concept_id,
        |  d.eff AS effective_drug_dose,
        |  CASE WHEN d.drug_exposure_id IS NOT NULL
        |       THEN 'milligram per kilogram' END AS dose_unit_concept_name
        |FROM de LEFT JOIN derivs d
        |  ON de.drug_exposure_id = d.drug_exposure_id
        | AND de.person_id = d.person_id""".stripMargin,
    "q44_cohort" ->
      """SELECT l_suppkey AS person_id FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM part
        |              WHERE p_partkey = l_partkey AND p_size < 10)
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |UNION
        |SELECT l_suppkey FROM lineitem
        |WHERE l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l_orderkey
        |                AND o_orderdate >= DATE '1997-01-01')""".stripMargin,
    "q45_subset_model" ->
      """SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey
        |                AND c.c_mktsegment = 'BUILDING')
        |UNION ALL
        |SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o JOIN customer c
        |                ON o.o_custkey = c.c_custkey
        |              WHERE o.o_orderkey = l.l_orderkey
        |                AND c.c_mktsegment = 'BUILDING')""".stripMargin,
    "q46_concept_groups" ->
      """SELECT l_returnflag, l_partkey,
        |  COUNT(l_partkey) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q47_copy_to_measurement" ->
      """WITH m AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS measurement_id,
        |    l_suppkey AS person_id,
        |    l_partkey AS measurement_concept_id,
        |    CAST(l_quantity AS DOUBLE) AS value_as_number
        |  FROM lineitem),
        |e AS (SELECT user_id, event_id, event_type, value,
        |             epoch_us(ts) AS ts_us FROM events),
        |cand AS (
        |  SELECT w.user_id, w.event_id,
        |    (w.value + 50.0) AS wt_kg, (v.value + 150.0) AS ht_cm,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY w.user_id, w.event_id
        |      ORDER BY abs(w.ts_us - v.ts_us) ASC, v.ts_us ASC, v.event_id ASC)
        |      AS rn
        |  FROM e w JOIN e v
        |    ON w.user_id = v.user_id
        |   AND w.event_type = 'click' AND v.event_type = 'view'
        |   AND abs(w.ts_us - v.ts_us) <= 3600000000),
        |bmi AS (
        |  SELECT user_id, event_id,
        |    wt_kg / ((ht_cm / 100.0) * (ht_cm / 100.0)) AS bmi
        |  FROM cand WHERE rn = 1),
        |numbered AS (
        |  SELECT (SELECT MAX(measurement_id) FROM m)
        |      + ROW_NUMBER() OVER (ORDER BY event_id) AS measurement_id,
        |    user_id AS person_id,
        |    CAST(3038553 AS BIGINT) AS measurement_concept_id,
        |    bmi AS value_as_number
        |  FROM bmi)
        |SELECT * FROM m
        |UNION ALL
        |SELECT * FROM numbered""".stripMargin,
    "q48_neg_ids" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |             epoch_us(ts) AS ts_us FROM events),
        |cand AS (
        |  SELECT w.user_id, w.event_id,
        |    (w.value + 50.0) AS wt_kg, (v.value + 150.0) AS ht_cm,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY w.user_id, w.event_id
        |      ORDER BY abs(w.ts_us - v.ts_us) ASC, v.ts_us ASC, v.event_id ASC)
        |      AS rn
        |  FROM e w JOIN e v
        |    ON w.user_id = v.user_id
        |   AND w.event_type = 'click' AND v.event_type = 'view'
        |   AND abs(w.ts_us - v.ts_us) <= 3600000000),
        |bmi AS (
        |  SELECT user_id, event_id,
        |    wt_kg / ((ht_cm / 100.0) * (ht_cm / 100.0)) AS bmi
        |  FROM cand WHERE rn = 1)
        |SELECT user_id AS person_id,
        |  CAST(3038553 AS BIGINT) AS measurement_concept_id,
        |  bmi AS value_as_number,
        |  CAST(-2147483647 + ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS BIGINT)
        |    AS measurement_id
        |FROM bmi""".stripMargin,
    "q49_copy_weight_z" ->
      """WITH m AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS measurement_id,
        |    l_suppkey AS person_id,
        |    l_partkey AS measurement_concept_id,
        |    CAST(l_quantity AS DOUBLE) AS value_as_number
        |  FROM lineitem),
        |lms AS (
        |  SELECT stratum,
        |    0.5 + CAST(stratum % 5 AS DOUBLE) * 0.1 AS L,
        |    50.0 + CAST(stratum AS DOUBLE) AS M,
        |    0.1 + CAST(stratum % 3 AS DOUBLE) * 0.05 AS S
        |  FROM (SELECT DISTINCT CAST(p_size AS BIGINT) AS stratum FROM part)),
        |meas AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) % 50 + 1 AS stratum,
        |    CAST(l_extendedprice AS DOUBLE) / 1000.0 AS x
        |  FROM lineitem),
        |z AS (
        |  SELECT l_orderkey, l_linenumber,
        |    (pow(x / M, L) - 1.0) / (L * S) AS z
        |  FROM meas LEFT JOIN lms USING (stratum)),
        |numbered AS (
        |  SELECT (SELECT MAX(measurement_id) FROM m)
        |      + ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber)
        |      AS measurement_id,
        |    l_orderkey AS person_id,
        |    CAST(2000000041 AS BIGINT) AS measurement_concept_id,
        |    z AS value_as_number
        |  FROM z)
        |SELECT * FROM m
        |UNION ALL
        |SELECT * FROM numbered""".stripMargin
  )
}
