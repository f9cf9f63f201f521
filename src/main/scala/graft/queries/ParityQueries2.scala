package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.PgAge
import graft.operators._
import graft.transforms._

/** Second parity batch: operator families from SURVEY.md §2 not yet
  * exercised by ParityQueries — as-of pairing join (J9), polymorphic
  * domain join (J4), transform-pipeline composition (P1/P2), concept-set
  * split (P3), cohort predicate (P4), and scalable global renumbering
  * (W2/W4/F9).
  */
object ParityQueries2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  private val dec = "decimal(20,4)"

  // ------------------------------------------------------------------ J9
  /** As-of pairing join: each 'click' event matched to the nearest
    * 'view' of the same user within 1 hour (the BMI height↔weight
    * pairing shape, /root/reference/pedsnetdcc/bmi.py:267-273).
    */
  def q21Asof(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).withColumn("ts_us", expr("ts_ns div 1000"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    AsOfJoin.nearest(
        clicks, views,
        keys = Seq("user_id"), leftTs = "ts_us", rightTs = "ts_us",
        toleranceSec = 3600L * 1000 * 1000, // µs-resolution inputs
        leftUnique = Seq("event_id"), rightTiebreak = Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("r_event_id"), col("r_ts_us"),
        abs(col("ts_us") - col("r_ts_us")).as("diff_us"))
  }

  // ------------------------------------------------------------------ J4
  /** Polymorphic conditional join: the mapped name comes from customer
    * for 'click' facts and supplier for 'purchase' facts, NULL
    * otherwise (fact_relationship domain dispatch,
    * /root/reference/pedsnetdcc/id_mapping_transform.py:296-363).
    */
  def q22Poly(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    PolyMap.map(
        e.select(col("event_id"), col("event_type"), col("user_id")),
        domainCol = "event_type", factIdCol = "user_id",
        domains = Seq(
          PolyMap.Domain("click", t(s, dir, "customer"), "c_custkey", "c_name"),
          PolyMap.Domain("purchase", t(s, dir, "supplier"), "s_suppkey", "s_name")),
        outCol = "mapped_name")
      .select(col("event_id"), col("event_type"), col("mapped_name"))
  }

  // -------------------------------------------------------------- P1/P2
  /** Transform-pipeline composition: Age + ConceptName + SiteName
    * folded over an orders-based "fact table" exactly like the
    * reference's modify_select chain
    * (/root/reference/pedsnetdcc/abstract_transform.py:46-86).
    */
  def q23Pipeline(s: SparkSession, dir: String): DataFrame = {
    val person = t(s, dir, "customer").select(
      col("c_custkey").as("person_id"),
      date_add(lit("1970-01-01").cast("date"), (col("c_custkey") % 15000).cast("int"))
        .cast("timestamp").as("birth_datetime"))
    val concept = t(s, dir, "nation").select(
      col("n_nationkey").as("concept_id"), col("n_name").as("concept_name"))
    val base = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"),
        col("o_custkey").as("person_id"),
        col("c_nationkey").as("nation_concept_id"),
        col("o_orderdate").cast("timestamp").as("order_datetime"))
    val ctx = TransformContext(s, "site1",
      Map("person" -> person, "concept" -> concept))
    val out = Transform.runAll(ctx, "orders_fact", base, Seq(
      AgeTransform(Map("orders_fact" -> Seq("order_datetime"))),
      ConceptNameTransform(_ => Seq("nation_concept_id")),
      SiteNameTransform()))
    out.select(col("o_orderkey"), col("order_age_in_months"),
      col("nation_concept_name"), col("site"))
  }

  // ------------------------------------------------------------------ P3
  /** Concept-set split: one cached scan routed into three named slices
    * plus remainder (split_measurement shape,
    * /root/reference/pedsnetdcc/split_measurement.py:86-113), summarized
    * per slice.
    */
  def q24Split(s: SparkSession, dir: String): DataFrame = {
    val slices = SetOps.splitByConceptSets(
      t(s, dir, "part").withColumn("p_sizekey", col("p_size").cast("long")),
      "p_sizekey",
      Map(
        "small" -> (1L to 15L).toSet,
        "medium" -> (16L to 30L).toSet,
        "large" -> (31L to 45L).toSet))
    slices.toSeq.sortBy(_._1)
      .map { case (name, df) =>
        df.groupBy()
          .agg(count(lit(1)).as("n"),
            sum(col("p_retailprice").cast(dec)).cast("double").as("sum_price"))
          .withColumn("slice", lit(name))
      }
      .reduce(_ unionByName _)
      .select(col("slice"), col("n"), col("sum_price"))
  }

  // ------------------------------------------------------------------ P4
  /** Cohort predicate: distinct persons matching concept-set predicates
    * across several fact tables, unioned (recover_cohort shape,
    * /root/reference/pedsnetdcc/recover_cohort.py:13-250).
    */
  def q25Cohort(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    val c = t(s, dir, "customer")
    val fromOrders = o
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_custkey"))
    val fromSegment = c
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 9000)
      .select(col("c_custkey").as("o_custkey"))
    val fromReturns = li.filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"))
    Seq(fromOrders, fromSegment, fromReturns)
      .reduce(_ union _)
      .distinct()
  }

  // ------------------------------------------------------------ W2/W4/F9
  /** Scalable global renumbering: dense sequential ids following a
    * total order without a single-partition window
    * (/root/reference/pedsnetdcc/era.py:480-502 renumbering;
    * /root/reference/pedsnetdcc/id_mapping_transform.py:28-31 id
    * assignment). AssignIds = range-partition + per-partition offsets.
    */
  def q26Renumber(s: SparkSession, dir: String): DataFrame =
    AssignIds.assign(
        t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        orderCols = Seq("c_custkey"), idCol = "new_id", start = 1001L)
      .select(col("c_custkey"), col("c_name"), col("new_id"))

  // ------------------------------------------------------------------ S5
  /** CSV sink + source round-trip (the external-id-mapper CSV surface,
    * /root/reference/pedsnetdcc/external_id_mapper.py:63-65,150-249):
    * write a projection as CSV, read it back with an explicit schema,
    * aggregate. Values must survive the round-trip exactly for the
    * oracle (reading the original parquet) to hash-match.
    */
  def q27Csv(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_csv_roundtrip_${dir.replaceAll("[^0-9.]", "")}"
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .write.mode("overwrite").option("header", "true").csv(tmp)
    s.read
      .schema("c_custkey LONG, c_mktsegment STRING, c_acctbal DOUBLE")
      .option("header", "true").csv(tmp)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast(dec)).cast("double").as("sum_bal"))
  }

  // -------------------------------------------------------------- P6/F7
  /** NaN / overflow cleanup: drop NaN values and |round(v)| > 10^15
    * before aggregating (/root/reference/pedsnetdcc/z_score.py:19-21,
    * 428-486).
    */
  def q28Cleanup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(!isnan(col("value")) && round(abs(col("value"))) <= 1e15)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_value"))

  // --------------------------------------------------------------- Ext→Z
  /** LMS z-score derivation (internalized derive_z): broadcast-join a
    * deterministic LMS stratum table and evaluate
    * ((x/M)^L − 1)/(L·S) as Column math.
    */
  def q29Zscore(s: SparkSession, dir: String): DataFrame = {
    val lms = t(s, dir, "part")
      .select(col("p_size").cast("long").as("stratum")).distinct()
      .select(
        col("stratum"),
        (lit(0.5) + (col("stratum") % 5).cast("double") * 0.1).as("L"),
        (lit(50.0) + col("stratum").cast("double")).as("M"),
        (lit(0.1) + (col("stratum") % 3).cast("double") * 0.05).as("S"))
    val meas = t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_quantity").cast("long") % 50 + 1).as("stratum"),
      (col("l_extendedprice").cast("double") / 1000.0).as("x"))
    ZScore.attach(meas, lms, Seq("stratum"), "x", "z")
      .select(col("l_orderkey"), col("l_linenumber"), col("stratum"), col("z"))
  }

  // ------------------------------------------------------------ J9 + math
  /** Full BMI derivation shape (/root/reference/pedsnetdcc/bmi.py):
    * pair each "weight" fact with the nearest "height" fact of the
    * same person within the match window (as-of join), then derive
    * bmi = wt / (ht/100)^2 as Column math — the external derive_bmi
    * tool internalized. Heights/weights are synthesized from the
    * events stream deterministically.
    */
  def q30Bmi(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).withColumn("ts_us", expr("ts_ns div 1000"))
    val weights = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        (col("value") + 50.0).as("wt_kg"))
    val heights = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        (col("value") + 150.0).as("ht_cm"))
    AsOfJoin.nearest(
        weights, heights,
        keys = Seq("user_id"), leftTs = "ts_us", rightTs = "ts_us",
        toleranceSec = 3600L * 1000 * 1000,
        leftUnique = Seq("event_id"), rightTiebreak = Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("r_event_id"),
        (col("wt_kg") / ((col("r_ht_cm") / 100.0) * (col("r_ht_cm") / 100.0)))
          .as("bmi"))
  }

  // ------------------------------------------------------- era + rollup
  /** Drug-era ingredient rollup shape
    * (/root/reference/pedsnetdcc/era.py:135-258): facts map to a
    * coarser concept via a dimension join (RxNorm ingredient via
    * concept_ancestor in the reference; part→brand here), then eras
    * build over the rolled-up concept.
    */
  def q31EraRollup(s: SparkSession, dir: String): DataFrame = {
    val intervals = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(
        col("l_suppkey").alias("person_id"),
        col("p_brand").alias("concept_id"),
        col("l_shipdate").cast("date").alias("start_date"),
        date_add(col("l_shipdate").cast("date"),
          col("l_quantity").cast("int")).alias("end_date"),
        col("l_orderkey"), col("l_linenumber"))
    // pk tiebreak: duplicate (start, end) rows carry different
    // running-max flags, so a non-total order lets a re-sort split
    // them nondeterministically (SURVEY.md §7.4)
    EraBuilder
      .eras(intervals, Seq("person_id", "concept_id"), "start_date", "end_date",
        gapDays = 30, tiebreak = Seq("l_orderkey", "l_linenumber"))
      .select(col("person_id"), col("concept_id"), col("era_id"),
        col("era_start"), col("era_end"), col("row_count"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_asof" -> q21Asof _,
    "q22_poly" -> q22Poly _,
    "q23_pipeline" -> q23Pipeline _,
    "q24_split" -> q24Split _,
    "q25_cohort" -> q25Cohort _,
    "q26_renumber" -> q26Renumber _,
    "q27_csv" -> q27Csv _,
    "q28_cleanup" -> q28Cleanup _,
    "q29_zscore" -> q29Zscore _,
    "q30_bmi" -> q30Bmi _,
    "q31_era_rollup" -> q31EraRollup _
  )

  def oracle: Map[String, String] = Map(
    "q21_asof" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |           FROM events),
        |cand AS (
        |  SELECT c.user_id, c.event_id, c.ts_us,
        |    v.event_id AS r_event_id, v.ts_us AS r_ts_us,
        |    abs(c.ts_us - v.ts_us) AS diff_us,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY c.user_id, c.event_id
        |      ORDER BY abs(c.ts_us - v.ts_us) ASC, v.ts_us ASC, v.event_id ASC)
        |      AS rn
        |  FROM e c JOIN e v
        |    ON c.user_id = v.user_id
        |   AND c.event_type = 'click' AND v.event_type = 'view'
        |   AND abs(c.ts_us - v.ts_us) <= 3600000000)
        |SELECT user_id, event_id, ts_us, r_event_id, r_ts_us, diff_us
        |FROM cand WHERE rn = 1""".stripMargin,
    "q22_poly" ->
      """SELECT event_id, event_type,
        |  CASE WHEN event_type = 'click' THEN c.c_name
        |       WHEN event_type = 'purchase' THEN s.s_name
        |       ELSE NULL END AS mapped_name
        |FROM events e
        |LEFT JOIN customer c
        |  ON e.user_id = c.c_custkey AND e.event_type = 'click'
        |LEFT JOIN supplier s
        |  ON e.user_id = s.s_suppkey AND e.event_type = 'purchase'""".stripMargin,
    "q23_pipeline" ->
      """WITH person AS (
        |  SELECT c_custkey AS person_id,
        |    CAST(DATE '1970-01-01' + INTERVAL 1 DAY * (c_custkey % 15000) AS TIMESTAMP)
        |      AS birth_datetime
        |  FROM customer),
        |base AS (
        |  SELECT o_orderkey, o_custkey AS person_id,
        |    c_nationkey AS nation_concept_id,
        |    CAST(o_orderdate AS TIMESTAMP) AS order_datetime
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT o_orderkey,
        |  date_part('year', age(order_datetime, birth_datetime)) * 12
        |  + date_part('month', age(order_datetime, birth_datetime))
        |  + date_part('day', age(order_datetime, birth_datetime))
        |    / date_part('day',
        |        (birth_datetime + INTERVAL 1 YEAR * date_part('year', age(order_datetime, birth_datetime))
        |           + INTERVAL 1 MONTH * (date_part('month', age(order_datetime, birth_datetime)) + 1))
        |      - (birth_datetime + INTERVAL 1 YEAR * date_part('year', age(order_datetime, birth_datetime))
        |           + INTERVAL 1 MONTH * date_part('month', age(order_datetime, birth_datetime))))
        |  AS order_age_in_months,
        |  n_name AS nation_concept_name,
        |  'site1' AS site
        |FROM base
        |LEFT JOIN person USING (person_id)
        |LEFT JOIN nation ON nation_concept_id = n_nationkey""".stripMargin,
    "q24_split" ->
      """SELECT slice, COUNT(*) AS n,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
        |FROM (
        |  SELECT CASE WHEN p_size BETWEEN 1 AND 15 THEN 'small'
        |              WHEN p_size BETWEEN 16 AND 30 THEN 'medium'
        |              WHEN p_size BETWEEN 31 AND 45 THEN 'large'
        |              ELSE 'other' END AS slice,
        |    p_retailprice
        |  FROM part)
        |GROUP BY slice""".stripMargin,
    "q25_cohort" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |UNION
        |SELECT c_custkey AS o_custkey FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
        |UNION
        |SELECT o_custkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'""".stripMargin,
    "q26_renumber" ->
      """SELECT c_custkey, c_name,
        |  ROW_NUMBER() OVER (ORDER BY c_custkey) + 1000 AS new_id
        |FROM customer""".stripMargin,
    "q27_csv" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q28_cleanup" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE NOT isnan(value) AND round(abs(value)) <= 1e15
        |GROUP BY event_type""".stripMargin,
    "q29_zscore" ->
      """WITH lms AS (
        |  SELECT stratum,
        |    0.5 + CAST(stratum % 5 AS DOUBLE) * 0.1 AS L,
        |    50.0 + CAST(stratum AS DOUBLE) AS M,
        |    0.1 + CAST(stratum % 3 AS DOUBLE) * 0.05 AS S
        |  FROM (SELECT DISTINCT CAST(p_size AS BIGINT) AS stratum FROM part)),
        |meas AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) % 50 + 1 AS stratum,
        |    CAST(l_extendedprice AS DOUBLE) / 1000.0 AS x
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, stratum,
        |  (pow(x / M, L) - 1.0) / (L * S) AS z
        |FROM meas LEFT JOIN lms USING (stratum)""".stripMargin,
    "q30_bmi" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |                  epoch_us(ts) AS ts_us FROM events),
        |cand AS (
        |  SELECT w.user_id, w.event_id, v.event_id AS r_event_id,
        |    (w.value + 50.0) AS wt_kg, (v.value + 150.0) AS ht_cm,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY w.user_id, w.event_id
        |      ORDER BY abs(w.ts_us - v.ts_us) ASC, v.ts_us ASC, v.event_id ASC)
        |      AS rn
        |  FROM e w JOIN e v
        |    ON w.user_id = v.user_id
        |   AND w.event_type = 'click' AND v.event_type = 'view'
        |   AND abs(w.ts_us - v.ts_us) <= 3600000000)
        |SELECT user_id, event_id, r_event_id,
        |  wt_kg / ((ht_cm / 100.0) * (ht_cm / 100.0)) AS bmi
        |FROM cand WHERE rn = 1""".stripMargin,
    "q31_era_rollup" ->
      """WITH intervals AS (
        |  SELECT l_suppkey AS person_id, p_brand AS concept_id,
        |    CAST(l_shipdate AS DATE) AS start_date,
        |    CAST(l_shipdate AS DATE) + CAST(CAST(l_quantity AS INT) AS INTEGER) AS end_date,
        |    l_orderkey, l_linenumber
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |flagged AS (
        |  SELECT *,
        |    MAX(end_date) OVER (PARTITION BY person_id, concept_id
        |      ORDER BY start_date, end_date, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
        |  FROM intervals),
        |islands AS (
        |  SELECT *,
        |    SUM(CASE WHEN prev_max_end IS NULL
        |             OR start_date > prev_max_end + INTERVAL 30 DAY
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY person_id, concept_id
        |            ORDER BY start_date, end_date, l_orderkey, l_linenumber
        |            ROWS UNBOUNDED PRECEDING) AS era_id
        |  FROM flagged)
        |SELECT person_id, concept_id, CAST(era_id AS BIGINT) AS era_id,
        |  MIN(start_date) AS era_start, MAX(end_date) AS era_end,
        |  COUNT(*) AS row_count
        |FROM islands GROUP BY person_id, concept_id, era_id""".stripMargin
  )
}
