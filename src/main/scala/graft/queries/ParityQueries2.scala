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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_asof" -> q21Asof _,
    "q22_poly" -> q22Poly _,
    "q23_pipeline" -> q23Pipeline _,
    "q24_split" -> q24Split _,
    "q25_cohort" -> q25Cohort _,
    "q26_renumber" -> q26Renumber _
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
        |FROM customer""".stripMargin
  )
}
