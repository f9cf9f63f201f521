package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.PgAge
import graft.operators._

/** Parity queries: one per operator family in SURVEY.md §2, expressed over
  * the driver's TPC-H-ish synthetic tables and checked against DuckDB.
  *
  * Oracle-safety conventions (the driver hash-compares against DuckDB):
  *  - double aggregation goes through DecimalType so both engines sum
  *    exactly, then casts back to double;
  *  - every ranked/limited result carries a deterministic total order
  *    (unique key tiebreak);
  *  - timestamps are output truncated to whole seconds (the raw events
  *    table is nanosecond-precision, which Spark cannot represent);
  *  - result column names are aliased identically on both sides.
  */
object ParityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  private val dec = "decimal(20,4)"
  private def d4(c: Column): Column = c.cast(dec)

  // ---------------------------------------------------------------- A2/A4
  /** Grouped aggregation with exact decimal sums (TPC-H Q1 shape). */
  def q01Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(d4(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(d4(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum((d4(col("l_extendedprice")) * (lit(1).cast(dec) - d4(col("l_discount"))))
          .cast("decimal(28,8)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  // ---------------------------------------------------------------- S1/P3
  /** Scan + projection + predicate (pushed to parquet). */
  def q02Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 25)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  // ------------------------------------------------------------------ J1
  /** Inner equi-join fact→dimension (person-join shape). */
  def q03Join(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(d4(col("o_totalprice"))).cast("double").as("sum_price"))

  // ------------------------------------------------------------------ J2
  /** Concept-name shape: repeated broadcast left joins to a small dim. */
  def q04LookupNames(s: SparkSession, dir: String): DataFrame = {
    val nation = t(s, dir, "nation")
    val cust = t(s, dir, "customer")
    val supp = t(s, dir, "supplier")
    val li = t(s, dir, "lineitem").join(t(s, dir, "orders"),
      col("l_orderkey") === col("o_orderkey"))
    val cn = broadcast(nation.select(
      col("n_nationkey").alias("c_nk"), col("n_name").alias("cust_nation")))
    val sn = broadcast(nation.select(
      col("n_nationkey").alias("s_nk"), col("n_name").alias("supp_nation")))
    li.join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left")
      .join(cn, col("c_nationkey") === col("c_nk"), "left")
      .join(sn, col("s_nationkey") === col("s_nk"), "left")
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("n"),
        sum(d4(col("l_extendedprice"))).cast("double").as("volume"))
  }

  // ------------------------------------------------------------------ J5/J6
  /** Anti-join: customers with no orders (new-key / referential shape). */
  def q05Anti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  // ------------------------------------------------------------------ J7
  /** Semi-join cohort subsetting: lineitems of high-value orders. */
  def q06Semi(s: SparkSession, dir: String): DataFrame = {
    val cohort = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
    SetOps
      .subsetByCohort(
        t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        cohort, Seq("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(d4(col("l_quantity"))).cast("double").as("sum_qty"))
  }

  // ------------------------------------------------------------------ U1
  /** N-way union-all merge (site merge shape) + conservation count. */
  def q07Merge(s: SparkSession, dir: String): DataFrame = {
    val fields = Seq("o_orderkey", "o_custkey", "o_totalprice")
    SetOps
      .mergeSites(s, Seq(dir, dir, dir), "orders", fields)
      .groupBy()
      .agg(count(lit(1)).as("n"),
        sum(d4(col("o_totalprice"))).cast("double").as("total"))
  }

  // ------------------------------------------------------------------ A6
  /** DISTINCT projection (cohort person-finder shape). */
  def q08Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
      .distinct()

  // ------------------------------------------------------------------ W1
  /** row_number per partition (era event ordering shape). */
  def q09WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"))
  }

  // ------------------------------------------------------------------ W3
  /** Gaps-and-islands era construction over synthetic intervals:
    * (supplier, part-group) with [shipdate, shipdate + quantity days],
    * 30-day gap tolerance — the reference's condition_era semantics.
    */
  def q10Era(s: SparkSession, dir: String): DataFrame = {
    val intervals = t(s, dir, "lineitem").select(
      col("l_suppkey").alias("person_id"),
      (col("l_partkey") % 10).alias("concept_id"),
      col("l_shipdate").cast("date").alias("start_date"),
      date_add(col("l_shipdate").cast("date"),
        col("l_quantity").cast("int")).alias("end_date"),
      col("l_orderkey"),
      col("l_linenumber"))
    EraBuilder
      .eras(intervals, Seq("person_id", "concept_id"), "start_date", "end_date",
        gapDays = 30, tiebreak = Seq("l_orderkey", "l_linenumber"))
      .select(col("person_id"), col("concept_id"), col("era_id"),
        col("era_start"), col("era_end"), col("row_count"))
  }

  // ------------------------------------------------------------------ A1/U2
  /** Per-person min/max over multiple domains (observation_period). */
  def q11ObsPeriod(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .select(col("o_custkey").alias("person_id"), col("o_orderdate").cast("date").alias("d"))
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").alias("person_id"), col("l_shipdate").cast("date").alias("d"))
    ObservationPeriod
      .sync(Seq((orders, col("d")), (li, col("d"))))
      .select(col("person_id"),
        col("observation_period_start_date"),
        col("observation_period_end_date"),
        col("observation_period_id"))
  }

  // ------------------------------------------------------------------ F5
  /** CASE WHEN routing (measurement partition dispatch shape). */
  def q12Case(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn(
        "size_class",
        when(col("p_size") < 10, "small")
          .when(col("p_size") < 30, "medium")
          .otherwise("large"))
      .groupBy(col("size_class"))
      .agg(count(lit(1)).as("n"),
        sum(d4(col("p_retailprice"))).cast("double").as("sum_price"))

  // ------------------------------------------------------------------ F1
  /** months_in_interval (PG age semantics) between order and ship dates. */
  def q13Age(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        PgAge.months_in_interval(col("o_orderdate"), col("l_shipdate"))
          .as("age_months"))
  }

  // ------------------------------------------------------------------ O1/O2
  /** Deterministic top-k (ORDER BY + LIMIT with unique tiebreak). */
  def q14TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
      .select(col("o_orderkey"), col("o_totalprice"))

  // ------------------------------------------------------------------ J3/W2
  /** ID-mapping: dense surrogate ids for customers (map build + replace). */
  def q15IdMap(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val empty = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("site_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("dcc_id",
          org.apache.spark.sql.types.LongType))))
    val (idMap, _) = IdMapping.extendMap(orders, "o_custkey", empty, lastId = 0L)
    IdMapping
      .replaceId(orders, "o_custkey", idMap, nullable = false, keepSiteId = true)
      .groupBy(col("o_custkey"), col("site_id"))
      .agg(count(lit(1)).as("n_orders"))
  }

  // ------------------------------------------------------------------ F2/F3
  /** COALESCE end-date normalization + interval padding (era prep). */
  def q16Coalesce(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        coalesce(
          when(col("o_orderstatus") === "O", lit(null).cast("date"))
            .otherwise(date_add(col("o_orderdate").cast("date"), 30)),
          date_add(col("o_orderdate").cast("date"), 1)).as("end_date"))

  // ------------------------------------------------------------------ J10
  /** UPDATE-join recompute: order totals replaced from lineitem sums. */
  def q17UpdateJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val computed = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").alias("o_orderkey"))
      .agg(sum(d4(col("l_extendedprice"))).cast("double").alias("computed_total"))
    SetOps
      .updateJoin(
        orders.withColumn("o_totalprice", col("o_totalprice").cast("double")),
        computed, Seq("o_orderkey"), "o_totalprice", "computed_total")
      .select(col("o_orderkey"),
        round(col("o_totalprice"), 4).as("o_totalprice"))
  }

  // ------------------------------------------------------------------ A5 + checks
  /** Validation counts: PK dups, FK orphans, NOT NULL violations. */
  def q18Checks(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val orders = t(s, dir, "orders")
    val dups = Checks.pkDuplicates(li, Seq("l_orderkey", "l_linenumber")).count()
    val orphans = Checks
      .fkOrphans(li, Seq("l_orderkey"), orders, Seq("o_orderkey"))
      .count()
    val nulls = Checks.notNullViolations(li, Seq("l_quantity", "l_shipdate")).count()
    import s.implicits._
    Seq((dups, orphans, nulls)).toDF("pk_dups", "fk_orphans", "null_violations")
  }

  // ------------------------------------------------------------------ U3
  /** UNION (dedup) of two branches. */
  def q19Union(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val b = o.filter(col("o_totalprice") > 200000).select(col("o_custkey"))
    a.union(b).dropDuplicates()
  }

  // ------------------------------------------------------------------ S4
  /** Idempotent append (ON CONFLICT DO NOTHING shape). */
  def q20Append(s: SparkSession, dir: String): DataFrame = {
    val target = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val incoming = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    SetOps.idempotentAppend(target, incoming, Seq("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> q01Agg _,
    "q02_filter" -> q02Filter _,
    "q03_join" -> q03Join _,
    "q04_lookup_names" -> q04LookupNames _,
    "q05_anti" -> q05Anti _,
    "q06_semi" -> q06Semi _,
    "q07_merge" -> q07Merge _,
    "q08_distinct" -> q08Distinct _,
    "q09_window_rank" -> q09WindowRank _,
    "q10_era" -> q10Era _,
    "q11_obs_period" -> q11ObsPeriod _,
    "q12_case" -> q12Case _,
    "q13_age" -> q13Age _,
    "q14_topk" -> q14TopK _,
    "q15_idmap" -> q15IdMap _,
    "q16_coalesce" -> q16Coalesce _,
    "q17_update_join" -> q17UpdateJoin _,
    "q18_checks" -> q18Checks _,
    "q19_union" -> q19Union _,
    "q20_append" -> q20Append _
  )

  def oracle: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,4)) * (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4))) AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 25""".stripMargin,
    "q03_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_lookup_names" ->
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |LEFT JOIN nation cn ON c_nationkey = cn.n_nationkey
        |LEFT JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY cn.n_name, sn.n_name""".stripMargin,
    "q05_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q06_semi" ->
      """SELECT l_orderkey AS o_orderkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l_orderkey AND o_totalprice > 300000)
        |GROUP BY l_orderkey""".stripMargin,
    "q07_merge" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
        |FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders
        |      UNION ALL SELECT * FROM orders)""".stripMargin,
    "q08_distinct" ->
      "SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'",
    "q09_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q10_era" ->
      """WITH intervals AS (
        |  SELECT l_suppkey AS person_id, l_partkey % 10 AS concept_id,
        |    CAST(l_shipdate AS DATE) AS start_date,
        |    CAST(l_shipdate AS DATE) + CAST(CAST(l_quantity AS INT) AS INTEGER) AS end_date,
        |    l_orderkey, l_linenumber
        |  FROM lineitem),
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
        |FROM islands GROUP BY person_id, concept_id, era_id""".stripMargin,
    "q11_obs_period" ->
      """WITH u AS (
        |  SELECT o_custkey AS person_id,
        |    MIN(CAST(o_orderdate AS DATE)) AS s, MAX(CAST(o_orderdate AS DATE)) AS e
        |  FROM orders GROUP BY o_custkey
        |  UNION ALL
        |  SELECT o_custkey AS person_id,
        |    MIN(CAST(l_shipdate AS DATE)) AS s, MAX(CAST(l_shipdate AS DATE)) AS e
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_custkey),
        |p AS (
        |  SELECT person_id, MIN(s) AS observation_period_start_date,
        |         MAX(e) AS observation_period_end_date
        |  FROM u GROUP BY person_id)
        |SELECT person_id, observation_period_start_date, observation_period_end_date,
        |  ROW_NUMBER() OVER (ORDER BY person_id) AS observation_period_id
        |FROM p""".stripMargin,
    "q12_case" ->
      """SELECT CASE WHEN p_size < 10 THEN 'small'
        |            WHEN p_size < 30 THEN 'medium'
        |            ELSE 'large' END AS size_class,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
        |FROM part GROUP BY 1""".stripMargin,
    "q13_age" ->
      """SELECT l_orderkey, l_linenumber,
        |  date_part('year', age(l_shipdate, o_orderdate)) * 12
        |  + date_part('month', age(l_shipdate, o_orderdate))
        |  + date_part('day', age(l_shipdate, o_orderdate))
        |    / date_part('day',
        |        (o_orderdate + INTERVAL 1 YEAR * date_part('year', age(l_shipdate, o_orderdate))
        |           + INTERVAL 1 MONTH * (date_part('month', age(l_shipdate, o_orderdate)) + 1))
        |      - (o_orderdate + INTERVAL 1 YEAR * date_part('year', age(l_shipdate, o_orderdate))
        |           + INTERVAL 1 MONTH * date_part('month', age(l_shipdate, o_orderdate))))
        |  AS age_months
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "q14_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "q15_idmap" ->
      """WITH idmap AS (
        |  SELECT o_custkey AS site_id,
        |    ROW_NUMBER() OVER (ORDER BY o_custkey) AS dcc_id
        |  FROM (SELECT DISTINCT o_custkey FROM orders))
        |SELECT m.dcc_id AS o_custkey, o.o_custkey AS site_id, COUNT(*) AS n_orders
        |FROM orders o JOIN idmap m ON o.o_custkey = m.site_id
        |GROUP BY m.dcc_id, o.o_custkey""".stripMargin,
    "q16_coalesce" ->
      """SELECT o_orderkey,
        |  COALESCE(CASE WHEN o_orderstatus = 'O' THEN NULL
        |                ELSE CAST(o_orderdate AS DATE) + 30 END,
        |           CAST(o_orderdate AS DATE) + 1) AS end_date
        |FROM orders""".stripMargin,
    "q17_update_join" ->
      """SELECT o.o_orderkey,
        |  ROUND(COALESCE(c.computed_total, CAST(o.o_totalprice AS DOUBLE)), 4) AS o_totalprice
        |FROM orders o
        |LEFT JOIN (SELECT l_orderkey AS o_orderkey,
        |             CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS computed_total
        |           FROM lineitem GROUP BY l_orderkey) c
        |ON o.o_orderkey = c.o_orderkey""".stripMargin,
    "q18_checks" ->
      """SELECT
        |  (SELECT COUNT(*) FROM (
        |     SELECT l_orderkey, l_linenumber FROM lineitem
        |     GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)) AS pk_dups,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_orderkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS fk_orphans,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_quantity IS NULL OR l_shipdate IS NULL) AS null_violations""".stripMargin,
    "q19_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000""".stripMargin,
    "q20_append" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM (
        |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus FROM orders
        |  WHERE o_orderkey NOT IN (
        |    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'))
        |GROUP BY o_orderstatus""".stripMargin
  )
}
