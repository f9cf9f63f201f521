package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.year

/** Physical-layout hints: the reference's index DDL maps to bucketing/
  * partitioning in Spark (SURVEY.md §2.11, §4). This spec demonstrates
  * the payoff the registry hints are for: a join between two tables
  * bucketed on the join key needs NO shuffle exchange — at 100 TB that
  * is the difference between a co-located join and re-shuffling both
  * fact tables.
  */
class LayoutSpec extends SparkSpec {

  test("bucketed tables co-locate the join (no Exchange in the plan)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // in-memory catalog: locations from a previous JVM are not dropped
    // by DROP TABLE, clear them on disk
    Seq("b_orders", "b_lineitem").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    graft.core.Tables.read(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.core.Tables.read(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        $"l_orderkey" === $"o_orderkey")
    // force a non-broadcast plan so bucketing is what saves the shuffle
    val plan = withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    }
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("partitioned write routes rows and scans prune partitions") {
    import spark.implicits._
    // the reference's measurement partitioning-by-concept-class with
    // trigger routing (pedsnetdcc/partition_measurement.py) maps to a
    // partitionBy write + automatic partition pruning on read
    val out = "/tmp/graft_partitioned_events"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    graft.core.Tables.events(spark, sf0001)
      .select("event_id", "user_id", "value", "event_type")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val clicks = spark.read.parquet(out).filter($"event_type" === "click")
    val plan = clicks.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)
    // routing correctness: partition slice equals the predicate slice
    val expected = graft.core.Tables.events(spark, sf0001)
      .filter($"event_type" === "click").count()
    assert(clicks.count() == expected && expected > 0)
  }

  test("registry layout hints drive co-bucketed, shuffle-free joins") {
    import spark.implicits._
    val model = graft.model.PedsnetModel.tpch
    Seq("graft_customer", "graft_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    // the registry says: customer buckets by c_custkey, orders by
    // o_custkey, both 64 — the person-join co-location decision made
    // ONCE in metadata, not per call site
    val cust = graft.operators.Layout.write(
      graft.core.Tables.read(spark, sf0001, "customer"),
      model.table("customer"), outDir = "/tmp")
    val ords = graft.operators.Layout.write(
      graft.core.Tables.read(spark, sf0001, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      model.table("orders"), outDir = "/tmp")
    val joined = spark.table(ords)
      .join(spark.table(cust), $"o_custkey" === $"c_custkey")
    val plan = withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    }
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"co-bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("hint-derived partition columns materialize at write time") {
    import spark.implicits._
    // the pedsnet measurement hint partitions by measurement_year,
    // which is NOT a CDM column — the writer derives it from
    // measurement_date per the hint's yearOf entry, and pruning on the
    // derived column works on read
    val model = graft.model.PedsnetModel.v33
    spark.sql("DROP TABLE IF EXISTS graft_measurement")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft_warehouse/graft_measurement"))
    val m = graft.core.Tables.read(spark, sf0001, "lineitem").select(
      $"l_orderkey".as("measurement_id"),
      $"l_suppkey".as("person_id"),
      $"l_shipdate".as("measurement_date"))
    val name = graft.operators.Layout.write(
      m, model.table("measurement").copy(
        schema = m.schema,
        layout = model.table("measurement").layout),
      outDir = "/tmp")
    val t = spark.table(name)
    assert(t.columns.contains("measurement_year"))
    val oneYear = t.filter($"measurement_year" === 1996)
    val plan = oneYear.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("measurement_year"), plan)
    val expected = m.filter(year($"measurement_date") === 1996).count()
    assert(oneYear.count() == expected && expected > 0)
  }

  test("underivable missing partition column fails fast") {
    import graft.model.{LayoutHint, TableDef}
    val df = spark.range(3).toDF("id")
    val bad = TableDef("t", df.schema,
      layout = Some(LayoutHint(partitionBy = Seq("missing_col"))))
    val e = intercept[RuntimeException] {
      graft.operators.Layout.write(df, bad, outDir = "/tmp/graft_layout_bad")
    }
    assert(e.getMessage.contains("missing_col"))
  }

  private def withSqlConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
