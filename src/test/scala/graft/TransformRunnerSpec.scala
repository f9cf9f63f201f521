package graft

import org.apache.spark.sql.functions._

import graft.transforms._

class TransformRunnerSpec extends SparkSpec {

  test("runner transforms, swaps atomically, and validates a site schema") {
    val out = "/tmp/graft_runner_out"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    new java.io.File(out).mkdirs()

    val concept = graft.core.Tables.read(spark, sf0001, "nation").select(
      col("n_nationkey").as("concept_id"), col("n_name").as("concept_name"))
    val results = TransformRunner.run(
      spark,
      siteDir = sf0001,
      site = "siteA",
      tables = Seq("nation", "region"),
      transforms = Seq(SiteNameTransform()),
      lookup = Map("concept" -> concept),
      checks = Map(
        "nation" -> TransformRunner.TableChecks(
          pk = Seq("n_nationkey"), notNull = Seq("n_name")),
        "region" -> TransformRunner.TableChecks(pk = Seq("r_regionkey"))),
      outDir = out)

    assert(results.map(r => (r.table, r.rows, r.pkDuplicates, r.nullViolations))
      == Seq(("nation", 25L, 0L, 0L), ("region", 5L, 0L, 0L)))
    val written = spark.read.parquet(s"$out/nation.parquet")
    assert(written.columns.contains("site"))
    assert(written.select("site").distinct().collect().map(_.getString(0)).toSeq
      == Seq("siteA"))

    // second run overwrites via the staging swap (no partial state)
    val again = TransformRunner.run(spark, sf0001, "siteB", Seq("nation"),
      Seq(SiteNameTransform()), Map("concept" -> concept), Map.empty, out)
    assert(again.head.rows == 25L)
    assert(spark.read.parquet(s"$out/nation.parquet")
      .select("site").distinct().collect().map(_.getString(0)).toSeq == Seq("siteB"))
  }

  test("registry-driven run derives tables and checks from the model") {
    val out = "/tmp/graft_runner_model_out"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    new java.io.File(out).mkdirs()

    // a two-table slice of the registry keeps the test fast while still
    // proving the model (not hand lists) drives tables + validation
    val model = graft.model.PedsnetModel.tpch
    val slice = graft.model.Model(model.name, model.version,
      model.tableSeq.filter(t => Set("nation", "region").contains(t.name)))
    val results = TransformRunner.run(
      spark, sf0001, "siteA", slice,
      transforms = Seq(SiteNameTransform()),
      lookup = Map.empty,
      outDir = out)
    assert(results.map(r => (r.table, r.rows, r.pkDuplicates, r.nullViolations))
      .toSet == Set(("nation", 25L, 0L, 0L), ("region", 5L, 0L, 0L)))
    // the spec came from the registry: notNull includes n_name, so a
    // model-driven check of a table with nulls would report them
    assert(TransformRunner.checksFor(slice)("nation").notNull.contains("n_name"))
  }
}
