package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.PedsnetModel

/** Schema-registry invariants (the stock_metadata parity surface):
  * constraint lookups resolve, FK references close over the model, and
  * the not-null rule matches the reference's (PK columns excluded from
  * the non-PK not-null set, not_nulls.py:33-35).
  */
class ModelSpec extends AnyFunSuite {

  for (model <- Seq(PedsnetModel.v33, PedsnetModel.v27, PedsnetModel.tpch)) {

    test(s"${model.name}/${model.version}: FK references resolve within the model") {
      for {
        t <- model.tableSeq
        fk <- t.fks
      } {
        val parent = model.table(fk.refTable)
        assert(fk.refCols.forall(parent.columns.contains),
          s"${t.name} FK -> ${fk.refTable}(${fk.refCols.mkString(",")})")
        assert(fk.cols.forall(t.columns.contains), s"${t.name} FK cols")
        // FKs reference the parent's PK (the reference's constraints do)
        assert(parent.pk == fk.refCols,
          s"${t.name} FK must target ${fk.refTable}'s PK")
      }
    }

    test(s"${model.name}/${model.version}: pk/fk/notNull constraint maps are consistent") {
      assert(model.primaryKeys.keySet.subsetOf(model.tables.keySet))
      assert(model.foreignKeys.keySet.subsetOf(model.tables.keySet))
      for (t <- model.tableSeq) {
        assert(t.pk.forall(t.columns.contains), s"${t.name} pk cols exist")
        assert(t.notNull.forall(t.columns.contains), s"${t.name} notNull cols exist")
        // non-PK not-null excludes every PK column (not_nulls.py rule)
        assert(t.notNullNonPk.intersect(t.pk).isEmpty, t.name)
      }
    }
  }

  test("pedsnet model carries the core CDM tables the reference constrains") {
    val names = PedsnetModel.v33.tables.keySet
    for (t <- Seq("person", "visit_occurrence", "measurement",
        "drug_exposure", "condition_occurrence", "observation",
        "fact_relationship", "observation_period"))
      assert(names.contains(t), t)
    // fact tables carry the person_id bucketing layout hint
    val m = PedsnetModel.v33.table("measurement")
    assert(m.layout.exists(_.bucketBy == Seq("person_id")))
  }

  test("fact_relationship has no PK, matching the CDM") {
    assert(PedsnetModel.v33.table("fact_relationship").pk.isEmpty)
  }

  test("every reference ID_MAP_TABLE and VOCAB_TABLE resolves in v3.3") {
    val names = PedsnetModel.v33.tables.keySet
    for (t <- PedsnetModel.idMapTables) assert(names.contains(t), s"id-map $t")
    for (t <- PedsnetModel.vocabTables) assert(names.contains(t), s"vocab $t")
    // the consistent set is a prefix subset of the full id-map set
    assert(PedsnetModel.consistentIdMapTables.toSet
      .subsetOf(PedsnetModel.idMapTables.toSet))
    // vocabulary tables are never id-mapped
    assert(PedsnetModel.vocabTables.toSet
      .intersect(PedsnetModel.idMapTables.toSet) == Set("cohort_definition"))
  }

  test("version resolver returns distinct schemas per version (stock_metadata parity)") {
    assert(PedsnetModel.forVersion("3.3.0") eq PedsnetModel.v33)
    assert(PedsnetModel.forVersion("2.7.0") eq PedsnetModel.v27)
    intercept[RuntimeException](PedsnetModel.forVersion("9.9.9"))
    // real schema diffs: 2.7 predates the linkage/geocode tables and
    // the measurement datetime refinement
    val old = PedsnetModel.v27.tables.keySet
    for (t <- Seq("location_fips", "location_history", "hash_token"))
      assert(!old.contains(t), t)
    assert(PedsnetModel.v33.table("measurement").columns
      .contains("measurement_datetime"))
    assert(!PedsnetModel.v27.table("measurement").columns
      .contains("measurement_datetime"))
  }
}

/** prepdb parity: the registry-rendered DDL must be executable Spark
  * SQL, and the created tables must round-trip the registry schema
  * exactly — the same metadata provisions, validates, and lays out.
  */
class DdlSpec extends SparkSpec {

  test("prepdb DDL executes and round-trips the registry schema") {
    val model = PedsnetModel.tpch
    val stmts = graft.operators.Ddl.prepSchemas(model, Seq("ddl_spec_site"))
    try {
      stmts.foreach(spark.sql(_))
      for (td <- model.tableSeq) {
        val created = spark.table(s"ddl_spec_site.${td.name}").schema
        assert(created.fieldNames.toSeq == td.schema.fieldNames.toSeq, td.name)
        assert(created.fields.map(_.dataType).toSeq ==
          td.schema.fields.map(_.dataType).toSeq, td.name)
      }
      // constraint metadata surfaces as comments for the DDL reader
      val lineitemDdl = graft.operators.Ddl.createTable(model.table("lineitem"))
      assert(lineitemDdl.contains("-- primary key (l_orderkey, l_linenumber)"))
      assert(lineitemDdl.contains("references orders(o_orderkey)"))
    } finally
      spark.sql("DROP DATABASE IF EXISTS ddl_spec_site CASCADE")
  }
}
