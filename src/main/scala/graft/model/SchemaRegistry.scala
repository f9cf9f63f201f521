package graft.model

import org.apache.spark.sql.types._

/** Versioned schema registry — the engine's twin of the reference's
  * `stock_metadata(model_version)` (/root/reference/pedsnetdcc/
  * utils.py:281-291), which resolves a SQLAlchemy MetaData per model
  * version and feeds every constraint pass:
  *
  *  - primary keys   (primary_keys.py:19-40)
  *  - foreign keys   (foreign_keys.py:18-44)
  *  - not-null cols  (not_nulls.py:15-36, excluding PK columns)
  *
  * Here the registry is plain data (no service call, no SQLAlchemy):
  * a [[Model]] holds one [[TableDef]] per table with its Spark
  * `StructType`, PK, FKs, NOT NULL columns, and physical layout hints
  * (bucketing/partitioning — the Spark analogue of the reference's
  * index DDL). Consumers ([[graft.operators.Checks]],
  * [[graft.transforms.TransformRunner]]) take a Model instead of
  * hand-passed column lists.
  */
final case class ForeignKey(cols: Seq[String], refTable: String, refCols: Seq[String])

/** Physical layout hint: how the table should be written at scale.
  * Bucketing by the join key co-locates fact↔map joins; date
  * partitioning prunes time-range scans (the Spark analogue of the
  * reference's btree indexes, indexes.py).
  *
  * `yearOf` makes derived partition columns self-describing: a
  * `partitionBy` entry named here is computed as `year(<source date
  * column>)` by [[graft.operators.Layout.write]], so callers hand the
  * writer the CDM table as-is instead of pre-deriving
  * `visit_start_year`-style columns (the reference's
  * partition_measurement.py derives the routing value inside its
  * trigger for the same reason).
  */
final case class LayoutHint(
    bucketBy: Seq[String] = Nil,
    numBuckets: Int = 0,
    partitionBy: Seq[String] = Nil,
    yearOf: Map[String, String] = Map.empty)

final case class TableDef(
    name: String,
    schema: StructType,
    pk: Seq[String] = Nil,
    fks: Seq[ForeignKey] = Nil,
    notNull: Seq[String] = Nil,
    layout: Option[LayoutHint] = None) {
  def columns: Seq[String] = schema.fieldNames.toSeq

  /** NOT NULL columns excluding the PK — the reference's rule
    * (not_nulls.py:33-35: `if not column.nullable and not
    * column.primary_key`).
    */
  def notNullNonPk: Seq[String] = notNull.filterNot(pk.contains)
}

final case class Model(name: String, version: String, tableSeq: Seq[TableDef]) {
  val tables: Map[String, TableDef] = tableSeq.map(t => t.name -> t).toMap

  def table(n: String): TableDef =
    tables.getOrElse(n, sys.error(s"model $name/$version has no table '$n'"))

  /** All PK constraints, keyed by table (primary_keys.py:34-38). */
  def primaryKeys: Map[String, Seq[String]] =
    tableSeq.filter(_.pk.nonEmpty).map(t => t.name -> t.pk).toMap

  /** All FK constraints, keyed by child table (foreign_keys.py:29-43). */
  def foreignKeys: Map[String, Seq[ForeignKey]] =
    tableSeq.filter(_.fks.nonEmpty).map(t => t.name -> t.fks).toMap

  /** Non-PK NOT NULL columns, keyed by table (not_nulls.py:27-36). */
  def notNulls: Map[String, Seq[String]] =
    tableSeq.map(t => t.name -> t.notNullNonPk).filter(_._2.nonEmpty).toMap
}

object PedsnetModel {

  private def field(n: String, t: DataType) = StructField(n, t, nullable = true)
  private def tbl(cols: (String, DataType)*): StructType =
    StructType(cols.map { case (n, t) => field(n, t) })

  private val L = LongType
  private val S = StringType
  private val D = DateType
  private val TS = TimestampType
  private val F = DoubleType

  /** PEDSnet/OMOP CDM core tables (a representative subset of the
    * model the reference resolves per version — table/column shapes
    * are the public OMOP CDM). PKs, FKs and NOT NULLs follow the
    * published CDM DDL; layout hints encode the scale decisions: facts
    * bucket by person_id (co-locates the person join and the id-map
    * join), time-heavy facts partition by year.
    */
  val v33: Model = Model("pedsnet", "3.3.0", Seq(
    TableDef("person",
      tbl("person_id" -> L, "gender_concept_id" -> L, "year_of_birth" -> L,
        "month_of_birth" -> L, "day_of_birth" -> L, "birth_datetime" -> TS,
        "race_concept_id" -> L, "ethnicity_concept_id" -> L,
        "location_id" -> L, "provider_id" -> L, "care_site_id" -> L,
        "person_source_value" -> S, "site" -> S),
      pk = Seq("person_id"),
      fks = Seq(
        ForeignKey(Seq("location_id"), "location", Seq("location_id")),
        ForeignKey(Seq("care_site_id"), "care_site", Seq("care_site_id")),
        ForeignKey(Seq("provider_id"), "provider", Seq("provider_id"))),
      notNull = Seq("person_id", "gender_concept_id", "year_of_birth",
        "race_concept_id", "ethnicity_concept_id"),
      layout = Some(LayoutHint(bucketBy = Seq("person_id"), numBuckets = 256))),
    TableDef("observation_period",
      tbl("observation_period_id" -> L, "person_id" -> L,
        "observation_period_start_date" -> D,
        "observation_period_end_date" -> D,
        "period_type_concept_id" -> L, "site" -> S),
      pk = Seq("observation_period_id"),
      fks = Seq(ForeignKey(Seq("person_id"), "person", Seq("person_id"))),
      notNull = Seq("observation_period_id", "person_id",
        "observation_period_start_date", "observation_period_end_date",
        "period_type_concept_id"),
      layout = Some(LayoutHint(bucketBy = Seq("person_id"), numBuckets = 256))),
    TableDef("visit_occurrence",
      tbl("visit_occurrence_id" -> L, "person_id" -> L,
        "visit_concept_id" -> L, "visit_start_date" -> D,
        "visit_start_datetime" -> TS, "visit_end_date" -> D,
        "visit_end_datetime" -> TS, "visit_type_concept_id" -> L,
        "provider_id" -> L, "care_site_id" -> L, "site" -> S),
      pk = Seq("visit_occurrence_id"),
      fks = Seq(
        ForeignKey(Seq("person_id"), "person", Seq("person_id")),
        ForeignKey(Seq("provider_id"), "provider", Seq("provider_id")),
        ForeignKey(Seq("care_site_id"), "care_site", Seq("care_site_id"))),
      notNull = Seq("visit_occurrence_id", "person_id", "visit_concept_id",
        "visit_start_date", "visit_type_concept_id"),
      layout = Some(LayoutHint(bucketBy = Seq("person_id"), numBuckets = 256,
        partitionBy = Seq("visit_start_year"),
        yearOf = Map("visit_start_year" -> "visit_start_date")))),
    TableDef("condition_occurrence",
      tbl("condition_occurrence_id" -> L, "person_id" -> L,
        "condition_concept_id" -> L, "condition_start_date" -> D,
        "condition_end_date" -> D, "condition_type_concept_id" -> L,
        "provider_id" -> L, "visit_occurrence_id" -> L, "site" -> S),
      pk = Seq("condition_occurrence_id"),
      fks = Seq(
        ForeignKey(Seq("person_id"), "person", Seq("person_id")),
        ForeignKey(Seq("visit_occurrence_id"), "visit_occurrence",
          Seq("visit_occurrence_id"))),
      notNull = Seq("condition_occurrence_id", "person_id",
        "condition_concept_id", "condition_start_date",
        "condition_type_concept_id"),
      layout = Some(LayoutHint(bucketBy = Seq("person_id"), numBuckets = 256))),
    TableDef("drug_exposure",
      tbl("drug_exposure_id" -> L, "person_id" -> L, "drug_concept_id" -> L,
        "drug_exposure_start_date" -> D, "drug_exposure_end_date" -> D,
        "days_supply" -> L, "drug_type_concept_id" -> L,
        "provider_id" -> L, "visit_occurrence_id" -> L, "site" -> S),
      pk = Seq("drug_exposure_id"),
      fks = Seq(
        ForeignKey(Seq("person_id"), "person", Seq("person_id")),
        ForeignKey(Seq("visit_occurrence_id"), "visit_occurrence",
          Seq("visit_occurrence_id"))),
      notNull = Seq("drug_exposure_id", "person_id", "drug_concept_id",
        "drug_exposure_start_date", "drug_type_concept_id"),
      layout = Some(LayoutHint(bucketBy = Seq("person_id"), numBuckets = 256))),
    TableDef("measurement",
      tbl("measurement_id" -> L, "person_id" -> L, "measurement_concept_id" -> L,
        "measurement_date" -> D, "measurement_datetime" -> TS,
        "measurement_type_concept_id" -> L, "value_as_number" -> F,
        "value_as_concept_id" -> L, "unit_concept_id" -> L,
        "provider_id" -> L, "visit_occurrence_id" -> L, "site" -> S),
      pk = Seq("measurement_id"),
      fks = Seq(
        ForeignKey(Seq("person_id"), "person", Seq("person_id")),
        ForeignKey(Seq("visit_occurrence_id"), "visit_occurrence",
          Seq("visit_occurrence_id"))),
      notNull = Seq("measurement_id", "person_id", "measurement_concept_id",
        "measurement_date", "measurement_type_concept_id"),
      layout = Some(LayoutHint(bucketBy = Seq("person_id"), numBuckets = 256,
        partitionBy = Seq("measurement_year"),
        yearOf = Map("measurement_year" -> "measurement_date")))),
    TableDef("observation",
      tbl("observation_id" -> L, "person_id" -> L, "observation_concept_id" -> L,
        "observation_date" -> D, "observation_type_concept_id" -> L,
        "value_as_number" -> F, "value_as_string" -> S,
        "provider_id" -> L, "visit_occurrence_id" -> L, "site" -> S),
      pk = Seq("observation_id"),
      fks = Seq(
        ForeignKey(Seq("person_id"), "person", Seq("person_id")),
        ForeignKey(Seq("visit_occurrence_id"), "visit_occurrence",
          Seq("visit_occurrence_id"))),
      notNull = Seq("observation_id", "person_id", "observation_concept_id",
        "observation_date", "observation_type_concept_id"),
      layout = Some(LayoutHint(bucketBy = Seq("person_id"), numBuckets = 256))),
    TableDef("fact_relationship",
      tbl("domain_concept_id_1" -> L, "fact_id_1" -> L,
        "domain_concept_id_2" -> L, "fact_id_2" -> L,
        "relationship_concept_id" -> L, "site" -> S),
      notNull = Seq("domain_concept_id_1", "fact_id_1",
        "domain_concept_id_2", "fact_id_2", "relationship_concept_id")),
    TableDef("location",
      tbl("location_id" -> L, "city" -> S, "state" -> S, "zip" -> S,
        "site" -> S),
      pk = Seq("location_id"),
      notNull = Seq("location_id")),
    TableDef("care_site",
      tbl("care_site_id" -> L, "care_site_name" -> S,
        "place_of_service_concept_id" -> L, "location_id" -> L, "site" -> S),
      pk = Seq("care_site_id"),
      fks = Seq(ForeignKey(Seq("location_id"), "location", Seq("location_id"))),
      notNull = Seq("care_site_id")),
    TableDef("provider",
      tbl("provider_id" -> L, "provider_name" -> S, "npi" -> S,
        "care_site_id" -> L, "site" -> S),
      pk = Seq("provider_id"),
      fks = Seq(ForeignKey(Seq("care_site_id"), "care_site", Seq("care_site_id"))),
      notNull = Seq("provider_id"))))

  /** Registry for the driver's TPC-H-ish test tables (column sets
    * match the generated parquet exactly) — the same metadata
    * machinery exercised over data an oracle can check.
    */
  val tpch: Model = Model("tpch", "1.0", Seq(
    TableDef("region",
      tbl("r_regionkey" -> L, "r_name" -> S),
      pk = Seq("r_regionkey"),
      notNull = Seq("r_regionkey", "r_name")),
    TableDef("nation",
      tbl("n_nationkey" -> L, "n_name" -> S, "n_regionkey" -> L),
      pk = Seq("n_nationkey"),
      fks = Seq(ForeignKey(Seq("n_regionkey"), "region", Seq("r_regionkey"))),
      notNull = Seq("n_nationkey", "n_name", "n_regionkey")),
    TableDef("customer",
      tbl("c_custkey" -> L, "c_name" -> S, "c_nationkey" -> L,
        "c_acctbal" -> F, "c_mktsegment" -> S),
      pk = Seq("c_custkey"),
      fks = Seq(ForeignKey(Seq("c_nationkey"), "nation", Seq("n_nationkey"))),
      notNull = Seq("c_custkey", "c_name", "c_nationkey"),
      layout = Some(LayoutHint(bucketBy = Seq("c_custkey"), numBuckets = 64))),
    TableDef("supplier",
      tbl("s_suppkey" -> L, "s_name" -> S, "s_nationkey" -> L,
        "s_acctbal" -> F),
      pk = Seq("s_suppkey"),
      fks = Seq(ForeignKey(Seq("s_nationkey"), "nation", Seq("n_nationkey"))),
      notNull = Seq("s_suppkey", "s_name", "s_nationkey")),
    TableDef("part",
      tbl("p_partkey" -> L, "p_name" -> S, "p_brand" -> S, "p_type" -> S,
        "p_size" -> L, "p_retailprice" -> F),
      pk = Seq("p_partkey"),
      notNull = Seq("p_partkey", "p_name")),
    TableDef("orders",
      tbl("o_orderkey" -> L, "o_custkey" -> L, "o_orderstatus" -> S,
        "o_totalprice" -> F, "o_orderdate" -> D, "o_orderpriority" -> S),
      pk = Seq("o_orderkey"),
      fks = Seq(ForeignKey(Seq("o_custkey"), "customer", Seq("c_custkey"))),
      notNull = Seq("o_orderkey", "o_custkey", "o_orderdate"),
      layout = Some(LayoutHint(bucketBy = Seq("o_custkey"), numBuckets = 64))),
    TableDef("lineitem",
      tbl("l_orderkey" -> L, "l_partkey" -> L, "l_suppkey" -> L,
        "l_linenumber" -> L, "l_quantity" -> F, "l_extendedprice" -> F,
        "l_discount" -> F, "l_tax" -> F, "l_returnflag" -> S,
        "l_linestatus" -> S, "l_shipdate" -> D),
      pk = Seq("l_orderkey", "l_linenumber"),
      fks = Seq(
        ForeignKey(Seq("l_orderkey"), "orders", Seq("o_orderkey")),
        ForeignKey(Seq("l_partkey"), "part", Seq("p_partkey")),
        ForeignKey(Seq("l_suppkey"), "supplier", Seq("s_suppkey"))),
      notNull = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
      layout = Some(LayoutHint(bucketBy = Seq("l_orderkey"), numBuckets = 64)))))
}
