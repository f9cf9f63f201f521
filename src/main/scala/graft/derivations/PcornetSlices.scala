package graft.derivations

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PedsnetModel
import graft.operators.ModelSubset

/** PCORnet slice derivation packages — the reference ships three
  * sibling R-package runners that carve a cohort's whole-schema slice
  * out of the CDM: the age-banded peds slice
  * (/root/reference/pedsnetdcc/r_pcornet_peds_slice.py:17-60, already
  * covered by the `pcornet-slice` CLI), the covid slice
  * (r_pcornet_covid_slice.py:171-230) and the adult slice
  * (r_pcornet_adult_slice.py:65-124). Each differs ONLY in its cohort
  * selection; the slice mechanics (FK-driven whole-schema subset and
  * per-table materialization) are shared.
  *
  * Spark-native shape: each slice is a [[DerivationPackage]] whose
  * derive step builds its cohort and runs the registry-FK subset
  * ([[ModelSubset.subset]] — semi-joins down the FK chain, root cohort
  * broadcast); the result is the count report, one row per sliced
  * table (the reference logs the same counts after its
  * INSERT...SELECT chain).
  *
  * Over the driver's TPC-H test tables, `customer` plays person:
  *  - covid slice: an EVENT-marked cohort — customers with an
  *    URGENT-priority order in the outbreak window (the covid-test-in-
  *    window analogue);
  *  - adult slice: an AGE cohort — synthetic birth date on or before
  *    asOf − 21 years (PCORnet's adult threshold), using the same
  *    deterministic birth mapping as the peds `pcornet-slice` CLI.
  */
abstract class PcornetSlice extends DerivationPackage {

  /** The slice's person-root cohort (full root-table rows; derive
    * projects the registry PK).
    */
  protected def cohort(lookup: String => DataFrame): DataFrame

  override def requires: Seq[String] = Seq("customer", "orders", "lineitem")

  override def derive(
      spark: SparkSession, lookup: String => DataFrame): DataFrame = {
    val model = PedsnetModel.tpch
    val keys = cohort(lookup)
      .select(model.table("customer").pk.map(col): _*)
    ModelSubset.countReport(
      ModelSubset.subset(model, "customer", keys, lookup))
  }
}

object PcornetCovidSlice extends PcornetSlice {
  override def name: String = "pcornet_covid_slice"

  /** Epidemic-window marker: customers with an urgent order in
    * H1 1995 — a semi-join cohort, the covid-test-in-window shape.
    */
  override protected def cohort(lookup: String => DataFrame): DataFrame = {
    val marked = lookup("orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1995-01-01").cast("date") &&
        col("o_orderdate") < lit("1995-07-01").cast("date"))
      .select(col("o_custkey").as("c_custkey"))
      .dropDuplicates()
    lookup("customer").join(marked, Seq("c_custkey"), "left_semi")
  }
}

object PcornetAdultSlice extends PcornetSlice {
  override def name: String = "pcornet_adult_slice"

  /** Age ≥ 21 years at the fixed as-of date: synthetic birth
    * (1970-01-01 + custkey·97 mod 15000 days — the peds-slice CLI's
    * spread) on or before asOf − 252 months. The month arithmetic
    * lands on a driver-side constant, so no clamping edge cases reach
    * the data.
    */
  override protected def cohort(lookup: String => DataFrame): DataFrame = {
    val birth = date_add(lit("1970-01-01").cast("date"),
      (col("c_custkey") * 97 % 15000).cast("int"))
    lookup("customer")
      .filter(birth <= add_months(lit("1995-06-01").cast("date"), -252))
  }
}
