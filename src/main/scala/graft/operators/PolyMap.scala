package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Polymorphic conditional join (J4): a fact column whose target table
  * depends on a domain code, as in the reference's `fact_relationship`
  * id-mapping — per domain an aliased outer join on
  * `(fact_id = key AND domain = code)`, then a CASE over the domain
  * picks the mapped value; unmatched domains stay NULL
  * (/root/reference/pedsnetdcc/id_mapping_transform.py:296-363).
  *
  * Scale: each domain's lookup is a broadcast left join (dimension
  * tables are small); N domains chain into one stage of broadcast hash
  * joins, so the fact table is read and shuffled zero times.
  */
object PolyMap {

  /** One domain's lookup spec: domain code value, lookup table, its key
    * column, and the value column to surface.
    */
  final case class Domain(code: String, lookup: DataFrame, keyCol: String, valueCol: String)

  /** Append `outCol` = the value from the domain-selected lookup table
    * keyed by `factIdCol`, NULL when the domain has no mapping or the
    * key is absent (exactly the reference's CASE-over-outer-joins
    * shape).
    */
  def map(facts: DataFrame, domainCol: String, factIdCol: String,
      domains: Seq[Domain], outCol: String): DataFrame = {
    val joined = domains.zipWithIndex.foldLeft(facts) { case (df, (d, i)) =>
      val dim = broadcast(d.lookup.select(
        col(d.keyCol).alias(s"__pk_$i"),
        col(d.valueCol).alias(s"__pv_$i")))
      df.join(dim,
        df(factIdCol) === dim(s"__pk_$i") && df(domainCol) === lit(d.code),
        "left")
    }
    val caseExpr: Column = domains.zipWithIndex.foldRight(lit(null).cast("string")) {
      case ((d, i), rest) =>
        when(col(domainCol) === d.code, col(s"__pv_$i")).otherwise(rest)
    }
    domains.indices.foldLeft(joined.withColumn(outCol, caseExpr)) { (df, i) =>
      df.drop(s"__pk_$i").drop(s"__pv_$i")
    }
  }
}
