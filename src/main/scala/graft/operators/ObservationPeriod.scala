package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** observation_period synchronization (A1/U2/W2).
  *
  * Parity: /root/reference/pedsnetdcc/sync_observation_period.py:8-78 —
  * per fact domain, take per-person MIN/MAX of `coalesce(datetime,
  * date)`; UNION ALL the 7 domains; reduce to one global (min, max) per
  * person; renumber ids.
  *
  * Spark shape: each branch is a partial-aggregated groupBy (map-side
  * combine), the union is plan-level, and the final groupBy re-uses the
  * same person_id hash partitioning. The id is assigned with the
  * two-phase AssignIds (no single-partition window).
  */
object ObservationPeriod {

  /** @param domains (df, dateExpr) pairs — dateExpr is typically
    *                `coalesce(col(dt), col(d))`
    */
  def sync(domains: Seq[(DataFrame, Column)], personCol: String = "person_id"): DataFrame = {
    val perDomain = domains.map { case (df, dateExpr) =>
      df.groupBy(col(personCol))
        .agg(min(dateExpr).as("start_date"), max(dateExpr).as("end_date"))
    }
    val unioned = perDomain.reduce(_ unionByName _)
    val perPerson = unioned
      .groupBy(col(personCol))
      .agg(
        min(col("start_date")).as("observation_period_start_date"),
        max(col("end_date")).as("observation_period_end_date"))
    AssignIds.assign(perPerson, Seq(personCol), "observation_period_id")
  }

  /** The reference's full sync shape, with DISTINCT start/end
    * expressions per domain (sync_observation_period.py:8-82): each
    * domain contributes per-person `(min(start), max(end))`; a domain
    * whose max is NULL (every end expression NULL for that person) is
    * filled with its own min (`fill_null_maxes_sql`, :57-60); the final
    * per-person reduction takes `min` of mins and
    * `coalesce(max(max), max(min))` (`fill_obs_period_sql`, :68-80)
    * and stamps the period type concept + renumbered ids.
    *
    * Scale shape: identical to [[sync]] — per-domain partial-aggregated
    * groupBys, plan-level union, one re-used person_id shuffle, and the
    * two-phase [[AssignIds]] numbering (no single-partition window).
    */
  def syncRanges(
      domains: Seq[(DataFrame, Column, Column)],
      periodTypeConceptId: Long = 44814724L,
      personCol: String = "person_id"): DataFrame = {
    val perDomain = domains.map { case (df, startExpr, endExpr) =>
      df.groupBy(col(personCol))
        .agg(min(startExpr).as("min_dt"), max(endExpr).as("max_dt"))
        .withColumn("max_dt", coalesce(col("max_dt"), col("min_dt")))
    }
    val unioned = perDomain.reduce(_ unionByName _)
    val perPerson = unioned
      .groupBy(col(personCol))
      .agg(
        min(col("min_dt")).as("observation_period_start_date"),
        coalesce(max(col("max_dt")), max(col("min_dt")))
          .as("observation_period_end_date"))
      .withColumn("period_type_concept_id", lit(periodTypeConceptId))
    AssignIds.assign(perPerson, Seq(personCol), "observation_period_id")
  }
}
