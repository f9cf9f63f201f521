package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort construction — the engine's twin of the reference's
  * cohort-definition passes, which build a one-column person table as a
  * UNION of per-domain selects
  * (/root/reference/pedsnetdcc/recover_cohort.py:13-120
  * `RECOVER_COHORT_SQL`: COVID lab tests from measurement, COVID/MIS-C/
  * PASC diagnoses from condition_occurrence, and respiratory diagnoses
  * join-constrained to post-2019 visits — three SELECT DISTINCT
  * branches UNIONed).
  *
  * Spark shape: each branch is an arbitrary pre-filtered DataFrame
  * (concept-set filters stay broadcast `isin`/semi-joins in the
  * caller's plan, join-constrained branches keep their join); the
  * union is plan-level, and the single dedup shuffle on the person
  * column replaces the reference's per-branch DISTINCT + UNION dedup —
  * one exchange instead of four.
  */
object Cohort {

  /** Union the person column of every branch and dedup once. */
  def build(branches: Seq[DataFrame], personCol: String = "person_id"): DataFrame =
    branches
      .map(_.select(col(personCol)))
      .reduce(_ unionByName _)
      .dropDuplicates(personCol)
}
