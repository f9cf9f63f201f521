package graft.transforms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PgAge

/** The reference's five stock transforms, re-expressed Spark-first. */

/** Age transform (J1 + F1): join `person` once and append
  * `<col>_age_in_months` for each configured datetime column
  * (/root/reference/pedsnetdcc/age_transform.py:90-147).
  */
final case class AgeTransform(columnsByTable: Map[String, Seq[String]])
    extends Transform {

  override def appliesTo(table: String): Boolean = columnsByTable.contains(table)

  def apply(ctx: TransformContext, table: String, df: DataFrame): DataFrame = {
    val cols = columnsByTable(table)
    val person = broadcast(
      ctx.lookup("person").select(col("person_id"), col("birth_datetime")))
    val joined = df.join(person, Seq("person_id"), "left")
    val widened = cols.foldLeft(joined) { (d, c) =>
      d.withColumn(
        s"${c.stripSuffix("_datetime")}_age_in_months",
        PgAge.months_in_interval(col("birth_datetime"), col(c)))
    }
    widened.drop("birth_datetime")
  }
}

/** Concept-name transform (J2): one broadcast left join per
  * `*_concept_id` column, appending `<prefix>_concept_name`
  * (/root/reference/pedsnetdcc/concept_name_transform.py:46-58; the
  * measurement table has 10 such columns). The concept dimension is
  * shared and cached by the caller; each join is a broadcast hash join so
  * the N-way chain stays in one stage.
  */
final case class ConceptNameTransform(conceptIdCols: String => Seq[String])
    extends Transform {

  def apply(ctx: TransformContext, table: String, df: DataFrame): DataFrame = {
    val concept = ctx.lookup("concept").select(col("concept_id"), col("concept_name"))
    conceptIdCols(table).foldLeft(df) { (d, c) =>
      val newName = c.stripSuffix("_concept_id") + "_concept_name"
      val alias = s"__c_$c"
      val dim = broadcast(
        concept.select(
          col("concept_id").alias(s"${alias}_id"),
          col("concept_name").alias(newName)))
      d.join(dim, d(c) === dim(s"${alias}_id"), "left").drop(s"${alias}_id")
    }
  }
}

/** Site-name transform (F6): append the site label as a literal column
  * (/root/reference/pedsnetdcc/site_name_transform.py:30-31).
  */
final case class SiteNameTransform() extends Transform {
  def apply(ctx: TransformContext, table: String, df: DataFrame): DataFrame =
    df.withColumn("site", lit(ctx.site).cast("string"))
}
