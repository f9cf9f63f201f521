package graft.derivations

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plugin surface for derivation packages — the engine's twin of the
  * reference's externally-packaged derivations, which it drives
  * through a generic runner: `run_r_query` shells out to an R package
  * with pre/derive/post phases around it
  * (/root/reference/pedsnetdcc/r_query.py:17-128), and the per-
  * derivation modules (r_drug_era.py:22-113, lab_loinc.py:81-172) are
  * thin parameterizations of that runner.
  *
  * Spark-native shape: a package declares the tables it reads and
  * produces its result as a DataFrame plan; `pre` normalizes inputs
  * and `post` decorates outputs (ids, concept names, site columns) —
  * both default to identity so simple packages override only
  * [[derive]]. Everything stays a lazy plan, so a package composes
  * with the transform pipeline and writes through the same atomic
  * sinks as any other operator.
  */
trait DerivationPackage {

  /** Package name (the reference's R package / CLI subcommand name). */
  def name: String

  /** Tables the package reads, resolved through the runner's lookup. */
  def requires: Seq[String]

  /** Input normalization applied to each required table before
    * [[derive]] sees it (the reference's pre-derivation SQL steps).
    */
  def pre(table: String, df: DataFrame): DataFrame = df

  /** The derivation itself: lookup resolves a required table to its
    * (pre-normalized) DataFrame.
    */
  def derive(spark: SparkSession, lookup: String => DataFrame): DataFrame

  /** Output decoration (the reference's post steps: id assignment,
    * concept-name fill, site column — r_query.py:96-128).
    */
  def post(df: DataFrame): DataFrame = df

  /** Run pre → derive → post. */
  final def run(spark: SparkSession, lookup: String => DataFrame): DataFrame =
    post(derive(spark, table => pre(table, lookup(table))))
}

object Derivations {

  /** Run a set of packages against one table resolver, returning each
    * package's result by name (the reference's `run_derivations`
    * subcommand shape).
    */
  def runAll(
      spark: SparkSession,
      packages: Seq[DerivationPackage],
      lookup: String => DataFrame): Map[String, DataFrame] =
    packages.map(p => p.name -> p.run(spark, lookup)).toMap
}
