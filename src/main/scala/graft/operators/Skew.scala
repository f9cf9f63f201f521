package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual lever when AQE's
  * runtime skew-join splitting (enabled in GraftSession) isn't enough:
  * hot keys (the reference's "hot persons" in clinical data — some
  * patients have 1000× the facts) serialize a whole shuffle partition
  * at 100 TB.
  *
  * ==Why the hot production joins do NOT route through this==
  *
  * The person-keyed production paths (the id-map join
  * [[IdMapping.replaceId]], era input prep, the as-of pairing) rely
  * on AQE instead, deliberately:
  *
  *  - AQE's skew-join splitting handles sort-merge/shuffled-hash JOIN
  *    skew at runtime with no plan-time knowledge of which keys are
  *    hot — [[graft.SkewSpec]] pins this with a planted hot person in
  *    the exact `replaceId` join shape (the executed plan carries
  *    `skew=true`). A hand-salted join, by contrast, pays the salt
  *    fan-out on EVERY run, hot keys or not, and bakes a guessed
  *    factor into the plan.
  *  - count/sum/min/max AGGREGATION skew is already flattened by
  *    partial aggregation (map-side combine): the reduce side sees at
  *    most one row per (key, map partition), so a hot group key
  *    cannot serialize a reducer. [[saltedCountSum]] only wins for
  *    non-combining aggregates (collect_list-class), which the
  *    production paths avoid on person keys.
  *  - WINDOW partitions (era gaps-and-islands) are not salvageable by
  *    salting at all — the semantics need every row of the person in
  *    one place; the bound there is per-person fact count, documented
  *    at the operator.
  *
  * This object is the documented escape hatch for the remaining
  * cases: non-combining aggregations over hot keys, and environments
  * running with AQE disabled.
  *
  * Pattern: append a salt in [0, factor) to the BIG side's key
  * (spreading one hot key over `factor` partitions) and replicate the
  * SMALL side once per salt value, so the equi-join still matches every
  * pair. Aggregations salt → partial-aggregate → unsalt → final
  * aggregate (two-stage combine).
  */
object Skew {

  /** Deterministic salt derived from the whole row's first column via
    * a cheap non-cryptographic hash (salting only needs dispersion,
    * not portability — it never reaches results).
    */
  private def salt(factor: Int, anyCol: Column): Column =
    pmod(hash(anyCol), lit(factor))

  /** Equi-join `big` to `small` on `keys`, salting the big side
    * `factor` ways and replicating the small side per salt. Result
    * equals `big.join(small, keys, joinType)` for "inner" and "left".
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      "salted join supports inner/left")
    val saltCol = "__salt"
    val nonKey = big.columns.filterNot(keys.contains).headOption
      .getOrElse(keys.head)
    val b = big.withColumn(saltCol, salt(factor, col(nonKey)))
    val s = small.withColumn(saltCol,
      explode(array((0 until factor).map(lit): _*)))
    b.join(s, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Salted two-stage aggregation: count + sum per key with the heavy
    * combine spread over `factor` sub-keys before the final reduce.
    * (General aggregations follow the same shape with their own
    * partial/final pairs.)
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      factor: Int): DataFrame = {
    val saltCol = "__salt"
    val partial = df
      .withColumn(saltCol, salt(factor, col(valueCol)))
      .groupBy((keys.map(col) :+ col(saltCol)): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$valueCol"))
  }
}
