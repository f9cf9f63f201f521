package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Adjusted Rand Index between two partitions of the same id set —
  * the chance-corrected agreement score for CLUSTERINGS, as
  * [[graft.pipeline.Curation]]'s Cohen's kappa is for classifiers
  * (Hubert & Arabie 1985). In the curation pipeline it grades whether
  * two near-dup detectors (MinHash-Jaccard vs SimHash, text clusters
  * vs embedding cells, …) would make the SAME dedup decisions: ARI 1
  * = identical partitions, 0 = chance-level agreement, negative =
  * systematic disagreement.
  *
  * Arithmetic: all four pair-count sums (Σᵢⱼ C(nᵢⱼ,2), Σᵢ C(aᵢ,2),
  * Σⱼ C(bⱼ,2), C(n,2)) are exact int64 — `x·(x−1) div 2` per cell,
  * summed. The final ratio `num2/den2` (both ~n⁴/4) leaves int64 near
  * n ≈ 6·10⁴, so the two totals are divided ONCE in double (exact
  * inputs < 2⁵³, one IEEE division + one multiply — bit-identical in
  * any engine; no transcendental is involved) and floored to micro.
  *
  * Scale shape: one equi-join of the two label frames on the id, one
  * (ca, cb)-keyed contingency groupBy (map-side combined; the
  * contingency is at most min(|A|,|B|) clusters squared but in
  * practice near-diagonal), two marginal roll-ups, and a single-row
  * combine. At corpus scales beyond ~6·10⁴ ids run it over a
  * stratified sample — ARI over a uniform sample is the standard
  * estimator of the population ARI, and the int64 bound above is the
  * honest reason to sample rather than silently lose exactness.
  */
object RandIndex {

  // x·(x−1) is even and non-negative, so integer `div` is exact floor
  private def c2(x: Column): Column =
    call_function("div", x * (x - lit(1L)), lit(2L))

  /** `a`, `b`: (id, cluster) frames partitioning the SAME id set
    * (rows missing from either side are dropped by the inner join —
    * supply explicit singleton clusters for unclustered ids). Returns
    * one row: (n, sum_nij_c2, sum_a_c2, sum_b_c2, ari_micro).
    */
  def adjustedRand(a: DataFrame, idColA: String, clusterColA: String,
      b: DataFrame, idColB: String, clusterColB: String): DataFrame = {
    val j = a.select(col(idColA).as("id"), col(clusterColA).as("ca"))
      .join(b.select(col(idColB).as("id"), col(clusterColB).as("cb")),
        Seq("id"))
    val cells = j.groupBy("ca", "cb").agg(count(lit(1)).as("nij"))
    val sij = cells.agg(sum(c2(col("nij"))).as("sij"),
      sum(col("nij")).as("n"))
    val sa = cells.groupBy("ca").agg(sum(col("nij")).as("ai"))
      .agg(sum(c2(col("ai"))).as("sa"))
    val sb = cells.groupBy("cb").agg(sum(col("nij")).as("bj"))
      .agg(sum(c2(col("bj"))).as("sb"))
    sij.crossJoin(sa).crossJoin(sb)
      .withColumn("cn2", c2(col("n")))
      .withColumn("num2",
        lit(2L) * col("cn2") * col("sij") - lit(2L) * col("sa") * col("sb"))
      .withColumn("den2",
        col("cn2") * (col("sa") + col("sb"))
          - lit(2L) * col("sa") * col("sb"))
      .select(col("n"), col("sij").as("sum_nij_c2"), col("sa").as("sum_a_c2"),
        col("sb").as("sum_b_c2"),
        when(col("den2") === 0, lit(1000000L))
          .otherwise(floor(col("num2").cast("double")
            / col("den2").cast("double") * 1e6).cast("long"))
          .as("ari_micro"))
  }
}
