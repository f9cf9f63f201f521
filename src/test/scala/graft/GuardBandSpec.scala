package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.{Curation, Retrieval, TextFunctions => TF}

/** Guard-band audit of every floored transcendental the oracle
  * contract depends on.
  *
  * The engine floors libm-computed doubles (ln, exp, pow) to integer
  * micro before cross-row sums. Java's `Math.log/exp/pow` and DuckDB's
  * libm are each allowed ≤1 ulp of error and are NOT guaranteed to
  * agree; a pre-floor value within ~1e-10 of an integer could floor
  * differently in the two engines and flip a whole micro unit on one
  * side only. This suite measures, on the sf0.01 gate corpus, the
  * minimum distance of every produced pre-floor value from its nearest
  * floor boundary and asserts it exceeds EPS — turning "the values
  * happen to agree" into a checked margin. Exactly-integer values
  * (e.g. ln(1) = 0) are safe on both engines and excluded.
  *
  * Floors whose operands are driver-computed literals shared with the
  * generated oracle SQL (folded centroids, the p130 nDCG discount
  * table, the p128 HLL comparison chain) need no audit — both engines
  * replay identical constants by construction.
  */
class GuardBandSpec extends SparkSpec {
  import spark.implicits._

  /** Micro-space guard band: 1 ulp of libm drift at these magnitudes
    * is ~1e-10, so a 1e-9 margin means no single-ulp disagreement can
    * cross a boundary.
    */
  private val EPS = 1e-9

  private def minBoundaryDist(df: DataFrame, y: Column): Double =
    df.select(y.as("y"))
      .filter(col("y") =!= floor(col("y"))) // exact integers are safe
      .select(least(col("y") - floor(col("y")),
        ceil(col("y")) - col("y")).as("d"))
      .agg(coalesce(min(col("d")), lit(1.0)))
      .as[Double].head()

  private def distScalar(y: Double): Double = {
    val f = y - math.floor(y)
    if (f == 0.0) 1.0 else math.min(f, 1.0 - f)
  }

  test("bm25 and ql log floors sit far from their boundaries") {
    val docs = Tables.read(spark, sf001, "documents")
    val queries = docs.filter(col("doc_id") % 40 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(TF.tokens(col("text")), 1, 4)).as("qtext"))
    val idx = Retrieval.bm25Index(docs, "doc_id", "text")
    val qT = Retrieval.queryTerms(queries, "query_id", "qtext")
    val hits = idx.postings
      .join(qT.select("tok").distinct(), Seq("tok"))
    val dfc = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    val cand = hits.join(dfc, Seq("tok"))
      .join(idx.doclen, Seq("doc_id")).crossJoin(idx.stats)
    val dBm = minBoundaryDist(cand,
      Retrieval.contribDouble(Retrieval.Bm25Params()))
    assert(dBm > EPS, s"bm25 contrib within $dBm of a floor boundary")

    val cf = hits.groupBy("tok").agg(sum(col("tf")).as("cf"))
    val fd = Retrieval.qlFloorDoubles(100.0)
    val dAq = minBoundaryDist(
      qT.join(cf, Seq("tok")).crossJoin(idx.stats), fd("aq_term"))
    assert(dAq > EPS, s"ql aq_term within $dAq of a floor boundary")
    val dDelta = minBoundaryDist(
      hits.join(cf, Seq("tok")).crossJoin(idx.stats), fd("delta"))
    assert(dDelta > EPS, s"ql delta within $dDelta of a floor boundary")
    val dLen = minBoundaryDist(idx.doclen, fd("len"))
    assert(dLen > EPS, s"ql len within $dLen of a floor boundary")
  }

  test("domain-mix exp floors sit far from their boundaries") {
    val docs = Tables.read(spark, sf001, "documents")
    // same operation order as domainMixWeightsPlan's w_int, replayed
    // on the driver (same JVM libm) from the plan's own outputs
    val rows = Curation.domainMixWeights(docs, "doc_id", "text",
        "source", vocabSize = 500)
      .select(col("n_tokens"), col("excess_micro"))
      .as[(Long, Long)].collect()
    val ntot = rows.map(_._1).sum
    val dmin = rows.map { case (nt, ex) =>
      distScalar((nt / ntot.toDouble) * math.exp(ex / 1e6) * 1e6)
    }.min
    assert(dmin > EPS, s"domain-mix w_int within $dmin of a boundary")
  }

  test("LR sigmoid floors sit far from their boundaries, every round") {
    val docs = Tables.read(spark, sf001, "documents")
    val buckets = 64
    val labeled = Curation.funnelLabels(docs, "doc_id", "text",
        profile = Curation.GateProfile.wordSalad)
      .select(col("doc_id"), col("cls"),
        explode(array_distinct(transform(TF.tokens(col("text")),
          t => TF.hash60(t) % buckets))).as("bucket"))
      .localCheckpoint()
    // replicate the lrWeights trajectory, measuring each round's
    // sigmoid boundary distance; the final weights are asserted equal
    // to lrWeights' own, so this replica can never silently drift
    // from the production loop
    val iters = 12
    val lab = labeled.groupBy(col("doc_id")).agg(max(col("cls")).as("cls"))
    val feats = labeled.select(col("doc_id"), col("bucket"))
    val m = lab.agg((count(lit(1)) * 1).as("m"))
    var resid = lab.select(col("doc_id"),
      (lit(500000L) - col("cls") * lit(1000000L)).as("r"))
    var w = Map.empty[Long, Long]
    var dmin = 1.0
    for (t <- 1 to iters) {
      val grad = feats.join(resid, Seq("doc_id"))
        .groupBy(col("bucket")).agg(sum(col("r")).as("g"))
      val delta = grad.crossJoin(broadcast(m))
        .select(col("bucket"),
          (-call_function("div",
            col("g") - pmod(col("g"), col("m")), col("m"))).as("d"))
        .as[(Long, Long)].collect()
      w = delta.foldLeft(w) { case (acc, (b, d)) =>
        acc + (b -> (acc.getOrElse(b, 0L) + d))
      }
      if (t < iters) {
        val wDf = w.toSeq.sortBy(_._1).toDF("bucket", "w")
        val z = feats.join(broadcast(wDf), Seq("bucket"))
          .groupBy(col("doc_id")).agg(sum(col("w")).as("z"))
        val sigma = lit(1.0) /
          (lit(1.0) + exp(-(col("z").cast("double") / lit(1e6))))
        val zl = lab.join(z, Seq("doc_id"))
        // audit the EXACT floored expression (σ − cls)·10⁶ — its
        // rounding differs from σ·10⁶ on the cls = 1 rows
        dmin = math.min(dmin, minBoundaryDist(zl,
          (sigma - col("cls").cast("double")) * 1e6))
        resid = zl.select(col("doc_id"),
          floor((sigma - col("cls").cast("double")) * 1e6)
            .cast("long").as("r"))
      }
    }
    assert(dmin > EPS, s"LR sigmoid within $dmin of a floor boundary")
    val prod = Curation.lrWeights(labeled, "doc_id", iters, lrDen = 1)
    assert(w.toSeq.sortBy(_._1) == prod,
      "audit replica diverged from the production LR trajectory")

    // calibration-report sigmoid centers over the produced buckets
    val zs = Curation.logisticRegression(docs, "doc_id", "text",
        buckets, iters, lrDen = 1,
        profile = Curation.GateProfile.wordSalad)
      .select(col("z_micro")).as[Long].collect()
    val dCal = zs.map { z =>
      val bucket = z - (((z % 400000) + 400000) % 400000)
      distScalar(1e6 / (1.0 + math.exp(-((bucket + 200000) / 1e6))))
    }.min
    assert(dCal > EPS, s"calibration sigmoid within $dCal of a boundary")
  }

  test("banding-theory pow floors sit far from their boundaries") {
    // the p108 theory curve: (1 − (1 − (t/100)²)⁶) · 10⁶ at the five
    // swept thresholds — a data-independent constant set
    val dmin = Seq(30, 40, 50, 60, 70).map { t =>
      distScalar((1.0 - math.pow(
        1.0 - math.pow(t / 100.0, 2.0), 6.0)) * 1e6)
    }.min
    assert(dmin > EPS, s"banding theory floor within $dmin of a boundary")
  }
}
