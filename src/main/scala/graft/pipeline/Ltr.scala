package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learning-to-rank head — the trained CONSUMER that closes the
  * retrieval-pipeline loop: the stack mines planted positives
  * (query_id = source doc) and BM25 hard negatives (p161's recipe:
  * the top-ranked lexical matches that are NOT the source), and this
  * head trains a pointwise logistic combination of the engine's own
  * ranking features — BM25 score, term proximity, exact-phrase
  * containment — then re-ranks with the learned weights (Joachims
  * 2002 / the RankNet family's pointwise baseline, Burges et al.
  * 2005). The p173 card scores base vs trained on the p130
  * MRR/nDCG scorecard: proof the pipeline's artifacts actually train
  * something that moves the eval harness.
  *
  * Determinism (the oracle contract): features are exact integer
  * micro; training follows the p117 discipline — margins are sums of
  * floor-divided int64 products, the sigmoid is the ONLY double (one
  * fixed op order, floored to micro per row — GuardBandSpec audits
  * the boundaries), gradients are per-row-floored int64 sums, and
  * weight updates use exact floor division (`Math.floorDiv` on the
  * driver ≡ the `(g − ((g mod m) + m) mod m) div m` dance in SQL).
  * Any engine replays the trajectory weight for weight.
  *
  * Scale shape: the feature frame is |Q|·k rows (|Q| is the absolute
  * planted budget, so CONSTANT in corpus size); each GD iteration is
  * one partially-aggregated pass over that cached frame collecting
  * FOUR int64 sums — training cost does not grow with the corpus at
  * all. Feature extraction rides the shared candidate semi-joins of
  * the p131/p134 rerankers.
  */
object Ltr {

  /** Fixed feature scale divisors: BM25 micro scores sit ~10× above
    * the other micro features, so x1 = bm25 div 10 brings all three
    * onto one scale (documented constants, replayed by the oracle).
    */
  private val Bm25Div = 10L

  /** One row per (query, BM25 top-k candidate): integer-micro
    * features `x1` (bm25 div 10), `x2` (proximity boost), `x3`
    * (phrase containment · 10⁶), the planted label `y`
    * (query_id = doc_id — every other candidate is a p161-style hard
    * negative by construction), and the base BM25 `rank`.
    */
  def rankFeatures(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int): DataFrame = {
    val base = Retrieval.bm25TopK(docs, idCol, textCol, queries,
      qidCol, qtextCol, k)
    val cand = base.select(col("query_id"), col("doc_id"),
      col("rank"), col("score_micro"))
    val qT = Retrieval.queryTerms(queries, qidCol, qtextCol)
    val prox = Retrieval.proximityFeature(docs, idCol, textCol, cand, qT)
    val phrase = Retrieval.phraseFeature(docs, idCol, textCol, cand,
      queries, qidCol, qtextCol)
    cand
      .join(prox, Seq("query_id", "doc_id"), "left")
      .join(phrase, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("score_micro"),
        call_function("div", col("score_micro"), lit(Bm25Div)).as("x1"),
        when(col("min_pair_dist").isNull, lit(0L))
          .otherwise(expr("1000000 div (min_pair_dist + 4)")).as("x2"),
        (coalesce(col("phrase_hit"), lit(0L)) * lit(1000000L)).as("x3"),
        when(col("query_id") === col("doc_id"), 1L).otherwise(0L)
          .as("y"))
  }

  /** Full-batch pointwise-logistic GD over a (cached) feature frame:
    * `iters` rounds, update `w ← w − floorDiv(g·lrNum, n)` (unit
    * learning rate · lrNum/n), bias included and unclamped. Weights
    * and bias are int64 micro, initialized at zero (σ(0) = ½). Eager
    * by design: each round collects four int64 sums — the
    * [[Curation.lrWeights]] driver-held-state discipline, never an
    * iteratively-deepening lazy plan.
    */
  def ltrWeights(feats: DataFrame, iters: Int,
      lrNum: Long): (Long, Long, Long, Long) =
    ltrTrajectory(feats, iters, lrNum).last

  /** Margin expression at a given weight state — exposed so
    * GuardBandSpec can audit every round's sigmoid floor boundaries
    * against exactly the expressions training evaluates.
    */
  private[graft] def marginMicro(
      w: (Long, Long, Long, Long)): org.apache.spark.sql.Column = {
    def fdiv(x: org.apache.spark.sql.Column,
        m: org.apache.spark.sql.Column) =
      call_function("div", x - pmod(pmod(x, m) + m, m), m)
    fdiv(lit(w._1) * col("x1"), lit(1000000L)) +
      fdiv(lit(w._2) * col("x2"), lit(1000000L)) +
      fdiv(lit(w._3) * col("x3"), lit(1000000L)) + lit(w._4)
  }

  /** [[ltrWeights]] exposing the whole trajectory (the state BEFORE
    * each round plus the final weights) — the GuardBand audit seam.
    */
  private[graft] def ltrTrajectory(feats: DataFrame, iters: Int,
      lrNum: Long): Seq[(Long, Long, Long, Long)] = {
    require(iters > 0 && lrNum > 0, "iters and lrNum must be positive")
    def fdiv(x: org.apache.spark.sql.Column,
        m: org.apache.spark.sql.Column) =
      call_function("div", x - pmod(pmod(x, m) + m, m), m)
    val n = feats.count()
    require(n > 0, "ltrWeights: empty feature frame")
    var w = (0L, 0L, 0L, 0L)
    val states = Seq.newBuilder[(Long, Long, Long, Long)]
    states += w
    for (_ <- 1 to iters) {
      val z = marginMicro(w)
      val sigma = lit(1.0) /
        (lit(1.0) + exp(-(z.cast("double") / lit(1e6))))
      val r = floor((sigma - col("y").cast("double")) * 1e6).cast("long")
      val row = feats.select(
        sum(fdiv(r * col("x1"), lit(1000000L))).as("g1"),
        sum(fdiv(r * col("x2"), lit(1000000L))).as("g2"),
        sum(fdiv(r * col("x3"), lit(1000000L))).as("g3"),
        sum(r).as("gb")).head()
      w = (w._1 - Math.floorDiv(row.getLong(0) * lrNum, n),
        w._2 - Math.floorDiv(row.getLong(1) * lrNum, n),
        w._3 - Math.floorDiv(row.getLong(2) * lrNum, n),
        w._4 - Math.floorDiv(row.getLong(3) * lrNum, n))
      states += w
    }
    states.result()
  }

  /** Re-rank the candidates by the trained score
    * `Σ floorDiv(w_k·x_k, 10⁶) + b` (weights folded as literals —
    * both engines replay the identical trajectory, so the literals
    * agree), ties to doc_id. Returns (query_id, rank, doc_id) for the
    * scorecard.
    */
  def rerank(feats: DataFrame,
      w: (Long, Long, Long, Long)): DataFrame = {
    def fdiv(x: org.apache.spark.sql.Column,
        m: org.apache.spark.sql.Column) =
      call_function("div", x - pmod(pmod(x, m) + m, m), m)
    val score = fdiv(lit(w._1) * col("x1"), lit(1000000L)) +
      fdiv(lit(w._2) * col("x2"), lit(1000000L)) +
      fdiv(lit(w._3) * col("x3"), lit(1000000L)) + lit(w._4)
    feats
      .withColumn("ltr_micro", score)
      .withColumn("rank", row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(col("ltr_micro").desc, col("doc_id")))
        .cast("long"))
      .select(col("query_id"), col("rank"), col("doc_id"))
  }
}
