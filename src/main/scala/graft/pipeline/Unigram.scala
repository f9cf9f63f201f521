package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.{TextFunctions => TF}

/** SentencePiece-style unigram-LM tokenizer (Kudo 2018, hard-EM
  * variant): seed a substring vocabulary from corpus counts, then
  * alternate Viterbi segmentation of every distinct word (E-step)
  * with piece-count re-estimation (M-step). The reference pipeline
  * family ships BPE ([[Bpe]]); this is the other production
  * subword tokenizer, and the engine's demonstration that per-word
  * dynamic programming fits Catalyst's higher-order functions —
  * the whole Viterbi pass is a zero-exchange projection over the
  * distinct-word table, no UDF, no mapPartitions.
  *
  * Determinism discipline (what lets DuckDB replay it exactly):
  *  - piece costs are integer micro-nats, `floor(−ln((c+1)/(tot+V))·1e6)`
  *    with add-one smoothing over the fixed vocabulary (so zero-count
  *    pieces survive later EM rounds);
  *  - the vocabulary is ALL single characters plus the top
  *    `vocabSize − |chars|` multi-character substrings by
  *    (count desc, piece asc);
  *  - the DP minimizes integer cost sums; the backtrace takes the
  *    SMALLEST split point attaining the optimum, so the segmentation
  *    is a pure function of the cost table.
  *
  * Scale shape: the corpus is touched once (word counts — one
  * token-occurrence shuffle with map-side combine); everything after
  * runs on the DISTINCT-WORD table (Zipf-bounded, millions of rows at
  * 100 TB, like [[Bpe]]'s word table). Each EM round is one
  * zero-exchange Viterbi projection plus one vocab-sized count
  * shuffle; the cost table is collected per round (vocab-sized — the
  * same driver-collected-winner discipline as `Bpe.train`) and rides
  * the next round's plan as a map literal.
  */
object Unigram {

  /** Finite "infinite" cost marking a dead DP position: any word whose
    * final [[segment]] `cost_micro` is at or above this contains a
    * character the vocabulary cannot cover (impossible when the model
    * is applied to its own training corpus — single-character coverage
    * is unconditional — but reachable when a snapshot-trained model
    * tokenizes a stream). Large enough to dwarf every real total, small
    * enough that `sentinel + maxLen·pieceCost` cannot overflow.
    */
  val Unsegmentable: Long = Long.MaxValue / 4

  /** Distinct words with occurrence counts — the corpus's only pass. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TF.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** The per-word piece-cost matrix: one entry per (start, len) pair
    * in (start asc, len asc) order — `pc[(start−1)·maxLen + len]` is
    * the cost of the piece at `start` of length `len`, null when the
    * piece overruns the word or is out of vocabulary. Shared by the
    * DP and the backtrace.
    */
  private def pcMatrix(word: Column, cmap: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)), s =>
      transform(sequence(lit(1), lit(maxLen)), l =>
        when(s + l - lit(1) <= length(word),
          element_at(cmap, word.substr(s, l))))))

  /** Seed piece counts: every substring of length 1..maxLen of every
    * distinct word, weighted by word frequency (a piece occurring
    * twice in a word counts twice, as in the SentencePiece seed).
    */
  def seedCounts(words: DataFrame, maxLen: Int): DataFrame =
    words
      .withColumn("piece", explode(filter(
        pcPieces(col("word"), maxLen), p => p.isNotNull)))
      .groupBy("piece").agg(sum(col("freq")).as("c"))

  /** All (start, len) substrings in matrix order (nulls for overruns,
    * filtered by the caller).
    */
  private def pcPieces(word: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)), s =>
      transform(sequence(lit(1), lit(maxLen)), l =>
        when(s + l - lit(1) <= length(word), word.substr(s, l)))))

  /** Deterministic vocabulary cut over collected seed counts: ALL
    * single characters (coverage — every word stays segmentable in
    * every round) plus the top multi-character pieces.
    */
  def fitVocab(counts: Seq[(String, Long)],
      vocabSize: Int): Seq[(String, Long)] = {
    val singles = counts.filter(_._1.length == 1).sortBy(_._1)
    val room = math.max(0, vocabSize - singles.size)
    val multis = counts.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(room)
    singles ++ multis
  }

  /** Integer micro-nat costs with add-one smoothing over the fixed
    * vocabulary — same double op order as the oracle's
    * `FLOOR(-ln((c+1)/CAST(tot+V AS DOUBLE))*1e6)`.
    */
  def costTable(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val tot = vocab.map(_._2).sum
    val v = vocab.size
    vocab.map { case (p, c) =>
      p -> math.floor(-math.log(
        (c + 1).toDouble / (tot + v).toDouble) * 1e6).toLong
    }.toMap
  }

  /** Viterbi segmentation of every word under a cost table: appends
    * `pieces` (the optimal segmentation, smallest-split-point
    * tie-break) and `cost_micro` (its total cost). Pure Column
    * higher-order expressions — a zero-exchange projection over the
    * word table; the cost map rides the plan as a literal (vocab-
    * sized, the [[Similarity.FoldedCentroidLimit]]-style bound is the
    * caller's vocabSize).
    */
  def segment(words: DataFrame, costMap: Map[String, Long],
      maxLen: Int): DataFrame = {
    require(costMap.nonEmpty, "empty vocabulary")
    val cmap = map(costMap.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      Seq(lit(k), lit(v))
    }: _*)
    val L = length(col("word"))
    val withPc = words.withColumn("__pc",
      pcMatrix(col("word"), cmap, maxLen))
    val pc = col("__pc")
    // dp[i+1] = best cost of word[1..i]; dp[1] = 0. Dead positions
    // (no vocabulary piece reaches them) hold the finite
    // [[Unsegmentable]] sentinel, NOT null: a null in the long array
    // gets silently materialized as 0 when the accumulator's inferred
    // element type is non-nullable (the aggregate takes its type from
    // the constant-foldable zero), which would make an unsegmentable
    // word score 0 instead of failing. The sentinel dwarfs any real
    // total (≤ wordLen·ln(vocab)·1e6 ≈ 1e9), so dead paths never win
    // a min, and `cost_micro >= Unsegmentable` is the caller's
    // out-of-vocabulary test.
    val dp = aggregate(sequence(lit(1), L), array(lit(0L)), (acc, i) =>
      concat(acc, array(coalesce(array_min(filter(
        transform(sequence(greatest(i - lit(maxLen), lit(0)), i - lit(1)),
          j => element_at(acc, (j + lit(1)).cast("int")) +
            element_at(pc, (j * lit(maxLen) + (i - j)).cast("int"))),
        x => x.isNotNull)), lit(Unsegmentable)))))
    val withDp = withPc.withColumn("__dp", dp)
    val dpc = col("__dp")
    // backtrace: L no-op-padded steps; at each live step take the
    // SMALLEST j attaining dp[pos+1]
    val btInit = struct(L.cast("int").as("pos"),
      array().cast("array<string>").as("pieces"))
    val bt = aggregate(sequence(lit(1), L), btInit, (st, _) => {
      val pos = st.getField("pos")
      val jstar = array_min(filter(
        transform(sequence(greatest(pos - lit(maxLen), lit(0)),
            pos - lit(1)),
          j => when(
            element_at(dpc, (j + lit(1)).cast("int")) +
              element_at(pc, (j * lit(maxLen) + (pos - j)).cast("int")) ===
              element_at(dpc, (pos + lit(1)).cast("int")), j)),
        x => x.isNotNull)).cast("int")
      when(pos > lit(0),
        struct(jstar.as("pos"),
          concat(array(col("word").substr(jstar + lit(1), pos - jstar)),
            st.getField("pieces")).as("pieces")))
        .otherwise(st)
    })
    withDp
      .withColumn("pieces", bt.getField("pieces"))
      .withColumn("cost_micro", element_at(dpc, (L + lit(1)).cast("int")))
      .drop("__pc", "__dp")
  }

  /** Piece counts of a segmented word table (occurrence-weighted) —
    * the M-step input. Output is at most vocab-sized.
    */
  def segmentCounts(seg: DataFrame): DataFrame =
    seg.select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("c"))

  /** The full trainer: seed → (Viterbi → recount → recost) × iters.
    * Returns the final segmentation table
    * `(word, freq, pieces, cost_micro)`. Counts are collected once
    * per round (vocab-sized); zero-count pieces keep finite add-one
    * costs, so the vocabulary never shrinks mid-train (pruning is a
    * policy layered on the returned counts, not baked in).
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxLen: Int, iters: Int): DataFrame = {
    val (costs, words) = trainedCosts(df, textCol, vocabSize, maxLen,
      iters)
    segment(words, costs, maxLen)
  }

  /** The trainer's model half: run the same EM loop and return the
    * FINAL cost table (plus the checkpointed word table, so [[train]]
    * segments without re-deriving it). This is what a streaming
    * tokenizer broadcasts: the cost map is the entire model, and
    * [[segment]]'s Viterbi is a stateless per-row projection — the
    * train-on-snapshot / apply-per-micro-batch move of
    * [[graft.streaming.StreamingJobs]].
    */
  def trainedCosts(df: DataFrame, textCol: String, vocabSize: Int,
      maxLen: Int, iters: Int): (Map[String, Long], DataFrame) = {
    require(iters >= 1, "iters must be >= 1")
    val words = wordCounts(df, textCol).localCheckpoint()
    val seed = seedCounts(words, maxLen)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val vocab = fitVocab(seed, vocabSize)
    val keys = vocab.map(_._1)
    var costs = costTable(vocab)
    for (_ <- 1 until iters) {
      val counted = segmentCounts(segment(words, costs, maxLen))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      costs = costTable(keys.map(k => k -> counted.getOrElse(k, 0L)))
    }
    (costs, words)
  }
}
