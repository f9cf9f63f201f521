package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.{TextFunctions => TF}

/** Byte-pair-encoding tokenizer TRAINING as iterative Spark plans — the
  * full merge loop, not just one round's pair statistic (that is
  * p62). Each round: count adjacent symbol pairs in the current
  * segmentation, pick the most frequent (ties to the lexicographically
  * smallest pair), greedily re-segment every word, repeat. The learned
  * merge table is the artifact a tokenizer ships.
  *
  * Scale shape — the classic trainer decomposition: ONE corpus-wide
  * shuffle builds the distinct-word frequency table; every iteration
  * after that touches only that vocab-sized table (pair counting is a
  * map-side-combined shuffle of 2-symbol keys, the argmax is ONE ROW
  * collected to the driver and re-applied as literals, and the
  * re-segmentation is a zero-exchange O(|word|) fold per row over a
  * lineage-cut word table). A 100 TB corpus trains at the cost of its
  * distinct words, exactly like a single-node BPE trainer over a
  * counted vocabulary.
  */
object Bpe {

  /** Distinct-word frequency table, each word split to single-character
    * symbols — the working set the merge loop iterates on.
    *
    * Zero-length words (a blank document tokenizes to `[""]`) are
    * dropped before the split: Spark's `sequence(1, 0)` DESCENDS to
    * `[1, 0]`, which would fabricate a phantom `("","")` pair that
    * violates [[applyMerge]]'s empty-string sentinel (the oracle's
    * `generate_series(1, 0)` is empty, so the pair exists only on the
    * Spark side). An empty word carries no pairs, so the filter cannot
    * change any merge statistic.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TF.tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))))

  /** Adjacent-pair frequencies of the current segmentation, weighted by
    * word frequency; overlapping occurrences all count (the BPE
    * counting rule — the merge step, not this one, is non-overlapping).
    */
  def pairCounts(words: DataFrame): DataFrame = {
    val syms = col("syms")
    val pairs = when(size(syms) >= 2,
      zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a, b) => struct(a.as("l"), b.as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
    words.select(col("cnt"), explode(pairs).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("pc"))
  }

  /** Greedy left-to-right non-overlapping application of the merge
    * (l, r) to every word's symbol list — one O(|word|) fold per row,
    * zero exchanges. Fold state is (emitted, pending): `pending` is the
    * one symbol the scan may still merge with the next element; ""
    * means none (a symbol is never empty, so the sentinel is safe).
    */
  def applyMerge(words: DataFrame, l: Column, r: Column): DataFrame = {
    val merged = aggregate(
      col("syms"),
      struct(array().cast("array<string>").as("res"), lit("").as("prev")),
      (st, x) =>
        when(st.getField("prev") === "",
          struct(st.getField("res").as("res"), x.as("prev")))
          .when(st.getField("prev") === l && x === r,
            struct(concat(st.getField("res"), array(concat(l, r))).as("res"),
              lit("").as("prev")))
          .otherwise(
            struct(concat(st.getField("res"), array(st.getField("prev")))
              .as("res"), x.as("prev"))),
      st => when(st.getField("prev") === "", st.getField("res"))
        .otherwise(concat(st.getField("res"), array(st.getField("prev")))))
    words.withColumn("syms", merged)
  }

  /** Train up to `nMerges` merges; returns the merge table
    * (it, lhs, rhs, pair_count) in training order. Stops early if the
    * vocabulary runs out of adjacent pairs.
    *
    * Each round runs ONE vocab-sized job: the pair-count argmax is a
    * single row, so it is collected to the driver (the same move the
    * k-means trainer makes with its centroid table) and re-applied as
    * literals — no `crossJoin(broadcast(...))` that would embed the
    * previous round's whole aggregate in the next round's plan. The
    * re-segmented word table is `localCheckpoint`ed each round (lazy:
    * the next round's argmax job materializes it), so the logical plan
    * stays FLAT — one `applyMerge` deep — at any merge count, instead
    * of doubling per round; and each round's argmax job, by
    * materializing the current table, makes the superseded one
    * unreachable, so it is unpersisted on the spot — at most two
    * vocab-sized tables are ever live (BpeSpec pins the bound with a
    * job-end listener). 10k-merge vocabularies are then bounded by
    * 10k vocab-sized jobs, not by an O(2^n) plan or 10k pinned tables.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val (merges, words) = trainWithVocab(docs, textCol, nMerges)
    releaseVocab(words)
    merges
  }

  /** Drop the block-store storage behind a vocab table returned by
    * [[trainWithVocab]] (or any superseded checkpoint round).
    * `Dataset.unpersist()` does NOT do this — it only uncaches
    * CacheManager entries, while a local checkpoint pins its RDD in
    * the block store until the ContextCleaner happens to collect it.
    * Only call after every plan reading the table has materialized.
    */
  def releaseVocab(vocab: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.CheckpointBridge
      .releaseLocalCheckpoint(vocab)

  /** [[train]], also returning the trainer's FINAL segmented word table
    * `(word, cnt, syms)` — the tokenizer dictionary [[encodeWith]]
    * joins against. Callers running the train→encode lifecycle in one
    * job use this to avoid replaying every merge a second time; the
    * caller owns the returned table's cache block (`unpersist()` it
    * when done).
    */
  def trainWithVocab(docs: DataFrame, textCol: String,
      nMerges: Int): (DataFrame, DataFrame) = {
    require(nMerges > 0, "nMerges must be positive")
    val spark = docs.sparkSession
    // eager: the one corpus-wide shuffle happens here, once
    var words = wordTable(docs, textCol).localCheckpoint()
    var prev: DataFrame = null
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var it = 1
    var exhausted = false
    while (it <= nMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(desc("pc"), asc("l"), asc("r")).limit(1).collect()
      // that job materialized the current table's lazy checkpoint, so
      // the superseded predecessor is no longer reachable: release it
      if (prev != null) { releaseVocab(prev); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pc) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((it.toLong, l, r, pc))
        prev = words
        words = applyMerge(words, lit(l), lit(r))
          .localCheckpoint(eager = false)
        it += 1
      }
    }
    // hit nMerges with the final checkpoint still lazy: materialize it
    // so the predecessor can be released before handing the table out
    if (prev != null) { words.count(); releaseVocab(prev) }
    (spark.createDataFrame(merges.result())
      .toDF("it", "lhs", "rhs", "pair_count"), words)
  }

  /** WordPiece merge training (Schuster & Nakajima 2012; the BERT
    * tokenizer's rule): identical greedy merge machinery to
    * [[trainWithVocab]], but each round's winner maximizes the
    * LIKELIHOOD RATIO count(lr) / (count(l)·count(r)) instead of the
    * raw pair count — merging the pair that most exceeds its
    * independence expectation. The ratio is compared as the exact
    * integer `pc·10¹² div (c_l·c_r)` (ties break on the pair), so the
    * whole trajectory replays bit-for-bit in the oracle; at a corpus
    * scale where `pc·10¹²` could overflow int64 (pc ≳ 9·10⁶ — recall
    * pc is bounded by corpus TOKEN count, so a 100-TB run trains on
    * a [[Curation.stratifiedSample]] like every tokenizer trainer),
    * the quotient would move to a double with documented tie
    * semantics.
    *
    * Per round, beyond the BPE pair count: one vocab-sized symbol
    * rollup (explode + sum) joined twice onto the pair table — all
    * zero-corpus-exchange jobs over the checkpointed word table, with
    * the same two-live-tables checkpoint discipline as the BPE
    * trainer. Output adds the winning `score_q12` per round.
    */
  def trainWordPiece(docs: DataFrame, textCol: String,
      nMerges: Int): DataFrame = {
    val (merges, vocab) = trainWordPieceWithVocab(docs, textCol, nMerges)
    releaseVocab(vocab)
    merges
  }

  /** [[trainWordPiece]] that ALSO hands out the final per-word
    * segmentation table — the encode-side dictionary, exactly as
    * [[trainWithVocab]] does for BPE. The caller owns the returned
    * vocab's cache block.
    */
  def trainWordPieceWithVocab(docs: DataFrame, textCol: String,
      nMerges: Int): (DataFrame, DataFrame) = {
    require(nMerges > 0, "nMerges must be positive")
    val spark = docs.sparkSession
    var words = wordTable(docs, textCol).localCheckpoint()
    var prev: DataFrame = null
    val merges = Seq.newBuilder[(Long, String, String, Long, Long)]
    var it = 1
    var exhausted = false
    while (it <= nMerges && !exhausted) {
      // ONE corpus-vocab aggregation per round (r15 optimization —
      // the round formerly ran pairCounts AND a second symbol-rollup
      // explode over the word table, then joined them): every symbol
      // occurrence is either the LEFT of exactly one adjacent pair or
      // its word's LAST symbol, so sc(s) = Σ_r pc(s,r) + lastCount(s)
      // exactly. One tagged explode (pairs + a last-symbol row with
      // r = NULL) feeds one groupBy; the symbol rollup and both joins
      // then run over the TINY aggregated pair table (its exchange is
      // reused, so the vocab scan happens once per round). Identical
      // pc/sc/score values — the trajectory replays bit-for-bit.
      val syms = col("syms")
      val pairRows = when(size(syms) >= 2,
        zip_with(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (a, b) => struct(a.as("l"), b.as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
      val tagged = words
        .select(col("cnt"), explode(concat(pairRows,
          array(struct(element_at(syms, -1).as("l"),
            lit(null).cast("string").as("r"))))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
      val sc = tagged.groupBy(col("l").as("sym"))
        .agg(sum(col("pc")).as("sc"))
      val top = tagged.filter(col("r").isNotNull)
        .join(sc.select(col("sym").as("l"), col("sc").as("cl")), Seq("l"))
        .join(sc.select(col("sym").as("r"), col("sc").as("cr")), Seq("r"))
        // q12 scale overflows int64 past pc ≈ 9.2e6; fail loudly
        // instead of silently wrapping and corrupting the trajectory
        .withColumn("score",
          when(col("pc") > lit(Long.MaxValue / 1000000000000L),
            raise_error(concat(
              lit("wordpiece pair count overflows q12 scoring: "),
              col("pc").cast("string"))).cast("long"))
          .otherwise(expr("pc * 1000000000000 div (cl * cr)")))
        .orderBy(desc("score"), asc("l"), asc("r"))
        .select(col("l"), col("r"), col("pc"), col("score"))
        .limit(1).collect()
      if (prev != null) { releaseVocab(prev); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pc, s) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2), top(0).getLong(3))
        merges += ((it.toLong, l, r, pc, s))
        prev = words
        words = applyMerge(words, lit(l), lit(r))
          .localCheckpoint(eager = false)
        it += 1
      }
    }
    if (prev != null) { words.count(); releaseVocab(prev) }
    (spark.createDataFrame(merges.result())
      .toDF("it", "lhs", "rhs", "pair_count", "score_q12"), words)
  }

  /** TOKENIZE with a trained merge table — the other half of the
    * tokenizer lifecycle (train ships the merges; encode applies
    * them). Merges are replayed in training order over the
    * DISTINCT-WORD table (the same greedy left-to-right
    * [[applyMerge]] the trainer segments with, so an in-vocab word
    * encodes exactly as training left it), then documents tokenize by
    * a broadcast dictionary join.
    *
    * Scale shape: the merge replay is |merges| vocab-sized
    * zero-exchange jobs — each round eagerly `localCheckpoint`s and
    * unpersists its predecessor, so at most two vocab-sized tables are
    * ever live and the plan stays one `applyMerge` deep (the trainer's
    * discipline). The corpus is touched exactly once, by the final
    * dictionary join: segmentation costs distinct words, tokenization
    * costs one broadcast-joined scan — the classic vocabulary-counted
    * tokenizer decomposition.
    *
    * Output: one row per (doc, word position): `pos` is 0-based corpus
    * order within the document, `tokens` the word's sub-word symbols.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    var words = wordTable(docs, textCol).localCheckpoint()
    for ((l, r) <- merges) {
      val next = applyMerge(words, lit(l), lit(r)).localCheckpoint()
      releaseVocab(words)
      words = next
    }
    encodeWith(docs, idCol, textCol, words)
  }

  /** Greedy left-to-right application of a trained merge table to ONE
    * word — the single-word form of the [[applyMerge]] replay (same
    * pass per merge, in training order), so it produces the identical
    * segmentation for in-vocabulary AND unseen words. This is what an
    * ingest tokenizer ships: the dictionary join ([[encodeWith]])
    * covers only trained words, but a merge table applies to anything.
    */
  def encodeWord(word: String, merges: Seq[(String, String)]): List[String] = {
    var syms: List[String] = word.map(_.toString).toList
    for ((l, r) <- merges) {
      val out = List.newBuilder[String]
      var rest = syms
      while (rest.nonEmpty) rest match {
        case a :: b :: tail if a == l && b == r =>
          out += (a + b); rest = tail
        case a :: tail =>
          out += a; rest = tail
      }
      syms = out.result()
    }
    syms
  }

  /** Tokenize ANY document frame — batch or STREAMING — by applying
    * the trained merge table per word ([[encodeWord]]): zero-exchange
    * (explode + per-partition map, no join, no aggregation), so a
    * streaming frame passes through stateless, and out-of-vocabulary
    * words segment correctly instead of dropping out of a dictionary
    * join. The merge table rides the closure (it is vocab-sized); a
    * per-partition memo makes repeated words pay the merge loop once.
    * Output schema matches [[encode]]; BpeSpec pins row-for-row
    * equality with the replay-based encode, OOV words included.
    */
  def encodeRows(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"),
        posexplode(TF.tokens(col(textCol))).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap[String, (Long, String)]()
        it.map { case (id, pos, word) =>
          val (n, toks) = memo.getOrElseUpdate(word, {
            val syms = encodeWord(word, merges)
            (syms.length.toLong, syms.mkString(" "))
          })
          (id, pos.toLong, n, toks)
        }
      }
      .toDF(idCol, "pos", "n_tokens", "tokens")
  }

  /** Tokenize against an ALREADY-SEGMENTED word table `(word, …,
    * syms)` — [[trainWithVocab]]'s second return, or [[encode]]'s
    * replayed dictionary. The corpus is touched exactly once, by the
    * broadcast dictionary join; no merge replay happens here, so a
    * train→encode lifecycle pays training exactly once.
    */
  def encodeWith(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val dict = broadcast(vocab.select(col("word"), col("syms")))
    docs
      .select(col(idCol), posexplode(TF.tokens(col(textCol))).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
      .join(dict, "word")
      .select(col(idCol), col("pos").cast("long").as("pos"),
        size(col("syms")).cast("long").as("n_tokens"),
        concat_ws(" ", col("syms")).as("tokens"))
  }
}
