package graft

import graft.core.Tables
import graft.pipeline.Dedup

/** Pruning-recall invariant for the inverted-index dedup: with the
  * stopword-shingle frequency cap engaged (the p04 production
  * configuration), the pair set must equal the unpruned exact scan —
  * pruning may only drop CANDIDATES that other shared shingles still
  * generate, never verified pairs. Checked at sf0.01 (the exhaustive
  * DuckDB oracle certifies the same thing; this spec keeps the
  * invariant enforced in-repo at every `sbt test`).
  */
class DedupRecallSpec extends SparkSpec {

  test("frequency-capped ngram-Jaccard finds exactly the unpruned pairs") {
    val docs = Tables.read(spark, sf001, "documents")
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 4, threshold = 0.4,
      maxShingleFreq = Some(math.max(20, (docs.count() / 10).toInt)))
    val unpruned = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreq = None)
    val missing = unpruned.exceptAll(capped).count()
    val extra = capped.exceptAll(unpruned).count()
    assert(missing == 0L, s"pruning lost $missing qualifying pairs")
    assert(extra == 0L, s"pruning fabricated $extra pairs")
  }
}
