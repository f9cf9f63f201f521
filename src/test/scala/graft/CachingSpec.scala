package graft

import org.apache.spark.sql.functions.col

import graft.pipeline.{Dedup, Similarity}

/** The caching contract [[graft.core.Caching]] documents: every
  * detector that brackets its shingled/assigned intermediate with
  * `withCached` must leave the CacheManager EMPTY once its result
  * materializes — a long-lived service composing several detectors in
  * one session must not accumulate cache entries. The returned frame
  * is checkpoint-backed, so reusing it is free (no recomputation).
  */
class CachingSpec extends SparkSpec with org.scalatest.BeforeAndAfterEach {

  // other operators legitimately return cache-backed frames that outlive
  // their call (extendMap, splitByConceptSets — their docstrings say so);
  // start each assertion from a clean CacheManager so this spec pins the
  // DETECTORS' bracket, not unrelated suites sharing the session
  override protected def beforeEach(): Unit = {
    super.beforeEach()
    spark.catalog.clearCache()
  }

  private def assertNoCacheEntries(label: String): Unit =
    assert(spark.sharedState.cacheManager.isEmpty,
      s"$label left CacheManager entries behind")

  test("minhash LSH (p02) releases its shingle cache on materialize") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      k = 3, numHashes = 12, bands = 6, threshold = 0.5)
    pairs.count()
    assertNoCacheEntries("minhashPairs")
  }

  test("ngram Jaccard (p04) releases its shingle cache on materialize") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreq = Some(50))
    pairs.count()
    assertNoCacheEntries("ngramJaccardPairs")
  }

  test("containment (p27) releases its shingle cache on materialize") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
      k = 4, threshold = 0.6, maxShingleFreq = Some(50))
    pairs.count()
    assertNoCacheEntries("containmentPairs")
  }

  test("semantic dedup (p40) releases its assignment cache on materialize") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      centroidFilter = col("vec_id") % 25 === 0, threshold = 0.4)
    out.count()
    assertNoCacheEntries("semanticDedup")
  }

  test("merge-clusters (p46) releases its pair cache on materialize") {
    val out = graft.queries.PipelineQueries.p46MergeClusters(spark, sf0001)
    out.count()
    assertNoCacheEntries("p46MergeClusters")
  }

  test("the bracketed result is stable across reuse (no recomputation drift)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      k = 3, numHashes = 12, bands = 6, threshold = 0.5)
    assert(pairs.count() == pairs.count())
  }
}
