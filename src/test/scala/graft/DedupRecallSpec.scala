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

  test("in-plan fractional cap equals the absolute cap it derives from") {
    // the production queries use maxShingleFreqFrac (resolved from a
    // single-row broadcast inside the plan); it must prune exactly as
    // the driver-computed max(20, |docs|/10) cap did
    val docs = Tables.read(spark, sf001, "documents")
    val abs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 4, threshold = 0.4,
      maxShingleFreq = Some(math.max(20, (docs.count() / 10).toInt)))
    val frac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreqFrac = Some(0.1))
    assert(frac.exceptAll(abs).count() == 0L &&
      abs.exceptAll(frac).count() == 0L)
  }

  test("LSH bucket cap: planted identical cluster emits O(B) star pairs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 300 byte-identical docs land in ONE bucket per band; with the cap
    // binding the all-pairs join must degrade to star edges — B-1 rows,
    // every member connected to the cluster min — never B(B-1)/2
    val boiler = (1L to 300L).map(i => (i, "lorem ipsum dolor sit amet " +
      "consectetur adipiscing elit sed do eiusmod tempor"))
    val distinctDocs = Seq(
      (900L, "completely different text about spark catalyst planning"),
      (901L, "another unrelated document mentioning parquet readers"))
    val df = (boiler ++ distinctDocs).toDF("doc_id", "text")
    val docs = Dedup.minhashDocs(df, "doc_id", "text", k = 3, numHashes = 12)
    val pairs = Dedup.minhashPlan(docs, bands = 6, rows = 2,
      threshold = 0.5, bucketCap = 8).collect()
    assert(pairs.length == 299, s"expected 299 star pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(0) == 1L),
      "every star pair must anchor at the cluster min id")
    // the audit card accounts for exactly the replaced pairs
    val audit = Dedup.lshBucketAudit(df, "doc_id", "text", k = 3,
      numHashes = 12, bands = 6, bucketCap = 8).collect()
    assert(audit.forall(_.getAs[Long]("n_oversized") >= 1L))
    assert(audit.forall(r => r.getAs[Long]("pairs_exact") >= 300L * 299 / 2))
    assert(audit.forall(r => r.getAs[Long]("pairs_capped") <=
      r.getAs[Long]("pairs_exact")))
  }

  test("LSH bucket cap: non-degenerate corpus is pair-identical to uncapped") {
    val docs = Dedup.minhashDocs(Tables.read(spark, sf001, "documents"),
      "doc_id", "text", k = 3, numHashes = 12)
    val capped = Dedup.minhashPlan(docs, bands = 6, rows = 2,
      threshold = 0.5)
    val uncapped = Dedup.minhashPlan(docs, bands = 6, rows = 2,
      threshold = 0.5, bucketCap = Int.MaxValue)
    assert(capped.exceptAll(uncapped).count() == 0L &&
      uncapped.exceptAll(capped).count() == 0L)
  }

  test("Hamming bucket cap: identical fingerprints collapse to star edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cluster = (1L to 200L).map(i => (i, 0x0123456789abcdL))
    val others = Seq((500L, 0x0123456789abceL), // hamming 2 from cluster
      (501L, 0x7fffffffffffffL))
    val hashes = (cluster ++ others).toDF("doc", "sim")
    val pairs = Dedup.hammingPairs(hashes, "doc", "sim", bits = 56,
      segments = 8, maxHamming = 3, bucketCap = 8).collect()
    // stars within the cluster: 199 rows anchored at doc 1; the
    // near-identical outsider may only surface via the cluster min
    val inCluster = pairs.filter(r => r.getLong(1) <= 200L)
    assert(inCluster.length == 199, s"got ${inCluster.length}")
    assert(inCluster.forall(_.getLong(0) == 1L))
    // uncapped parity on the non-degenerate part
    val nonDegenerate = others.toDF("doc", "sim")
    val a = Dedup.hammingPairs(nonDegenerate, "doc", "sim", 56, 8, 3)
    val b = Dedup.hammingPairs(nonDegenerate, "doc", "sim", 56, 8, 3,
      bucketCap = Int.MaxValue)
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
  }

  test("count-bound prefilter never drops a qualifying pair (random corpora)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a tiny vocabulary forces heavy shingle sharing, so many pairs sit
    // right at the survivor bound — the regime where an off-by-one in
    // n_shared + min(cap) + 1 >= required-intersection would bite
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val base = (1L to 30L).map { i =>
        (i, Seq.fill(4 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      // planted near-dups: copies with one token appended
      val planted = base.take(6).map { case (i, t) => (i + 100L, t + " a") }
      val df = (base ++ planted).toDF("doc_id", "text")

      val sh = Dedup.shingled(df, "doc_id", "text", k = 2)
      val a = sh.select(col("doc").as("doc_a"), col("sh").as("sh_a"))
      val b = sh.select(col("doc").as("doc_b"), col("sh").as("sh_b"))
      def brute(pred: org.apache.spark.sql.Column) =
        a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("inter",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .filter(pred)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

      val wantJ = brute(col("inter") /
        size(array_union(col("sh_a"), col("sh_b"))) >= 0.5)
      val wantC = {
        val ab = brute(size(col("sh_a")) > 0 &&
          col("inter") / size(col("sh_a")) >= 0.6)
        val ba = brute(size(col("sh_b")) > 0 &&
          col("inter") / size(col("sh_b")) >= 0.6).map(_.swap)
        ab ++ ba
      }
      def runJ(cap: Option[Int]) =
        Dedup.ngramJaccardPairs(df, "doc_id", "text", k = 2,
            threshold = 0.5, maxShingleFreq = cap)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      def runC(cap: Option[Int]) =
        Dedup.containmentPairs(df, "doc_id", "text", k = 2,
            threshold = 0.6, maxShingleFreq = cap)
          .select("contained", "container").as[(Long, Long)].collect().toSet

      // uncapped: the count-bound prefilter must be exactly lossless
      assert(runJ(None) == wantJ, s"jaccard seed=$seed: " +
        s"missing=${wantJ -- runJ(None)} extra=${runJ(None) -- wantJ}")
      assert(runC(None) == wantC, s"containment seed=$seed: " +
        s"missing=${wantC -- runC(None)} extra=${runC(None) -- wantC}")
      // capped in this everything-is-a-stopword corpus: allowed to lose
      // pairs (documented cap semantics) but never to fabricate one
      assert((runJ(Some(10)) -- wantJ).isEmpty, s"jaccard cap seed=$seed")
      assert((runC(Some(10)) -- wantC).isEmpty, s"containment cap seed=$seed")
    }
  }

  test("bounded calibration sample: absolute budget, pair-preserving") {
    import org.apache.spark.sql.functions._
    val docs = Tables.read(spark, sf001, "documents")
    val n = docs.count()
    // corpus below the budget → modulus 1 → identity
    val all = Dedup.boundedCalibrationSample(docs, "doc_id", "text",
      k = 3, budgetDocs = 10000)
    assert(all.count() == n)
    // budget caps the sample (±2×: the modulus is a ceiling division,
    // and the content-hash residue is only approximately uniform)
    val s = Dedup.boundedCalibrationSample(docs, "doc_id", "text",
      k = 3, budgetDocs = 100)
    val c = s.count()
    assert(c > 0 && c <= 2 * 100, s"sample size $c vs budget 100")
    // content keying keeps at least one near-identical pair TOGETHER —
    // the property an id-stride sample lacks (near-dup pairs land on
    // arbitrary id pairs, surviving only at 1/m²)
    val sh = Dedup.shingled(s, "doc_id", "text", k = 3)
    val a = sh.select(col("doc").as("da"), col("sh").as("sa"))
    val b = sh.select(col("doc").as("db"), col("sh").as("sb"))
    val nearDup = a.join(b, col("da") < col("db"))
      .filter(size(array_union(col("sa"), col("sb"))) > 0)
      .filter(size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb"))) >= 0.3)
      .count()
    assert(nearDup > 0, "sample kept no near-dup pair to calibrate on")
  }

  test("survivorPolicyCard: hand-built clusters, policies pick the right survivors") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // cluster {1,2,3}: doc 2 longest, doc 3 best quality; cluster
    // {10,11}: doc 10 wins everything (policies agree with min_id)
    val feat = Seq(
      (1L, 5L, 100L), (2L, 9L, 200L), (3L, 7L, 900L),
      (10L, 8L, 500L), (11L, 2L, 400L),
      (99L, 50L, 50L) // isolated: not in any pair -> not in the card
    ).toDF("doc_id", "n_toks", "score_micro")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.survivorPolicyCard(feat, "doc_id", "n_toks",
        "score_micro", pairs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // min_id: survivors 1 (toks 5, q 100) and 10 (toks 8, q 500)
    assert(out("min_id") ==
      (("min_id", 2L, 3L, (9L + 7L) + 2L, 600L, 0L)),
      out("min_id").toString)
    // keep_longest: survivors 2 (9, 200) and 10 -> one cluster changed
    assert(out("keep_longest") ==
      (("keep_longest", 2L, 3L, (5L + 7L) + 2L, 700L, 1L)),
      out("keep_longest").toString)
    // keep_best_quality: survivors 3 (7, 900) and 10
    assert(out("keep_best_quality") ==
      (("keep_best_quality", 2L, 3L, (5L + 9L) + 2L, 1400L, 1L)),
      out("keep_best_quality").toString)
  }
}
