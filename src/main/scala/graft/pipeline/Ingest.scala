package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Idempotent corpus ingest — batch rows admitted only if their content
  * fingerprint is absent from the corpus (the S4 ON CONFLICT DO NOTHING
  * append over content identity; CLI `ingest-dedup` is the plain
  * anti-join form).
  *
  * [[bloomFresh]] is the scale path for the common regime where the
  * corpus is orders of magnitude larger than the batch. The plain
  * anti-join shuffles BOTH sides' digests on every ingest; fine in
  * absolute bytes (16 B/doc), but it hash-partitions a corpus-sized
  * relation to admit a few thousand rows. The bloom path never
  * shuffles anything:
  *
  *  1. one corpus pass builds a mergeable Bloom sketch of the
  *     fingerprints (Spark's `stat.bloomFilter` — distributed
  *     aggregation, driver holds only the bitset; ~1.2 GiB at 1 B keys
  *     / 1 % FPP, so it broadcasts; shard the batch by key range and
  *     build range-scoped sketches if the corpus outgrows that);
  *  2. the broadcast sketch partitions the batch map-side into
  *     definitely-fresh rows (bloom negative — no join at all) and a
  *     maybe set (true dups + ~FPP false positives);
  *  3. a second corpus pass resolves the maybe set exactly: the maybe
  *     keys broadcast into a semi-join (corpus scanned, not shuffled),
  *     and the surviving collision keys — at most |maybe| of them —
  *     broadcast back into the final anti-join.
  *
  * The result is bit-identical to the plain anti-join (the sketch only
  * prefilters; every bloom-positive is verified exactly), which is what
  * the p47 oracle checks. The probe UDF is one sketch lookup per BATCH
  * row — the corpus side stays pure scan.
  */
object Ingest {

  private def fp(c: Column): Column = fingerprint(tokens(c))

  /** Batch rows whose content fingerprint does not occur in `corpus`
    * (all batch columns preserved). `expectedItems`/`fpp` size the
    * sketch — size for the CORPUS's distinct-content cardinality.
    */
  def bloomFresh(corpus: DataFrame, batch: DataFrame, textCol: String,
      expectedItems: Long, fpp: Double): DataFrame = {
    val spark = corpus.sparkSession
    val corpusKeys = corpus.select(fp(col(textCol)).as("k"))
    val sketch = corpusKeys.stat.bloomFilter("k", expectedItems, fpp)
    val bcast = spark.sparkContext.broadcast(sketch)
    val mightContain = udf((k: String) => k != null && bcast.value.mightContain(k))

    val keyed = batch.withColumn("__k", fp(col(textCol)))
    val definite = keyed.filter(!mightContain(col("__k")))
    val maybe = keyed.filter(mightContain(col("__k")))

    // exact verdict for the bloom-positives: their keys broadcast into
    // a corpus semi-join (scan, no shuffle), and the collision set —
    // bounded by |maybe| — broadcasts into the final anti-join
    val collisions = corpusKeys
      .join(broadcast(maybe.select(col("__k").as("k")).distinct()),
        Seq("k"), "left_semi")
      .distinct()
    val verified = maybe.join(broadcast(collisions),
      maybe("__k") === collisions("k"), "left_anti")

    definite.unionByName(verified).drop("__k")
  }

  /** Plain anti-join form (the small-corpus / first-load path and the
    * correctness reference for [[bloomFresh]]).
    */
  def exactFresh(corpus: DataFrame, batch: DataFrame,
      textCol: String): DataFrame =
    batch.withColumn("__k", fp(col(textCol)))
      .join(corpus.select(fp(col(textCol)).as("__k")).distinct(),
        Seq("__k"), "left_anti")
      .drop("__k")

  /** Snapshot diff — the audit step of incremental ingest: one row per
    * doc id in either snapshot, classified `added` / `removed` /
    * `modified` (same id, different content fingerprint) / `unchanged`.
    * A single full-outer join on the id carrying 16-byte fingerprints,
    * never document text — at corpus scale the exchange is id+digest
    * sized, and both scans prune to (id, text→digest).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("doc_id"), fp(col(textCol)).as("ofp"))
    val n = newSnap.select(col(idCol).as("doc_id"), fp(col(textCol)).as("nfp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("ofp").isNull, "added")
          .when(col("nfp").isNull, "removed")
          .when(col("ofp") === col("nfp"), "unchanged")
          .otherwise("modified").as("status"))
  }
}
