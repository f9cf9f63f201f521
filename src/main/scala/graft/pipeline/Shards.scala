package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shard-file materialization — the LAST MILE of the corpus-release
  * family: [[Curation.globalShardManifest]] / mixtureInterleave
  * compute exact (doc → chunk_idx, chunk_off) placements, and a
  * trainer consumes FILES, not manifests. This sink writes the corpus
  * as one JSONL directory per shard, rows physically ordered by their
  * manifested offset, and [[certify]] proves the written files carry
  * exactly the manifested membership, content, and order.
  *
  * Scale shape: one shuffle keyed by `chunk_idx` (hash-distributed —
  * a shard never outgrows one writer task because `shardToks` bounds
  * it by construction), an in-partition sort on (chunk, offset), and
  * a `partitionBy` directory split. No driver-side loop, no global
  * sort: the manifest already IS the global order, so materializing
  * it needs only per-shard locality. The JSONL surface is
  * [[Jsonl]]'s (C4/Pile/RedPajama interchange); uncompressed shards
  * stay splittable, compressed ones are one split per file
  * (shard sizing makes that the right parallel unit anyway).
  *
  * A document that straddles a shard boundary is written to the
  * shard where it STARTS (GPT-style packing — the trainer reads it
  * across the boundary), exactly the manifest's semantics.
  */
object Shards {

  /** Write `docs` as ordered JSONL shard files under `path`, one
    * `chunk_idx=N` directory per shard, rows in `chunk_off` order.
    * `manifest` must carry (idCol, chunk_idx, chunk_off) — any
    * placement frame from the manifest family works.
    */
  def write(docs: DataFrame, idCol: String, textCol: String,
      manifest: DataFrame, path: String,
      compression: Option[String] = None): Unit = {
    val rows = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(manifest.select(col(idCol).as("doc_id"), col("chunk_idx"),
        col("chunk_off")), Seq("doc_id"))
      .repartition(col("chunk_idx"))
      .sortWithinPartitions(col("chunk_idx"), col("chunk_off"),
        col("doc_id"))
    val w = rows.write.mode("overwrite").partitionBy("chunk_idx")
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Incrementally extend a shard directory after a manifest append
    * ([[Curation.mixtureAppend]]): rewrite ONLY the chunk directories
    * the delta touches — every chunk at or past the delta's first
    * chunk (the boundary chunk already holds committed base rows, so
    * its directory is rewritten whole; strictly-earlier chunks are
    * untouched on disk). Dynamic partition overwrite replaces exactly
    * the directories present in the written frame, so an appended
    * release costs O(Δ + one boundary chunk), never a corpus rewrite
    * — and the result is byte-identical to a full [[write]] of the
    * appended manifest (spec-pinned).
    *
    * `manifest` is the FULL post-append manifest; `deltaManifest` is
    * the appended rows' placement (any frame carrying the delta's
    * `chunk_idx`). The cut is derived in-plan (single-row min,
    * broadcast) — no driver-side collect.
    */
  def writeAppend(docs: DataFrame, idCol: String, textCol: String,
      manifest: DataFrame, deltaManifest: DataFrame, path: String,
      compression: Option[String] = None): Unit = {
    val cut = deltaManifest.agg(
      min(col("chunk_idx")).as("__first_new"))
    // an EMPTY delta would make the min NULL, the >= comparison drop
    // every row, and the append silently no-op — a mis-wired delta
    // frame must fail loudly instead (in-plan, no driver-side count)
    val firstNew = when(col("__first_new").isNull,
        raise_error(lit(
          "writeAppend: deltaManifest is empty — nothing to append")))
      .otherwise(col("__first_new"))
    val affected = manifest
      .crossJoin(broadcast(cut))
      .filter(col("chunk_idx") >= firstNew)
      .drop("__first_new")
    val rows = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(affected.select(col(idCol).as("doc_id"), col("chunk_idx"),
        col("chunk_off")), Seq("doc_id"))
      .repartition(col("chunk_idx"))
      .sortWithinPartitions(col("chunk_idx"), col("chunk_off"),
        col("doc_id"))
    val w = rows.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("chunk_idx")
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Read shard files back. The explicit schema names the in-file
    * payload; `chunk_idx` comes from the directory structure and is
    * pinned LONG here (partition-column inference would make it INT).
    * Malformed lines surface as `_corrupt` ([[Jsonl.read]] contract).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("doc_id LONG, text STRING, chunk_off LONG, " +
        "chunk_idx LONG, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Physical-order audit: the number of adjacent row pairs WITHIN A
    * SHARD FILE whose `chunk_off` decreases in the file's byte order.
    * Zero certifies the files stream in manifest order — the property
    * a sequential trainer depends on and the one thing a stored
    * column cannot prove (a scrambled file would still carry correct
    * offsets).
    *
    * Each file is read WHOLE (`wholeTextFiles` is non-splittable by
    * construction): a DataFrame scan over a file larger than
    * `maxPartitionBytes` splits it across read partitions, and an
    * adjacent-pairs count inside partitions would never see an
    * out-of-order pair straddling the split boundary — the audit
    * could pass on a corrupted file. The audited contract is
    * per-file order (a chunk directory holds one part file per
    * write; if several coexisted, their interleaving at read time is
    * reader-chosen and not a file property). Lines that fail to
    * parse are skipped here — [[certify]]'s clean-row counts surface
    * corruption separately. Imperative parsing is the honest tool:
    * the quantity IS the physical byte order, which no declarative
    * plan observes; one task per file, zero shuffles, one row each.
    */
  def orderInversions(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val invs = spark.sparkContext
      .wholeTextFiles(s"$path/chunk_idx=*")
      .map { case (_, content) =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        var inv = 0L
        var prev = Long.MinValue
        for (line <- content.split('\n').iterator if line.nonEmpty) {
          val off =
            try {
              val n = mapper.readTree(line)
              val f = if (n == null) null else n.get("chunk_off")
              if (f == null || !f.canConvertToLong) Long.MinValue
              else f.asLong()
            } catch { case _: Exception => Long.MinValue }
          if (off != Long.MinValue) {
            if (off < prev) inv += 1
            prev = off
          }
        }
        inv
      }
    spark.createDataset(invs).toDF("inv")
      .agg(coalesce(sum(col("inv")), lit(0L)).as("order_inversions"))
  }

  /** Certify written shards against their manifest: per shard, the
    * doc/token counts and the order-covering checksum
    * (Σ hash60(fingerprint:chunk_off) mod 2²⁸ — the [[p86]]-style
    * commutative sum, positional through the manifested offset), all
    * recomputed FROM THE FILES, plus the global physical-order
    * inversion count (broadcast single row, structurally zero for a
    * faithful write). The oracle recomputes the same quantities from
    * the source corpus, so any loss of membership, content, offset,
    * or row order hash-mismatches the gate.
    */
  def certify(spark: SparkSession, path: String): DataFrame = {
    val back = read(spark, path)
    // the clean-row filter ALSO anchors on a data column: under
    // aggressive column pruning (e.g. a bare count() over this card)
    // a filter referencing only `_corrupt` leaves the JSON scan with
    // nothing but the internal corrupt column, which Spark rejects
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN); a well-formed shard row
    // always carries its offset, so the predicate is equivalent.
    val clean = back.filter(col("chunk_off").isNotNull &&
      col("_corrupt").isNull)
    val sums = clean
      .withColumn("fp", TextFunctions.fingerprint(
        TextFunctions.tokens(col("text"))))
      .withColumn("term",
        pmod(TextFunctions.hash60(concat(col("fp"), lit(":"),
          col("chunk_off").cast("string"))), lit(268435456L)))
      .groupBy(col("chunk_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextFunctions.tokens(col("text"))).cast("long"))
          .as("n_toks"),
        sum(col("term")).as("shard_sum"))
    sums.crossJoin(broadcast(orderInversions(spark, path)))
  }
}
