package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.Multimodal

/** Multimodal (video) query cards — the first per-family split out of
  * the 10k-line [[PipelineQueries]] (round-14 review nit #2); new
  * media cards land here.
  *
  * Same oracle portability contract as [[PipelineQueries]]: every
  * emitted value is replayable in closed form by DuckDB from the
  * source tables alone.
  */
object MediaQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** REAL video decode certified end to end — the round-14 review's
    * last honest stub closed: per document, a 1–3-frame MJPEG-in-AVI
    * video is written through the JDK's actual JPEG encoder wrapped
    * in a real RIFF container ([[Multimodal.encodeVideoPattern]]),
    * then decoded back by walking the container and JPEG-decoding
    * every frame ([[Multimodal.decodeAviFrames]]). The output pins,
    * per frame: the DECODED dimensions, the frame count (one row per
    * frame), and the frame's luma level quantized back off the
    * decoded raster — all replayable in closed form from
    * (doc_id, frame_idx) because each solid 48×32 frame aligns JPEG's
    * 8×8 DCT blocks with a single gray level, keeping lossy error far
    * below the 64-count level steps.
    *
    * Scale shape: encode and decode are per-row partition iterators —
    * zero exchanges; payload bytes never leave the task that made
    * them, 5 longs per frame do.
    */
  def p190VideoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = t(s, dir, "documents").select(
        col("doc_id"),
        (lit(1) + pmod(col("doc_id"), lit(3))).cast("int"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, Int)]
    Multimodal.decodeAviFrames(Multimodal.encodeVideoPattern(src)).toDF()
  }

  /** Cross-resolution VIDEO near-dup (p191): even doc_ids render a
    * two-frame pattern video at 72×64, odd doc_ids render the SAME
    * frame seeds (`floor(doc_id/2)`) at 144×128 — the classic
    * re-encoded copy, different in every payload byte. Every frame of
    * every video is genuinely decoded ([[Multimodal.videoSignatures]]:
    * container walk + JPEG decode + per-frame dHash), the ordered
    * frame-hash sequence is the video's 16-byte signature, and the
    * near-dup join is a signature EQUI-join — so the planted
    * (2k, 2k+1) pairs surface iff the real decoders recover the same
    * perceptual content at both resolutions, and nothing else pairs
    * (distinct seeds give distinct patterns, the p77 fixture
    * argument). The oracle replays the planted pair list in closed
    * form; a single wrong/missing/extra pair hash-mismatches.
    *
    * Scale shape: decode+hash is per-row, zero exchange; the join
    * shuffles 16-byte signatures, never frames — at 100 TB the same
    * plan dedups a video corpus with payloads read exactly once.
    */
  def p191VideoNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    def vids(parity: Int, cell: Int) = Multimodal.encodePatternVideo(
      docs.filter(pmod(col("doc_id"), lit(2)) === parity)
        .select(col("doc_id"), floor(col("doc_id") / 2).cast("long"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Long)],
      nFrames = 2, cell = cell)
    val sigs = Multimodal.videoSignatures(vids(0, 8).union(vids(1, 16)))
      .toDF()
    sigs.as("a").join(sigs.as("b"),
        col("a.vsig") === col("b.vsig") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("doc_a"),
        col("b.media_id").as("doc_b"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p190_video_frames" -> p190VideoFrames _,
    "p191_video_neardup" -> p191VideoNearDup _)

  def oracle: Map[String, String] = Map(
    "p190_video_frames" ->
      """WITH fr AS (
        |  SELECT doc_id, UNNEST(generate_series(0, doc_id % 3)) AS f
        |  FROM documents)
        |SELECT doc_id AS media_id, f AS frame_idx,
        |  CAST(48 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
        |  CAST((doc_id + f) % 4 AS BIGINT) AS luma_level
        |FROM fr""".stripMargin,
    "p191_video_neardup" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 2 = 0""".stripMargin)
}
