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
      .as[(Long, Int)]
    Multimodal.decodeAviFrames(Multimodal.encodeVideoPattern(src)).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p190_video_frames" -> p190VideoFrames _)

  def oracle: Map[String, String] = Map(
    "p190_video_frames" ->
      """WITH fr AS (
        |  SELECT doc_id, UNNEST(generate_series(0, doc_id % 3)) AS f
        |  FROM documents)
        |SELECT doc_id AS media_id, f AS frame_idx,
        |  CAST(48 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
        |  CAST((doc_id + f) % 4 AS BIGINT) AS luma_level
        |FROM fr""".stripMargin)
}
