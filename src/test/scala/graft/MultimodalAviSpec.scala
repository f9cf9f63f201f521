package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** MJPEG-in-AVI: the RIFF writer/walker round-trips byte-exactly, the
  * frame decode is the JDK's REAL JPEG decoder (levels quantize back
  * exactly per the 8×8-block alignment argument), and the generic
  * media paths ([[Multimodal.sampleFrames]] /
  * [[Multimodal.extractFeatures]]) route AVI payloads through the
  * real branch instead of the unknown-format stub.
  */
class MultimodalAviSpec extends SparkSpec {

  import spark.implicits._

  test("buildAviMjpeg -> aviFrames round-trips every frame byte-exactly") {
    val frames = Seq(
      Array.tabulate(301)(i => (i % 251).toByte), // odd length: pad path
      Array.tabulate(64)(i => (i * 7 % 256).toByte))
    val avi = Multimodal.buildAviMjpeg(frames, 48, 32, fps = 10)
    assert(Multimodal.isAviPayload(avi))
    assert(!Multimodal.isAviPayload("RIFFxxxxWAVE".getBytes("US-ASCII")))
    val back = Multimodal.aviFrames(avi)
    assert(back.size == 2)
    assert(back.zip(frames).forall { case (a, b) => a.sameElements(b) })
  }

  test("decodeAviFrames recovers frame count, dims, and luma levels") {
    val src = Seq((0L, 1), (1L, 2), (2L, 3), (7L, 3)).toDS()
    val got = Multimodal.decodeAviFrames(Multimodal.encodeVideoPattern(src))
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    val exp = for {
      (id, n) <- Seq((0L, 1), (1L, 2), (2L, 3), (7L, 3))
      f <- 0 until n
    } yield (id, f.toLong, 48L, 32L, (id + f) % 4)
    assert(got.map(r => (r.media_id, r.frame_idx, r.width, r.height,
      r.luma_level)).toSeq == exp)
  }

  test("sampleFrames decodes AVI payloads for real (no stub branch)") {
    val vids = Multimodal.encodeVideoPattern(Seq((0L, 3), (4L, 3), (1L, 3)).toDS())
      .map(v => Multimodal.MediaRow(v.media_id, v.avi, "video/avi"))
    val got = Multimodal.sampleFrames(vids, every = 2, maxFrames = 2)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    // every=2 over 3 real frames -> indices 0 and 2 (the stub's
    // length/40 frame count would have sampled a different set)
    assert(got.map(r => (r.media_id, r.frame_idx)).toSeq ==
      Seq((0L, 0L), (0L, 2L), (1L, 0L), (1L, 2L), (4L, 0L), (4L, 2L)))
    // fingerprints come from DECODED properties: ids 0 and 4 render
    // identical level sequences ((0+f)%4 == (4+f)%4), id 1 does not
    val byId = got.groupBy(_.media_id)
    assert(byId(0L).map(_.frame_checksum).toSeq ==
      byId(4L).map(_.frame_checksum).toSeq)
    assert(byId(0L).map(_.frame_checksum).toSeq !=
      byId(1L).map(_.frame_checksum).toSeq)
  }

  test("videoSignatures: resolution-invariant, content-sensitive") {
    def sigs(cell: Int) = Multimodal.videoSignatures(
      Multimodal.encodePatternVideo(
        Seq((10L, 5L), (11L, 6L)).toDS(), nFrames = 2, cell = cell))
      .collect().map(v => v.media_id -> v.vsig).toMap
    val lo = sigs(8)
    val hi = sigs(16)
    // a re-render at 2x resolution is a different payload byte-wise
    // but the SAME perceptual signature, per frame dHash invariance
    assert(lo(10L) == hi(10L) && lo(11L) == hi(11L))
    // different seeds -> different patterns -> different signatures
    assert(lo(10L) != lo(11L))
    // frame ORDER is part of the signature: seeds swapped != original
    val swapped = Multimodal.videoSignatures(
      Multimodal.encodePatternVideo(Seq((12L, 5L)).toDS(),
        nFrames = 2, cell = 8)).collect().head.vsig
    assert(swapped == lo(10L)) // same seed, same order -> equal
  }

  test("extractFeatures routes AVI through real decode") {
    // id 1, 2 frames: levels (1+0)%4=1, (1+1)%4=2 -> grays 96, 160;
    // mean luma = (96+160)/2/255 up to JPEG's few-count DC error
    val vids = Multimodal.encodeVideoPattern(Seq((1L, 2)).toDS())
      .map(v => Multimodal.MediaRow(v.media_id, v.avi, "video/avi"))
    val f = Multimodal.extractFeatures(vids).collect().head
    assert(f.width == 48 && f.height == 32)
    assert(math.abs(f.mean_luma - 128.0 / 255.0) < 4.0 / 255.0,
      s"mean_luma=${f.mean_luma}")
    // unknown binary still takes the documented stub (unchanged path)
    val junk = Seq(Multimodal.MediaRow(9L,
      Array.tabulate(100)(_.toByte), "application/octet-stream")).toDS()
    assert(Multimodal.extractFeatures(junk).collect().head.width ==
      64 + (0 & 0xff) % 192)
  }
}
