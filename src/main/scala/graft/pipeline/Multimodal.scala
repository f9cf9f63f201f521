package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus batched per-partition
  * feature extraction.
  *
  * Beyond-reference surface (BASELINE.json north star). IMAGE payloads
  * (PNG/JPEG/GIF/BMP, sniffed by magic number) are decoded for REAL
  * through `javax.imageio` — dimensions and mean luma come from the
  * actual raster. Only payloads with no JDK codec (video, unknown
  * formats) fall back to a deterministic STUB keyed on the payload
  * bytes, clearly marked below.
  *
  * Scale design: payload bytes ride in the row (Parquet binary), so a
  * scan prunes them unless requested (`ReadSchema` check); feature
  * extraction is `mapPartitions` over a typed Dataset — one codec
  * initialization per partition, streaming iterator, no per-row setup
  * and no driver collect. On a real cluster the same code fans out per
  * input split.
  */
object Multimodal {

  case class MediaRow(media_id: Long, content: Array[Byte], mime: String)

  case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      checksum: String,
      width: Int,
      height: Int,
      mean_luma: Double)

  /** True when the payload's magic number marks a format `ImageIO`
    * decodes out of the box: PNG, JPEG, GIF, or BMP. The dispatch is
    * on CONTENT, not the mime column — a mislabeled payload still
    * takes the right path. Signatures are checked in full (GIF's
    * 6-byte `GIF87a`/`GIF89a`, BMP's 2-byte tag plus a known DIB
    * header size) so ordinary text starting with "BM"/"GIF" is not
    * misrouted into the decoder; [[tryDecodeImage]] backstops the
    * residual false positives.
    */
  def isImagePayload(b: Array[Byte]): Boolean =
    (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G') ||
    (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) ||
    (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') ||
    (b.length >= 18 && b(0) == 'B' && b(1) == 'M' && {
      // little-endian DIB header size at offset 14: one of the sizes
      // any real BMP writer emits
      val dib = (b(14) & 0xff) | ((b(15) & 0xff) << 8) |
        ((b(16) & 0xff) << 16) | ((b(17) & 0xff) << 24)
      dib == 12 || dib == 40 || dib == 52 || dib == 56 || dib == 64 ||
        dib == 108 || dib == 124
    })

  /** Magic-sniff + `ImageIO` parse in one guarded step: null when the
    * payload is not an image OR the bytes fail to parse despite a
    * magic hit (truncated file, lying prefix). Callers fall back to
    * the stub path on null, so a payload that happens to start with
    * an image signature degrades to stub features instead of
    * crashing the whole job.
    */
  private def tryDecodeImage(b: Array[Byte]): java.awt.image.BufferedImage =
    if (!isImagePayload(b)) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case scala.util.control.NonFatal(_) => null }

  /** REAL image decode for feature extraction: one pass over the
    * decoded raster for mean luma (per-pixel channel average,
    * normalized to [0,1] — exact double math: channel sums are
    * integers, so the division order below is reproducible by any
    * engine computing the same closed form).
    */
  private def imageFeatures(id: Long, mime: String, bytes: Array[Byte],
      digest: String, img: java.awt.image.BufferedImage): MediaFeatures = {
    val w = img.getWidth
    val h = img.getHeight
    // bulk row reads, not per-pixel getRGB — one colormodel conversion
    // per row keeps the raster pass linear in bytes, not API calls
    val rowBuf = new Array[Int](w)
    var lumaSum = 0.0
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        lumaSum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
          (rgb & 0xff)) / 3.0
        x += 1
      }
      y += 1
    }
    MediaFeatures(id, mime, bytes.length.toLong, digest, w, h,
      lumaSum / (w.toLong * h) / 255.0)
  }

  /** Attach typed metadata to a binary payload column — pure Column
    * expressions (codegen, no decode needed): byte length and an md5
    * checksum of the payload bytes (equals any engine's md5 of the
    * UTF-8 source string, keeping the oracle portable).
    */
  def withMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("checksum", md5(col(binCol)))

  /** Batched "decode + feature extraction" over a typed Dataset.
    *
    * Image payloads (magic-sniffed) go through the REAL `ImageIO`
    * decoder; everything else (video, unknown) through the documented
    * stub. The partition-iterator shape (init once, stream rows, no
    * materialization) is the part that matters at scale and is exactly
    * what a libjpeg/ffmpeg binding would use.
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init would go here (codec handles, buffers)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { row =>
        val bytes = row.content
        val digest = md.digest(bytes).map("%02x".format(_)).mkString
        md.reset()
        val img = tryDecodeImage(bytes)
        if (img != null) imageFeatures(row.media_id, row.mime, bytes, digest, img)
        else decodeOne(row.media_id, row.mime, bytes, digest)
      }
    }
  }

  /** STUB decode — the fallback for payloads the JDK cannot decode
    * (video, unknown formats): deterministic fake dimensions/luma
    * derived from the payload bytes. A real build replaces this body
    * with an ffmpeg binding; image payloads never reach it (they are
    * sniffed into [[imageFeatures]]).
    */
  private def decodeOne(id: Long, mime: String, bytes: Array[Byte],
      digest: String): MediaFeatures = {
    val n = bytes.length
    val w = 64 + (if (n > 0) (bytes(0) & 0xff) % 192 else 0)
    val h = 64 + (if (n > 1) (bytes(1) & 0xff) % 192 else 0)
    val luma = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / n / 255.0
    MediaFeatures(id, mime, n.toLong, digest, w, h, luma)
  }

  case class FrameRow(media_id: Long, frame_idx: Long, frame_checksum: String)

  /** Frame sampling: one payload row expands to every `every`-th
    * frame, at most `maxFrames` of them — the row-expanding
    * mapPartitions shape (iterator flatMap, codec init once per
    * partition) an ffmpeg binding would use.
    *
    * Image payloads (magic-sniffed) are decoded for REAL: a still
    * image is its own single frame, fingerprinted from the DECODED
    * properties (`"<w>x<h>:<px00>"` md5) — never the payload bytes,
    * which vary across encoders. Video/opaque payloads use the STUB:
    * the frame count derives from the payload byte length (40 bytes ≙
    * one fake frame) and each "frame" is fingerprinted as the md5 of
    * the payload bytes plus a `#<idx>` suffix — deterministic, so any
    * engine reproduces it from the source text.
    */
  def sampleFrames(ds: Dataset[MediaRow], every: Int,
      maxFrames: Int): Dataset[FrameRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init would go here (demuxer handles, buffers)
      val md = java.security.MessageDigest.getInstance("MD5")
      def fp(bytes: Array[Byte]): String = {
        val digest = md.digest(bytes).map("%02x".format(_)).mkString
        md.reset()
        digest
      }
      it.flatMap { row =>
        val img = tryDecodeImage(row.content)
        if (img != null) {
          val key = s"${img.getWidth}x${img.getHeight}:" +
            s"${img.getRGB(0, 0) & 0xffffff}"
          Seq(FrameRow(row.media_id, 0L, fp(key.getBytes("UTF-8"))))
        } else {
          val nFrames = row.content.length / 40 + 1
          (0 until maxFrames).map(_.toLong * every).filter(_ < nFrames).map { i =>
            FrameRow(row.media_id, i,
              fp(row.content ++ s"#$i".getBytes("UTF-8")))
          }
        }
      }
    }
  }

  case class EncodedImage(media_id: Long, png: Array[Byte])

  case class DecodedImage(media_id: Long, width: Long, height: Long,
      px00: Long)

  /** REAL PNG encode — no stub: a solid-color image is rasterized and
    * written through `javax.imageio`'s actual PNG encoder, so the
    * payload column carries genuine codec output. The mapPartitions
    * shape is [[extractFeatures]]'s: stream the iterator, reuse
    * per-partition buffers, never materialize a partition.
    */
  def encodePng(ds: Dataset[(Long, Int, Int, Int)]): Dataset[EncodedImage] =
    encodeImage(ds, "png")

  /** Format-generic twin of [[encodePng]]: `format` is any writer
    * `ImageIO` ships ("png", "jpg", "gif", "bmp"). JPEG output is
    * LOSSY — oracles over JPEG payloads must pin dimensions and coarse
    * pixel bands, never exact pixel values or bytes.
    */
  def encodeImage(ds: Dataset[(Long, Int, Int, Int)],
      format: String): Dataset[EncodedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val bos = new java.io.ByteArrayOutputStream()
      it.map { case (id, w, h, rgb) =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(rgb))
        g.fillRect(0, 0, w, h)
        g.dispose()
        bos.reset()
        javax.imageio.ImageIO.write(img, format, bos)
        EncodedImage(id, bos.toByteArray)
      }
    }
  }

  /** REAL image decode — no stub: `ImageIO.read` parses the actual
    * bytes (format-sniffed, so PNG and JPEG payloads both decode);
    * dimensions and the top-left pixel come from the decoded raster.
    * Encoded bytes are NOT portable across encoders (PNG filtering
    * choices differ, JPEG is lossy), so correctness oracles pin the
    * decoded properties, never the payload — the encode∘decode
    * identity is what certifies both codec calls ran for real.
    */
  def decodePng(ds: Dataset[EncodedImage]): Dataset[DecodedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.png))
        require(img != null, s"media_id=${r.media_id}: not a decodable image")
        DecodedImage(r.media_id, img.getWidth.toLong, img.getHeight.toLong,
          (img.getRGB(0, 0) & 0xffffff).toLong)
      }
    }
  }

  /** Per-cell luma levels (0..3) of the deterministic 9×8 test
    * pattern for `seed` — a chained draw that NEVER repeats a level
    * between horizontally adjacent cells, so every dHash comparison
    * sits across a ≥64-count luma step: large enough that a lossy
    * JPEG re-encode's block-mean error (a few counts) cannot flip the
    * comparison, which is what makes a JPEG copy of a PNG land within
    * the Hamming radius of its source. The draw mixes through a
    * splitmix64-style finalizer — a LINEAR congruential mix would make
    * every seed's step sequence a shift of one shared orbit (the
    * sequence over cell index is an arithmetic progression, so seed
    * deltas translate to index shifts) and collapse 2500 seeds onto
    * ~800 distinct hashes; the oracle never replays the mix (it pins
    * only the planted pair list), so only determinism matters here.
    */
  private[graft] def patternLevels(seed: Long): Array[Int] = {
    def mix(i: Int): Long = {
      var z = seed * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val out = new Array[Int](72)
    out(0) = java.lang.Math.floorMod(mix(0), 4L).toInt
    var i = 1
    while (i < 72) {
      out(i) = (out(i - 1) + 1 +
        java.lang.Math.floorMod(mix(i), 3L).toInt) % 4
      i += 1
    }
    out
  }

  /** Render the seed's 9×8 level pattern as a real image through an
    * actual `ImageIO` codec, each pattern cell a `cell`×`cell` block
    * of solid gray `32 + 64·level`. Same codec contract as
    * [[encodeImage]]: genuine payload bytes, so PNG output decodes
    * exactly and JPEG output is lossy — which is precisely the planted
    * near-duplicate pair [[dHash]] + banded Hamming search must find.
    * The default cell size of 8 aligns each pattern cell with exactly
    * one JPEG 8×8 DCT block: a solid block is pure DC, so lossy
    * quantization moves its mean by a few counts at most — far below
    * the 64-count steps — and the JPEG copy's dHash matches its PNG
    * source with zero flipped comparisons.
    */
  def encodePattern(ds: Dataset[(Long, Long)],
      format: String, cell: Int = 8): Dataset[EncodedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val bos = new java.io.ByteArrayOutputStream()
      val w = 9 * cell
      val h = 8 * cell
      val px = new Array[Int](w * h) // reused across rows in the partition
      it.map { case (id, seed) =>
        val levels = patternLevels(seed)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) = (32 + 64 * levels((y / cell) * 9 + (x / cell))) * 0x010101
            x += 1
          }
          y += 1
        }
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        img.setRGB(0, 0, w, h, px, 0, w) // one bulk write, no per-pixel calls
        bos.reset()
        javax.imageio.ImageIO.write(img, format, bos)
        EncodedImage(id, bos.toByteArray)
      }
    }
  }

  case class ImageHash(media_id: Long, dhash: Long)

  /** 64-bit difference hash of a decoded raster — the standard
    * perceptual fingerprint (block-average the luma to a 9×8 grid,
    * emit one bit per horizontally adjacent cell comparison). Robust
    * to re-encoding and resizing because it survives anything that
    * preserves coarse luma structure; bit `y*8+x` = cell (x+1,y)
    * brighter than cell (x,y).
    */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val (gw, gh) = (9, 8)
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](gw * gh)
    val counts = new Array[Long](gw * gh)
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      val gy = y * gh / h
      var x = 0
      while (x < w) {
        val gx = x * gw / w
        val rgb = rowBuf(x)
        sums(gy * gw + gx) += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
          (rgb & 0xff)) / 3.0
        counts(gy * gw + gx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < 8) {
        val a = sums(gy * gw + gx) / counts(gy * gw + gx)
        val b = sums(gy * gw + gx + 1) / counts(gy * gw + gx + 1)
        if (b > a) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** [[dHash64]] over a media corpus: decode each image payload
    * (magic-sniffed, [[tryDecodeImage]]) and emit its perceptual
    * hash; non-image / undecodable payloads are dropped — a
    * perceptual hash of bytes that never decoded would be noise. Same
    * partition-iterator shape as [[extractFeatures]]; the output is
    * 16 bytes per row, which is what the downstream banded Hamming
    * join shuffles instead of payloads.
    */
  def dHash(ds: Dataset[MediaRow]): Dataset[ImageHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { row =>
        val img = tryDecodeImage(row.content)
        if (img == null) None else Some(ImageHash(row.media_id, dHash64(img)))
      }
    }
  }

  case class ResizedMeta(
      media_id: Long,
      target_w: Int,
      target_h: Int,
      scale_x_micro: Long,
      scale_y_micro: Long)

  /** Resize planning: per payload, the scale factors from the decoded
    * dimensions to a target box — the 1:1 mapPartitions shape of a
    * batch resizer. Image payloads are decoded for REAL (`ImageIO`
    * header dimensions); only video/opaque payloads use the STUB
    * dimensions. Scales are fixed-point so any engine reproduces them.
    */
  def resizePlan(ds: Dataset[MediaRow], targetW: Int,
      targetH: Int): Dataset[ResizedMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val img = tryDecodeImage(row.content)
        val (w, h) =
          if (img != null) (img.getWidth, img.getHeight)
          else {
            val f = decodeOne(row.media_id, row.mime, row.content, "")
            (f.width, f.height)
          }
        ResizedMeta(row.media_id, targetW, targetH,
          math.floor(targetW * 1e6 / w).toLong,
          math.floor(targetH * 1e6 / h).toLong)
      }
    }
  }

  case class EncodedAudio(media_id: Long, wav: Array[Byte])

  case class DecodedAudio(media_id: Long, sample_rate: Long,
      channels: Long, n_frames: Long, peak: Long)

  /** REAL WAV encode — no stub: 16-bit mono PCM frames (a constant
    * `amplitude` tone; little-endian shorts) written through the JDK's
    * actual RIFF/WAVE encoder (`javax.sound.sampled.AudioSystem`). The
    * payload column carries genuine codec output, same contract as
    * [[encodePng]].
    */
  def encodeWav(ds: Dataset[(Long, Int, Int, Int)]): Dataset[EncodedAudio] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { case (id, sampleRate, nFrames, amplitude) =>
        val pcm = new Array[Byte](nFrames * 2)
        var i = 0
        while (i < nFrames) {
          pcm(2 * i) = (amplitude & 0xff).toByte
          pcm(2 * i + 1) = ((amplitude >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          sampleRate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        EncodedAudio(id, bos.toByteArray)
      }
    }
  }

  /** [[encodeWavSquare]] with a per-window amplitude CONTOUR from the
    * seed's chained level draw ([[patternLevels]], first 65 of 72):
    * 65 windows × 120 frames, window w a ±(1000 + 4000·level(w))·scale
    * square wave — audio whose energy envelope carries structure, the
    * waveform [[audioFingerprint]] hashes. `scale` produces a LOUDER
    * copy of the same recording (every sample scales exactly), the
    * audio analogue of p77's JPEG re-encode: a planted near-duplicate
    * that differs in every byte but not in contour.
    */
  def encodeWavPattern(ds: Dataset[(Long, Long)],
      scale: Int = 1): Dataset[EncodedAudio] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { case (id, seed) =>
        val levels = patternLevels(seed)
        val nFrames = 65 * 120
        val pcm = new Array[Byte](nFrames * 2)
        var i = 0
        while (i < nFrames) {
          val amp = (1000 + 4000 * levels(i / 120)) * scale
          val s = if ((i / 4) % 2 == 0) amp else -amp
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        EncodedAudio(id, bos.toByteArray)
      }
    }
  }

  case class AudioHash(media_id: Long, afp: Long)

  /** 64-bit energy-contour fingerprint over REALLY decoded PCM — the
    * audio analogue of [[dHash64]]: split the frame stream into 65
    * equal windows, take each window's mean |sample|, emit one bit
    * per adjacent-window comparison. SCALE-INVARIANT by construction
    * (a louder or quieter copy preserves every comparison exactly —
    * integer sums scale linearly), so re-leveled copies of a
    * recording land at Hamming distance 0 and feed the same banded
    * [[graft.pipeline.Dedup.hammingPairs]] join as image dHashes.
    * Zero-exchange: decode + hash per row, 16 bytes out.
    */
  def audioFingerprint(ds: Dataset[EncodedAudio]): Dataset[AudioHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.wav))
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val sums = new Array[Long](65)
        val counts = new Array[Long](65)
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
          val w = (i.toLong * 65 / n).toInt
          sums(w) += math.abs(s.toLong)
          counts(w) += 1
          i += 1
        }
        var hash = 0L
        var w = 0
        while (w < 64) {
          // mean comparison via cross-multiplied integer sums: exact,
          // no double rounding
          if (sums(w + 1) * counts(w) > sums(w) * counts(w + 1))
            hash |= 1L << w
          w += 1
        }
        AudioHash(r.media_id, hash)
      }
    }
  }

  /** REAL WAV decode — no stub: `AudioSystem.getAudioInputStream`
    * parses the actual RIFF header (sample rate, channels, frame
    * count) and the PCM frames are read back for a peak-sample stat —
    * the audio analogue of [[decodePng]], and the same oracle
    * contract: decoded properties are pinned, payload bytes never are.
    */
  def decodeWav(ds: Dataset[EncodedAudio]): Dataset[DecodedAudio] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.wav))
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val bytes = ais.readAllBytes()
        var peak = 0L
        var i = 0
        while (i + 1 < bytes.length) {
          val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
          if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
          i += 2
        }
        DecodedAudio(r.media_id, fmt.getSampleRate.toLong,
          fmt.getChannels.toLong, frames, peak)
      }
    }
  }

  /** Square-wave variant of [[encodeWav]]: frame i carries
    * `+amplitude` when `(i / period) % 2 == 0`, else `-amplitude` —
    * a waveform with sign structure, so downstream feature extraction
    * (zero crossings, energy) is non-degenerate. Same REAL RIFF/WAVE
    * encoder, 16-bit mono little-endian PCM.
    */
  def encodeWavSquare(ds: Dataset[(Long, Int, Int, Int, Int)]): Dataset[EncodedAudio] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { case (id, sampleRate, nFrames, amplitude, period) =>
        val pcm = new Array[Byte](nFrames * 2)
        var i = 0
        while (i < nFrames) {
          val s = if ((i / period) % 2 == 0) amplitude else -amplitude
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          sampleRate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        EncodedAudio(id, bos.toByteArray)
      }
    }
  }

  case class AudioFeatures(media_id: Long, n_frames: Long, peak: Long,
      energy: Long, n_crossings: Long)

  /** Audio feature extraction over REAL decoded PCM: parse the RIFF
    * header with `AudioSystem`, read the 16-bit frames back, and
    * compute exact integer features — peak amplitude, energy (sum of
    * squared samples), and sign-change (zero-crossing) count. Integer
    * math end to end, so the oracle reproduces every value exactly;
    * per-partition 1:1 map, no exchange.
    */
  def audioFeatures(ds: Dataset[EncodedAudio]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.wav))
        val frames = ais.getFrameLength
        val bytes = ais.readAllBytes()
        var peak = 0L
        var energy = 0L
        var crossings = 0L
        var prev = 0
        var i = 0
        while (i + 1 < bytes.length) {
          val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
          if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
          energy += s.toLong * s.toLong
          if (i >= 2 && ((s < 0) != (prev < 0))) crossings += 1
          prev = s
          i += 2
        }
        AudioFeatures(r.media_id, frames, peak, energy, crossings)
      }
    }
  }

  /** [[resizePlan]] over REAL decoded dimensions: the payloads are
    * actual PNGs and width/height come from `ImageIO.read`, not the
    * stub — the full resize-planning path a batch image pipeline runs
    * (decode → compute scale factors), per partition, fixed-point
    * scales.
    */
  def resizePlanPng(ds: Dataset[EncodedImage], targetW: Int,
      targetH: Int): Dataset[ResizedMeta] = {
    import ds.sparkSession.implicits._
    decodePng(ds).map { d =>
      ResizedMeta(d.media_id, targetW, targetH,
        math.floor(targetW * 1e6 / d.width).toLong,
        math.floor(targetH * 1e6 / d.height).toLong)
    }
  }

  /** Build a media table from the documents table by treating the
    * UTF-8 bytes as an opaque payload — the driver testdata carries no
    * real image column, so this is the plumbing-exercise source.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content"),
        lit("text/plain").as("mime"))
      .as[MediaRow]
  }

  /** Mixed media table from documents: EVEN doc_ids become real PNG
    * payloads (doc-derived dimensions 1+id%16 × 1+len%16 and gray
    * color (id%256)·0x010101, written through the actual encoder —
    * the p57 recipe), ODD doc_ids stay opaque text payloads. One
    * corpus that exercises both the real-decode path and the
    * documented video/opaque stub, with every decoded property
    * derivable from the doc attributes so oracles replay it in
    * closed form.
    */
  def mixedMediaFromDocuments(spark: SparkSession,
      docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    val evens = docs.filter(pmod(col("doc_id"), lit(2)) === 0).select(
        col("doc_id"),
        (lit(1) + pmod(col("doc_id"), lit(16))).cast("int"),
        (lit(1) + pmod(length(col("text")), lit(16))).cast("int"),
        (pmod(col("doc_id"), lit(256)) * 65793).cast("int"))
      .as[(Long, Int, Int, Int)]
    val pngs = encodePng(evens)
      .map(e => MediaRow(e.media_id, e.png, "image/png"))
    val texts = mediaFromDocuments(spark,
      docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    pngs.union(texts)
  }
}
