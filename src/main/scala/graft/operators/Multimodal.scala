package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.2 [EXT] "multimodal columns"):
  * image/audio/video as opaque `binary` columns with typed metadata, and the
  * per-partition batch-processing shape a real decode/feature pipeline uses.
  *
  * The image and audio decodes are REAL pure-JVM codecs — `javax.imageio`
  * (PNG/BMP/GIF ship with the JDK) and `javax.sound.sampled` (WAV PCM) — no
  * native libraries required. Only VIDEO falls back to a digest-derived
  * pseudo-feature: no pure-JVM video codec exists; the fallback is the
  * explicit, documented seam where ffmpeg-class tooling plugs in.
  *
  * Scale notes: binary payloads ride the scan and never enter a shuffle
  * (features are extracted first, and only features move); decoders are
  * heavyweight, so they are constructed once per PARTITION, never per row —
  * the mapPartitions shape below is the Scala twin of `mapInPandas`
  * batching.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,              // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int, height: Int,   // image/video
      sample_rate: Int,          // audio
      format: String)

  /** Extracted features: fixed-dim embedding + basic stats. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float])

  /** Decoded image statistics (what a real pipeline keys quality filters on). */
  final case class ImageStats(
      media_id: Long,
      width: Int, height: Int,
      n_px: Long,
      sum_luma: Long)

  /** Perceptual-hash fingerprint of a decoded image (two sign-safe 32-bit
    * halves of the 64-bit aHash — see [[ImageCodec.aHash64]]).
    */
  final case class ImageHash(
      media_id: Long,
      width: Int, height: Int,
      fp_hi: Long, fp_lo: Long,
      n_set: Int)

  /** Decoded audio statistics. */
  final case class AudioStats(
      media_id: Long,
      sample_rate: Int,
      n_samples: Long,
      sum_amp: Long,
      sum_abs: Long)

  /** Per-sampled-frame perceptual hash of a video asset. */
  final case class FrameHash(
      media_id: Long,
      frame_idx: Int,
      width: Int, height: Int,
      fp_hi: Long, fp_lo: Long,
      n_set: Int)

  /** Real image codec over `javax.imageio` (JDK-bundled PNG/BMP/GIF readers —
    * no native codecs needed). One instance per partition.
    */
  final class ImageCodec extends Serializable {
    var decodedCount: Long = 0L // observability: one codec per partition

    /** Fixture/test helper: deterministic grayscale PNG. Lossless — the
      * band-0 samples read back exactly as written.
      */
    def encodeGrayPng(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { raster.setSample(x, y, 0, gray(x, y) & 0xFF); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Fixture/test helper: deterministic grayscale JPEG — the standard
      * crawl container, LOSSY by design. The codec is the JDK's own
      * (`javax.imageio` ships a JPEG reader+writer in java.desktop), so
      * decode stays pure-JVM like the PNG path; what changes is the
      * CONTRACT — decoded samples approximate the source, so gates assert
      * exact structure (dims, pixel counts) plus a bounded distortion,
      * never exact luma.
      */
    def encodeGrayJpeg(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { raster.setSample(x, y, 0, gray(x, y) & 0xFF); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    /** Fixture/test helper: deterministic grayscale TIFF — the archival
      * container (JDK-bundled reader+writer since 9, pure-JVM). LOSSLESS:
      * decoded samples read back exactly, so TIFF gates share PNG's
      * exact-luma oracle contract rather than JPEG's bounded-distortion one.
      */
    def encodeGrayTiff(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { raster.setSample(x, y, 0, gray(x, y) & 0xFF); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "tiff", bos)
      bos.toByteArray
    }

    /** Sum of |decoded − reference(x, y)| over a decoded grayscale image —
      * the lossy-codec distortion audit (integer, deterministic given the
      * decoder).
      */
    def absErrSum(img: java.awt.image.BufferedImage, ref: (Int, Int) => Int): Long = {
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          sum += math.abs(raster.getSample(x, y, 0) - (ref(x, y) & 0xFF))
          x += 1
        }
        y += 1
      }
      sum
    }

    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      decodedCount += 1
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      img
    }

    /** (width, height, sum of per-pixel luminance). Luminance = the single
      * band for grayscale images, integer mean of the color bands otherwise
      * (deterministic — no float weighting).
      */
    def stats(img: java.awt.image.BufferedImage): (Int, Int, Long) = {
      val raster = img.getRaster
      val w = img.getWidth; val h = img.getHeight
      val bands = raster.getNumBands
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (bands == 1) sum += raster.getSample(x, y, 0)
          else {
            var b = 0; var s = 0
            while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
            sum += s / bands
          }
          x += 1
        }
        y += 1
      }
      (w, h, sum)
    }

    /** 64-bit perceptual average-hash (aHash) of a decoded grayscale image:
      * the pixels fold into an 8×8 block grid (block (bx,by) covers
      * x∈[bx·w/8,(bx+1)·w/8), so dims must be divisible by 8 for equal
      * blocks), and bit by·8+bx is set iff the block's mean luminance
      * STRICTLY exceeds the image mean — in integers, `blockSum·64 >
      * totalSum` (equal-size blocks make the two means comparable without
      * division; ties → 0, mirrored verbatim by the SQL oracle). Returned
      * as two sign-safe 32-bit halves (bits 32-63, bits 0-31) plus the
      * popcount, so downstream banding/XOR arithmetic never touches the
      * BIGINT sign bit in either engine.
      *
      * Near-dup property: any pixel edit that preserves block sums (and any
      * edit small enough not to flip a block-vs-total comparison) leaves the
      * hash unchanged, so visually-identical re-encodes land in the same
      * Hamming bucket — the image twin of MinHash for text.
      */
    def aHash64(img: java.awt.image.BufferedImage): (Long, Long, Int) = {
      val raster = img.getRaster
      val w = img.getWidth; val h = img.getHeight
      require(w % 8 == 0 && h % 8 == 0, s"aHash64 needs dims divisible by 8, got ${w}x$h")
      val bs = new Array[Long](64)
      var ts = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = raster.getSample(x, y, 0)
          bs((y * 8 / h) * 8 + (x * 8 / w)) += g
          ts += g
          x += 1
        }
        y += 1
      }
      var hi = 0L; var lo = 0L; var n = 0
      var b = 0
      while (b < 64) {
        if (bs(b) * 64 > ts) {
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
          n += 1
        }
        b += 1
      }
      (hi, lo, n)
    }

    /** REAL pixel resize: 2× box-filter downsample of a grayscale image —
      * output pixel (x,y) = ⌊(sum of the 2×2 input block)/4⌋. Integer floor
      * keeps the transform exactly reproducible by the SQL oracle (a
      * float-weighted resampler would not be). Dims must be even.
      */
    def resizeBox2x(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
      val w = img.getWidth; val h = img.getHeight
      require(w % 2 == 0 && h % 2 == 0, s"resizeBox2x needs even dims, got ${w}x$h")
      val in = img.getRaster
      val out = new java.awt.image.BufferedImage(
        w / 2, h / 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val or = out.getRaster
      var y = 0
      while (y < h / 2) {
        var x = 0
        while (x < w / 2) {
          val s = in.getSample(2 * x, 2 * y, 0) + in.getSample(2 * x + 1, 2 * y, 0) +
            in.getSample(2 * x, 2 * y + 1, 0) + in.getSample(2 * x + 1, 2 * y + 1, 0)
          or.setSample(x, y, 0, s / 4)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Fixed-dim feature from real pixels: pixels bucketed row-major into
      * `dim` cells, mean luminance per cell, normalized to [-1, 1].
      */
    def gridFeature(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val raster = img.getRaster
      val w = img.getWidth; val h = img.getHeight
      val n = w.toLong * h
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val cell = (((y.toLong * w + x) * dim) / n).toInt min (dim - 1)
          sums(cell) += raster.getSample(x, y, 0)
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(dim)(i =>
        if (counts(i) == 0) 0f
        else (sums(i).toDouble / counts(i) / 127.5 - 1.0).toFloat)
    }
  }

  /** Real audio codec over `javax.sound.sampled` (JDK-bundled WAV reader).
    * 16-bit PCM mono in/out. One instance per partition.
    */
  final class AudioCodec extends Serializable {
    var decodedCount: Long = 0L

    /** Fixture/test helper: deterministic 16-bit PCM mono WAV. */
    def encodeWavPcm16(samples: Array[Short], sampleRate: Float): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) { // little-endian, matching the format above
        data(2 * i) = (samples(i) & 0xFF).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** (sample rate, decoded 16-bit samples). */
    def decodePcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
      decodedCount += 1
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val raw = ais.readAllBytes()
      val out = new Array[Short](raw.length / 2)
      val le = !fmt.isBigEndian
      var i = 0
      while (i < out.length) {
        out(i) =
          if (le) (((raw(2 * i + 1) & 0xFF) << 8) | (raw(2 * i) & 0xFF)).toShort
          else (((raw(2 * i) & 0xFF) << 8) | (raw(2 * i + 1) & 0xFF)).toShort
        i += 1
      }
      (fmt.getSampleRate.toInt, out)
    }

    /** Fixed-dim feature from real samples: `dim` consecutive blocks, mean
      * amplitude per block, normalized to [-1, 1].
      */
    def blockFeature(samples: Array[Short], dim: Int): Array[Float] = {
      val n = samples.length.toLong max 1L
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < samples.length) {
        val cell = ((i.toLong * dim) / n).toInt min (dim - 1)
        sums(cell) += samples(i)
        counts(cell) += 1
        i += 1
      }
      Array.tabulate(dim)(i =>
        if (counts(i) == 0) 0f
        else (sums(i).toDouble / counts(i) / 32768.0).toFloat)
    }
  }

  /** Per-partition decode dispatcher: real codecs for image and audio, and a
    * clearly-marked digest fallback for video (the one kind with no pure-JVM
    * codec — swap in an ffmpeg binding here without touching the dataflow).
    */
  final class MediaDecoder(featureDim: Int) extends Serializable {
    val image = new ImageCodec
    val audio = new AudioCodec

    def feature(r: MediaRow): Array[Float] = r.kind match {
      case "image" => image.gridFeature(image.decode(r.bytes), featureDim)
      case "audio" => audio.blockFeature(audio.decodePcm16(r.bytes)._2, featureDim)
      case _       => digestFeature(r.bytes)
    }

    /** VIDEO FALLBACK ONLY: deterministic pseudo-feature from a rolling
      * digest of the payload — stands in for a real frame-decode + embed.
      */
    def digestFeature(bytes: Array[Byte]): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Float](featureDim)
      var seed = bytes
      var i = 0
      while (i < featureDim) {
        seed = md.digest(seed)
        out(i) = ((java.nio.ByteBuffer.wrap(seed).getInt(0) & 0x0FFFFFFF).toFloat
          / 0x0FFFFFFF.toFloat) * 2.0f - 1.0f
        i += 1
      }
      out
    }
  }

  /** Batch feature extraction: one decoder per partition, rows streamed
    * through it. Image/audio features come from REAL decoded pixels/samples.
    */
  def extractFeatures(media: Dataset[MediaRow], featureDim: Int = 16,
      decoderCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new MediaDecoder(featureDim) // ONE per partition
      decoderCounter.foreach(_.add(1))
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, decoder.feature(r))
      }
    }
  }

  /** Real image decode → stats, one codec per partition. Recovers
    * width/height from the BYTES (the metadata columns are not consulted).
    */
  def decodeImageStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new ImageCodec
      rows.map { r =>
        val (w, h, sum) = codec.stats(codec.decode(r.bytes))
        ImageStats(r.media_id, w, h, w.toLong * h, sum)
      }
    }
  }

  /** Packed-frame video container ("GPV1"): magic + frame index + a
    * concatenation of intra-coded PNG frames. This is the structural
    * contract of a real container — magic validation, random access via
    * the offset table, per-frame payload decode — with a pure-JVM frame
    * codec, so frame EXTRACTION and SAMPLING are real end-to-end even
    * though no inter-frame (ffmpeg-class) codec exists on the JVM; that
    * codec plugs into [[frame]]'s payload decode without touching the
    * container or the Spark plumbing (the documented seam from COVERAGE.md
    * "Known gaps", now narrowed from "whole video path" to "inter-frame
    * compression only").
    *
    * Layout (big-endian): `"GPV1" | i32 n | i32 off[n] | i32 payloadLen |
    * payload` with offsets relative to payload start; off[i+1] (or
    * payloadLen) delimits frame i.
    */
  final class VideoCodec extends Serializable {
    private val Magic = Array[Byte]('G', 'P', 'V', '1')

    def pack(frames: Seq[Array[Byte]]): Array[Byte] = {
      val payloadLen = frames.map(_.length).sum
      val buf = java.nio.ByteBuffer.allocate(4 + 4 + 4 * frames.length + 4 + payloadLen)
      buf.put(Magic).putInt(frames.length)
      var off = 0
      frames.foreach { f => buf.putInt(off); off += f.length }
      buf.putInt(payloadLen)
      frames.foreach(buf.put)
      buf.array()
    }

    private def header(bytes: Array[Byte]): java.nio.ByteBuffer = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      val m = new Array[Byte](4)
      require(bytes.length >= 12, s"truncated container: ${bytes.length} bytes")
      buf.get(m)
      require(java.util.Arrays.equals(m, Magic),
        s"bad container magic: ${m.map(b => f"$b%02x").mkString}")
      buf
    }

    def frameCount(bytes: Array[Byte]): Int = header(bytes).getInt()

    /** Random-access extraction of frame `i`'s payload bytes. */
    def frame(bytes: Array[Byte], i: Int): Array[Byte] = {
      val buf = header(bytes)
      val n = buf.getInt()
      require(i >= 0 && i < n, s"frame $i out of range [0, $n)")
      val offs = Array.fill(n)(buf.getInt())
      val payloadLen = buf.getInt()
      val start = offs(i)
      val end = if (i + 1 < n) offs(i + 1) else payloadLen
      require(start >= 0 && end <= payloadLen && start <= end,
        s"corrupt offset table for frame $i: [$start, $end) of $payloadLen")
      // copyOfRange zero-pads past the array end, which would yield
      // silently corrupt frame bytes when the container is truncated
      // relative to its declared payloadLen — fail loudly instead.
      require(buf.position() + end <= bytes.length,
        s"truncated payload: frame $i needs ${buf.position() + end} bytes, " +
          s"container has ${bytes.length}")
      java.util.Arrays.copyOfRange(bytes, buf.position() + start, buf.position() + end)
    }
  }

  /** Delta-frame video container ("GPV2") — inter-frame compression in
    * pure JVM, closing the last seam COVERAGE.md's known-gaps note left on
    * the video path (GPV1 is intra-only). Outer layout is GPV1's
    * (`magic | i32 n | i32 off[n] | i32 payloadLen | payload`) with magic
    * "GPV2"; per-frame payloads are tagged:
    *
    *   - `'K'` + PNG bytes — intra keyframe (frame 0);
    *   - `'D'` + i32 w + i32 h + RLE — residual frame: the per-pixel
    *     difference (cur − prevRecon) mod 256, zero-run RLE-coded as
    *     (runLen u8 ≥ 1, value u8) pairs. Mod-256 residuals make the
    *     codec LOSSLESS (recon = (prev + resid) & 0xFF), and a static
    *     scene collapses to a handful of zero runs.
    *
    * The real cost model of inter-frame codecs follows: random access
    * becomes PREFIX decode (frame i needs 0..i), so the sampling operator
    * reconstructs sequentially — one pass to the last sampled index per
    * asset, never re-decoding the prefix per sample.
    */
  final class VideoCodecV2 extends Serializable {
    private val Magic = Array[Byte]('G', 'P', 'V', '2')

    def pack(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] = {
      require(frames.nonEmpty, "empty video")
      frames.foreach(f =>
        require(f.length == width * height, "frame size mismatch"))
      val ic = new ImageCodec
      var prev: Array[Int] = null
      val encoded = frames.map { f =>
        val e =
          if (prev == null)
            'K'.toByte +: ic.encodeGrayPng(width, height, (x, y) => f(y * width + x))
          else deltaFrame(width, height, f, prev)
        prev = f
        e
      }
      val payloadLen = encoded.map(_.length).sum
      val buf = java.nio.ByteBuffer.allocate(4 + 4 + 4 * encoded.length + 4 + payloadLen)
      buf.put(Magic).putInt(encoded.length)
      var off = 0
      encoded.foreach { e => buf.putInt(off); off += e.length }
      buf.putInt(payloadLen)
      encoded.foreach(buf.put)
      buf.array()
    }

    private def deltaFrame(w: Int, h: Int, cur: Array[Int],
        prev: Array[Int]): Array[Byte] = {
      val resid = Array.tabulate(cur.length)(i => ((cur(i) - prev(i)) & 0xFF).toByte)
      val out = new java.io.ByteArrayOutputStream()
      out.write('D'.toInt)
      val dims = java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h)
      out.write(dims.array())
      var i = 0
      while (i < resid.length) {
        var j = i
        while (j < resid.length && resid(j) == resid(i) && j - i < 255) j += 1
        out.write(j - i)
        out.write(resid(i) & 0xFF)
        i = j
      }
      out.toByteArray
    }

    private def header(bytes: Array[Byte]): java.nio.ByteBuffer = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      val m = new Array[Byte](4)
      require(bytes.length >= 12, s"truncated container: ${bytes.length} bytes")
      buf.get(m)
      require(java.util.Arrays.equals(m, Magic),
        s"bad container magic: ${m.map(b => f"$b%02x").mkString}")
      buf
    }

    def frameCount(bytes: Array[Byte]): Int = header(bytes).getInt()

    /** Sequential reconstruction of frames 0..`upTo` (inclusive): returns
      * (width, height, gray pixels row-major) per frame. O(upTo) by
      * construction — the inter-frame dependency chain.
      */
    def decodeGray(bytes: Array[Byte], upTo: Int): IndexedSeq[(Int, Int, Array[Int])] = {
      val buf = header(bytes)
      val n = buf.getInt()
      require(upTo >= 0 && upTo < n, s"frame $upTo out of range [0, $n)")
      val offs = Array.fill(n)(buf.getInt())
      val payloadLen = buf.getInt()
      val base = buf.position()
      require(base + payloadLen <= bytes.length,
        s"truncated payload: declared $payloadLen, container has ${bytes.length - base}")
      val ic = new ImageCodec
      var prev: (Int, Int, Array[Int]) = null
      (0 to upTo).map { i =>
        val start = offs(i)
        val end = if (i + 1 < n) offs(i + 1) else payloadLen
        require(start >= 0 && end <= payloadLen && start < end,
          s"corrupt offset table for frame $i: [$start, $end) of $payloadLen")
        val p = java.util.Arrays.copyOfRange(bytes, base + start, base + end)
        val rec: (Int, Int, Array[Int]) = p(0) match {
          case 'K' =>
            val img = ic.decode(java.util.Arrays.copyOfRange(p, 1, p.length))
            val (w, h) = (img.getWidth, img.getHeight)
            val px = new Array[Int](w * h)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            (w, h, px)
          case 'D' =>
            require(prev != null, s"delta frame $i has no prior keyframe")
            val db = java.nio.ByteBuffer.wrap(p, 1, 8)
            val (w, h) = (db.getInt(), db.getInt())
            require(w == prev._1 && h == prev._2,
              s"delta frame $i dims ${w}x$h != keyframe ${prev._1}x${prev._2}")
            val px = new Array[Int](w * h)
            var (pos, k) = (9, 0)
            while (pos + 1 < p.length && k < px.length) {
              val run = p(pos) & 0xFF
              val v = p(pos + 1) & 0xFF
              require(k + run <= px.length, s"RLE overrun in frame $i")
              var r = 0
              while (r < run) { px(k) = (prev._3(k) + v) & 0xFF; k += 1; r += 1 }
              pos += 2
            }
            require(k == px.length,
              s"RLE underrun in frame $i: decoded $k of ${px.length} pixels")
            (w, h, px)
          case t => throw new IllegalArgumentException(
            s"unknown frame tag ${t.toInt} at frame $i")
        }
        prev = rec
        rec
      }
    }

    /** Gray pixel array → BufferedImage, so reconstructed delta frames
      * feed the same [[ImageCodec.aHash64]] the intra path uses.
      */
    def grayImage(w: Int, h: Int, px: Array[Int]): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, px(y * w + x) & 0xFF); x += 1 }
        y += 1
      }
      img
    }
  }

  /** [[sampleFrameHashes]] for the delta-coded GPV2 container: the sampled
    * indices come from the same stride/cap contract, but reconstruction is
    * ONE sequential prefix decode to the last sampled index per asset
    * (inter-frame chains forbid random access), then each sampled frame
    * hashes through the identical aHash path. Container bytes still never
    * shuffle — only fixed-width (media_id, frame_idx, fp) rows move.
    */
  def sampleFrameHashesV2(media: Dataset[MediaRow], everyNth: Int,
      maxFrames: Int): Dataset[FrameHash] = {
    require(everyNth > 0 && maxFrames > 0, "sampling stride/cap must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val vc = new VideoCodecV2
      val ic = new ImageCodec
      rows.flatMap { r =>
        val n = vc.frameCount(r.bytes)
        val wanted = (0 until n by everyNth).take(maxFrames)
        if (wanted.isEmpty) Iterator.empty
        else {
          val frames = vc.decodeGray(r.bytes, wanted.last)
          wanted.iterator.map { i =>
            val (w, h, px) = frames(i)
            val (hi, lo, set) = ic.aHash64(vc.grayImage(w, h, px))
            FrameHash(r.media_id, i, w, h, hi, lo, set)
          }
        }
      }
    }
  }

  /** Real frame sampling + decode over the GPV1 container: every `everyNth`
    * frame (up to `maxFrames` per asset) is EXTRACTED from the container
    * bytes, PNG-decoded, and perceptually hashed — the video twin of
    * [[perceptualHash]]. Container bytes never shuffle: sampling, decode
    * and hashing all run inside the scan partition and only fixed-width
    * (media_id, frame_idx, fp) rows move — at 100 TB of video the shuffle
    * carries ~32 bytes per SAMPLED frame. The decode fan-out is bounded by
    * construction (`maxFrames`), mirroring [[frameSamplePlan]]'s
    * metadata-only contract.
    */
  def sampleFrameHashes(media: Dataset[MediaRow], everyNth: Int,
      maxFrames: Int): Dataset[FrameHash] = {
    require(everyNth > 0 && maxFrames > 0, "sampling stride/cap must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val vc = new VideoCodec
      val ic = new ImageCodec
      rows.flatMap { r =>
        val n = vc.frameCount(r.bytes)
        (0 until n by everyNth).take(maxFrames).iterator.map { i =>
          val img = ic.decode(vc.frame(r.bytes, i))
          val (hi, lo, set) = ic.aHash64(img)
          FrameHash(r.media_id, i, img.getWidth, img.getHeight, hi, lo, set)
        }
      }
    }
  }

  /** Real image decode → 64-bit perceptual aHash, one codec per partition.
    * Bytes never shuffle: decode and hash happen in the scan partition and
    * only the fixed-width fingerprint rows move — at 100 TB of images the
    * shuffle carries 28 bytes/asset.
    */
  def perceptualHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new ImageCodec
      rows.map { r =>
        val img = codec.decode(r.bytes)
        val (hi, lo, n) = codec.aHash64(img)
        ImageHash(r.media_id, img.getWidth, img.getHeight, hi, lo, n)
      }
    }
  }

  /** Real audio decode → stats, one codec per partition. */
  def decodeAudioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new AudioCodec
      rows.map { r =>
        val (rate, samples) = codec.decodePcm16(r.bytes)
        var sum = 0L; var abs = 0L
        var i = 0
        while (i < samples.length) {
          sum += samples(i); abs += math.abs(samples(i).toInt); i += 1
        }
        AudioStats(r.media_id, rate, samples.length.toLong, sum, abs)
      }
    }
  }

  /** Metadata-only "resize": the part of a resize that is pure plumbing —
    * the pixel transform itself is the codec's job.
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    media
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling plan for video payloads: every `everyNth` frame index up
    * to `maxFrames` — generates (media_id, frame_idx) WITHOUT touching the
    * bytes, so the expensive decode fan-out is explicit and bounded.
    */
  def frameSamplePlan(media: DataFrame, frameCount: org.apache.spark.sql.Column,
      everyNth: Int, maxFrames: Int): DataFrame =
    media
      .withColumn("frame_idx",
        // frameCount == 0 (empty/corrupt asset) must yield zero frame rows,
        // not an illegal-sequence-boundaries error killing the job
        explode(when(frameCount > 0,
          slice(sequence(lit(0), frameCount - 1, lit(everyNth)), 1, maxFrames))
          .otherwise(array().cast("array<int>"))))

  /** Join features back to metadata for downstream similarity search. */
  def withFeatures(media: DataFrame, features: DataFrame): DataFrame =
    media.join(features.drop("kind"), Seq("media_id"))
}
