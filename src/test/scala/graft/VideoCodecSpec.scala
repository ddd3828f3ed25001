package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Pins the GPV1 packed-frame container (q239's video path): random-access
  * extraction, malformed-input rejection, and the end-to-end
  * pack → sample → decode → hash equivalence with hashing the frames
  * directly (the container must be transparent).
  */
class VideoCodecSpec extends AnyFunSuite {
  import TestSpark._

  private val vc = new Multimodal.VideoCodec
  private val ic = new Multimodal.ImageCodec

  private def frame(seed: Int): Array[Byte] =
    ic.encodeGrayPng(8, 8, (x, y) => (seed * 29 + x * 3 + y * 5) % 256)

  test("pack/frame round-trips every frame at random access") {
    val frames = (0 until 5).map(frame)
    val packed = vc.pack(frames)
    assert(vc.frameCount(packed) == 5)
    // extraction order deliberately != storage order
    for (i <- Seq(3, 0, 4, 2, 1))
      assert(java.util.Arrays.equals(vc.frame(packed, i), frames(i)))
  }

  test("empty container and malformed inputs fail loudly") {
    assert(vc.frameCount(vc.pack(Seq.empty)) == 0)
    intercept[IllegalArgumentException](vc.frame(vc.pack(Seq.empty), 0))
    intercept[IllegalArgumentException](vc.frameCount(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      vc.frameCount("AVI0".getBytes ++ new Array[Byte](8)))
    intercept[IllegalArgumentException](vc.frame(vc.pack(Seq(frame(1))), 1))
  }

  test("sampled hashes through the container equal direct frame hashes") {
    import spark.implicits._
    val frames = (0 until 7).map(frame)
    val media = Seq(Multimodal.MediaRow(42L, "video", vc.pack(frames), 8, 8, 0, "gpv1")).toDS()
    val sampled = Multimodal.sampleFrameHashes(media, everyNth = 2, maxFrames = 3)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toList == List(0, 2, 4))
    val direct = Seq(0, 2, 4).map { i =>
      val (hi, lo, n) = ic.aHash64(ic.decode(frames(i)))
      (i, hi, lo, n)
    }
    assert(sampled.map(f => (f.frame_idx, f.fp_hi, f.fp_lo, f.n_set)).toList == direct)
  }

  // ---- GPV2: delta-coded container (q251's path) ----

  private val v2 = new Multimodal.VideoCodecV2

  private def grayFrame(seed: Int): Array[Int] =
    Array.tabulate(64)(i => (seed * 29 + (i % 8) * 3 + (i / 8) * 5) % 256)

  test("v2 pack/decode is lossless through the residual chain") {
    val frames = (0 until 6).map(grayFrame)
    val packed = v2.pack(8, 8, frames)
    assert(v2.frameCount(packed) == 6)
    val rec = v2.decodeGray(packed, 5)
    for (i <- 0 until 6) {
      assert(rec(i)._1 == 8 && rec(i)._2 == 8)
      assert(rec(i)._3.toList == frames(i).toList, s"frame $i diverged")
    }
    // prefix decode stops where asked
    assert(v2.decodeGray(packed, 2).length == 3)
  }

  test("v2 mod-256 residual wraparound reconstructs exactly") {
    // adjacent frames differ by +200 per pixel: residual wraps mod 256
    val f0 = Array.fill(64)(250)
    val f1 = f0.map(v => (v + 200) & 0xFF)
    val f2 = f1.map(v => (v + 200) & 0xFF)
    val rec = v2.decodeGray(v2.pack(8, 8, Seq(f0, f1, f2)), 2)
    assert(rec(1)._3.toList == f1.toList && rec(2)._3.toList == f2.toList)
  }

  test("v2 static scene compresses: delta frames are tiny zero-run records") {
    val f = grayFrame(3)
    val static = v2.pack(8, 8, Seq.fill(10)(f))
    // per-pixel noise — residuals vary pixel to pixel, so runs stay short
    // (grayFrame(i)→grayFrame(i+1) differs by a CONSTANT, which RLE would
    // compress exactly as well as zeros)
    val dynamic = v2.pack(8, 8,
      (0 until 10).map(s => Array.tabulate(64)(i => (s * i * 13 + i * i * 7) % 256)))
    assert(static.length < dynamic.length / 2,
      s"static ${static.length} B should undercut dynamic ${dynamic.length} B")
    val rec = v2.decodeGray(static, 9)
    assert(rec(9)._3.toList == f.toList)
  }

  test("v2 malformed inputs fail loudly") {
    intercept[IllegalArgumentException](v2.frameCount(Array[Byte](1, 2)))
    intercept[IllegalArgumentException](
      v2.frameCount("GPV1".getBytes ++ new Array[Byte](8))) // wrong magic = v1
    val packed = v2.pack(8, 8, Seq(grayFrame(0), grayFrame(1)))
    intercept[IllegalArgumentException](v2.decodeGray(packed, 2))
    // truncated container: drop the tail of the payload
    val cut = java.util.Arrays.copyOfRange(packed, 0, packed.length - 4)
    intercept[IllegalArgumentException](v2.decodeGray(cut, 1))
  }

  test("v2 sampled hashes equal hashing the source pixels directly") {
    import spark.implicits._
    val frames = (0 until 9).map(grayFrame)
    val media = Seq(Multimodal.MediaRow(7L, "video",
      v2.pack(8, 8, frames), 8, 8, 0, "gpv2")).toDS()
    val sampled = Multimodal.sampleFrameHashesV2(media, everyNth = 2, maxFrames = 4)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toList == List(0, 2, 4, 6))
    val direct = Seq(0, 2, 4, 6).map { i =>
      val (hi, lo, n) = ic.aHash64(v2.grayImage(8, 8, frames(i)))
      (i, hi, lo, n)
    }
    assert(sampled.map(f => (f.frame_idx, f.fp_hi, f.fp_lo, f.n_set)).toList == direct)
  }
}
