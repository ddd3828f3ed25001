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
}
