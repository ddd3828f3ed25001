package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.{AnnLsh, Multimodal}
import graft.queries.VectorQueries

class AnnMultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("AnnLsh recall on clustered vectors vs brute force") {
    import spark.implicits._
    // 10 well-separated cluster centers, 30 points each with small noise:
    // nearest neighbours are same-cluster, LSH must recover most of them.
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(10, dim)(rnd.nextGaussian() * 5)
    val points = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => x + rnd.nextGaussian() * 0.1).toSeq)
    }
    val emb = points.toDF("vec_id", "e")
    val q = emb.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("e").as("qe"))

    val approx = AnnLsh.topK(emb, q, k = 5, nPlanes = 16, nBands = 4, dim = dim)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = VectorQueries.groupedTopK(
      emb.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", VectorFunctions.cosine(col("e"), col("qe"))),
      "qid", 5, Seq(col("cos").desc, col("vec_id")))
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall too low (approx=${approx.size}, exact=${exact.size})")
  }

  test("AnnIvf recall on clustered vectors vs brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val centers = Array.fill(8, dim)(rnd.nextGaussian() * 5)
    val points = (0 until 240).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + rnd.nextGaussian() * 0.1).toSeq)
    }
    val emb = points.toDF("vec_id", "e")
    val q = emb.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("e").as("qe"))

    val centroids = graft.operators.AnnIvf.trainCentroids(emb, k = 8, iters = 2, dim = dim)
    val approx = graft.operators.AnnIvf.topK(emb, q, k = 5, centroids, nprobe = 2)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = VectorQueries.groupedTopK(
      emb.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", VectorFunctions.cosine(col("e"), col("qe"))),
      "qid", 5, Seq(col("cos").desc, col("vec_id")))
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall too low")

    // determinism: training twice yields identical centroids (decimal means)
    val again = graft.operators.AnnIvf.trainCentroids(emb, k = 8, iters = 2, dim = dim)
    assert(centroids.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("dot/cosine expressions agree with plain scala") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0); val b = Seq(-1.0, 0.5, 2.0)
    val row = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b")).as("d"),
        VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .collect().head
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val c = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    assert(math.abs(row.getDouble(0) - d) < 1e-12)
    assert(math.abs(row.getDouble(1) - c) < 1e-12)
  }

  test("multimodal: real image+audio+video decode, one decoder per partition") {
    import spark.implicits._
    val img = new Multimodal.ImageCodec
    val aud = new Multimodal.AudioCodec
    val media = (0 until 40).map { i =>
      i % 3 match {
        case 0 => Multimodal.MediaRow(i.toLong, "image",
          img.encodeGrayPng(12, 10, (x, y) => (i * 31 + x * 7 + y * 13) % 256),
          12, 10, 0, "png")
        case 1 => Multimodal.MediaRow(i.toLong, "audio",
          aud.encodeWavPcm16(Array.tabulate(400)(j =>
            (((i * 31 + j * 7) % 2001) - 1000).toShort), 8000f),
          0, 0, 8000, "wav")
        case _ => Multimodal.MediaRow(i.toLong, "video", // digest fallback kind
          Array.tabulate[Byte](64 + i)(j => ((i * 31 + j) % 127).toByte),
          640, 480, 0, "raw")
      }
    }
    val ds = media.toDS().repartition(4)
    val acc = spark.sparkContext.longAccumulator("decoders")
    val feats = Multimodal.extractFeatures(ds, featureDim = 8, decoderCounter = Some(acc))
    val rows = feats.collect()
    assert(rows.length == 40)
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(f => f.feature.forall(v => v >= -1f && v <= 1f)))
    assert(acc.value == 4L, s"expected 4 decoders (one per partition), got ${acc.value}")
    // determinism: same bytes -> same features on a fresh run
    val again = Multimodal.extractFeatures(ds, featureDim = 8).collect()
    val m1 = rows.map(f => f.media_id -> f.feature.toSeq).toMap
    again.foreach(f => assert(m1(f.media_id) == f.feature.toSeq))
  }

  test("multimodal: PNG and WAV decode recover exact pixel/sample content") {
    val img = new Multimodal.ImageCodec
    val png = img.encodeGrayPng(9, 7, (x, y) => (x * 7 + y * 13 + 5) % 256)
    val (w, h, sum) = img.stats(img.decode(png))
    val expected = (for (x <- 0 until 9; y <- 0 until 7) yield (x * 7 + y * 13 + 5) % 256).sum
    assert((w, h) == (9, 7))
    assert(sum == expected.toLong)

    val aud = new Multimodal.AudioCodec
    val samples = Array.tabulate(500)(i => ((i * 37) % 2001 - 1000).toShort)
    val (rate, back) = aud.decodePcm16(aud.encodeWavPcm16(samples, 8000f))
    assert(rate == 8000)
    assert(back.toSeq == samples.toSeq)
  }

  test("multimodal: JPEG (lossy) decode recovers structure exactly, luma within bound") {
    // the standard crawl container, via the JDK's own codec (pure-JVM):
    // dims and pixel counts must be EXACT facts recovered from the bytes;
    // luma is approximate by design — assert the distortion bound the
    // q280 gate claims (mean |decoded − source| ≤ 4/px on a DCT-friendly
    // gradient) and that the bound is MEANINGFUL (the decode is not just
    // returning the source: some pixel differs, because JPEG quantizes)
    val codec = new Multimodal.ImageCodec
    for (id <- 0L until 12L) {
      val w = 16 + (id % 9).toInt
      val h = 16 + (id % 7).toInt
      def src(x: Int, y: Int): Int = math.min(255, (id % 32).toInt * 2 + x * 5 + y * 3)
      val img = codec.decode(codec.encodeGrayJpeg(w, h, src))
      assert((img.getWidth, img.getHeight) == (w, h), s"dims lost for id=$id")
      val err = codec.absErrSum(img, src)
      assert(err <= 4L * w * h, s"id=$id: mean abs err ${err.toDouble / (w * h)} > 4")
    }
    // lossiness is real: a high-frequency pattern must show NONZERO error
    val noisy = codec.decode(codec.encodeGrayJpeg(16, 16,
      (x, y) => if ((x + y) % 2 == 0) 0 else 255))
    assert(codec.absErrSum(noisy, (x, y) => if ((x + y) % 2 == 0) 0 else 255) > 0,
      "checkerboard survived JPEG bit-exact — not a lossy codec?")
  }

  test("integration: decode -> feature -> ANN search over media assets") {
    import spark.implicits._
    // near-duplicate media: asset i and i+100 share bytes (same image), so
    // their decoded-pixel features are identical and ANN must pair them up
    val enc = new Multimodal.ImageCodec
    val media = ((0 until 100) ++ (0 until 100)).zipWithIndex.map { case (seed, idx) =>
      Multimodal.MediaRow(idx.toLong, "image",
        enc.encodeGrayPng(16, 16, (x, y) => (seed * 131 + x * 7 + y * 3) % 256),
        16, 16, 0, "png")
    }
    val feats = Multimodal.extractFeatures(media.toDS().repartition(4), featureDim = 16)
      .select(col("media_id").as("vec_id"),
        col("feature").cast("array<double>").as("e"))
    val q = feats.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("e").as("qe"))
    val nn = graft.operators.AnnLsh.topK(feats, q, k = 1, nPlanes = 16, nBands = 4, dim = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // each query's nearest neighbour is its byte-identical twin at +100
    (0L until 10L).foreach { id =>
      val (twin, cos) = nn(id)
      assert(twin == id + 100, s"query $id matched $twin")
      assert(math.abs(cos - 1.0) < 1e-9)
    }
  }

  test("multimodal: resize metadata and frame-sample plan") {
    import spark.implicits._
    val df = Seq((1L, 1920, 1080), (2L, 320, 240)).toDF("media_id", "width", "height")
    val rs = Multimodal.resizeMeta(df, 640).collect()
      .map(r => r.getLong(0) -> (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))).toMap
    assert(rs(1L) == (640, 360))
    assert(rs(2L) == (320, 240)) // never upscale
    val plan = Multimodal.frameSamplePlan(df.withColumn("n_frames", lit(100)),
      col("n_frames"), everyNth = 10, maxFrames = 5)
    assert(plan.filter(col("media_id") === 1).select("frame_idx")
      .collect().map(_.getInt(0)).toSeq == Seq(0, 10, 20, 30, 40))
  }

  test("aHash64: PNG round-trip matches the pure-pixel reference computation") {
    val codec = new Multimodal.ImageCodec
    def px(x: Int, y: Int) = (5 * 37 + x * 11 + y * 17) % 256
    val png = codec.encodeGrayPng(16, 16, px)
    val (hi, lo, n) = codec.aHash64(codec.decode(png))
    // reference: block sums straight from the formula, no codec involved
    val bs = new Array[Long](64)
    var ts = 0L
    for (y <- 0 until 16; x <- 0 until 16) {
      bs((y / 2) * 8 + x / 2) += px(x, y); ts += px(x, y)
    }
    var (rhi, rlo, rn) = (0L, 0L, 0)
    for (b <- 0 until 64 if bs(b) * 64 > ts) {
      if (b < 32) rlo |= 1L << b else rhi |= 1L << (b - 32)
      rn += 1
    }
    assert((hi, lo, n) == ((rhi, rlo, rn)))
    assert(n > 0 && n < 64, "degenerate hash: all bits equal")
  }

  test("aHash64: block-sum-preserving pixel swap leaves the hash unchanged") {
    val codec = new Multimodal.ImageCodec
    def base(x: Int, y: Int) = (3 * 37 + x * 11 + y * 17) % 256
    // diagonal swap inside block (2,1): pixels (4,2)<->(5,3) and (5,2)<->(4,3)
    def swapped(x: Int, y: Int) = (x, y) match {
      case (4, 2) => base(5, 3); case (5, 3) => base(4, 2)
      case (5, 2) => base(4, 3); case (4, 3) => base(5, 2)
      case _      => base(x, y)
    }
    val h1 = codec.aHash64(codec.decode(codec.encodeGrayPng(16, 16, base)))
    val h2 = codec.aHash64(codec.decode(codec.encodeGrayPng(16, 16, swapped)))
    assert(h1 == h2)
    // sanity: the two images really are different byte streams
    assert(!codec.encodeGrayPng(16, 16, base)
      .sameElements(codec.encodeGrayPng(16, 16, swapped)))
  }

  test("aHash64: a large single-block luminance change flips bits; odd dims rejected") {
    val codec = new Multimodal.ImageCodec
    def base(x: Int, y: Int) = (7 * 37 + x * 11 + y * 17) % 256
    def bright(x: Int, y: Int) = if (x < 2 && y < 2) 255 else base(x, y)
    val (h1, l1, _) = codec.aHash64(codec.decode(codec.encodeGrayPng(16, 16, base)))
    val (h2, l2, _) = codec.aHash64(codec.decode(codec.encodeGrayPng(16, 16, bright)))
    val hamming = java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
    assert(hamming > 0, "saturating a block must flip at least its own bit")
    assertThrows[IllegalArgumentException] {
      codec.aHash64(codec.decode(codec.encodeGrayPng(15, 16, base)))
    }
  }

  test("resizeBox2x: integer box filter matches the per-block floor sum; odd dims rejected") {
    val codec = new Multimodal.ImageCodec
    def px(x: Int, y: Int) = (x * 53 + y * 29) % 256
    val small = codec.resizeBox2x(codec.decode(codec.encodeGrayPng(16, 16, px)))
    assert(small.getWidth == 8 && small.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val expect = (px(2 * x, 2 * y) + px(2 * x + 1, 2 * y) +
        px(2 * x, 2 * y + 1) + px(2 * x + 1, 2 * y + 1)) / 4
      assert(small.getRaster.getSample(x, y, 0) == expect, s"pixel ($x,$y)")
    }
    assertThrows[IllegalArgumentException] {
      codec.resizeBox2x(codec.decode(codec.encodeGrayPng(15, 16, px)))
    }
  }
}
