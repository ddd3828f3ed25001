package graft.queries

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.Multimodal
import Protocol._

/** Multimodal decode under the DuckDB gate (SURVEY §2.2 [EXT] "multimodal
  * columns"). The payloads are REAL encoded media — PNG images and WAV PCM
  * audio built deterministically from `doc_id` closed forms — so the oracle
  * can recompute the decoded statistics in pure SQL while the Spark side
  * must round-trip actual bytes through `javax.imageio` /
  * `javax.sound.sampled`. A wrong decode (bad dimension recovery, sample
  * misread, endianness slip) hash-mismatches immediately.
  *
  * Scale shape: payload synthesis and decode happen in the SAME partition
  * (bytes never shuffle); only the fixed-width stats rows move.
  */
object MultimodalQueries extends QueryModule {

  private val nAssets = 40
  private val nHashAssets = 60

  /** q228/q229 fixture: one 16×16 grayscale PNG per doc. Pixel (x,y) =
    * (base·37 + x·11 + y·17) mod 256 with base = doc_id mod 12, then the
    * four pixels of block (doc_id mod 64) are swapped diagonally — a
    * SUM-PRESERVING perturbation, so every doc encodes DISTINCT bytes while
    * same-base docs share an identical aHash. The oracle therefore models
    * only the base formula; the swap must vanish through the real
    * encode → decode → block-sum path (a codec that misplaced pixels across
    * block boundaries would surface it).
    */
  private def hashMedia(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    val ids = Tables.load(s, dir, "documents")
      .select(col("doc_id")).orderBy(col("doc_id")).limit(nHashAssets)
    ids.as[Long].mapPartitions { it =>
      val codec = new Multimodal.ImageCodec
      it.map { id =>
        val base = (id % 12).toInt
        val px = Array.tabulate(16, 16)((y, x) => (base * 37 + x * 11 + y * 17) % 256)
        val blk = (id % 64).toInt
        val (cx, cy) = ((blk % 8) * 2, (blk / 8) * 2)
        def swap(x1: Int, y1: Int, x2: Int, y2: Int): Unit = {
          val t = px(y1)(x1); px(y1)(x1) = px(y2)(x2); px(y2)(x2) = t
        }
        swap(cx, cy, cx + 1, cy + 1)
        swap(cx + 1, cy, cx, cy + 1)
        val png = codec.encodeGrayPng(16, 16, (x, y) => px(y)(x))
        Multimodal.MediaRow(id, "image", png, 0, 0, 0, "png")
      }
    }
  }

  /** Shared oracle CTEs for the aHash family: regenerate the UNSWAPPED pixel
    * grid (the swap is block-sum-invariant), fold to 8×8 block sums, and set
    * bit by·8+bx iff blockSum·64 > totalSum — integer-exact, mirroring
    * ImageCodec.aHash64 verbatim (strict >, ties → 0). Fingerprints pack as
    * two sign-safe 32-bit halves.
    */
  private val duckAHash =
    s"""WITH ids AS (SELECT doc_id, doc_id % 12 AS base
       |             FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT $nHashAssets)),
       |g AS (SELECT i.doc_id, x.range AS x, y.range AS y,
       |        (i.base*37 + x.range*11 + y.range*17) % 256 AS v
       |      FROM ids i, range(0,16) x, range(0,16) y),
       |blk AS (SELECT doc_id, (y//2)*8 + (x//2) AS b, SUM(v) AS bs FROM g GROUP BY 1, 2),
       |tot AS (SELECT doc_id, SUM(bs) AS ts FROM blk GROUP BY 1),
       |bits AS (SELECT blk.doc_id, blk.b, CASE WHEN bs*64 > ts THEN 1 ELSE 0 END AS bit
       |         FROM blk JOIN tot USING (doc_id)),
       |fp AS (SELECT doc_id,
       |        CAST(SUM(CASE WHEN b >= 32 THEN CAST(bit AS BIGINT) << (b - 32) ELSE 0 END) AS BIGINT) AS fp_hi,
       |        CAST(SUM(CASE WHEN b < 32 THEN CAST(bit AS BIGINT) << b ELSE 0 END) AS BIGINT) AS fp_lo,
       |        CAST(SUM(bit) AS BIGINT) AS n_set
       |       FROM bits GROUP BY doc_id)""".stripMargin

  override val declared: Seq[Declared] = Seq(

    // q86 — image decode: PNG-encode a deterministic grayscale image per
    // doc (dims 8+id%9 × 8+id%7, pixel (x,y) = (id*31+x*7+y*13)%256), then
    // decode the BYTES and report recovered width/height and luminance
    // sums. The oracle regenerates the same grid arithmetic in SQL.
    Declared("q86_image_decode",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id")).orderBy(col("doc_id")).limit(nAssets)
        val media = ids.as[Long].mapPartitions { it =>
          val codec = new Multimodal.ImageCodec
          it.map { id =>
            val w = 8 + (id % 9).toInt
            val h = 8 + (id % 7).toInt
            val png = codec.encodeGrayPng(w, h,
              (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
            // metadata dims left 0: the decode must recover them from bytes
            Multimodal.MediaRow(id, "image", png, 0, 0, 0, "png")
          }
        }
        Multimodal.decodeImageStats(media).toDF()
          .select(col("media_id"), col("width"), col("height"),
            big(col("n_px")).as("n_px"), big(col("sum_luma")).as("sum_luma"),
            out6(dec(col("sum_luma")) / dec(col("n_px"))).as("mean_luma"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH ids AS (SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
             |                    CAST(8 + doc_id % 7 AS INT) AS h
             |             FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT $nAssets)),
             |     px AS (SELECT i.doc_id, i.w, i.h,
             |                   (i.doc_id*31 + x.range*7 + y.range*13) % 256 AS g
             |            FROM ids i
             |            JOIN range(0, 16) x ON x.range < i.w
             |            JOIN range(0, 16) y ON y.range < i.h)
             |SELECT doc_id AS media_id, w AS width, h AS height,
             |  CAST(COUNT(*) AS BIGINT) AS n_px,
             |  CAST(SUM(g) AS BIGINT) AS sum_luma,
             |  CAST(ROUND(CAST(SUM(g) AS DECIMAL(18,6)) / CAST(COUNT(*) AS DECIMAL(18,6)), 6)
             |       AS DECIMAL(18,6)) AS mean_luma
             |FROM px GROUP BY doc_id, w, h
             |ORDER BY media_id""".stripMargin)),

    // q87 — audio decode: WAV-encode 16-bit PCM mono per doc (n = 800 +
    // (id%5)*160 samples at 8 kHz, sample i = (id*31+i*7)%2001 - 1000),
    // decode the BYTES and report sample count, signed sum, absolute sum,
    // and mean amplitude. Oracle regenerates the sample series in SQL.
    Declared("q87_audio_decode",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id")).orderBy(col("doc_id")).limit(nAssets)
        val media = ids.as[Long].mapPartitions { it =>
          val codec = new Multimodal.AudioCodec
          it.map { id =>
            val n = 800 + (id % 5).toInt * 160
            val samples = Array.tabulate(n)(i =>
              (((id * 31 + i * 7) % 2001) - 1000).toShort)
            val wav = codec.encodeWavPcm16(samples, 8000f)
            Multimodal.MediaRow(id, "audio", wav, 0, 0, 0, "wav")
          }
        }
        Multimodal.decodeAudioStats(media).toDF()
          .select(col("media_id"), col("sample_rate"),
            big(col("n_samples")).as("n_samples"),
            big(col("sum_amp")).as("sum_amp"),
            big(col("sum_abs")).as("sum_abs"),
            out6(dec(col("sum_amp")) / dec(col("n_samples"))).as("mean_amp"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH ids AS (SELECT doc_id, 800 + (doc_id % 5) * 160 AS n
             |             FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT $nAssets)),
             |     smp AS (SELECT i.doc_id, i.n,
             |                    (i.doc_id*31 + s.range*7) % 2001 - 1000 AS amp
             |             FROM ids i JOIN range(0, 1440) s ON s.range < i.n)
             |SELECT doc_id AS media_id, CAST(8000 AS INT) AS sample_rate,
             |  CAST(COUNT(*) AS BIGINT) AS n_samples,
             |  CAST(SUM(amp) AS BIGINT) AS sum_amp,
             |  CAST(SUM(ABS(amp)) AS BIGINT) AS sum_abs,
             |  CAST(ROUND(CAST(SUM(amp) AS DECIMAL(18,6)) / CAST(COUNT(*) AS DECIMAL(18,6)), 6)
             |       AS DECIMAL(18,6)) AS mean_amp
             |FROM smp GROUP BY doc_id, n
             |ORDER BY media_id""".stripMargin)),

    // q228 — perceptual image hash (aHash): decode the PNG BYTES, fold the
    // real pixels into 8×8 block sums, threshold against the image mean —
    // the image twin of MinHash for text dedup. Width/height recovered from
    // bytes prove the decode; the fingerprint halves prove block/threshold
    // arithmetic bit-for-bit against the SQL re-derivation.
    //
    // Shape at 100 TB: decode + hash run inside the scan partition (bytes
    // never shuffle); 28 bytes/asset of fingerprint reach the exchange.
    Declared("q228_image_ahash",
      (s, dir) => {
        Multimodal.perceptualHash(hashMedia(s, dir)).toDF()
          .select(col("media_id"), col("width"), col("height"),
            col("fp_hi"), col("fp_lo"), big(col("n_set")).as("n_set"))
          .orderBy(col("media_id"))
      },
      Some(s"""$duckAHash
             |SELECT doc_id AS media_id, 16 AS width, 16 AS height, fp_hi, fp_lo, n_set
             |FROM fp ORDER BY media_id""".stripMargin)),

    // q229 — perceptual-hash NEAR-DUP pairs: band the 64-bit aHash into
    // 4×16-bit keys and equi-join on (band index, band value); pigeonhole
    // guarantees every pair at Hamming ≤ 3 shares at least one intact band,
    // so the banded join finds EXACTLY what all-pairs would (the oracle
    // below IS all-pairs — affordable in DuckDB at gate scale, never run
    // by the engine). Exact Hamming re-check via XOR + popcount on the
    // candidate pairs only.
    Declared("q229_ahash_neardup_pairs",
      (s, dir) => {
        val fp = Multimodal.perceptualHash(hashMedia(s, dir)).toDF()
          .select(col("media_id"), col("fp_hi"), col("fp_lo")).persist()
        val mask = lit(0xFFFFL)
        val bands = fp.select(col("media_id"), posexplode(array(
          col("fp_lo").bitwiseAND(mask),
          shiftright(col("fp_lo"), 16).bitwiseAND(mask),
          col("fp_hi").bitwiseAND(mask),
          shiftright(col("fp_hi"), 16).bitwiseAND(mask))).as(Seq("bi", "bv")))
        val cand = bands.as("a")
          .join(bands.as("b"),
            col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
              col("a.media_id") < col("b.media_id"))
          .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
          .distinct()
        cand
          .join(fp.select(col("media_id").as("id_a"),
            col("fp_hi").as("ha"), col("fp_lo").as("la")), "id_a")
          .join(fp.select(col("media_id").as("id_b"),
            col("fp_hi").as("hb"), col("fp_lo").as("lb")), "id_b")
          .withColumn("hamming",
            big(call_function("bit_count", col("ha").bitwiseXOR(col("hb"))) +
              call_function("bit_count", col("la").bitwiseXOR(col("lb")))))
          .filter(col("hamming") <= 3)
          .select(col("id_a"), col("id_b"), col("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""$duckAHash
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(bit_count(xor(a.fp_hi, b.fp_hi)) + bit_count(xor(a.fp_lo, b.fp_lo)) AS BIGINT) AS hamming
             |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.fp_hi, b.fp_hi)) + bit_count(xor(a.fp_lo, b.fp_lo)) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // q234 — REAL image resize: decode the 16×16 PNG, 2× box-filter
    // downsample with integer floor (output px = ⌊Σ(2×2 block)/4⌋),
    // RE-ENCODE the 8×8 result, decode it AGAIN and report its stats —
    // the full transform round-trip a thumbnailing/preprocessing stage
    // performs, with every pixel step exactly reproducible in SQL. The
    // oracle's `blk` sums are the same 2×2 blocks the aHash uses, and the
    // fixture's pixel swap is block-sum-invariant, so the base formula
    // predicts the resized luminance exactly.
    Declared("q234_image_resize",
      (s, dir) => {
        import s.implicits._
        val resized = hashMedia(s, dir).mapPartitions { it =>
          val codec = new Multimodal.ImageCodec
          it.map { r =>
            val small = codec.resizeBox2x(codec.decode(r.bytes))
            val raster = small.getRaster
            val png = codec.encodeGrayPng(small.getWidth, small.getHeight,
              (x, y) => raster.getSample(x, y, 0))
            r.copy(bytes = png)
          }
        }
        Multimodal.decodeImageStats(resized).toDF()
          .select(col("media_id"), col("width"), col("height"),
            big(col("n_px")).as("n_px"), big(col("sum_luma")).as("sum_luma"))
          .orderBy(col("media_id"))
      },
      Some(s"""$duckAHash
             |SELECT doc_id AS media_id, 8 AS width, 8 AS height,
             |  CAST(64 AS BIGINT) AS n_px, CAST(SUM(bs // 4) AS BIGINT) AS sum_luma
             |FROM blk GROUP BY doc_id ORDER BY media_id""".stripMargin)),

    // q235 — audio FRAME-ENERGY profile: decode the WAV PCM, fold samples
    // into 160-sample frames (20 ms at 8 kHz), exact integer energy
    // Σ amp² per frame, keep the top-3 frames per asset — the
    // voice-activity / loudness-peak readout an audio curation pipeline
    // keys segment selection on. Frame fold is per-row work inside the
    // decode partition; the per-asset top-k is a partitioned window (k·n
    // rows out, never a global sort).
    Declared("q235_audio_frame_energy",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id")).orderBy(col("doc_id")).limit(nAssets)
        val media = ids.as[Long].mapPartitions { it =>
          val codec = new Multimodal.AudioCodec
          it.map { id =>
            val n = 800 + (id % 5).toInt * 160
            val samples = Array.tabulate(n)(i =>
              (((id * 31 + i * 7) % 2001) - 1000).toShort)
            Multimodal.MediaRow(id, "audio",
              codec.encodeWavPcm16(samples, 8000f), 0, 0, 0, "wav")
          }
        }
        val frames = media.mapPartitions { it =>
          val codec = new Multimodal.AudioCodec
          it.flatMap { r =>
            val (_, samples) = codec.decodePcm16(r.bytes)
            samples.grouped(160).zipWithIndex.map { case (fr, i) =>
              (r.media_id, i.toLong,
                fr.foldLeft(0L)((a, v) => a + v.toLong * v))
            }
          }
        }.toDF("media_id", "frame_idx", "energy")
        val w = Window.partitionBy(col("media_id"))
          .orderBy(col("energy").desc, col("frame_idx"))
        frames.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(col("media_id"), col("frame_idx"), big(col("energy")).as("energy"))
          .orderBy(col("media_id"), col("energy").desc, col("frame_idx"))
      },
      Some(s"""WITH ids AS (SELECT doc_id, 800 + (doc_id % 5) * 160 AS n
             |             FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT $nAssets)),
             |     smp AS (SELECT i.doc_id, s.range AS idx,
             |                    (i.doc_id*31 + s.range*7) % 2001 - 1000 AS amp
             |             FROM ids i JOIN range(0, 1440) s ON s.range < i.n),
             |     fr AS (SELECT doc_id, idx // 160 AS frame_idx, SUM(amp*amp) AS energy
             |            FROM smp GROUP BY 1, 2),
             |     rk AS (SELECT doc_id, frame_idx, energy,
             |              ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY energy DESC, frame_idx) AS rn
             |            FROM fr)
             |SELECT doc_id AS media_id, frame_idx, CAST(energy AS BIGINT) AS energy
             |FROM rk WHERE rn <= 3 ORDER BY media_id, energy DESC, frame_idx""".stripMargin)),

    // q239 — VIDEO frame sampling through the REAL container path: each
    // asset is a GPV1 packed-frame video (magic + offset table + PNG
    // frames, 6 + id%5 frames of 16×16), and the engine EXTRACTS every 3rd
    // frame (≤ 4 per asset) from the container bytes via the offset table,
    // PNG-decodes it, and aHashes the pixels — closing the video gap down
    // to inter-frame compression only (the ffmpeg seam documented on
    // Multimodal.VideoCodec). Frame pixels follow q228's formula with a
    // per-frame base (doc_id + 5f) mod 12 plus the sum-preserving diagonal
    // swap at block (doc_id + f) mod 64 — distinct bytes per frame, oracle
    // models only the base formula, a codec or offset-table bug that
    // misplaces pixels across block boundaries breaks the hash.
    Declared("q239_video_frame_sample",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id")).orderBy(col("doc_id")).limit(nAssets)
        val media = ids.as[Long].mapPartitions { it =>
          val ic = new Multimodal.ImageCodec
          val vc = new Multimodal.VideoCodec
          it.map { id =>
            val frames = (0 until (6 + (id % 5).toInt)).map { f =>
              val base = ((id + 5 * f) % 12).toInt
              val px = Array.tabulate(16, 16)((y, x) => (base * 37 + x * 11 + y * 17) % 256)
              val blk = ((id + f) % 64).toInt
              val (cx, cy) = ((blk % 8) * 2, (blk / 8) * 2)
              def swap(x1: Int, y1: Int, x2: Int, y2: Int): Unit = {
                val t = px(y1)(x1); px(y1)(x1) = px(y2)(x2); px(y2)(x2) = t
              }
              swap(cx, cy, cx + 1, cy + 1)
              swap(cx + 1, cy, cx, cy + 1)
              ic.encodeGrayPng(16, 16, (x, y) => px(y)(x))
            }
            Multimodal.MediaRow(id, "video", vc.pack(frames), 16, 16, 0, "gpv1")
          }
        }
        Multimodal.sampleFrameHashes(media, everyNth = 3, maxFrames = 4).toDF()
          .select(col("media_id"), col("frame_idx"),
            col("fp_hi"), col("fp_lo"), big(col("n_set")).as("n_set"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some(s"""WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT $nAssets),
             |fr AS (SELECT i.doc_id, f.range AS f, (i.doc_id + 5*f.range) % 12 AS base
             |       FROM ids i JOIN range(0, 11) f ON f.range < 6 + i.doc_id % 5
             |       WHERE f.range % 3 = 0 AND f.range // 3 < 4),
             |g AS (SELECT fr.doc_id, fr.f, x.range AS x, y.range AS y,
             |        (fr.base*37 + x.range*11 + y.range*17) % 256 AS v
             |      FROM fr, range(0,16) x, range(0,16) y),
             |blk AS (SELECT doc_id, f, (y//2)*8 + (x//2) AS b, SUM(v) AS bs FROM g GROUP BY 1, 2, 3),
             |tot AS (SELECT doc_id, f, SUM(bs) AS ts FROM blk GROUP BY 1, 2),
             |bits AS (SELECT blk.doc_id, blk.f, blk.b, CASE WHEN bs*64 > ts THEN 1 ELSE 0 END AS bit
             |         FROM blk JOIN tot USING (doc_id, f))
             |SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
             |  CAST(SUM(CASE WHEN b >= 32 THEN CAST(bit AS BIGINT) << (b - 32) ELSE 0 END) AS BIGINT) AS fp_hi,
             |  CAST(SUM(CASE WHEN b < 32 THEN CAST(bit AS BIGINT) << b ELSE 0 END) AS BIGINT) AS fp_lo,
             |  CAST(SUM(bit) AS BIGINT) AS n_set
             |FROM bits GROUP BY doc_id, f ORDER BY media_id, frame_idx""".stripMargin)),

    // q251 — DELTA-CODED video through the GPV2 container: frame 0 is a PNG
    // keyframe, every later frame mod-256 residuals (RLE) against the
    // previous RECONSTRUCTION, so decoding sampled frame i forces the real
    // inter-frame prefix chain 0..i — the seam q239 left open (GPV1 is
    // intra-only). Pixels follow q239's per-frame formula (base
    // (doc_id+5f) mod 12 + the sum-preserving swap at block (doc_id+f) mod
    // 64), so the oracle again models only the base formula while any
    // residual/RLE/reconstruction slip (a wrapped byte, a swapped run, a
    // stale prev frame) breaks the aHash of every frame downstream of it.
    Declared("q251_video_delta_codec",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id")).orderBy(col("doc_id")).limit(nAssets)
        val media = ids.as[Long].mapPartitions { it =>
          val vc = new Multimodal.VideoCodecV2
          it.map { id =>
            val frames = (0 until (7 + (id % 4).toInt)).map { f =>
              val base = ((id + 5 * f) % 12).toInt
              val px = Array.tabulate(16, 16)((y, x) => (base * 37 + x * 11 + y * 17) % 256)
              val blk = ((id + f) % 64).toInt
              val (cx, cy) = ((blk % 8) * 2, (blk / 8) * 2)
              def swap(x1: Int, y1: Int, x2: Int, y2: Int): Unit = {
                val t = px(y1)(x1); px(y1)(x1) = px(y2)(x2); px(y2)(x2) = t
              }
              swap(cx, cy, cx + 1, cy + 1)
              swap(cx + 1, cy, cx, cy + 1)
              Array.tabulate(256)(i => px(i / 16)(i % 16))
            }
            Multimodal.MediaRow(id, "video", vc.pack(16, 16, frames), 16, 16, 0, "gpv2")
          }
        }
        Multimodal.sampleFrameHashesV2(media, everyNth = 2, maxFrames = 5).toDF()
          .select(col("media_id"), col("frame_idx"),
            col("fp_hi"), col("fp_lo"), big(col("n_set")).as("n_set"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some(s"""WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT $nAssets),
             |fr AS (SELECT i.doc_id, f.range AS f, (i.doc_id + 5*f.range) % 12 AS base
             |       FROM ids i JOIN range(0, 10) f ON f.range < 7 + i.doc_id % 4
             |       WHERE f.range % 2 = 0 AND f.range // 2 < 5),
             |g AS (SELECT fr.doc_id, fr.f, x.range AS x, y.range AS y,
             |        (fr.base*37 + x.range*11 + y.range*17) % 256 AS v
             |      FROM fr, range(0,16) x, range(0,16) y),
             |blk AS (SELECT doc_id, f, (y//2)*8 + (x//2) AS b, SUM(v) AS bs FROM g GROUP BY 1, 2, 3),
             |tot AS (SELECT doc_id, f, SUM(bs) AS ts FROM blk GROUP BY 1, 2),
             |bits AS (SELECT blk.doc_id, blk.f, blk.b, CASE WHEN bs*64 > ts THEN 1 ELSE 0 END AS bit
             |         FROM blk JOIN tot USING (doc_id, f))
             |SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
             |  CAST(SUM(CASE WHEN b >= 32 THEN CAST(bit AS BIGINT) << (b - 32) ELSE 0 END) AS BIGINT) AS fp_hi,
             |  CAST(SUM(CASE WHEN b < 32 THEN CAST(bit AS BIGINT) << b ELSE 0 END) AS BIGINT) AS fp_lo,
             |  CAST(SUM(bit) AS BIGINT) AS n_set
             |FROM bits GROUP BY doc_id, f ORDER BY media_id, frame_idx""".stripMargin)),

    // q280 — REAL JPEG DECODE (the standard crawl container): the JDK's
    // own javax.imageio JPEG codec (java.desktop — still pure-JVM, no
    // native libs), closing most of the "standard containers" seam the
    // round-11 survey marked external. JPEG is LOSSY, so the gate contract
    // changes shape: a smooth per-doc gradient (base + 5x + 3y, clamped —
    // DCT-friendly, so 8x8 block error stays small) is JPEG-encoded and
    // decoded back; the oracle replays the EXACT structural facts (dims
    // recovered from the bytes, pixel counts) and the distortion is a
    // VERIFIED CLAIM — mean |decoded−source| <= 4/px — computed Spark-side
    // and asserted as a boolean column (the q238 "within" discipline for
    // engine-specific numerics). A decoder that misread dimensions,
    // dropped pixels, or produced garbage luma hash-mismatches or flips
    // the claim.
    Declared("q280_jpeg_decode",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id")).orderBy(col("doc_id")).limit(nAssets)
        val rows = ids.as[Long].mapPartitions { it =>
          val codec = new Multimodal.ImageCodec
          it.map { id =>
            val w = 16 + (id % 9).toInt
            val h = 16 + (id % 7).toInt
            def src(x: Int, y: Int): Int =
              math.min(255, (id % 32).toInt * 2 + x * 5 + y * 3)
            val jpg = codec.encodeGrayJpeg(w, h, src)
            val img = codec.decode(jpg) // dims recovered from bytes alone
            val (dw, dh, _) = codec.stats(img)
            val err = codec.absErrSum(img, src)
            (id, dw, dh, dw.toLong * dh, err * 1000000L / (dw.toLong * dh))
          }
        }.toDF("media_id", "width", "height", "n_px", "mae_micro")
        rows.select(col("media_id"), col("width"), col("height"),
            big(col("n_px")).as("n_px"),
            (col("mae_micro") <= 4000000L).as("within_tol"))
          .orderBy(col("media_id"))
      },
      Some(s"""SELECT doc_id AS media_id,
             |  CAST(16 + doc_id % 9 AS INT) AS width,
             |  CAST(16 + doc_id % 7 AS INT) AS height,
             |  CAST((16 + doc_id % 9) * (16 + doc_id % 7) AS BIGINT) AS n_px,
             |  TRUE AS within_tol
             |FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT $nAssets)
             |ORDER BY media_id""".stripMargin)),

    // q281 — REAL TIFF ROUND-TRIP (the archival container, JDK-bundled
    // reader+writer since Java 9 — still pure-JVM): TIFF is LOSSLESS, so
    // unlike q280's JPEG this gate carries q86's full exact-luma oracle —
    // per-doc pixels from a closed form, encoded to real TIFF bytes,
    // decoded back, and the SUM of recovered luminance must match the
    // formula bit-exactly in DuckDB. Distinct dims/formula from q86 so a
    // container mix-up (PNG bytes where TIFF was claimed) cannot
    // cross-pass.
    Declared("q281_tiff_roundtrip",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id")).orderBy(col("doc_id")).limit(nAssets)
        val media = ids.as[Long].mapPartitions { it =>
          val codec = new Multimodal.ImageCodec
          it.map { id =>
            val w = 6 + (id % 11).toInt
            val h = 6 + (id % 5).toInt
            val tif = codec.encodeGrayTiff(w, h,
              (x, y) => ((id * 29 + x * 5 + y * 11) % 256).toInt)
            Multimodal.MediaRow(id, "image", tif, 0, 0, 0, "tiff")
          }
        }
        Multimodal.decodeImageStats(media).toDF()
          .select(col("media_id"), col("width"), col("height"),
            big(col("n_px")).as("n_px"), big(col("sum_luma")).as("sum_luma"),
            out6(dec(col("sum_luma")) / dec(col("n_px"))).as("mean_luma"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH ids AS (SELECT doc_id, CAST(6 + doc_id % 11 AS INT) AS w,
             |                    CAST(6 + doc_id % 5 AS INT) AS h
             |             FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT $nAssets)),
             |     px AS (SELECT i.doc_id, i.w, i.h,
             |                   (i.doc_id*29 + x.range*5 + y.range*11) % 256 AS g
             |            FROM ids i
             |            JOIN range(0, 17) x ON x.range < i.w
             |            JOIN range(0, 17) y ON y.range < i.h)
             |SELECT doc_id AS media_id, w AS width, h AS height,
             |  CAST(COUNT(*) AS BIGINT) AS n_px,
             |  CAST(SUM(g) AS BIGINT) AS sum_luma,
             |  CAST(ROUND(CAST(SUM(g) AS DECIMAL(18,6)) / CAST(COUNT(*) AS DECIMAL(18,6)), 6)
             |       AS DECIMAL(18,6)) AS mean_luma
             |FROM px GROUP BY doc_id, w, h
             |ORDER BY media_id""".stripMargin))
  )
}
