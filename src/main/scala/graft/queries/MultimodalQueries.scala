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
             |ORDER BY media_id""".stripMargin))
  )
}
