package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.2 [EXT] "multimodal columns"):
  * image/audio/video as opaque `binary` columns with typed metadata, and the
  * per-partition batch-processing shape a real decode/feature pipeline uses.
  *
  * The DECODE STEP IS A STUB: this container ships no image/audio codecs, so
  * `StubDecoder` produces a deterministic fake (bytes → digest-derived
  * "features"). Everything around it — the schema, the one-decoder-per-
  * partition lifecycle, the batch iteration, the output shape — is the real
  * Spark plumbing a production codec drops into.
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

  /** A "decoder" with per-partition lifecycle. The real implementation
    * would wrap a codec handle (libjpeg/ffmpeg/...); the stub derives
    * deterministic pseudo-features from a rolling digest of the payload so
    * tests can assert exact values.
    */
  final class StubDecoder(featureDim: Int) extends Serializable {
    var decodedCount: Long = 0L // observability: one decoder per partition

    def decode(bytes: Array[Byte]): Array[Float] = {
      decodedCount += 1
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
    * through it. Swap `StubDecoder` for a real codec without touching the
    * dataflow.
    */
  def extractFeatures(media: Dataset[MediaRow], featureDim: Int = 16,
      decoderCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder(featureDim) // ONE per partition
      decoderCounter.foreach(_.add(1))
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, decoder.decode(r.bytes))
      }
    }
  }

  /** Metadata-only "resize": the part of a resize that is pure plumbing —
    * the pixel transform itself is the stubbed codec's job.
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
