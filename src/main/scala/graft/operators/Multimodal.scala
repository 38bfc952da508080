package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * Pattern for image/audio/video at 100 TB: the payload travels as a
  * `binary` column (parquet keeps it columnar and never decodes it during
  * pruning); metadata is a typed struct; decode / feature-extraction runs
  * batched per partition (`mapPartitions`) so codec state is initialized once
  * per task, not per row — the Scala analogue of `mapInPandas` batching.
  *
  * Decode: IMAGE payloads (png/jpeg/gif/bmp) go through a REAL pure-JVM
  * decode (`ImageCodec`: byte-level header sniff + javax.imageio pixel
  * decode + grid-luminance feature — see ImageCodecSpec and q49's oracle);
  * WAV/PCM AUDIO payloads go through a REAL RIFF parse + sample decode
  * (`AudioCodec`: windowed-RMS profile feature — see AudioCodecSpec and
  * q71's oracle). Compressed audio and video (which the JDK cannot decode)
  * fall back to `FakeDecoder`, a deterministic stand-in with the same
  * bytes→float-vector contract a native codec would fill.
  */
object Multimodal {

  /** A multimodal record: payload + metadata. */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                               meta_width: Int, meta_height: Int)

  /** Extracted feature row. */
  final case class MediaFeature(media_id: Long, kind: String, n_bytes: Long,
                                checksum: Long, feature: Array[Float])

  /** STUB decoder: deterministic stand-in for a real image/audio decode.
    * Real deployments replace `decode` with e.g. a JNI codec call; the
    * signature (bytes → fixed-size float feature) is the contract. */
  object FakeDecoder {
    def decode(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      var acc = 1469598103934665603L // FNV-1a basis — deterministic fake
      var i = 0
      while (i < payload.length) {
        acc = (acc ^ (payload(i) & 0xffL)) * 1099511628211L
        out(i % dim) += ((acc >>> 40) % 1000).toFloat / 1000f
        i += 1
      }
      out
    }
  }

  /** Wrap a string column as a fake media payload table (testdata has no real
    * media; this builds the binary-column shape from `documents`). */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image/fake").as("kind"),
      to_binary(col(textCol), lit("utf-8")).as("payload"),
      (length(col(textCol)) % 1024).cast("int").as("meta_width"),
      (length(col(textCol)) % 768).cast("int").as("meta_height"))
      .as[MediaRecord]
  }

  /** Batched per-partition feature extraction: decoder state initialized once
    * per partition; rows streamed through. Fully distributed, no driver hop.
    * Payloads whose magic bytes identify a JDK-decodable image get the REAL
    * pixel decode (grid-luminance embedding); WAV/PCM payloads the REAL
    * sample decode (windowed-RMS profile); everything else the deterministic
    * fallback. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeature] = {
    implicit val enc: Encoder[MediaFeature] = Encoders.product[MediaFeature]
    media.mapPartitions { it =>
      // per-partition init point (real codecs allocate native context here)
      it.map { r =>
        // every row gets EXACTLY dim floats (fixed-size contract): the image
        // path computes the smallest grid covering dim cells and truncates
        val grid = math.ceil(math.sqrt(dim.toDouble)).toInt
        val feat = ImageCodec.parseHeader(r.payload)
          .flatMap(_ => ImageCodec.decode(r.payload))
          .map(img => ImageCodec.luminanceFeature(img, grid).take(dim))
          .orElse(AudioCodec.parseHeader(r.payload)
            .flatMap(_ => AudioCodec.decodeSamples(r.payload))
            .map(AudioCodec.rmsProfile(_, dim)))
          .getOrElse(FakeDecoder.decode(r.payload, dim))
        var crc = 0L
        var i = 0
        while (i < r.payload.length) { crc = crc * 31 + (r.payload(i) & 0xff); i += 1 }
        MediaFeature(r.media_id, r.kind, r.payload.length.toLong, crc, feat)
      }
    }
  }
}
