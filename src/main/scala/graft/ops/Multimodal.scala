package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, batched decode/feature-extract via typed `mapPartitions`
  * (the Scala analog of `mapInPandas` batch UDFs). Media codecs are NOT
  * in this container, so the decode kernel is STUBBED with a
  * deterministic fake (clearly marked); the Spark-side plumbing —
  * schema, batching, partitioning — is real and tested.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      head_hex: String,
      modality: String)

  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Long,
      /** STUB: deterministic fake embedding standing in for a real
        * image/audio feature extractor (codec libs unavailable). */
      feature: Array[Float])

  /** Binary metadata extraction — pure column expressions. */
  def metadata(media: DataFrame): DataFrame = {
    media.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      hex(substring(col("payload"), 1, 8)).as("head_hex"),
      // magic-byte sniff on the first bytes
      when(substring(col("payload"), 1, 5) === lit("%PDF-".getBytes), "pdf")
        .when(substring(col("payload"), 1, 3) === lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)), "jpeg")
        .when(substring(col("payload"), 1, 4) === lit(Array[Byte](0x89.toByte, 'P', 'N', 'G')), "png")
        .when(substring(col("payload"), 1, 4) === lit("RIFF".getBytes), "riff_av")
        .otherwise("unknown").as("modality"))
  }

  /** Batched "decode + featurize": one partition = one batch, kernel
    * amortized across the batch like a vectorized UDF. The kernel body
    * is the stub — swap `fakeFeature` for a real decoder at deploy. */
  def extractFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-batch init happens here (model load / codec context)
        batch.map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          MediaFeature(id, bytes.length.toLong, fakeFeature(bytes, dim))
        }
      }
  }

  /** STUB decode: deterministic bytes → pseudo-feature. Stands in for
    * image resize / audio frame-sample / video keyframe extraction. */
  private def fakeFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L
      out((i % dim)) += ((h >>> 40).toInt & 0xffff) / 65536f - 0.5f
      i += 1
    }
    out
  }
}
