package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, batched decode/feature-extract via typed `mapPartitions`
  * (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The container-level decode is REAL byte parsing — PNG IHDR, JPEG
  * SOFn segment walk, GIF logical-screen descriptor (mirrors the
  * metadata surface of reference src/extractors/images.rs:30-106:
  * width / height / bits-per-component / format). Full pixel decode
  * (IDAT inflate + filter reconstruction, JPEG entropy decode) is out
  * of scope in this container — the content feature is a deterministic
  * byte-level signature (rolling FNV histogram), exposed only as
  * hash-stable scalars (`feature_hash`, `feature_norm`) so downstream
  * harnesses can compare results.
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
      format: String,
      width: Long,
      height: Long,
      bits_per_component: Long,
      feature_hash: Long,
      feature_norm: Double)

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

  /** Parsed container header: (format, width, height, bitsPerComponent).
    * Unknown/truncated payloads → ("unknown", 0, 0, 0). */
  private[graft] def decodeHeader(b: Array[Byte]): (String, Long, Long, Long) = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)

    // >= 25: the branch reads u8(24) (IHDR bit depth) — a truncated
    // 24-byte payload must fall through to "unknown", not throw.
    if (b.length >= 25 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      // PNG: 8-byte signature, then the IHDR chunk is mandatory first:
      // 4-byte length, "IHDR", width(4) height(4) bitdepth(1) colortype(1)
      ("png", be32(16), be32(20), u8(24).toLong)
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8 && u8(2) == 0xff) {
      // JPEG: walk marker segments to the first SOFn (C0-CF except
      // C4/C8/CC) which carries precision(1) height(2) width(2)
      var i = 2
      var out: (String, Long, Long, Long) = ("jpeg", 0L, 0L, 0L)
      var done = false
      while (!done && i + 3 < b.length) {
        if (u8(i) != 0xff) { i += 1 } // skip fill bytes / entropy data
        else {
          val m = u8(i + 1)
          if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01 || m == 0xff) i += 2
          else if (m == 0xd9 || m == 0xda) done = true // EOI / SOS: dims must precede
          else {
            val len = be16(i + 2)
            if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              if (i + 8 < b.length)
                out = ("jpeg", be16(i + 7).toLong, be16(i + 5).toLong, u8(i + 4).toLong)
              done = true
            } else i += 2 + math.max(2, len)
          }
        }
      }
      out
    } else if (b.length >= 11 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      // GIF87a/89a: logical screen descriptor at offset 6 (LE u16 w, h)
      ("gif", le16(6).toLong, le16(8).toLong, 8L)
    } else if (b.length >= 5 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F') {
      ("pdf", 0L, 0L, 0L)
    } else ("unknown", 0L, 0L, 0L)
  }

  /** Deterministic byte-level content signature: a dim-bucket rolling
    * FNV histogram, surfaced as (hash, norm) scalars. Stands in for a
    * learned embedding at the same schema position; swap the body for
    * a real model/codec kernel at deploy — the batching, partitioning
    * and output contract stay identical. */
  private[ops] def contentSignature(bytes: Array[Byte], dim: Int): (Long, Double) = {
    val acc = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L
      acc(i % dim) += ((h >>> 40).toInt & 0xffff) / 65536f - 0.5f
      i += 1
    }
    // quantize components before hashing so the scalar is stable
    var fh = 0xcbf29ce484222325L
    var norm = 0.0
    var d = 0
    while (d < dim) {
      val q = math.round(acc(d) * 1024f).toLong
      fh = (fh ^ q) * 1099511628211L
      norm += acc(d).toDouble * acc(d).toDouble
      d += 1
    }
    (fh, math.sqrt(norm))
  }

  /** Batched decode + featurize: one partition = one batch, kernel
    * amortized across the batch like a vectorized UDF. Header decode
    * (PNG/JPEG/GIF dims) is real; the content feature is the
    * deterministic signature above, exposed as hash-stable scalars. */
  def extractFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-batch init happens here (model load / codec context)
        batch.map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          // one malformed payload must degrade to "unknown", not fail
          // the whole Spark task
          val (fmt, w, hgt, bits) =
            try decodeHeader(bytes)
            catch { case _: RuntimeException => ("unknown", 0L, 0L, 0L) }
          val (fh, norm) = contentSignature(bytes, dim)
          MediaFeature(id, bytes.length.toLong, fmt, w, hgt, bits, fh, norm)
        }
      }
  }
}
