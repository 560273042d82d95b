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
  * width / height / bits-per-component / format). The byte-level
  * content feature is a deterministic rolling-FNV signature exposed as
  * hash-stable scalars (`feature_hash`, `feature_norm`).
  *
  * FULL pixel decode (round 4) is real too, via the JDK's ImageIO
  * (PNG/JPEG/GIF/BMP — no external libs): [[pixelFeatures]] decodes
  * payloads to pixels and derives integer-exact luminance stats plus a
  * 64-bit perceptual average-hash (aHash: 8×8 block means vs their
  * global mean), which plugs straight into
  * [[Dedup.hammingNearDups64]]'s pigeonhole banding for image near-dup
  * at corpus scale.
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
    // DOUBLE accumulation on purpose: every increment is a dyadic
    // rational (k − 32768)/2^16, so all partial sums are EXACT for any
    // payload under 2^37 bytes bytes — order-independent and therefore
    // replicable bit-for-bit by the DuckDB oracle's recursive-CTE
    // formulation (float was exact only below ~4 KB payloads).
    val acc = new Array[Double](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L
      acc(i % dim) += ((h >>> 40).toInt & 0xffff) / 65536.0 - 0.5
      i += 1
    }
    // quantize components before hashing so the scalar is stable
    var fh = 0xcbf29ce484222325L
    var norm = 0.0
    var d = 0
    while (d < dim) {
      val q = math.round(acc(d) * 1024.0)
      fh = (fh ^ q) * 1099511628211L
      norm += acc(d) * acc(d)
      d += 1
    }
    (fh, math.sqrt(norm))
  }

  /** DuckDB oracle for the `multimodal_features` driver query — the
    * content signature replicated exactly: the FNV chain runs in a
    * recursive CTE over byte positions (HUGEINT mod-2^64); the
    * accumulator sums are EXACT dyadic rationals (see contentSignature)
    * so a GROUP BY sum reproduces the sequential loop bit-for-bit; the
    * final component-hash fold is 8 inlined stages. ASCII-payload
    * caveat (unicode(char) == UTF-8 byte) — true of the corpus, same
    * caveat as the simhash oracle. */
  def featuresOracleSql(table: String = "documents"): String = {
    val M = "18446744073709551616"
    val H = "4294967296"
    def xor64(a: String, b: String): String =
      s"(xor(CAST(($a) // $H AS BIGINT), CAST(($b) // $H AS BIGINT)) * CAST($H AS HUGEINT)" +
        s" + xor(CAST(($a) % $H AS BIGINT), CAST(($b) % $H AS BIGINT)))"
    val keepQ = (0 until 8).map(d => s"q$d").mkString(", ")
    val stages = new scala.collection.mutable.ArrayBuffer[String]
    stages += s"f0 AS (SELECT doc_id, norm, $keepQ, CAST(14695981039346656037 AS HUGEINT) AS fh FROM accs)"
    for (d <- 0 until 8) {
      val qu = s"(CASE WHEN q$d < 0 THEN CAST(q$d AS HUGEINT) + $M ELSE CAST(q$d AS HUGEINT) END)"
      stages += s"f${d + 1} AS (SELECT doc_id, norm, $keepQ, " +
        s"((${xor64("fh", qu)}) * 1099511628211) % $M AS fh FROM f$d)"
    }
    val qCols = (0 until 8).map(d =>
      s"CAST(floor(sum(CASE WHEN d = $d THEN a ELSE 0 END) * 1024.0 + 0.5) AS BIGINT) AS q$d")
      .mkString(",\n    ")
    s"""WITH RECURSIVE
       |b AS (SELECT doc_id, text, length(text) AS len FROM $table),
       |chain(doc_id, i, h) AS (
       |  SELECT doc_id, 0, CAST(14695981039346656037 AS HUGEINT) FROM b
       |  UNION ALL
       |  SELECT c.doc_id, c.i + 1,
       |    ((${xor64("c.h", "CAST(unicode(substr(b.text, c.i + 1, 1)) AS HUGEINT)")}) * 1099511628211) % $M
       |  FROM chain c JOIN b ON b.doc_id = c.doc_id
       |  WHERE c.i < b.len),
       |incs AS (
       |  SELECT doc_id, (i - 1) % 8 AS d,
       |    CAST((h // 1099511627776) % 65536 AS DOUBLE) / 65536.0 - 0.5 AS inc
       |  FROM chain WHERE i >= 1),
       |accraw AS (SELECT doc_id, d, sum(inc) AS a FROM incs GROUP BY doc_id, d),
       |dims AS (SELECT doc_id, dd.d FROM b, (SELECT unnest(generate_series(0, 7)) AS d) dd),
       |acc AS (
       |  SELECT dims.doc_id, dims.d, coalesce(accraw.a, 0.0) AS a
       |  FROM dims LEFT JOIN accraw ON dims.doc_id = accraw.doc_id AND dims.d = accraw.d),
       |accs AS (
       |  SELECT doc_id,
       |    sqrt(sum(a * a)) AS norm,
       |    $qCols
       |  FROM acc GROUP BY doc_id),
       |${stages.mkString(",\n")}
       |SELECT b.doc_id,
       |  CAST(octet_length(encode(b.text)) AS BIGINT) AS n_bytes,
       |  CASE WHEN substr(b.text, 1, 3) = 'GIF' AND length(b.text) >= 11 THEN 'gif'
       |       WHEN substr(b.text, 1, 4) = '%PDF' AND length(b.text) >= 5 THEN 'pdf'
       |       ELSE 'unknown' END AS format,
       |  CAST(CASE WHEN fh < 9223372036854775808 THEN fh ELSE fh - $M END AS BIGINT) AS feature_hash,
       |  round(norm, 4) AS feature_norm
       |FROM f8 JOIN b ON f8.doc_id = b.doc_id""".stripMargin
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

  // ------------------------------------------------------------------
  // Real pixel decode (JDK ImageIO) + perceptual hashing
  // ------------------------------------------------------------------

  final case class PixelFeature(
      doc_id: Long,
      width: Int,
      height: Int,
      /** mean luminance × 1000, integer-exact (0..255000). */
      mean_luma_q: Long,
      /** 64-bit average-hash over an 8×8 block grid. */
      ahash: Long,
      decoded: Boolean)

  /** Decode one payload to pixels and derive (width, height,
    * mean-luma×1000, aHash). All-integer arithmetic — no float
    * accumulation order to worry about, so results are exactly
    * reproducible across partitionings. None = undecodable. */
  private[graft] def pixelFeaturesOf(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Throwable => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    // luma per pixel ×1000: 299r + 587g + 114b (BT.601, integer)
    var total = 0L
    val blockSum = new Array[Long](64)
    val blockCnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = 299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
        total += luma
        val bi = by * 8 + math.min(7, x * 8 / w)
        blockSum(bi) += luma
        blockCnt(bi) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    // block means; empty blocks (images narrower/shorter than 8px)
    // inherit the global mean so their bit is deterministic-neutral
    val meanQ = total / n
    val blockMean = new Array[Long](64)
    var i = 0
    while (i < 64) {
      blockMean(i) = if (blockCnt(i) == 0) meanQ else blockSum(i) / blockCnt(i)
      i += 1
    }
    var gsum = 0L
    i = 0
    while (i < 64) { gsum += blockMean(i); i += 1 }
    val gmean = gsum / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (blockMean(i) >= gmean) hash |= (1L << i)
      i += 1
    }
    Some((w, h, meanQ, hash))
  }

  /** Batched decode + feature extraction over a binary media column —
    * the mapInPandas-batch shape, Scala-typed. Undecodable payloads
    * degrade to a decoded=false row, never a task failure. */
  def pixelFeatures(media: DataFrame): Dataset[PixelFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          pixelFeaturesOf(bytes) match {
            case Some((w, h, luma, ahash)) => PixelFeature(id, w, h, luma, ahash, decoded = true)
            case None => PixelFeature(id, 0, 0, 0L, 0L, decoded = false)
          }
        }
      }
  }

  /** Deterministic synthetic PNG for fixtures/benchmarks: 64×64, an
    * 8×8 block pattern seeded by `group` (splitmix-style), with blocks
    * [0, invertBlocks) luminance-inverted — so two variants of one
    * group sit at aHash hamming ≈ |invert difference| while distinct
    * groups are ~32 bits apart. Block levels 220/30 keep every block
    * far from the global mean, so small inversions cannot flip
    * unrelated bits. */
  private[graft] def syntheticPng(group: Long, invertBlocks: Int): Array[Byte] = {
    var s = group * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val pattern = next()
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val bi = (y / 8) * 8 + (x / 8)
        val bitHigh = ((pattern >>> bi) & 1L) == 1L
        val inverted = bi < invertBlocks
        val high = bitHigh ^ inverted
        val v = if (high) 220 else 30
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Video-container plumbing: frame sampling + frame-level dedup.
  // The codec decode is the (allowed) stub — frame payloads are a
  // deterministic integer formula — but the CONTAINER layer is real:
  // the engine builds the byte stream, then independently re-parses it
  // (magic, counts, per-frame length prefixes, truncation guard), and
  // the oracle predicts the hashes from the formula alone, so any
  // build/parse disagreement breaks the hash match.
  // ------------------------------------------------------------------

  /** Synthetic "GVID" container for vid `id`: magic "GVID", be32
    * n_frames, be16 width, be16 height, then per frame a be32 length
    * prefix + payload. All parameters derive from the content group
    * g = id/4 — four consecutive ids carry IDENTICAL frames (the
    * planted cross-video duplicates). Every 16th id (id%16 == 15) is
    * truncated mid-header: the corrupt-ingest case the parser must
    * reject. Frame payload byte j of frame f:
    * (g·131 + f·29 + j·17 + (j² mod 97)) mod 256. */
  private[graft] def syntheticVideo(id: Long): Array[Byte] = {
    val g = id / 4
    val nFrames = (6 + (g % 3) * 2).toInt
    val w = (16 + g % 8).toInt
    val h = 9
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def be32(v: Int): Unit = { be16((v >>> 16) & 0xffff); be16(v & 0xffff) }
    out.write('G'); out.write('V'); out.write('I'); out.write('D')
    be32(nFrames); be16(w); be16(h)
    var f = 0
    while (f < nFrames) {
      val len = (40 + ((f * 5 + g) % 24)).toInt
      be32(len)
      var j = 0
      while (j < len) {
        out.write(((g * 131 + f * 29 + j * 17 + (j.toLong * j % 97)) % 256).toInt)
        j += 1
      }
      f += 1
    }
    val bytes = out.toByteArray
    if (id % 16 == 15) java.util.Arrays.copyOf(bytes, 9) else bytes
  }

  /** FNV-1a 64 over raw bytes (the frame fingerprint). */
  @inline private[ops] def hashBytes(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h = (h ^ (b(i) & 0xffL)) * 1099511628211L; i += 1 }
    h
  }

  /** Parse a GVID container and fingerprint every `stride`-th frame.
    * Returns Nil on any structural violation (bad magic, truncated
    * header, frame length running past the buffer) — corrupt crawl
    * payloads must skip, never throw. */
  private[ops] def frameHashesOf(bytes: Array[Byte],
                                 stride: Int): Seq[(Int, Int, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 12) return Nil
    if (bytes(0) != 'G' || bytes(1) != 'V' || bytes(2) != 'I' || bytes(3) != 'D') return Nil
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    val nFrames = (u8(4) << 24) | (u8(5) << 16) | (u8(6) << 8) | u8(7)
    val w = (u8(8) << 8) | u8(9)
    val h = (u8(10) << 8) | u8(11)
    if (nFrames < 0 || nFrames > (1 << 20)) return Nil // hostile count guard
    val acc = Seq.newBuilder[(Int, Int, Int, Int, Long)]
    var off = 12
    var f = 0
    while (f < nFrames) {
      if (off + 4 > bytes.length) return Nil
      val len = (u8(off) << 24) | (u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)
      off += 4
      if (len < 0 || off + len > bytes.length) return Nil
      if (f % stride == 0)
        acc += ((f, nFrames, w, h, hashBytes(bytes, off, off + len)))
      off += len
      f += 1
    }
    acc.result()
  }

  /** Frame-sampled fingerprints + cross-video share census over a
    * (vid_id, payload) table: the frame-level dedup primitive for
    * video corpora. Scale shape: the binary payload never leaves its
    * scan partition — the kernel emits only (vid_id, idx, fp) scalars;
    * the census is one fp-keyed partial-agg exchange and an equi-join
    * of two scalar tables (AQE broadcasts the census side when small).
    * Output: (vid_id, frame_idx, n_frames, width, height, fp, n_share)
    * for sampled frames of structurally valid containers. */
  def videoFrameDedup(media: DataFrame, stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val frames = media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        frameHashesOf(payload, stride).map { case (f, n, w, h, fp) =>
          (id, f.toLong, n.toLong, w, h, fp)
        }
      })
      .toDF("vid_id", "frame_idx", "n_frames", "width", "height", "fp")
      // two consumers (census + join side): materialize so the
      // container parse runs exactly once per payload
      .localCheckpoint(false)
    val share = frames.groupBy("fp")
      .agg(countDistinct(col("vid_id")).as("n_share"))
    frames.join(share, "fp")
      .select(col("vid_id"), col("frame_idx"), col("n_frames"),
        col("width"), col("height"), col("fp"), col("n_share"))
  }

  /** Deterministic RIFF/WAVE PCM clip for the audio-plumbing surface:
    * a REAL little-endian WAV container — RIFF header, 16-byte fmt
    * chunk (PCM, 16-bit, mono or stereo), an interposed LIST junk
    * chunk for two thirds of the ids (odd-length for one third, so
    * the RIFF pad byte is exercised), then the data chunk carrying a
    * square wave with a silent lead-in. Every byte derives from `id`:
    *
    *   rate     = [8000, 16000, 44100][id % 3]
    *   channels = 1 + id % 2
    *   lead     = id % 5 silent frames
    *   amp      = 1000 + 137 * (id % 7)
    *   half     = 3 + id % 4 (half-period in frames)
    *   nf       = 200 + 31 * (id % 13) DECLARED frames
    *   left(i)  = 0 while i < lead, then ±amp flipping every `half`
    *   right(i) = sign(left) * (amp - 200) (stereo only)
    *
    * ids divisible by 17 are TRUNCATED mid-stream: the chunk sizes
    * still declare `nf` frames but only nf/2 are present — the parser
    * must clamp to complete frames actually available. */
  private[graft] def syntheticWav(id: Long): Array[Byte] = {
    val rate = Array(8000, 16000, 44100)((id % 3).toInt)
    val channels = 1 + (id % 2).toInt
    val lead = (id % 5).toInt
    val amp = 1000 + 137 * (id % 7).toInt
    val half = 3 + (id % 4).toInt
    val nfDecl = 200 + 31 * (id % 13).toInt
    val nfReal = if (id % 17 == 0) nfDecl / 2 else nfDecl
    val blockAlign = channels * 2
    val junkLen = (id % 3).toInt match {
      case 0 => 0
      case 1 => 4
      case _ => 5 // odd: forces the RIFF pad byte
    }
    val junkTotal = if (junkLen == 0) 0 else 8 + junkLen + (junkLen & 1)
    val dataDecl = nfDecl * blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def tag(s: String): Unit = s.foreach(c => out.write(c.toInt))
    tag("RIFF"); le32(4 + 24 + junkTotal + 8 + dataDecl); tag("WAVE")
    tag("fmt "); le32(16); le16(1); le16(channels); le32(rate)
    le32(rate * blockAlign); le16(blockAlign); le16(16)
    if (junkLen > 0) {
      tag("LIST"); le32(junkLen)
      (0 until junkLen).foreach(k => out.write(((id + k) % 256).toInt))
      if ((junkLen & 1) == 1) out.write(0)
    }
    tag("data"); le32(dataDecl)
    var i = 0
    while (i < nfReal) {
      val left =
        if (i < lead) 0
        else if (((i - lead) / half) % 2 == 0) amp
        else -amp
      le16(left & 0xffff)
      if (channels == 2) {
        val right = if (left == 0) 0 else if (left > 0) amp - 200 else -(amp - 200)
        le16(right & 0xffff)
      }
      i += 1
    }
    out.toByteArray
  }

  /** REAL RIFF/WAVE parse — chunk walk (unknown chunks skipped with
    * the odd-size pad byte), PCM-16 fmt validation, data clamped to
    * the complete frames actually present — then integer-exact clip
    * stats over the interleaved samples:
    *
    *   peak         max |sample|
    *   energy       Σ sample²              (exact long)
    *   pos_weighted Σ sample · (k+1)       k = global interleaved
    *                                       index — order-sensitive, so
    *                                       channel-interleave and
    *                                       lead-in off-by-ones break it
    *   n_silent     #{ |sample| ≤ 2 }
    *
    * Returns None for anything that isn't a complete PCM-16 WAV
    * header (malformed payloads become absent rows, never failures —
    * the extract-job error-row discipline). */
  private[graft] def audioFeaturesOf(bytes: Array[Byte])
      : Option[(Int, Int, Long, Long, Long, Long, Long, Long)] = {
    def tagAt(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def le32(off: Int): Long =
      (le16(off).toLong | (le16(off + 2).toLong << 16)) & 0xffffffffL
    if (bytes.length < 12 || tagAt(0) != "RIFF" || tagAt(8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, blockAlign)
    while (off + 8 <= bytes.length) {
      val id = tagAt(off)
      val size = le32(off + 4)
      val body = off + 8
      if (id == "fmt ") {
        if (size < 16 || body + 16 > bytes.length) return None
        val audioFormat = le16(body)
        val channels = le16(body + 2)
        val rate = le32(body + 4).toInt
        val blockAlign = le16(body + 12)
        val bits = le16(body + 14)
        if (audioFormat != 1 || bits != 16 || channels < 1 || channels > 2 ||
          rate <= 0 || blockAlign != channels * 2) return None
        fmt = Some((channels, rate, blockAlign))
      } else if (id == "data") {
        val (channels, rate, blockAlign) = fmt.getOrElse(return None)
        val available = math.min(size, (bytes.length - body).toLong)
        val nFrames = available / blockAlign
        var peak = 0L; var energy = 0L; var posW = 0L; var nSilent = 0L
        var k = 0L
        var i = 0L
        while (i < nFrames) {
          var c = 0
          while (c < channels) {
            val s = le16((body + i * blockAlign + c * 2).toInt).toShort.toLong
            val a = math.abs(s)
            if (a > peak) peak = a
            energy += s * s
            posW += s * (k + 1)
            if (a <= 2) nSilent += 1
            k += 1; c += 1
          }
          i += 1
        }
        return Some((rate, channels, nFrames, nFrames * 1000L / rate,
          peak, energy, posW, nSilent))
      }
      // unknown chunk (LIST, fact, ...): skip body + odd-size pad
      off = body + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Audio-column plumbing: per-clip integer stats over binary WAV
    * payloads — the audio analog of [[pixelFeatures]]. Per-row kernel
    * via typed mapPartitions (batch-UDF shape), scalar outputs only;
    * `silence_frac` is the single IEEE division of two exact longs. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        audioFeaturesOf(payload).map { case (r, c, nf, ms, pk, en, pw, ns) =>
          (id, r.toLong, c.toLong, nf, ms, pk, en, pw, ns)
        }
      })
      .toDF("doc_id", "sample_rate", "channels", "n_frames", "duration_ms",
        "peak", "energy", "pos_weighted", "n_silent")
      .withColumn("silence_frac",
        col("n_silent").cast("double") /
          (col("n_frames") * col("channels")).cast("double"))
  }

  /** DuckDB oracle for the `multimodal_audio` driver query: every
    * sample is re-derived from the [[syntheticWav]] generator formula
    * (never from the container bytes — the build/parse round trip is
    * exactly what the comparison proves), aggregated with the same
    * integer arithmetic and the same single final division. */
  def audioOracleSql(nClips: Int): String = {
    s"""WITH ids AS (
       |  SELECT unnest(generate_series(0, ${nClips - 1})) AS doc_id),
       |par AS (
       |  SELECT doc_id,
       |    CAST([8000, 16000, 44100][CAST(doc_id % 3 AS INT) + 1] AS BIGINT)
       |      AS rate,
       |    CAST(1 + doc_id % 2 AS BIGINT) AS channels,
       |    doc_id % 5 AS lead,
       |    1000 + 137 * (doc_id % 7) AS amp,
       |    3 + doc_id % 4 AS half,
       |    CASE WHEN doc_id % 17 = 0 THEN (200 + 31 * (doc_id % 13)) // 2
       |         ELSE 200 + 31 * (doc_id % 13) END AS nf
       |  FROM ids),
       |frames AS (
       |  SELECT doc_id, rate, channels, amp, nf,
       |    unnest(generate_series(0, nf - 1)) AS i,
       |    lead, half
       |  FROM par),
       |chans AS (
       |  SELECT doc_id, rate, channels, amp, nf, i, lead, half,
       |    unnest(generate_series(0, channels - 1)) AS c
       |  FROM frames),
       |samples AS (
       |  SELECT doc_id, rate, channels, nf, i, c,
       |    CASE
       |      WHEN i < lead THEN 0
       |      WHEN ((i - lead) // half) % 2 = 0
       |        THEN CASE WHEN c = 0 THEN amp ELSE amp - 200 END
       |      ELSE CASE WHEN c = 0 THEN -amp ELSE -(amp - 200) END
       |    END AS s
       |  FROM chans),
       |agg AS (
       |  SELECT doc_id, rate, channels, nf,
       |    CAST(max(abs(s)) AS BIGINT) AS peak,
       |    CAST(sum(s * s) AS BIGINT) AS energy,
       |    CAST(sum(s * (i * channels + c + 1)) AS BIGINT) AS pos_weighted,
       |    CAST(sum(CASE WHEN abs(s) <= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_silent
       |  FROM samples GROUP BY doc_id, rate, channels, nf)
       |SELECT doc_id, rate AS sample_rate, channels,
       |  CAST(nf AS BIGINT) AS n_frames,
       |  CAST(nf * 1000 // rate AS BIGINT) AS duration_ms,
       |  peak, energy, pos_weighted, n_silent,
       |  CAST(n_silent AS DOUBLE) / CAST(nf * channels AS DOUBLE)
       |    AS silence_frac
       |FROM agg""".stripMargin
  }

  /** DuckDB oracle for the `multimodal_framehash` driver query: the
    * frame bytes are re-derived from the generator formula (never from
    * the container — the build/parse round trip is exactly what the
    * hash check proves), FNV-1a folded in HUGEINT mod-2^64, the same
    * stride sampling, corrupt-id exclusion, and share census. */
  def frameDedupOracleSql(nVids: Int, stride: Int): String = {
    val M = "18446744073709551616"
    val off = "CAST(" + java.lang.Long.toUnsignedString(0xcbf29ce484222325L) + " AS HUGEINT)"
    val step = SimhashOracle.mulmod(SimhashOracle.xor64("h", "c"), "1099511628211")
    s"""WITH vids AS (
       |  SELECT unnest(generate_series(0, ${nVids - 1})) AS vid_id),
       |ok AS (
       |  SELECT vid_id, vid_id // 4 AS g FROM vids WHERE vid_id % 16 <> 15),
       |geom AS (
       |  SELECT vid_id, g, CAST(6 + (g % 3) * 2 AS BIGINT) AS n_frames,
       |    CAST(16 + g % 8 AS INT) AS width, CAST(9 AS INT) AS height
       |  FROM ok),
       |idx AS (
       |  SELECT vid_id, g, n_frames, width, height,
       |    unnest(generate_series(0, n_frames - 1)) AS frame_idx
       |  FROM geom),
       |samp AS (SELECT * FROM idx WHERE frame_idx % $stride = 0),
       |fpt AS (
       |  SELECT vid_id, frame_idx, n_frames, width, height,
       |    list_reduce(list_prepend($off,
       |      list_transform(generate_series(0, 40 + ((frame_idx * 5 + g) % 24) - 1),
       |        j -> CAST((g * 131 + frame_idx * 29 + j * 17 + (j * j % 97)) % 256 AS HUGEINT))),
       |      (h, c) -> $step) AS z
       |  FROM samp),
       |fps AS (
       |  SELECT vid_id, frame_idx, n_frames, width, height,
       |    CAST(CASE WHEN z >= 9223372036854775808 THEN z - $M ELSE z END AS BIGINT) AS fp
       |  FROM fpt),
       |share AS (
       |  SELECT fp, CAST(count(DISTINCT vid_id) AS BIGINT) AS n_share
       |  FROM fps GROUP BY fp)
       |SELECT vid_id, frame_idx, n_frames, width, height, f.fp, n_share
       |FROM fps f JOIN share s ON f.fp = s.fp""".stripMargin
  }

  // ------------------------------------------------------------------
  // EXIF metadata plumbing (multimodal_exif): the privacy-scrub
  // census a multimodal training pipeline runs before shipping images
  // — which payloads carry EXIF, which carry GPS coordinates (strip
  // candidates), and how many bytes stripping the APP1 segment saves.
  // ------------------------------------------------------------------

  /** Deterministic JPEG with a REAL EXIF APP1 segment: SOI, then for
    * ids with `id % 4 != 3` an APP1 carrying a genuine TIFF structure
    * — "II" little-endian for even ids, "MM" big-endian for odd —
    * with IFD0 entries Orientation (SHORT, inline), DateTime (ASCII
    * 20, by offset) and, for `id % 3 == 0`, a GPS-IFD pointer tag
    * whose IFD holds LatRef/Lat(3×RATIONAL)/LonRef/Lon(3×RATIONAL);
    * then a SOF0 stub, SOS, `16 + id % 9` entropy bytes (mod 251 —
    * never 0xFF, so no stuffing needed) and EOI. Every value derives
    * from `id`:
    *
    *   orientation = 1 + id % 8;  day = 1 + id % 28
    *   latRef = N/S by id even/odd;  lonRef = E if id % 4 < 2 else W
    *   lat = (id%90)°, (id%60)', ((id*37)%6000)/100"  (den 1, 1, 100)
    *   lon = (id%180)°, ((id*7)%60)', ((id*53)%6000)/100"
    *
    * ids with `id % 8 == 1` (all of which carry APP1) are TRUNCATED at
    * 12 bytes — mid-APP1, the declared length running past the buffer
    * — so the parser's structural-violation path is exercised. */
  private[graft] def syntheticExifJpeg(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wBe16(v: Int): Unit = { w8(v >>> 8); w8(v) }
    w8(0xff); w8(0xd8) // SOI
    val hasApp1 = id % 4 != 3
    val gps = hasApp1 && id % 3 == 0
    if (hasApp1) {
      val little = id % 2 == 0
      val tiff = new java.io.ByteArrayOutputStream()
      def t8(v: Int): Unit = tiff.write(v & 0xff)
      def t16(v: Int): Unit =
        if (little) { t8(v); t8(v >>> 8) } else { t8(v >>> 8); t8(v) }
      def t32(v: Int): Unit =
        if (little) { t8(v); t8(v >>> 8); t8(v >>> 16); t8(v >>> 24) }
        else { t8(v >>> 24); t8(v >>> 16); t8(v >>> 8); t8(v) }
      def entry(tag: Int, typ: Int, count: Int)(value: => Unit): Unit = {
        t16(tag); t16(typ); t32(count); value
      }
      if (little) { t8('I'); t8('I') } else { t8('M'); t8('M') }
      t16(42); t32(8)
      val n = if (gps) 3 else 2
      val dtOff = 10 + 12 * n + 4
      val gpsOff = dtOff + 20
      t16(n)
      entry(0x0112, 3, 1) { t16(1 + (id % 8).toInt); t16(0) }
      entry(0x0132, 2, 20) { t32(dtOff) }
      if (gps) entry(0x8825, 4, 1) { t32(gpsOff) }
      t32(0)
      f"2026:08:${1 + id % 28}%02d 10:00:00".foreach(c => t8(c.toInt)); t8(0)
      if (gps) {
        val latRats = gpsOff + 2 + 4 * 12 + 4
        val lonRats = latRats + 24
        t16(4)
        entry(1, 2, 2) { t8(if (id % 2 == 0) 'N' else 'S'); t8(0); t16(0) }
        entry(2, 5, 3) { t32(latRats) }
        entry(3, 2, 2) { t8(if (id % 4 < 2) 'E' else 'W'); t8(0); t16(0) }
        entry(4, 5, 3) { t32(lonRats) }
        t32(0)
        t32((id % 90).toInt); t32(1)
        t32((id % 60).toInt); t32(1)
        t32(((id * 37) % 6000).toInt); t32(100)
        t32((id % 180).toInt); t32(1)
        t32(((id * 7) % 60).toInt); t32(1)
        t32(((id * 53) % 6000).toInt); t32(100)
      }
      val tb = tiff.toByteArray
      w8(0xff); w8(0xe1); wBe16(2 + 6 + tb.length)
      "Exif".foreach(c => w8(c.toInt)); w8(0); w8(0)
      out.write(tb, 0, tb.length)
    }
    // SOF0 stub (13 bytes incl marker)
    w8(0xff); w8(0xc0); wBe16(11); w8(8); wBe16(16); wBe16(16)
    w8(1); w8(1); w8(0x11); w8(0)
    // SOS (10 bytes incl marker) + entropy + EOI
    w8(0xff); w8(0xda); wBe16(8); w8(1); w8(1); w8(0); w8(0); w8(63); w8(0)
    var j = 0
    val ne = 16 + (id % 9).toInt
    while (j < ne) { out.write(((id * 11 + j) % 251).toInt); j += 1 }
    w8(0xff); w8(0xd9)
    val bytes = out.toByteArray
    if (id % 8 == 1) java.util.Arrays.copyOf(bytes, 12) else bytes
  }

  private val ExifNone = (0L, "none", 0L, 0L, 0L, 0L, 0L, 0L)

  /** REAL EXIF parse: JPEG segment walk to APP1/"Exif\0\0", then an
    * endian-aware TIFF IFD walk — IFD0 for Orientation (0x0112,
    * inline SHORT), DateTime (0x0132, ASCII by offset; day = chars
    * 8-9) and the GPS-IFD pointer (0x8825); the GPS IFD for
    * LatRef/Lat/LonRef/Lon, the coordinates folded to EXACT signed
    * centi-arcseconds (deg·360000 + min·6000 + sec·100, each rational
    * resolved by truncating integer division — exact on denominators
    * dividing their numerator·scale, as generated here and by every
    * mainstream camera's 1/1/100 convention). Every offset is
    * bounds-checked and IFD entry counts are capped (hostile-count
    * guard); ANY structural violation returns the absent tuple —
    * corrupt crawl payloads must skip, never throw.
    *
    * Returns (exif_ok, byte_order, orientation, date_day, has_gps,
    * lat_csec, lon_csec, app1_bytes). */
  private[graft] def exifOf(b: Array[Byte]): (Long, String, Long, Long, Long, Long, Long, Long) = {
    if (b == null || b.length < 4) return ExifNone
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return ExifNone
    @inline def u8(i: Int): Int = b(i) & 0xff
    var p = 2
    var tiffBase = -1
    var tiffEnd = -1
    var app1Total = 0L
    while (tiffBase < 0) {
      if (p + 4 > b.length) return ExifNone
      if (u8(p) != 0xff) return ExifNone
      val m = u8(p + 1)
      if (m == 0xd9 || m == 0xda) return ExifNone // SOS/EOI: no EXIF
      val len = (u8(p + 2) << 8) | u8(p + 3)
      if (len < 2 || p + 2 + len > b.length) return ExifNone
      if (m == 0xe1 && len >= 10 &&
          u8(p + 4) == 'E' && u8(p + 5) == 'x' && u8(p + 6) == 'i' &&
          u8(p + 7) == 'f' && u8(p + 8) == 0 && u8(p + 9) == 0) {
        tiffBase = p + 10
        tiffEnd = p + 2 + len
        app1Total = len + 2L
      } else p += 2 + len
    }
    if (tiffEnd - tiffBase < 8) return ExifNone
    val little =
      if (u8(tiffBase) == 'I' && u8(tiffBase + 1) == 'I') true
      else if (u8(tiffBase) == 'M' && u8(tiffBase + 1) == 'M') false
      else return ExifNone
    @inline def ok(off: Int, n: Int): Boolean =
      off >= 0 && tiffBase + off + n <= tiffEnd
    @inline def u16(off: Int): Int = {
      val i = tiffBase + off
      if (little) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    }
    @inline def u32(off: Int): Long = {
      val i = tiffBase + off
      if (little)
        u8(i) | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else
        (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) | (u8(i + 2).toLong << 8) | u8(i + 3)
    }
    if (!ok(2, 2) || u16(2) != 42) return ExifNone
    if (!ok(4, 4)) return ExifNone
    val ifd0 = u32(4)
    if (ifd0 > Int.MaxValue || !ok(ifd0.toInt, 2)) return ExifNone
    var orientation = 0L
    var day = 0L
    var gpsIfd = -1L
    var hasGps = 0L
    var latC = 0L
    var lonC = 0L
    val n0 = u16(ifd0.toInt)
    if (n0 > 64) return ExifNone // hostile-count guard
    if (!ok(ifd0.toInt, 2 + 12 * n0 + 4)) return ExifNone
    var e = 0
    while (e < n0) {
      val eo = ifd0.toInt + 2 + 12 * e
      u16(eo) match {
        case 0x0112 => orientation = u16(eo + 8).toLong
        case 0x0132 =>
          val cnt = u32(eo + 4)
          val off = u32(eo + 8)
          if (cnt < 11 || off > Int.MaxValue || !ok(off.toInt, cnt.toInt))
            return ExifNone
          val d1 = u8(tiffBase + off.toInt + 8) - '0'
          val d2 = u8(tiffBase + off.toInt + 9) - '0'
          if (d1 < 0 || d1 > 9 || d2 < 0 || d2 > 9) return ExifNone
          day = d1 * 10L + d2
        case 0x8825 => gpsIfd = u32(eo + 8)
        case _ => ()
      }
      e += 1
    }
    if (gpsIfd >= 0) {
      if (gpsIfd > Int.MaxValue || !ok(gpsIfd.toInt, 2)) return ExifNone
      val ng = u16(gpsIfd.toInt)
      if (ng > 64) return ExifNone
      if (!ok(gpsIfd.toInt, 2 + 12 * ng + 4)) return ExifNone
      var latSign = 0L
      var lonSign = 0L
      var latV = Long.MinValue
      var lonV = Long.MinValue
      // one coordinate = 3 rationals at `off`: deg, min, sec — folded
      // to centi-arcseconds with truncating per-rational division
      def coordCsec(off: Long): Long = {
        if (off > Int.MaxValue || !ok(off.toInt, 24)) return Long.MinValue
        val o = off.toInt
        val dn = u32(o); val dd = u32(o + 4)
        val mn = u32(o + 8); val md = u32(o + 12)
        val sn = u32(o + 16); val sd = u32(o + 20)
        if (dd == 0 || md == 0 || sd == 0) return Long.MinValue
        (dn / dd) * 360000L + (mn / md) * 6000L + sn * 100L / sd
      }
      var g = 0
      while (g < ng) {
        val eo = gpsIfd.toInt + 2 + 12 * g
        u16(eo) match {
          case 1 => latSign = if (u8(tiffBase + eo + 8) == 'S') -1L else 1L
          case 2 => latV = coordCsec(u32(eo + 8))
          case 3 => lonSign = if (u8(tiffBase + eo + 8) == 'W') -1L else 1L
          case 4 => lonV = coordCsec(u32(eo + 8))
          case _ => ()
        }
        g += 1
      }
      if (latSign != 0 && lonSign != 0 &&
          latV != Long.MinValue && lonV != Long.MinValue) {
        hasGps = 1L
        latC = latSign * latV
        lonC = lonSign * lonV
      } else return ExifNone // GPS IFD present but structurally broken
    }
    (1L, if (little) "II" else "MM", orientation, day, hasGps, latC, lonC,
      app1Total)
  }

  /** EXIF privacy-scrub census over a (doc_id, payload) table: which
    * payloads carry parseable EXIF, their byte order / orientation /
    * capture day, whether GPS coordinates are present (the strip
    * candidates), the EXACT signed centi-arcsecond coordinates, and
    * the bytes an APP1 strip would save. Scale shape: one stateless
    * per-row kernel inside the scan partition — the binary payload
    * never moves, only scalars come out; zero shuffles. */
  def exifCensus(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val n = if (payload == null) 0L else payload.length.toLong
        val (okF, bo, ori, day, gps, lat, lon, app1) = exifOf(payload)
        (id, n, okF, bo, ori, day, gps, lat, lon, app1)
      })
      .toDF("doc_id", "n_bytes", "exif_ok", "byte_order", "orientation",
        "date_day", "has_gps", "lat_csec", "lon_csec", "app1_bytes")
  }

  /** DuckDB oracle for [[exifCensus]] over [[syntheticExifJpeg]]:
    * every field re-derived from the GENERATOR formula in closed form
    * — never from the bytes — so the build/parse round trip is what
    * the match proves (framehash pattern). The byte totals restate
    * the container arithmetic: APP1 = 68 bytes plain / 182 with GPS,
    * tail = 41 + id%9, truncation cuts at 12. */
  def exifOracleSql(nImgs: Int): String =
    s"""WITH ids AS (SELECT unnest(generate_series(0, ${nImgs - 1})) AS id),
       |f AS (SELECT id,
       |  (id % 4 <> 3) AS has_app1,
       |  (id % 8 = 1) AS trunc,
       |  (id % 4 <> 3 AND id % 3 = 0) AS gps_built
       |  FROM ids),
       |g AS (SELECT id, has_app1, trunc, gps_built,
       |  (has_app1 AND NOT trunc) AS ok FROM f)
       |SELECT CAST(id AS BIGINT) AS doc_id,
       |  CAST(CASE WHEN trunc THEN 12
       |    ELSE 2 + CASE WHEN has_app1
       |      THEN CASE WHEN gps_built THEN 182 ELSE 68 END ELSE 0 END
       |      + 41 + id % 9 END AS BIGINT) AS n_bytes,
       |  CAST(CASE WHEN ok THEN 1 ELSE 0 END AS BIGINT) AS exif_ok,
       |  CASE WHEN NOT ok THEN 'none'
       |       WHEN id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
       |  CAST(CASE WHEN ok THEN 1 + id % 8 ELSE 0 END AS BIGINT) AS orientation,
       |  CAST(CASE WHEN ok THEN 1 + id % 28 ELSE 0 END AS BIGINT) AS date_day,
       |  CAST(CASE WHEN ok AND gps_built THEN 1 ELSE 0 END AS BIGINT) AS has_gps,
       |  CAST(CASE WHEN ok AND gps_built THEN
       |    (CASE WHEN id % 2 = 0 THEN 1 ELSE -1 END) *
       |    ((id % 90) * 360000 + (id % 60) * 6000 + (id * 37) % 6000)
       |    ELSE 0 END AS BIGINT) AS lat_csec,
       |  CAST(CASE WHEN ok AND gps_built THEN
       |    (CASE WHEN id % 4 < 2 THEN 1 ELSE -1 END) *
       |    ((id % 180) * 360000 + ((id * 7) % 60) * 6000 + (id * 53) % 6000)
       |    ELSE 0 END AS BIGINT) AS lon_csec,
       |  CAST(CASE WHEN ok THEN
       |    CASE WHEN gps_built THEN 182 ELSE 68 END
       |    ELSE 0 END AS BIGINT) AS app1_bytes
       |FROM g""".stripMargin
}
