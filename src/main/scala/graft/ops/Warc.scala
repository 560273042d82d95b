package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC/1.0 container plumbing (ISO 28500 — the Common-Crawl shard
  * format): REAL byte-level record framing — version line, CRLF
  * header block, Content-Length-framed payload, CRLF CRLF record
  * separator — parsed with an index cursor over the raw shard bytes.
  * The ingestion primitive a crawl pipeline runs before anything
  * else touches a shard.
  *
  * Scale shape: one stateless flatMap kernel per shard — the shard
  * bytes never leave their scan partition, only per-record scalars
  * (type, uri, length, payload fingerprint) come out; downstream is
  * whatever census the caller groups. Truncated shards yield their
  * complete prefix records (crawl shards are cut mid-flight all the
  * time — skip, never throw). */
object Warc {

  /** Deterministic synthetic WARC shard. Record r of shard s:
    *  - r = 0: `warcinfo` (no target URI);
    *  - r ≥ 1 cycling by r % 3: 1 → `response`, 2 → `request`,
    *    0 → `metadata`; target URI
    *    https://host{(s·7+r)%13}.example/doc{s·31+r};
    *  - payload: len = 20 + (s·13 + r·7) % 50 bytes,
    *    byte j = 97 + (s + r·3 + j) % 26 (lowercase ASCII);
    *  - 1 + (3 + s % 4) records per shard.
    * Shards with s % 8 == 7 are TRUNCATED mid-payload of their last
    * record (headers intact, half the declared bytes present). */
  private[graft] def syntheticShard(s: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes("US-ASCII"))
    val nRecs = 1 + 3 + (s % 4).toInt
    var lastRecStart = 0
    var r = 0
    while (r < nRecs) {
      lastRecStart = out.size()
      val tpe =
        if (r == 0) "warcinfo"
        else if (r % 3 == 1) "response"
        else if (r % 3 == 2) "request"
        else "metadata"
      val plLen = 20 + ((s * 13 + r * 7) % 50).toInt
      w("WARC/1.0\r\n")
      w(s"WARC-Type: $tpe\r\n")
      w(s"WARC-Record-ID: <urn:graft:$s-$r>\r\n")
      if (r > 0)
        w(s"WARC-Target-URI: https://host${(s * 7 + r) % 13}.example/doc${s * 31 + r}\r\n")
      w(s"Content-Length: $plLen\r\n")
      w("\r\n")
      var j = 0
      while (j < plLen) {
        out.write(97 + ((s + r * 3 + j) % 26).toInt)
        j += 1
      }
      w("\r\n\r\n")
      r += 1
    }
    val bytes = out.toByteArray
    if (s % 8 == 7) {
      // cut mid-payload of the LAST record: keep its headers and half
      // of the declared payload — the framing contract is violated,
      // so the record must NOT be emitted
      val lastPl = 20 + ((s * 13 + (nRecs - 1) * 7) % 50).toInt
      val headersEnd = {
        // scan from lastRecStart for the blank line, bounded so a
        // generator-layout change fails loudly instead of walking off
        // the array
        var i = lastRecStart
        while (i + 3 < bytes.length &&
               !(bytes(i) == '\r' && bytes(i + 1) == '\n' &&
                 bytes(i + 2) == '\r' && bytes(i + 3) == '\n')) i += 1
        require(i + 3 < bytes.length,
          s"syntheticShard: no CRLFCRLF header terminator after offset $lastRecStart")
        i + 4
      }
      java.util.Arrays.copyOf(bytes, headersEnd + lastPl / 2)
    } else bytes
  }

  /** Parse one shard: records as (idx, type, uri — "" for none,
    * contentLength, payload FNV-1a 64). Strict framing: version line,
    * header lines to the blank line, exactly Content-Length payload
    * bytes, then CRLF CRLF — any violation (truncation, missing
    * length, bad version) ends the parse with the complete prefix. */
  private[graft] def parseShard(b: Array[Byte]): Vector[(Int, String, String, Long, Long)] = {
    val outB = Vector.newBuilder[(Int, String, String, Long, Long)]
    if (b == null) return outB.result()
    @inline def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      if (i + 1 < b.length) i else -1
    }
    var p = 0
    var idx = 0
    var done = false
    while (!done && p < b.length) {
      val ve = lineEnd(p)
      if (ve < 0 || new String(b, p, ve - p, "US-ASCII") != "WARC/1.0") { done = true }
      else {
        p = ve + 2
        var tpe = ""
        var uri = ""
        var clen = -1L
        var headersOk = false
        var stop = false
        while (!stop) {
          val he = lineEnd(p)
          if (he < 0) { stop = true }
          else if (he == p) { p += 2; headersOk = true; stop = true } // blank
          else {
            val line = new String(b, p, he - p, "US-ASCII")
            val ci = line.indexOf(": ")
            if (ci < 0) { stop = true } // malformed header line
            else {
              val k = line.substring(0, ci)
              val v = line.substring(ci + 2)
              if (k == "WARC-Type") tpe = v
              else if (k == "WARC-Target-URI") uri = v
              else if (k == "Content-Length")
                clen = try v.toLong catch { case _: NumberFormatException => -1L }
              p = he + 2
            }
          }
        }
        if (!headersOk || clen < 0 || tpe.isEmpty ||
            p + clen + 4 > b.length) { done = true }
        else {
          val fp = Multimodal.hashBytes(b, p, (p + clen).toInt)
          val pe = (p + clen).toInt
          if (!(b(pe) == '\r' && b(pe + 1) == '\n' &&
                b(pe + 2) == '\r' && b(pe + 3) == '\n')) { done = true }
          else {
            outB += ((idx, tpe, uri, clen, fp))
            idx += 1
            p = pe + 4
          }
        }
      }
    }
    outB.result()
  }

  /** Per-record extraction over a (shard_id, warc) table. */
  def records(shards: DataFrame): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select(col("shard_id").cast("long"), col("warc"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseShard(bytes).iterator.map { case (idx, tpe, uri, clen, fp) =>
          (id, idx.toLong, tpe, uri, clen, fp)
        }
      })
      .toDF("shard_id", "rec_idx", "warc_type", "target_uri",
        "content_length", "payload_fp")
  }

  /** DuckDB oracle for records(syntheticShard corpus): every field —
    * including the FNV payload fingerprint — re-derived from the
    * GENERATOR formula in closed form, never from the bytes (the
    * framehash pattern); truncated shards lose exactly their last
    * record. */
  def recordsOracleSql(nShards: Int): String = {
    val M = "18446744073709551616"
    val off = "CAST(" + java.lang.Long.toUnsignedString(0xcbf29ce484222325L) + " AS HUGEINT)"
    val step = SimhashOracle.mulmod(SimhashOracle.xor64("h", "c"), "1099511628211")
    s"""WITH shards AS (
       |  SELECT unnest(generate_series(0, ${nShards - 1})) AS s),
       |geom AS (
       |  SELECT s, 1 + 3 + s % 4 AS n_recs, (s % 8 = 7) AS trunc
       |  FROM shards),
       |recs AS (
       |  SELECT s, n_recs, trunc,
       |    unnest(generate_series(0, CAST(n_recs - 1 AS INT))) AS r
       |  FROM geom),
       |kept AS (
       |  SELECT s, r FROM recs
       |  WHERE NOT (trunc AND r = n_recs - 1)),
       |fields AS (
       |  SELECT s, r,
       |    CASE WHEN r = 0 THEN 'warcinfo'
       |         WHEN r % 3 = 1 THEN 'response'
       |         WHEN r % 3 = 2 THEN 'request'
       |         ELSE 'metadata' END AS warc_type,
       |    CASE WHEN r = 0 THEN ''
       |         ELSE 'https://host' || CAST((s * 7 + r) % 13 AS VARCHAR)
       |           || '.example/doc' || CAST(s * 31 + r AS VARCHAR)
       |    END AS target_uri,
       |    CAST(20 + (s * 13 + r * 7) % 50 AS BIGINT) AS content_length
       |  FROM kept),
       |fpt AS (
       |  SELECT s, r,
       |    list_reduce(list_prepend($off,
       |      list_transform(generate_series(0, CAST(content_length - 1 AS INT)),
       |        j -> CAST(97 + (s + r * 3 + j) % 26 AS HUGEINT))),
       |      (h, c) -> $step) AS z
       |  FROM fields)
       |SELECT f.s AS shard_id, CAST(f.r AS BIGINT) AS rec_idx,
       |  f.warc_type, f.target_uri, f.content_length,
       |  CAST(CASE WHEN z >= 9223372036854775808 THEN z - $M ELSE z END
       |    AS BIGINT) AS payload_fp
       |FROM fields f JOIN fpt ON fpt.s = f.s AND fpt.r = f.r""".stripMargin
  }
}
