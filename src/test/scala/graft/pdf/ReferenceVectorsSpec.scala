package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.codec.Codecs

/** Behavior cross-check against the reference's own decoder test
  * vectors (reference: tests/test_decoders.rs — spec-defined
  * input/output pairs, re-asserted here so the two engines provably
  * agree on the same bytes). */
class ReferenceVectorsSpec extends AnyFunSuite {

  test("ASCIIHex vectors (test_decoders.rs:39-53)") {
    assert(Codecs.asciiHexDecode("48656C6C6F20576F726C64".getBytes)
      .sameElements("Hello World".getBytes))
    assert(Codecs.asciiHexDecode("54657374".getBytes).sameElements("Test".getBytes))
    assert(Codecs.asciiHexDecode("414243444546".getBytes).sameElements("ABCDEF".getBytes))
  }

  test("ASCII85 vectors incl. the z shorthand (test_decoders.rs:56-66)") {
    assert(Codecs.ascii85Decode("z".getBytes).sameElements(Array[Byte](0, 0, 0, 0)))
    assert(Codecs.ascii85Decode("<+U,m".getBytes).sameElements("Test".getBytes))
  }

  test("RunLength literal + repeat runs (test_decoders.rs:82-94)") {
    assert(Codecs.runLengthDecode(Array[Byte](2, 'A', 'B', 'C')).sameElements("ABC".getBytes))
    assert(Codecs.runLengthDecode(Array[Byte](250.toByte, 'X'))
      .sameElements("XXXXXXX".getBytes)) // 257-250 = 7 repeats
  }

  test("Flate round-trip through the zlib container (test_decoders.rs:22-36)") {
    val original = "This is a test of FlateDecode compression in a PDF stream.".getBytes
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(original)
    deflater.finish()
    val buf = new Array[Byte](1024)
    val n = deflater.deflate(buf)
    deflater.end()
    assert(Codecs.flateDecode(java.util.Arrays.copyOf(buf, n)).sameElements(original))
  }

  test("DCT is pass-through (test_decoders.rs:97-104)") {
    val jpegish = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2, 3)
    assert(Codecs.applyFilter("DCTDecode", jpegish, None, _ => graft.pdf.cos.PdfObj.Null)
      .sameElements(jpegish))
  }

  // ---- encode helpers for the pipeline vectors (test-only) ----------

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](4096)
    val n = d.deflate(buf)
    d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  private def hexEncode(data: Array[Byte]): Array[Byte] =
    data.map(b => f"${b & 0xff}%02X").mkString.getBytes("ISO-8859-1")

  /** Minimal PDF-variant LZW encoder (MSB packing, Clear/EOD, early
    * change) — mirrors the decoder's table growth; inputs here are
    * short enough that code width stays at 9 bits. */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var nBits = 0; var codeBits = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << codeBits) | code
      nBits += codeBits
      while (nBits >= 8) { out.write(((bitBuf >>> (nBits - 8)) & 0xff).toInt); nBits -= 8 }
    }
    val dict = scala.collection.mutable.HashMap.empty[String, Int]
    var next = 258
    def codeOf(s: String): Int = if (s.length == 1) s.charAt(0) & 0xff else dict(s)
    put(256) // clear table
    if (data.nonEmpty) {
      var w = new String(Array(data(0)), "ISO-8859-1")
      var i = 1
      while (i < data.length) {
        val wc = w + (data(i) & 0xff).toChar
        if (wc.length == 1 || dict.contains(wc)) w = wc
        else {
          put(codeOf(w))
          dict(wc) = next; next += 1
          if (next >= (1 << codeBits) - 1 && codeBits < 12) codeBits += 1
          w = (data(i) & 0xff).toChar.toString
        }
        i += 1
      }
      put(codeOf(w))
    }
    put(257) // EOD
    if (nBits > 0) out.write(((bitBuf << (8 - nBits)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZW round-trip (test_decoders.rs:69-80)") {
    val original = "ABABABABABABABAB".getBytes("ISO-8859-1")
    assert(Codecs.lzwDecode(lzwEncode(original)).sameElements(original))
    val longer = ("the quick brown fox " * 20).getBytes("ISO-8859-1")
    assert(Codecs.lzwDecode(lzwEncode(longer)).sameElements(longer))
  }

  private def pipelineDecode(filters: Seq[String], data: Array[Byte]): Array[Byte] = {
    import graft.pdf.cos.PdfObj
    import graft.pdf.cos.PdfObj._
    val fl: PdfObj = if (filters.size == 1) Name(filters.head)
      else Arr(filters.map(Name.apply).toVector)
    Codecs.decodeStream(Dict(Map("Filter" -> fl)), data, identity)
  }

  test("filter pipeline: single hex (test_decoders.rs:107)") {
    assert(pipelineDecode(Seq("ASCIIHexDecode"), "48656C6C6F".getBytes)
      .sameElements("Hello".getBytes))
  }

  test("filter pipeline: hex then flate (test_decoders.rs:117)") {
    val original = "Hello, World!".getBytes("ISO-8859-1")
    val encoded = hexEncode(deflate(original))
    assert(pipelineDecode(Seq("ASCIIHexDecode", "FlateDecode"), encoded)
      .sameElements(original))
  }

  test("filter pipeline: 3-stage hex+flate+lzw (test_decoders.rs:238)") {
    val original = "Complex!".getBytes("ISO-8859-1")
    val encoded = hexEncode(deflate(lzwEncode(original)))
    assert(pipelineDecode(Seq("ASCIIHexDecode", "FlateDecode", "LZWDecode"), encoded)
      .sameElements(original))
  }

  test("empty filter list passes data through (test_decoders.rs:230)") {
    val data = "No compression here!".getBytes("ISO-8859-1")
    import graft.pdf.cos.PdfObj._
    assert(Codecs.decodeStream(Dict.empty, data, identity).sameElements(data))
  }

  test("unsupported filter errors (test_decoders.rs:135)") {
    intercept[Exception] {
      pipelineDecode(Seq("NonExistentFilter"), "test".getBytes)
    }
  }
}
