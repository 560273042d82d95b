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
}
