package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.codec.{Codecs, DecodeException}
import graft.pdf.testgen.PdfBuilder

/** Decoder round-trips + guards (reference analog: tests/test_decoders.rs). */
class CodecSpec extends AnyFunSuite {

  /** Seeded random byte arrays (sizes 0..2000) — deterministic
    * property-style sweep without a generator dependency. */
  private def forAll(f: Array[Byte] => Unit): Unit = {
    val rnd = new java.util.Random(42)
    (0 until 60).foreach { _ =>
      val a = new Array[Byte](rnd.nextInt(2000))
      rnd.nextBytes(a)
      f(a)
    }
    f(Array.emptyByteArray)
    f(Array.fill[Byte](500)(7)) // long runs (RLE edge)
  }

  test("flate round-trip (property)") {
    forAll { data =>
      assert(Codecs.flateDecode(PdfBuilder.deflate(data)).sameElements(data))
    }
  }

  test("flate: raw-deflate (no zlib wrapper) fallback") {
    val data = "raw deflate payload".getBytes
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true) // nowrap
    d.setInput(data); d.finish()
    val buf = new Array[Byte](1024)
    val n = d.deflate(buf)
    d.end()
    assert(Codecs.flateDecode(buf.take(n)).sameElements(data))
  }

  test("flate: truncated stream returns prefix instead of failing") {
    val full = PdfBuilder.deflate(("hello world " * 100).getBytes)
    val out = Codecs.flateDecode(full.dropRight(4))
    assert(new String(out).startsWith("hello world"))
  }

  test("asciiHex round-trip + terminator + odd pad") {
    val data = Array[Byte](0x00, 0x7f, 0xff.toByte, 0x10)
    val enc = (data.map(b => f"${b & 0xff}%02X").mkString + ">").getBytes
    assert(Codecs.asciiHexDecode(enc).sameElements(data))
    assert(Codecs.asciiHexDecode("7>".getBytes).sameElements(Array[Byte](0x70)))
  }

  test("ascii85 round-trip (encoder in test only)") {
    def encode85(data: Array[Byte]): Array[Byte] = {
      val sb = new StringBuilder
      var i = 0
      while (i < data.length) {
        val chunk = data.slice(i, math.min(i + 4, data.length))
        var v = 0L
        chunk.foreach(b => v = (v << 8) | (b & 0xff))
        var pad = 4 - chunk.length
        v <<= 8 * pad
        if (chunk.length == 4 && v == 0) sb.append('z')
        else {
          val cs = new Array[Char](5)
          var k = 4
          var vv = v
          while (k >= 0) { cs(k) = ('!' + (vv % 85)).toChar; vv /= 85; k -= 1 }
          sb.appendAll(cs, 0, 5 - pad)
        }
        i += 4
      }
      (sb.toString + "~>").getBytes
    }
    forAll { data =>
      assert(Codecs.ascii85Decode(encode85(data)).sameElements(data))
    }
  }

  test("runLength round-trip (encoder in test only)") {
    def encodeRle(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < data.length) {
        var run = 1
        while (i + run < data.length && data(i + run) == data(i) && run < 127) run += 1
        if (run >= 2) { out.write(257 - run); out.write(data(i)); i += run }
        else {
          var lit = 1
          while (i + lit < data.length && lit < 128 &&
                 (i + lit + 1 >= data.length || data(i + lit) != data(i + lit + 1))) lit += 1
          out.write(lit - 1)
          out.write(data, i, lit)
          i += lit
        }
      }
      out.write(128)
      out.toByteArray
    }
    forAll { data =>
      assert(Codecs.runLengthDecode(encodeRle(data)).sameElements(data))
    }
  }

  test("lzw round-trip (encoder in test only, early-change packing)") {
    forAll { data =>
      assert(Codecs.lzwDecode(encodeLzw(data), earlyChange = 1).sameElements(data))
    }
  }

  /** Test-only LZW encoder (MSB-first, EarlyChange=1 width growth) —
    * shared by the round-trip property and the 3-filter pipeline
    * vector below. */
  private def encodeLzw(data: Array[Byte]): Array[Byte] = {
      val table = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
      (0 until 256).foreach(i => table(Seq(i.toByte)) = i)
      var nxt = 258
      val codes = scala.collection.mutable.ArrayBuffer(256)
      var w = Vector.empty[Byte]
      data.foreach { ch =>
        val wc = w :+ ch
        if (table.contains(wc)) w = wc
        else {
          codes += table(w)
          table(wc) = nxt; nxt += 1
          w = Vector(ch)
        }
      }
      if (w.nonEmpty) codes += table(w)
      codes += 257
      // MSB-first packing with EarlyChange=1 width growth
      val out = new java.io.ByteArrayOutputStream()
      var width = 9
      var cnt = 257 // first code after Clear assigns no table entry
      var bitBuf = 0L
      var bitCnt = 0
      codes.foreach { c =>
        bitBuf = (bitBuf << width) | c
        bitCnt += width
        while (bitCnt >= 8) {
          out.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt)
          bitCnt -= 8
        }
        if (c == 256) { cnt = 257; width = 9 }
        else if (c != 257) {
          cnt += 1
          if (cnt >= (1 << width) - 1 && width < 12) width += 1
        }
      }
      if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
      out.toByteArray
  }

  test("3-filter pipeline AHx→Fl→LZW (test_decoders.rs:238 complex_filter_pipeline)") {
    import graft.pdf.cos.PdfObj
    import graft.pdf.cos.PdfObj._
    val original = "Complex!".getBytes
    // encode inside-out: LZW, then flate, then hex — decode lists the
    // OUTERMOST filter first: [/ASCIIHexDecode /FlateDecode /LZWDecode]
    val enc = (PdfBuilder.deflate(encodeLzw(original))
      .map(b => f"${b & 0xff}%02X").mkString + ">").getBytes
    val dict = Dict(Map("Filter" -> Arr(Vector(
      Name("ASCIIHexDecode"), Name("FlateDecode"), Name("LZWDecode")))))
    assert(Codecs.decodeStream(dict, enc, identity[PdfObj]).sameElements(original))
  }

  test("unsupported filter in a pipeline throws (test_decoders.rs:135)") {
    import graft.pdf.cos.PdfObj
    import graft.pdf.cos.PdfObj._
    val dict = Dict(Map("Filter" -> Name("NonExistentFilter")))
    intercept[DecodeException](
      Codecs.decodeStream(dict, "test".getBytes, identity[PdfObj]))
  }

  test("no /Filter entry returns data as-is (test_decoders.rs:144,230)") {
    import graft.pdf.cos.PdfObj
    import graft.pdf.cos.PdfObj._
    val data = "No compression here!".getBytes
    assert(Codecs.decodeStream(Dict(Map.empty), data, identity[PdfObj]).sameElements(data))
    // decode on a non-stream object (test_decoders.rs:211) has no
    // analog: streamData takes Stream by type — the error is
    // unrepresentable rather than runtime-checked
  }

  test("png predictor: Up and Sub filters") {
    // 2 rows × 3 cols, 1 color, 8bpc; filter byte prefixes each row
    val data = Array[Byte](
      1, 10, 10, 10,  // Sub: 10, 20, 30
      2, 1, 1, 1)     // Up:  11, 21, 31
    val out = Codecs.applyPredictor(data, predictor = 12, colors = 1, bpc = 8, columns = 3)
    assert(out.sameElements(Array[Byte](10, 20, 30, 11, 21, 31)))
  }

  test("tiff predictor 2") {
    val data = Array[Byte](10, 5, 5, 1, 1, 1)
    val out = Codecs.applyPredictor(data, predictor = 2, colors = 1, bpc = 8, columns = 6)
    assert(out.sameElements(Array[Byte](10, 15, 20, 21, 22, 23)))
  }

  test("decodeStream dispatches by /Filter dict incl. short aliases") {
    import graft.pdf.cos.PdfObj
    import graft.pdf.cos.PdfObj._
    val data = "pipeline payload".getBytes
    // [/AHx /Fl]: outermost listed first — data was deflated then hexed
    val enc = (PdfBuilder.deflate(data).map(b => f"${b & 0xff}%02X").mkString + ">").getBytes
    val dict = Dict(Map("Filter" -> Arr(Vector(Name("AHx"), Name("Fl")))))
    assert(Codecs.decodeStream(dict, enc, identity[PdfObj]).sameElements(data))
    // single name form + RunLength
    val rle = Array[Byte](2, 'a', 'b', 'c', 0x81.toByte, 'z', 0x80.toByte)
    val d2 = Dict(Map("Filter" -> Name("RunLengthDecode")))
    assert(new String(Codecs.decodeStream(d2, rle, identity[PdfObj])) == "abc" + "z" * 128)
  }

  test("decompression bomb guard trips on high-ratio input") {
    val bomb = PdfBuilder.deflate(new Array[Byte](50 * 1024 * 1024)) // 50MB zeros
    intercept[DecodeException](Codecs.flateDecode(bomb))
  }
}
