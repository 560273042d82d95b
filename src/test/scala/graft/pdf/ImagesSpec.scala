package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.doc.PdfDocument
import graft.pdf.extract.{Images, PdfImage}
import graft.pdf.testgen.PdfBuilder

/** Image XObject pixel extraction + PNG/JPEG save encoding
  * (reference: src/extractors/images.rs:430-525, 156-204). Fixtures
  * embed raw sample data behind FlateDecode; round-trips decode our
  * own PNG output back to pixels. */
class ImagesSpec extends AnyFunSuite {

  /** One-page PDF with a single image XObject. */
  private def pdfWithImage(w: Int, h: Int, bpc: Int, csEntry: String,
                           samples: Array[Byte],
                           dct: Boolean = false,
                           extraObjs: PdfBuilder => String = _ => ""): Array[Byte] = {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val pre = extraObjs(b)
    val cs = if (csEntry.startsWith("@")) pre else csEntry
    val imgId =
      if (dct) b.addStream(s"/Subtype /Image /Width $w /Height $h /BitsPerComponent $bpc " +
        s"/ColorSpace $cs /Filter /DCTDecode ", samples, flate = false)
      else b.addStream(s"/Subtype /Image /Width $w /Height $h /BitsPerComponent $bpc " +
        s"/ColorSpace $cs ", samples, flate = true)
    val content = s"q $w 0 0 $h 100 500 cm /Im1 Do Q".getBytes("ISO-8859-1")
    val cId = b.addStream("", content, flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /XObject << /Im1 $imgId 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    b.build(catId)
  }

  private def extractOne(pdf: Array[Byte]): PdfImage = {
    val doc = new PdfDocument(pdf)
    val imgs = Images.extract(doc, doc.pages.head)
    assert(imgs.size == 1, s"expected one image, got ${imgs.size}")
    imgs.head
  }

  test("malformed image XObjects are rejected, never crash (reference test_images.rs:371)") {
    // reference errors on missing Subtype / wrong Subtype / missing
    // Width / missing Height; this engine's analog is a silent skip
    def pdfWithRawXObject(dict: String): Array[Byte] = {
      val b = new PdfBuilder()
      val catId = b.reserveId()
      val pagesId = b.reserveId()
      val imgId = b.addStream(dict, Array.fill[Byte](30)(1), flate = true)
      val cId = b.addStream("", "q 10 0 0 10 0 0 cm /Im1 Do Q".getBytes("ISO-8859-1"), flate = false)
      val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /XObject << /Im1 $imgId 0 R >> >> /Contents $cId 0 R >>")
      b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
      b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
      b.build(catId)
    }
    val cases = Seq(
      "",                                                    // missing Subtype
      "/Subtype /Form ",                                     // wrong Subtype
      "/Subtype /Image /Height 100 /ColorSpace /DeviceRGB ", // missing Width
      "/Subtype /Image /Width 100 /ColorSpace /DeviceRGB ",  // missing Height
      "/Subtype /Image /Width 0 /Height 10 /ColorSpace /DeviceRGB ") // zero dim
    for (dict <- cases) {
      val doc = new PdfDocument(pdfWithRawXObject(dict))
      assert(Images.extract(doc, doc.pages.head).isEmpty, s"dict [$dict]")
    }
    // a RAW image with missing/unsupported ColorSpace is rejected like
    // the reference's parse_color_space Err path (unknown-as-gray
    // would fabricate pixel semantics)…
    val doc = new PdfDocument(pdfWithRawXObject("/Subtype /Image /Width 5 /Height 2 "))
    assert(Images.extract(doc, doc.pages.head).isEmpty)
    // …but DCT pass-through KEEPS the image without a /ColorSpace —
    // deliberate divergence: the JPEG payload carries its own color
    // model and the sink saves it verbatim
    val b2 = new PdfBuilder()
    val catId2 = b2.reserveId()
    val pagesId2 = b2.reserveId()
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val imgId2 = b2.addStream("/Subtype /Image /Width 5 /Height 2 /Filter /DCTDecode ",
      jpeg, flate = false)
    val cId2 = b2.addStream("", "q 5 0 0 2 0 0 cm /Im1 Do Q".getBytes("ISO-8859-1"), flate = false)
    val pageId2 = b2.addObject(s"<< /Type /Page /Parent $pagesId2 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /XObject << /Im1 $imgId2 0 R >> >> /Contents $cId2 0 R >>")
    b2.addObjectAt(pagesId2, s"<< /Type /Pages /Kids [$pageId2 0 R] /Count 1 >>")
    b2.addObjectAt(catId2, s"<< /Type /Catalog /Pages $pagesId2 0 R >>")
    val doc2 = new PdfDocument(b2.build(catId2))
    val kept = Images.extract(doc2, doc2.pages.head)
    assert(kept.size == 1 && kept.head.isJpeg && kept.head.colorSpace == "unknown")
  }

  test("DCTDecode detected inside a Filter array (reference test_images.rs:434)") {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val imgId = b.addStream("/Subtype /Image /Width 2 /Height 2 /BitsPerComponent 8 " +
      "/ColorSpace /DeviceRGB /Filter [ /DCTDecode ] ", jpeg, flate = false)
    val cId = b.addStream("", "q 2 0 0 2 0 0 cm /Im1 Do Q".getBytes("ISO-8859-1"), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /XObject << /Im1 $imgId 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val img = extractOne(b.build(catId))
    assert(img.isJpeg)
    assert(Images.toPng(img).isEmpty) // pass-through, not decodable here
  }

  test("BitsPerComponent defaults to 8 when absent (reference test_images.rs:462)") {
    val b = new PdfBuilder()
    val catId = b.reserveId()
    val pagesId = b.reserveId()
    val imgId = b.addStream("/Subtype /Image /Width 10 /Height 10 /ColorSpace /DeviceRGB ",
      Array.fill[Byte](300)(0), flate = true)
    val cId = b.addStream("", "q 10 0 0 10 0 0 cm /Im1 Do Q".getBytes("ISO-8859-1"), flate = false)
    val pageId = b.addObject(s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /XObject << /Im1 $imgId 0 R >> >> /Contents $cId 0 R >>")
    b.addObjectAt(pagesId, s"<< /Type /Pages /Kids [$pageId 0 R] /Count 1 >>")
    b.addObjectAt(catId, s"<< /Type /Catalog /Pages $pagesId 0 R >>")
    val img = extractOne(b.build(catId))
    assert(img.bitsPerComponent == 8)
    assert(img.width == 10 && img.height == 10)
  }

  test("large image dimensions pass through on DCT (reference test_images.rs:495)") {
    val jpegStub = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val img = extractOne(pdfWithImage(4096, 2048, 8, "/DeviceRGB", jpegStub, dct = true))
    assert(img.width == 4096 && img.height == 2048)
    assert(img.isJpeg)
  }

  test("8-bit RGB image: pixels survive extract → PNG → decode round-trip") {
    val w = 4; val h = 3
    val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) & 0xff).toByte)
    val img = extractOne(pdfWithImage(w, h, 8, "/DeviceRGB", px))
    assert(img.width == w && img.height == h && img.colorSpace == "DeviceRGB")
    assert(!img.isJpeg)
    val png = Images.toPng(img).get
    // our own header parser agrees on the container
    assert(graft.ops.Multimodal.decodeHeader(png) == (("png", w.toLong, h.toLong, 8L)))
    val (outPx, ow, oh, ch) = Images.decodePngForTest(png)
    assert((ow, oh, ch) == ((w, h, 3)))
    assert(outPx.sameElements(px))
  }

  test("8-bit grayscale encodes as PNG color type 0") {
    val w = 5; val h = 2
    val px = Array.tabulate(w * h)(i => (i * 25).toByte)
    val img = extractOne(pdfWithImage(w, h, 8, "/DeviceGray", px))
    val png = Images.toPng(img).get
    val (outPx, _, _, ch) = Images.decodePngForTest(png)
    assert(ch == 1)
    assert(outPx.sameElements(px))
  }

  test("1-bit image expands to 0/255 with row padding") {
    // 10x2, rows padded to 2 bytes: 1010101010 / 0101010101
    val samples = Array[Byte](0xaa.toByte, 0x80.toByte, 0x55, 0x40)
    val img = extractOne(pdfWithImage(10, 2, 1, "/DeviceGray", samples))
    val (px, _, _, _) = Images.decodePngForTest(Images.toPng(img).get)
    val row0 = (0 until 10).map(i => px(i) & 0xff)
    val row1 = (0 until 10).map(i => px(10 + i) & 0xff)
    assert(row0 == Seq(255, 0, 255, 0, 255, 0, 255, 0, 255, 0), row0.toString)
    assert(row1 == Seq(0, 255, 0, 255, 0, 255, 0, 255, 0, 255), row1.toString)
  }

  test("CMYK samples convert to RGB") {
    // one pixel: pure cyan (C=255) → RGB (0, 255, 255)
    val img = extractOne(pdfWithImage(1, 1, 8, "/DeviceCMYK",
      Array[Byte](0xff.toByte, 0, 0, 0)))
    val (px, _, _, ch) = Images.decodePngForTest(Images.toPng(img).get)
    assert(ch == 3)
    assert((px(0) & 0xff, px(1) & 0xff, px(2) & 0xff) == ((0, 255, 255)))
  }

  test("Indexed palette resolves through the base space") {
    val img = extractOne(pdfWithImage(2, 1, 8, "@palette",
      Array[Byte](0, 1), extraObjs = { b =>
        // palette: index 0 = red, 1 = blue over DeviceRGB
        val pal = b.addStream("", Array[Byte](0xff.toByte, 0, 0, 0, 0, 0xff.toByte), flate = true)
        s"[/Indexed /DeviceRGB 1 $pal 0 R]"
      }))
    assert(img.colorSpace == "Indexed" && img.paletteBase == "DeviceRGB")
    val (px, _, _, ch) = Images.decodePngForTest(Images.toPng(img).get)
    assert(ch == 3)
    assert((px(0) & 0xff, px(1) & 0xff, px(2) & 0xff) == ((255, 0, 0)))
    assert((px(3) & 0xff, px(4) & 0xff, px(5) & 0xff) == ((0, 0, 255)))
  }

  test("ICCBased N=3 treated as RGB") {
    val img = extractOne(pdfWithImage(1, 1, 8, "@icc",
      Array[Byte](1, 2, 3), extraObjs = { b =>
        val icc = b.addStream("/N 3 ", Array[Byte](0), flate = false)
        s"[/ICCBased $icc 0 R]"
      }))
    assert(img.colorSpace == "DeviceRGB")
  }

  test("opt-in JPEG transcode: real JPEG decodes to a PNG with the right pixels") {
    // build a real JPEG via ImageIO (solid mid-gray survives DCT
    // quantization exactly enough for a tolerance check)
    val src = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) src.setRGB(x, y, 0x808080)
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "jpg", jout)
    val img = graft.pdf.extract.PdfImage("Im1", 16, 16, 8, "DeviceRGB",
      isJpeg = true, jout.toByteArray, None, "")
    assert(Images.toPng(img).isEmpty, "default path stays pass-through")
    val png = Images.transcodeJpegToPng(img)
    assert(png.isDefined)
    val (px, w, h, ch) = Images.decodePngForTest(png.get)
    assert(w == 16 && h == 16 && ch == 3)
    // JPEG is lossy: all pixels within a small delta of 0x80
    assert(px.forall(b => math.abs((b & 0xff) - 0x80) <= 4), "pixels near mid-gray")
    // non-JPEG input refuses
    assert(Images.transcodeJpegToPng(img.copy(isJpeg = false)).isEmpty)
    // garbage JPEG degrades to None, no throw
    assert(Images.transcodeJpegToPng(img.copy(data = "junk".getBytes)).isEmpty)
  }

  test("DCTDecode is JPEG pass-through: toJpeg yields bytes, toPng None") {
    val fakeJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++
      new Array[Byte](16)
    val img = extractOne(pdfWithImage(8, 8, 8, "/DeviceRGB", fakeJpeg, dct = true))
    assert(img.isJpeg)
    assert(Images.toJpeg(img).get.sameElements(fakeJpeg))
    assert(Images.toPng(img).isEmpty)
  }
}
